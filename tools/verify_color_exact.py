"""Exhaustive proof that the integer S-form color conversion equals the
reference f64 chain over the ENTIRE 10-bit input domain.

Channels r and b depend on (y, v) / (y, u): all 2^20 pairs checked in one
vectorized pass. Channel g depends on (y, u, v): all 2^30 triples checked
in 1024 u-slices of 1024x1024 f64 grids (host, a few minutes).

The f64 side reproduces ``src/codec.rs:661-687`` operation for operation
(numpy elementwise f64 == scalar IEEE f64). The integer side is
``tpu_vpcc.ops.color.color_luts`` — the exact constructor the runtime
uses, so a clean run proves the runtime conversion, not a lookalike.

Usage: python tools/verify_color_exact.py  [--quick N]  (N u-slices only)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tpu_vpcc.ops.color import (
    B_U_COEF,
    G_U_COEF,
    G_V_COEF,
    R_V_COEF,
    color_luts,
    g8_from_packed,
)


def f64_channel_rb(y, c):
    """clamp(floor((y + c)/1023*255)) in the reference's op order."""
    x = np.floor((y + c) / 1023.0 * 255.0)
    return np.clip(x, 0.0, 255.0).astype(np.int32)


def check_rb():
    s_r, s_b, s_g = color_luts()
    y = np.arange(1024, dtype=np.float64)[:, None]  # (y, chroma)
    d = (np.arange(1024, dtype=np.float64) - 512.0)[None, :]
    y85 = (85 * np.arange(1024, dtype=np.int64))[:, None]
    bad = {}
    for name, coef, s in (("r", R_V_COEF, s_r), ("b", B_U_COEF, s_b)):
        ref = f64_channel_rb(y, coef * d)
        got = np.clip((y85 - s[None, :].astype(np.int64)) // 341, 0, 255)
        mism = np.argwhere(ref != got)
        bad[name] = mism
        print(f"channel {name}: {1024*1024} pairs, {len(mism)} mismatches")
        for m in mism[:10]:
            print(f"  y={m[0]} chroma={m[1]} ref={ref[m[0],m[1]]} got={got[m[0],m[1]]}")
    return all(len(v) == 0 for v in bad.values())


def check_g(n_slices: int = 1024):
    _, _, packed_g = color_luts()
    y = np.arange(1024, dtype=np.float64)[:, None]  # (y, v)
    dv = (np.arange(1024, dtype=np.float64) - 512.0)[None, :]
    bterm = G_V_COEF * dv  # (1, v) f64 per-v term
    yi = np.arange(1024, dtype=np.int64)[:, None]
    total_bad = 0
    t0 = time.perf_counter()
    for u in range(n_slices):
        du = float(u) - 512.0
        aterm = G_U_COEF * du  # scalar f64, same rounding as the chain
        # reference op order: (y - a) - b, then /1023, *255, floor, clamp
        ref = np.clip(np.floor(((y - aterm) - bterm) / 1023.0 * 255.0), 0.0, 255.0)
        # the ACTUAL runtime decode: packed S + deviation masks
        got = np.clip(g8_from_packed(yi, packed_g[u].astype(np.int64)[None, :]), 0, 255)
        mism = np.argwhere(ref.astype(np.int64) != got)
        if len(mism):
            total_bad += len(mism)
            for m in mism[:5]:
                print(
                    f"  g mismatch: y={m[0]} u={u} v={m[1]} "
                    f"ref={int(ref[m[0],m[1]])} got={got[m[0],m[1]]} "
                    f"(packed={packed_g[u,m[1]]})"
                )
        if u % 128 == 127:
            print(
                f"  g: {u+1}/{n_slices} u-slices, {total_bad} mismatches, "
                f"{time.perf_counter()-t0:.1f}s"
            )
    print(f"channel g: {n_slices*1024*1024} triples, {total_bad} mismatches")
    return total_bad == 0


def main() -> int:
    n = 1024
    if len(sys.argv) >= 3 and sys.argv[1] == "--quick":
        n = int(sys.argv[2])
    ok_rb = check_rb()
    ok_g = check_g(n)
    verdict = "PROVEN EXACT" if (ok_rb and ok_g) else "MISMATCHES FOUND"
    full = " (full domain)" if n == 1024 else f" ({n}/1024 u-slices only)"
    print(f"RESULT: {verdict}{full}")
    return 0 if (ok_rb and ok_g) else 1


if __name__ == "__main__":
    sys.exit(main())
