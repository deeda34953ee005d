"""Mosaic probe set 2 for the shift-network compaction kernel.

  P5  pltpu.bitcast u32 -> u16: output shape and element order (need
      little-endian pairs: u32 (lo | hi<<16) -> [lo, hi] adjacent)
  P6  rolls + flat-shift construction on wide-lane u16 arrays
      ((R, 1024) — the stream shape the kernel uses)
  P7  dynamic-shift roll (traced shift value)
  P8  u16 -> u32 upcast + recombine and a full miniature shift-network
      compaction on a bitcast stream, compiled
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv


def report(name, got, want):
    got = np.asarray(got)
    want = np.asarray(want)
    ok = got.shape == want.shape and np.array_equal(got, want)
    print(f"{name}: {'OK' if ok else 'FAIL'}"
          + ("" if ok else f" mism={np.sum(got != want) if got.shape == want.shape else '-'} shape={got.shape} vs {want.shape}"))
    return ok


def rollm(x, k, axis):
    n = x.shape[axis]
    return pltpu.roll(x, shift=(n - (k % n)) % n, axis=axis)


def flat_shift_down(x, k, lanes):
    if k % lanes == 0:
        return rollm(x, k // lanes, 0)
    assert k < lanes
    xr = rollm(x, k, 1)
    xrr = rollm(xr, 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < lanes - k, xr, xrr)


# --- P5 -------------------------------------------------------------------

def probe_bitcast():
    R = 4
    lo = np.arange(R * 512, dtype=np.uint32).reshape(R, 512) % 60000
    hi = (np.arange(R * 512, dtype=np.uint32).reshape(R, 512) * 7 + 3) % 60000
    combo = lo | (hi << 16)

    def kern(c_ref, o_ref):
        o_ref[:] = pltpu.bitcast(c_ref[:], jnp.uint16)

    try:
        o = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 1024), jnp.uint16),
            interpret=INTERPRET,
        )(jnp.asarray(combo))
        want = np.empty((R, 1024), np.uint16)
        want[:, 0::2] = lo.astype(np.uint16)
        want[:, 1::2] = hi.astype(np.uint16)
        report("P5 bitcast u32->u16 interleave order", o, want)
    except Exception as e:  # noqa: BLE001
        print(f"P5 bitcast: EXC {type(e).__name__}: {str(e)[:300]}")

    # and back
    def kern2(c_ref, o_ref):
        u = pltpu.bitcast(c_ref[:], jnp.uint16)
        o_ref[:] = pltpu.bitcast(u, jnp.uint32)

    try:
        o = pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((R, 512), jnp.uint32),
            interpret=INTERPRET,
        )(jnp.asarray(combo))
        report("P5 bitcast roundtrip", o, combo)
    except Exception as e:  # noqa: BLE001
        print(f"P5 bitcast roundtrip: EXC {type(e).__name__}: {str(e)[:300]}")


# --- P6 -------------------------------------------------------------------

def probe_wide_u16():
    R, L = 8, 1024
    x = (np.arange(R * L, dtype=np.uint32) % 61000).astype(np.uint16).reshape(R, L)
    ks = [1, 5, 1023, 1024, 4096]

    def kern(x_ref, *outs):
        for o, k in zip(outs, ks):
            o[:] = flat_shift_down(x_ref[:], k, L)

    try:
        outs = pl.pallas_call(
            kern,
            out_shape=tuple(jax.ShapeDtypeStruct((R, L), jnp.uint16) for _ in ks),
            interpret=INTERPRET,
        )(jnp.asarray(x))
        flat = x.reshape(-1)
        for o, k in zip(outs, ks):
            got = np.asarray(o).reshape(-1)[: flat.size - k]
            report(f"P6 u16 flat shift {k} @ lanes={L}", got, flat[k:])
    except Exception as e:  # noqa: BLE001
        print(f"P6 u16 wide shifts: EXC {type(e).__name__}: {str(e)[:300]}")


# --- P7 -------------------------------------------------------------------

def probe_dynamic_roll():
    R, L = 4, 256
    x = np.arange(R * L, dtype=np.int32).reshape(R, L)

    def kern(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=1)

    try:
        o = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            interpret=INTERPRET,
        )(jnp.asarray(np.array([7], np.int32)), jnp.asarray(x))
        report("P7 dynamic lane roll", o, np.roll(x, 7, axis=1))
    except Exception as e:  # noqa: BLE001
        print(f"P7 dynamic roll: EXC {type(e).__name__}: {str(e)[:300]}")


# --- P8: miniature compaction on a bitcast stream -------------------------

def probe_mini_compact():
    # one chunk, no DMA windows: inputs are the XLA-style combined u32
    # arrays; kernel bitcasts to u16 streams, runs the shift network,
    # recombines, writes (R, L) u32 out. Valid flags ride a combined
    # stream too; sh computed on the host here.
    R, L = 4, 512  # pixels = R*L = 2048, slots = 4096
    P = R * L
    r = np.random.default_rng(0)
    v0 = r.random(P) < 0.6
    v1 = r.random(P) < 0.5
    w0d0 = r.integers(0, 1 << 30, P, dtype=np.uint32)
    w0d1 = r.integers(0, 1 << 30, P, dtype=np.uint32)

    cum = np.cumsum(v0.astype(np.int64) + v1) - (v0.astype(np.int64) + v1)
    dest0 = cum
    dest1 = cum + v0
    pos0 = 2 * np.arange(P)
    pos1 = pos0 + 1
    sh0 = np.where(v0, pos0 - dest0, 0).astype(np.uint32)
    sh1 = np.where(v1, pos1 - dest1, 0).astype(np.uint32)

    alo = (w0d0 & 0xFFFF) | ((w0d1 & 0xFFFF) << 16)
    ahi = (w0d0 >> 16) | (w0d1 & 0xFFFF0000)
    shc = sh0 | (sh1 << 16)

    NB = 13  # max shift < 2^13 = 8192 > 4096

    def kern(alo_ref, ahi_ref, shc_ref, o_ref):
        lanes = 2 * L
        lo = pltpu.bitcast(alo_ref[:], jnp.uint16)
        hi = pltpu.bitcast(ahi_ref[:], jnp.uint16)
        s = pltpu.bitcast(shc_ref[:], jnp.uint16)
        for b in range(NB):
            k = 1 << b
            lo_s = flat_shift_down(lo, k, lanes) if k < lanes else rollm(lo, k // lanes, 0)
            hi_s = flat_shift_down(hi, k, lanes) if k < lanes else rollm(hi, k // lanes, 0)
            s_s = flat_shift_down(s, k, lanes) if k < lanes else rollm(s, k // lanes, 0)
            move_in = ((s_s >> b) & 1) == 1
            self_mv = ((s >> b) & 1) == 1
            lo = jnp.where(move_in, lo_s, lo)
            hi = jnp.where(move_in, hi_s, hi)
            s = jnp.where(move_in, s_s, jnp.where(self_mv, jnp.uint16(0), s))
        lo32 = pltpu.bitcast(lo, jnp.uint32)  # pairs again — NOT what we want
        # recombine properly: upcast u16 streams to u32 then merge
        # (we need per-STREAM-ELEMENT u32: lo[p] | hi[p]<<16 at stream
        # position p, as an (R, 2L) u32 array)
        lo_u = lo.astype(jnp.uint32)
        hi_u = hi.astype(jnp.uint32)
        o_ref[:] = lo_u | (hi_u << 16)

    try:
        o = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 2 * L), jnp.uint32),
            interpret=INTERPRET,
        )(jnp.asarray(alo), jnp.asarray(ahi), jnp.asarray(shc))
        got = np.asarray(o).reshape(-1)
        # expected: interleaved valid w0 values in emission order
        inter = np.empty(2 * P, np.uint32)
        inter[0::2] = w0d0
        inter[1::2] = w0d1
        vv = np.empty(2 * P, bool)
        vv[0::2] = v0
        vv[1::2] = v1
        want = inter[vv]
        report("P8 mini shift-compact (prefix)", got[: want.size], want)
    except Exception as e:  # noqa: BLE001
        print(f"P8 mini compact: EXC {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_bitcast()
    probe_wide_u16()
    probe_dynamic_roll()
    probe_mini_compact()
