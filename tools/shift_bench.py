"""Stage-level A/B: shift-network compaction vs the batched split-sort,
at the production 1280² bucketed extent, on the real TPU.

Methodology = bench.py's chained K-vs-1 differential: one jitted
lax.fori_loop whose trip count is dynamic, carry = bare adds consuming
one element of EVERY output operand family plus the counts, inputs
perturbed by a provably-zero data-dependent bump (defeats hoisting of
the prep cumsums/keys in both variants). Stage-isolated numbers can
mislead vs the fused end-to-end graph (PERFORMANCE.md) — this is a
go/no-go gate before full-pipeline integration, not a headline.

Usage: python tools/shift_bench.py [--extent 16384] [--f 1] [--n 20]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--extent", type=int, default=16384)
    ap.add_argument("--f", type=int, default=1)
    ap.add_argument("--groups", type=int, default=3072)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--density", type=float, default=0.61)
    ap.add_argument("--variant", choices=["shift", "sort", "both"],
                    default="both")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp
    from tpu_vpcc.ops.shift_compact import shift_compact_ops
    from tpu_vpcc.ops.tiled import _batched_split_sort, _merge_segment_stacks

    F = args.f
    S = args.groups * 512  # slots_per_block at res 16, 2 maps
    half = S // 2
    extent = args.extent
    assert S % extent == 0
    Sk = 16384  # production batched-split-sort segment extent
    Kseg = S // Sk
    print(f"F={F} S={S} extent={extent} K={S // extent} "
          f"(sort: Sk={Sk} Kseg={Kseg}) density={args.density}")

    r = np.random.default_rng(0)
    w0 = r.integers(0, 1 << 30, (F, S), dtype=np.uint32)
    wc = r.integers(0, 1 << 30, (F, S), dtype=np.uint32)
    valid = r.random((F, S)) < args.density
    iota = np.arange(half, dtype=np.uint32)
    emi = np.concatenate([2 * iota, 2 * iota + 1])[None, :].repeat(F, 0)
    seg_bases = (np.arange(Kseg, dtype=np.uint32) * Sk)[None, :].repeat(F, 0)

    dev = jax.devices()[0]
    w0_d = jax.device_put(w0, dev)
    wc_d = jax.device_put(wc, dev)
    valid_d = jax.device_put(valid, dev)
    emi_d = jax.device_put(emi, dev)
    segb_d = jax.device_put(seg_bases, dev)

    def run_shift(w0x, wcx, vx):
        return shift_compact_ops(w0x, None, wcx, vx, F, S, extent=extent,
                                 interpret=args.cpu)

    def run_sort(w0x, wcx, vx):
        words = (w0x, None, wcx, vx, emi_d)
        payload, counts_seg = _batched_split_sort(words, segb_d, F, Kseg, Sk)
        merged = _merge_segment_stacks(payload, counts_seg, F)
        return merged, counts_seg.sum(axis=1)

    def make_chained(fn):
        @jax.jit
        def chained(n, w0x, wcx, vx):
            def body(i, carry):
                c = carry
                bump = jnp.where(c < 0, 1, 0).astype(jnp.uint32)
                vb = vx != (bump > 0)  # provably-identity, unhoistable
                ops, cnt = fn(w0x + bump, wcx, vb)
                probe = sum(o[0, 0].astype(jnp.int32) for o in ops)
                return c + cnt.sum().astype(jnp.int32) + probe
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return chained

    results = {}
    for name, fn in [("shift", run_shift), ("sort", run_sort)]:
        if args.variant not in (name, "both"):
            continue
        # correctness cross-check once
        ops, cnt = jax.jit(fn)(w0_d, wc_d, valid_d)
        cnt_np = np.asarray(cnt)
        results[name + "_ops"] = [np.asarray(o) for o in ops]
        results[name + "_cnt"] = cnt_np

        ch = make_chained(fn)
        n_long = np.int32(args.n * args.k)
        n_short = np.int32(args.n)
        t0 = time.perf_counter()
        _ = np.asarray(ch(n_long, w0_d, wc_d, valid_d))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        dts_l, dts_s = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(ch(n_long, w0_d, wc_d, valid_d))
            dts_l.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = np.asarray(ch(n_short, w0_d, wc_d, valid_d))
            dts_s.append(time.perf_counter() - t0)
        net = (min(dts_l) - min(dts_s)) / (args.n * (args.k - 1))
        print(f"{name}: {net * 1e3:.3f} ms per chained run "
              f"({net * 1e3 / F:.3f} ms/frame)  [long {min(dts_l):.3f}s "
              f"short {min(dts_s):.3f}s]")

    if args.variant == "both":
        a, b = results["shift_ops"], results["sort_ops"]
        ca, cb = results["shift_cnt"], results["sort_cnt"]
        assert np.array_equal(ca, cb), (ca, cb)
        ok = True
        for f in range(F):
            n = ca[f]
            for x, y in zip(a, b):
                if not np.array_equal(x[f, :n], y[f, :n]):
                    ok = False
        print("prefix parity:", "OK" if ok else "FAIL")


if __name__ == "__main__":
    main()
