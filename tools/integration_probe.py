"""Rank the shift-compact pipeline's non-kernel costs in the FULL
production graph (round-5 follow-up to PERFORMANCE.md's "next probe
targets": the bucketed tile transposes, the [garbage|D0|D1] block
concat, the dest cumsum, plus the pack/gather front end).

Methodology — the only one this backend trusts (CLAUDE.md): substitute
ONE stage with a same-shape fake inside the production dispatch
(`_flat_pretiled_impl`, packed out, shift-compact policy), time the
chained K-vs-1 differential, and read the delta vs the unmodified
graph. Stage-isolated microbenchmarks mislead (XLA fuses truncated
graphs differently); every fake consumes the same inputs and produces
the same shapes/dtypes so the surrounding fusion landscape survives.

Variants:
  full     production graph (baseline)
  notr     skip the three [FG,res,res] tile transposes (orientation fix)
  nocs     replace the dest cumsum with an elementwise fake
  noker    replace the Pallas kernel call with slice+reshape of its
           input blocks (measures everything-but-kernel)
  nopack   replace the canvas-extent u32 plane pack with casts
  nogather replace the megarow row gather with a static slice

Usage: python tools/integration_probe.py [--variants full,notr,...]
       [--n 8] [--k 9] [--batch 1]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
_CACHE = os.path.join(_REPO, ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)


def build_patches():
    """Variant-name -> {hook-name: fake} table (module-scope for the
    trace-only shape test in tests/tools checks)."""
    import jax
    import jax.numpy as jnp

    from tpu_vpcc.ops import shift_compact as SC
    from tpu_vpcc.ops import tiled

    orig_ttw = tiled._tiles_to_words

    def fake_ttw_no_transpose(*a, **kw):
        kw["_fix_orientation"] = False
        return orig_ttw(*a, **kw)

    def fake_pack(occ, geo0, geo1, ay, au, av, cfg_):
        u32 = lambda t: t.astype(jnp.uint32)  # noqa: E731
        return u32(geo0) | (u32(geo1) << 10), u32(ay[:, 0]), u32(ay[:, 1])

    def fake_up(t, factor):
        # same output shape/deps as _upsample2d, no relayout: slice the
        # corner and broadcast it (values wrong — cost probe only)
        if factor == 1:
            return t
        corner = t[..., :1, :1]
        return jnp.broadcast_to(
            corner, t.shape[:-2] + (t.shape[-2] * factor,
                                    t.shape[-1] * factor)
        )

    def fake_pack_realup(occ, geo0, geo1, ay, au, av, cfg_):
        orig_up = tiled._upsample2d
        tiled._upsample2d = fake_up
        try:
            return apply_patch._orig["pack"](
                occ, geo0, geo1, ay, au, av, cfg_
            )
        finally:
            tiled._upsample2d = orig_up

    def fake_mega(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg_):
        r = cfg_.occupancy_resolution
        T2 = r * r
        Gc = fields.shape[1]
        F = fields.shape[0]
        FG = F * Gc
        planes = tiled._pack_u32_planes(
            occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg_
        )
        nb = cfg_.block_h * cfg_.block_w
        cat = jnp.concatenate([p.reshape(F * nb, T2) for p in planes], axis=1)
        rows = jax.lax.dynamic_slice_in_dim(cat, 0, FG, 0)  # no gather
        return (
            rows[:, :T2].reshape(FG, r, r),
            rows[:, T2 : 2 * T2].reshape(FG, r, r),
            rows[:, 2 * T2 :].reshape(FG, r, r),
        )

    def mega_g3(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg_):
        """REAL alternative: three separate row gathers, no 3-plane
        concat (tests whether the megarow cat materialization is the
        nogather delta)."""
        r = cfg_.occupancy_resolution
        T2 = r * r
        Gc = fields.shape[1]
        F = fields.shape[0]
        FG = F * Gc
        nb = cfg_.block_h * cfg_.block_w
        from tpu_vpcc.atlas import groups as G
        planes = tiled._pack_u32_planes(
            occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg_
        )
        ff = fields.reshape(FG, G.N_GROUP_FIELDS)
        f_of_g = jax.lax.broadcasted_iota(jnp.int32, (F, Gc), 0).reshape(FG)
        row_idx = f_of_g * nb + ff[:, G.G_BLOCKID]
        return tuple(
            p.reshape(F * nb, T2)[row_idx].reshape(FG, r, r)
            for p in planes
        )

    def fake_cumsum(s01, F, half):
        # same shape/deps as _dest_cumsum, elementwise (values wrong)
        return s01 + jax.lax.broadcasted_iota(jnp.int32, s01.shape, 1)

    def fake_ilmm(pairs, F, half, nbits=None):
        # same shapes/deps as _interleave_pairs_mm WITHOUT the MXU
        # permutation: a layout-preserving concat (values land in the
        # wrong ORDER — cost probe only)
        return [
            jnp.concatenate([a0, a1], axis=1).astype(jnp.uint32)
            for a0, a1 in pairs
        ]


    def fake_launch(key_b, op_blocks, dtypes, row0_blk, delta, pendrow,
                    shbits, F, K, Rh, rows_per_frame, merge, interpret):
        # everything-but-kernel: the production shift_compact_ops runs
        # unmodified (including the round-7 interleave matmul when
        # MM_IL is on) and only the pallas_call is replaced. Force
        # FULL consumption of every operand block: the real kernel's
        # side-effecting DMA pins all inputs, and without the
        # reductions the corner-element probe lets XLA slice the
        # payload/color path to points (probe-hole classes of rounds
        # 3/4/6).
        red = (
            sum(b.astype(jnp.uint32).sum() for b in op_blocks)
            + key_b.astype(jnp.uint32).sum()
            + (row0_blk.sum() + delta.sum() + pendrow.sum()
               + shbits.sum()).astype(jnp.uint32)
        )
        return [
            b[:, SC.ALIGN_ROWS :, :].reshape(F * rows_per_frame, SC.LANES)
            + red.astype(b.dtype)
            for b in op_blocks
        ]

    def mm_transpose_bf16(t_a, t_b, t_c, sw, tile):
        """8-bit-chunked single-pass bf16 variant of _tile_transpose_mm
        (chunks <= 255 are bf16-exact; one term per output => exact)."""
        FG = t_a.shape[0]
        T2 = tile * tile
        j = jnp.arange(T2)
        src = (j % tile) * tile + j // tile
        P = (src[:, None] == jnp.arange(T2)[None, :]).astype(jnp.bfloat16)
        a = t_a.reshape(FG, T2)
        b = t_b.reshape(FG, T2)
        c = t_c.reshape(FG, T2)
        M8 = jnp.uint32(0xFF)
        chunks = [a & M8, (a >> 8) & M8, a >> 16,
                  b & M8, (b >> 8) & M8, (b >> 16) & M8, b >> 24,
                  c & M8, (c >> 8) & M8, (c >> 16) & M8, c >> 24]
        rows = jnp.concatenate(
            [ch.astype(jnp.bfloat16) for ch in chunks], axis=0
        )
        tt = jax.lax.dot(rows, P, preferred_element_type=jnp.float32)
        u = lambda k: tt[k * FG : (k + 1) * FG].astype(jnp.uint32)  # noqa: E731
        aT = u(0) | (u(1) << 8) | (u(2) << 16)
        bT = u(3) | (u(4) << 8) | (u(5) << 16) | (u(6) << 24)
        cT = u(7) | (u(8) << 8) | (u(9) << 16) | (u(10) << 24)
        sel = sw.reshape(FG, 1)
        out = lambda t, tT: jnp.where(  # noqa: E731
            sel, tT, t.reshape(FG, T2)
        ).reshape(FG, tile, tile)
        return out(t_a, aT), out(t_b, bT), out(t_c, cT)

    def dest_cumsum_lean(s01, F, half):
        """All-f32 variant: no i32 intermediates, rowbase via a second
        (tiny) HIGHEST-precision triu matmul instead of jnp.cumsum."""
        W = 512
        if half % W:
            return jnp.cumsum(s01, axis=1)
        R = half // W
        s = s01.reshape(F * R, W).astype(jnp.float32)
        U = jnp.triu(jnp.ones((W, W), jnp.float32))
        incl_r = jax.lax.dot(s, U, preferred_element_type=jnp.float32)
        rowsum = incl_r[:, W - 1].reshape(F, R)
        UR = jnp.triu(jnp.ones((R, R), jnp.float32), k=1)
        # exclusive row base: rowsum @ strict-lower?? want base[r] =
        # sum_{q<r} rowsum[q] = rowsum @ L with L[q, r] = 1 for q < r
        rowbase = jax.lax.dot(
            rowsum, UR,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return (
            incl_r.reshape(F, R, W) + rowbase[:, :, None]
        ).astype(jnp.int32).reshape(F, half)

    return {
        "full": {},
        "tr8": {"mmtr": mm_transpose_bf16},
        "cs2": {"csum": dest_cumsum_lean},
        "trcs": {"mmtr": mm_transpose_bf16, "csum": dest_cumsum_lean},
        "notr": {"ttw": fake_ttw_no_transpose},
        "nocs": {"csum": fake_cumsum},
        "noker": {"launch": fake_launch},
        "noilmm": {"ilmm": fake_ilmm},
        "nopack": {"pack": fake_pack},
        "noup": {"pack": fake_pack_realup},
        "g3": {"mega": mega_g3},
        "nogather": {"mega": fake_mega},
        # REAL-implementation A/B variants (bit-exact, via the
        # trace-time env policy knobs): base = where-transpose +
        # jnp.cumsum; mmtr / mmcs switch ONE stage to the MXU matmul
        # formulation; mmboth = the TPU default
        "base": {},
        "mmtr": {},
        "mmcs": {},
        "mmboth": {},
    }


# env-knob sets for the real-implementation variants (None = not an
# env variant: leave the TPU defaults in place)
ENV_VARIANTS = {
    "base": {"TPU_VPCC_NO_MM_TR": "1", "TPU_VPCC_NO_MM_CS": "1"},
    "mmtr": {"TPU_VPCC_NO_MM_CS": "1"},
    "mmcs": {"TPU_VPCC_NO_MM_TR": "1"},
    "mmboth": {},
    # round 7: merge-free narrow kernel behind the MXU per-pixel
    # interleave (il = TPU default) vs the odd-even-merge kernel
    "il": {},
    "noil": {"TPU_VPCC_NO_MM_IL": "1"},
    # round 7: kernel work predication (see _make_kernel): off = every
    # chunk runs all passes; skip = empty chunks skip the body; bits =
    # additionally per-pass pl.when on the chunk's shift bound
    "proff": {"TPU_VPCC_PRED": "off"},
    "prskip": {"TPU_VPCC_PRED": "skip"},
    "prbits": {"TPU_VPCC_PRED": "bits"},
    # round 7: bucket-extent gather-then-pack vs canvas-extent
    # pack-then-gather (bit-exact twins; see _bpack_policy)
    "bpack": {"TPU_VPCC_BPACK": "1"},
    "nobp": {"TPU_VPCC_NO_BPACK": "1"},
    # round 7: interleave-matmul arithmetic (see _il_prec_policy; the
    # noilmm probe showed the dot itself costs ~0.095 at HIGHEST)
    "il6": {"TPU_VPCC_IL_PREC": "highest"},
    "il3": {"TPU_VPCC_IL_PREC": "high"},
    "il8": {"TPU_VPCC_IL_PREC": "chunk8"},
}

# kernel lane-width variants: the shift_compact module constants are
# read at TRACE time, so patching them re-shapes the whole kernel
# (window (2Rh+8, LANES); narrower lanes turn more merge/shift passes
# into row-multiple rolls). Sweep result (extent 32768, full graph):
# 128 -> 0.586 ms/frame, 256 -> 0.737, 512 -> 0.720; 128 = the native
# (8, 128) register width is now the module default.
LANE_VARIANTS = {"l128": 128, "l256": 256, "l512": 512}

# MXU destination-cumsum block width (_dest_cumsum's triu matmul rows;
# independent of the kernel LANES). Wider rows = fewer rows but a
# quadratically bigger triu operand; 512 won the round-5 sweep.
CS_VARIANTS = {"cs256": 256, "cs512": 512, "cs1024": 1024}


def set_lane_variant(name):
    from tpu_vpcc.ops import shift_compact as SC

    if not hasattr(set_lane_variant, "_default"):
        set_lane_variant._default = SC.LANES
        set_lane_variant._cs_default = SC._CS_LANES
    lanes = LANE_VARIANTS.get(name, set_lane_variant._default)
    SC.LANES = lanes
    SC.ALIGN = SC.ALIGN_ROWS * lanes
    SC._LOG_ALIGN = SC.ALIGN.bit_length() - 1
    SC._CS_LANES = CS_VARIANTS.get(name, set_lane_variant._cs_default)
_ENV_KEYS = (
    "TPU_VPCC_NO_MM_TR", "TPU_VPCC_NO_MM_CS",
    "TPU_VPCC_MM_TR", "TPU_VPCC_MM_CS",
    "TPU_VPCC_MM_IL", "TPU_VPCC_NO_MM_IL", "TPU_VPCC_PRED",
    "TPU_VPCC_BPACK", "TPU_VPCC_NO_BPACK", "TPU_VPCC_IL_PREC",
)


def set_env_variant(name):
    env = ENV_VARIANTS.get(name)
    if env is None:
        return
    for k in _ENV_KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)


def apply_patch(p):
    from tpu_vpcc.ops import shift_compact as SC
    from tpu_vpcc.ops import tiled

    if not hasattr(apply_patch, "_orig"):
        apply_patch._orig = {
            "ttw": tiled._tiles_to_words,
            "pack": tiled._pack_u32_planes,
            "mega": tiled._pretiled_gather_megarow,
            "gt": tiled._gather_tiles,
            "sco": SC.shift_compact_ops,
            "mmtr": tiled._tile_transpose_mm,
            "csum": SC._dest_cumsum,
            "launch": SC._launch,
            "ilmm": SC._interleave_pairs_mm,
        }
    o = apply_patch._orig
    tiled._tiles_to_words = p.get("ttw", o["ttw"])
    tiled._pack_u32_planes = p.get("pack", o["pack"])
    tiled._pretiled_gather_megarow = p.get("mega", o["mega"])
    tiled._gather_tiles = p.get("gt", o["gt"])
    tiled._tile_transpose_mm = p.get("mmtr", o["mmtr"])
    SC._dest_cumsum = p.get("csum", o["csum"])
    SC._launch = p.get("launch", o["launch"])
    SC._interleave_pairs_mm = p.get("ilmm", o["ilmm"])
    # tiled imports shift_compact_ops inside the dispatch branch, so
    # patching the source module attribute covers it
    SC.shift_compact_ops = p.get("sco", o["sco"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variants", default="full,noker,nocs,nogather,nowords"
    )
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--k", type=int, default=9)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--parity", action="store_true",
                    help="byte-compare env-variant dispatch outputs")
    ap.add_argument("--extent", type=int, default=0,
                    help="override the shift-compact chunk extent")
    ap.add_argument("--planes", action="store_true",
                    help="stage raw tiled planes (pre-round-7 graph) "
                    "instead of the production host-packed cat; required "
                    "for the legacy pack/gather variants")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("TPU_VPCC_SHIFT", "1")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    import jax.numpy as jnp

    from tpu_vpcc.models.flagship import (
        FlagshipConfig,
        bucket_flagship_inputs,
        example_batch_inputs,
    )
    from tpu_vpcc.ops import tiled
    from tpu_vpcc.ops.tiled import narrow_emit_ok, tile_plane

    cfg = FlagshipConfig(batch=args.batch)
    fcfg = cfg.frame_config()
    raw = example_batch_inputs(cfg, occupancy_fill=0.7, n_patches=48)
    res = fcfg.occupancy_resolution
    raw, fcfg, g_bucket, n_live = bucket_flagship_inputs(raw, fcfg)
    host_inputs = (
        raw[0],
        tile_plane(raw[1], res // fcfg.occupancy_precision),
        tile_plane(raw[2], res),
        tile_plane(raw[3], res),
        tile_plane(raw[4], res),
        tile_plane(raw[5], res // 2),
        tile_plane(raw[6], res // 2),
    )
    S_cap = g_bucket * fcfg.slots_per_group
    assert narrow_emit_ok(fcfg, args.batch, S_cap)
    assert fcfg.shift_compact, "probe requires the shift-compact policy"
    from dataclasses import replace as _dreplace

    if args.extent:
        from tpu_vpcc.ops.shift_compact import shift_supported

        assert shift_supported(S_cap, args.extent), (S_cap, args.extent)
        fcfg = _dreplace(fcfg, shift_compact=args.extent)
    cat_mode = not args.planes
    if cat_mode:
        # PRODUCTION staging (round 7): the shared helper keeps the
        # probe's staged graph in lockstep with the pipeline and bench
        # (host pack + host orientation per the env policies; the
        # device graph starts at the mega-row gather)
        from tpu_vpcc.ops.tiled import stage_cat_inputs

        legacy = {"nopack", "noup", "notr", "g3", "hostpack", "dualhost",
                  "bpack", "nobp"}
        bad = legacy & set(args.variants.split(","))
        assert not bad, f"variants {bad} need --planes (pre-round-7 graph)"
        host_inputs, fcfg = stage_cat_inputs(*host_inputs, fcfg)
    dev = jax.devices()[0]
    inputs = [
        None if a is None else jax.device_put(a, dev) for a in host_inputs
    ]
    print(
        f"batch={args.batch} g_bucket={g_bucket} live={n_live} "
        f"S={S_cap} extent={fcfg.shift_compact} pack30={fcfg.pack30} "
        f"cat_mode={cat_mode}"
    )

    patches = build_patches()

    if cat_mode:
        import jax.numpy as jnp

        def fake_gt_cat(fields, occ_t, *rest):
            # same-shape tile fetch WITHOUT the row gather: a static
            # slice of the cat (cost probe only — wrong groups)
            cfg_ = rest[-1]
            r = cfg_.occupancy_resolution
            T2 = r * r
            Gc = fields.shape[1]
            F = fields.shape[0]
            FG = F * Gc
            rows = jax.lax.dynamic_slice_in_dim(
                occ_t.reshape(-1, 3 * T2), 0, FG, 0
            )
            return (
                rows[:, :T2].reshape(FG, r, r),
                rows[:, T2 : 2 * T2].reshape(FG, r, r),
                rows[:, 2 * T2 :].reshape(FG, r, r),
            )

        def fake_ttw_cheap(fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg_,
                           **kw):
            # same-shape words WITHOUT the per-slot compute: reshape the
            # gathered tiles (consumes all three; values wrong). The
            # downstream cumsum/kernel run on ~bit-0 density.
            h = S // 2
            u32 = lambda a: a.astype(jnp.uint32)  # noqa: E731
            fa = u32(t_a).reshape(F, h)
            fb = u32(t_b).reshape(F, h)
            fc = u32(t_c).reshape(F, h)
            w0 = jnp.concatenate([fa, fb], axis=1)
            wc = jnp.concatenate([fb, fc], axis=1)
            valid = jnp.concatenate(
                [(fa & 1) == 1, (fc & 1) == 1], axis=1
            )
            emi = jax.lax.broadcasted_iota(jnp.int32, (F, S), 1)
            zs = (
                None if cfg_.pack30
                else jnp.concatenate([fa, fb], axis=1).astype(jnp.uint16)
            )
            return w0, zs, wc, valid, emi

        patches["nogather"] = {"gt": fake_gt_cat}
        patches["nowords"] = {"ttw": fake_ttw_cheap}

    if "hostpack" in args.variants:
        # HYPOTHESIS variant (round 7): the host (or an untimed pass)
        # supplies the SINGLE-orientation packed u32 planes already
        # concatenated row-wise — the pack (0.125 ms, the largest
        # stage on the merge-free graph) leaves the timed graph; the
        # orientation fix stays on device. H2D grows ~1.2x (12 vs
        # ~10 B/px).
        import jax.numpy as jnp

        from tpu_vpcc.atlas import groups as G
        from tpu_vpcc.ops import tiled as T

        @jax.jit
        def build_cat(occ, geo0, geo1, ay, au, av):
            pa, pb, pc = T._pack_u32_planes(occ, geo0, geo1, ay, au, av, fcfg)
            nb = fcfg.block_h * fcfg.block_w
            T2 = res * res
            Fb = occ.shape[0]
            return jnp.concatenate(
                [p.reshape(Fb * nb, T2) for p in (pa, pb, pc)], axis=1
            )

        hp_cat = jax.device_put(np.asarray(build_cat(*inputs[1:])), dev)

        def hp_mega(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t,
                    cfg_):
            r = cfg_.occupancy_resolution
            T2 = r * r
            Gc = fields.shape[1]
            F = fields.shape[0]
            FG = F * Gc
            nb = cfg_.block_h * cfg_.block_w
            ff = fields.reshape(FG, G.N_GROUP_FIELDS)
            f_of_g = jax.lax.broadcasted_iota(
                jnp.int32, (F, Gc), 0
            ).reshape(FG)
            # occ_t carries the packed cat (+ the timing loop's
            # perturbation riding on it)
            rows = occ_t[f_of_g * nb + ff[:, G.G_BLOCKID]]
            return (
                rows[:, :T2].reshape(FG, r, r),
                rows[:, T2 : 2 * T2].reshape(FG, r, r),
                rows[:, 2 * T2 :].reshape(FG, r, r),
            )

        patches["hostpack"] = {"mega": hp_mega}

    if "dualhost" in args.variants:
        # HYPOTHESIS variant: the host (or an untimed pass) supplies the
        # three packed u32 planes in BOTH orientations, concatenated
        # along the block axis; the megarow gather picks the per-group
        # orientation by row offset, deleting the orientation-fix stage
        # AND the device pack from the timed graph. Built here once
        # with the production pack + mm-transpose (untimed).
        import jax.numpy as jnp

        from tpu_vpcc.atlas import groups as G
        from tpu_vpcc.ops import tiled as T

        @jax.jit
        def build_dual(occ, geo0, geo1, ay, au, av):
            pa, pb, pc = T._pack_u32_planes(occ, geo0, geo1, ay, au, av, fcfg)
            nb = fcfg.block_h * fcfg.block_w
            T2 = res * res
            Fb = occ.shape[0]
            cat = jnp.concatenate(
                [p.reshape(Fb * nb, T2) for p in (pa, pb, pc)], axis=1
            )
            catT = jnp.concatenate(
                [
                    p.reshape(Fb * nb, res, res)
                    .transpose(0, 2, 1)
                    .reshape(Fb * nb, T2)
                    for p in (pa, pb, pc)
                ],
                axis=1,
            )
            # [normal blocks | transposed blocks] per frame, so the row
            # index is f*(2nb) + blockid + sw*nb
            return jnp.concatenate(
                [
                    jnp.stack([cat.reshape(Fb, nb, 3 * T2)[f],
                               catT.reshape(Fb, nb, 3 * T2)[f]])
                    .reshape(2 * nb, 3 * T2)
                    for f in range(Fb)
                ],
                axis=0,
            )

        dual_cat = jax.device_put(
            np.asarray(build_dual(*inputs[1:])), dev
        )

        def dual_mega(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t,
                      cfg_):
            r = cfg_.occupancy_resolution
            T2 = r * r
            Gc = fields.shape[1]
            F = fields.shape[0]
            FG = F * Gc
            nb = cfg_.block_h * cfg_.block_w
            ff = fields.reshape(FG, G.N_GROUP_FIELDS)
            f_of_g = jax.lax.broadcasted_iota(
                jnp.int32, (F, Gc), 0
            ).reshape(FG)
            sw = (ff[:, G.G_SWAP] == 1).astype(jnp.int32)
            # occ_t carries the dual-packed plane (+ the timing loop's
            # perturbation riding on it)
            rows = occ_t[f_of_g * (2 * nb) + ff[:, G.G_BLOCKID] + sw * nb]
            return (
                rows[:, :T2].reshape(FG, r, r),
                rows[:, T2 : 2 * T2].reshape(FG, r, r),
                rows[:, 2 * T2 :].reshape(FG, r, r),
            )

        def dual_ttw(*a, **kw):
            kw["_fix_orientation"] = False
            return apply_patch._orig["ttw"](*a, **kw)

        patches["dualhost"] = {"mega": dual_mega, "ttw": dual_ttw}

    # a name not registered anywhere would silently run as the FULL
    # graph (patches.get(name, {})) and print a ~0 delta — the probe-
    # mirage class CLAUDE.md warns about; typos and mode-mismatched
    # variants (e.g. 'nowords' under --planes) must error instead
    known = (
        set(patches) | set(ENV_VARIANTS) | set(LANE_VARIANTS)
        | set(CS_VARIANTS)
    )
    unknown = [n for n in args.variants.split(",") if n not in known]
    assert not unknown, (
        f"unknown variants (typo, or wrong staging mode): {unknown}"
    )

    results = {}
    parity_ops = {}
    for name in args.variants.split(","):
        if name == "dualhost":
            run_inputs = [inputs[0], dual_cat] + [
                jnp.zeros((1,), i.dtype) for i in inputs[2:]
            ]
        elif name == "hostpack":
            run_inputs = [inputs[0], hp_cat] + [
                jnp.zeros((1,), i.dtype) for i in inputs[2:]
            ]
        else:
            run_inputs = inputs
        apply_patch(patches.get(name, {}))
        set_env_variant(name)
        set_lane_variant(name)

        @jax.jit
        def chained(n, fields, occ, geo0, geo1, ay, au, av):
            def body(i, carry):
                c = carry
                bump = jnp.where(c < 0, 1, 0)
                ops, cnt = tiled._flat_pretiled_impl(
                    fields, occ + bump.astype(occ.dtype), geo0, geo1,
                    ay if ay is None else ay + bump.astype(ay.dtype),
                    au, av, fcfg, _packed_out=True,
                )
                probe = sum(o[0, 0].astype(jnp.int32) for o in ops)
                return c + cnt.sum() + probe

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        n_long = np.int32(args.n * args.k)
        n_short = np.int32(args.n)
        t0 = time.perf_counter()
        _ = np.asarray(chained(n_long, *run_inputs))
        compile_s = time.perf_counter() - t0
        dts_l, dts_s = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(chained(n_long, *run_inputs))
            dts_l.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = np.asarray(chained(n_short, *run_inputs))
            dts_s.append(time.perf_counter() - t0)
        net = (min(dts_l) - min(dts_s)) / (args.n * (args.k - 1))
        ms = net * 1e3 / args.batch
        results[name] = ms
        print(f"{name}: {ms:.3f} ms/frame  (compile {compile_s:.0f}s)",
              flush=True)

        if args.parity and (
            name in ENV_VARIANTS
            or name in ("full", "tr8", "cs2", "trcs", "dualhost", "g3")
        ):
            @jax.jit
            def once(fields, occ, geo0, geo1, ay, au, av):
                return tiled._flat_pretiled_impl(
                    fields, occ, geo0, geo1, ay, au, av, fcfg,
                    _packed_out=True,
                )
            ops, cnt = once(*run_inputs)
            parity_ops[name] = (
                [np.asarray(o) for o in ops], np.asarray(cnt)
            )

    apply_patch(patches["full"])
    set_env_variant("mmboth")
    if "full" in results:
        base = results["full"]
        for name, ms in results.items():
            if name != "full":
                print(f"  delta {name}: {base - ms:+.3f} ms")
    if len(parity_ops) > 1:
        names = list(parity_ops)
        ref_ops, ref_cnt = parity_ops[names[0]]
        for name in names[1:]:
            ops, cnt = parity_ops[name]
            ok = np.array_equal(cnt, ref_cnt) and all(
                np.array_equal(a[f, : ref_cnt[f]], b[f, : ref_cnt[f]])
                for a, b in zip(ops, ref_ops)
                for f in range(len(ref_cnt))
            )
            print(f"parity {name} vs {names[0]}: "
                  f"{'ok' if ok else 'MISMATCH'}")
            assert ok


if __name__ == "__main__":
    main()
