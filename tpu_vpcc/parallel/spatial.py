"""Spatially sharded reconstruction via ``shard_map`` (frames × slots).

The slot axis of one frame is split across the mesh's ``space`` axis;
each device reconstructs its slot range with the shared core
(``tpu_vpcc.ops.reconstruct.reconstruct_slot_range``). Block-to-patch
ownership is resolved on the host (see ``tpu_vpcc.atlas.groups``), so
shards are compute-independent; a single ``lax.psum`` over ``space``
produces the per-frame global point count alongside the per-shard counts.

Outputs stay sharded: each device returns its compacted points + count;
``stitch_spatial`` assembles the globally ordered point list on host
(device order == slot order == the reference emission order).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.reconstruct import FrameConfig, reconstruct_slot_range


def reconstruct_gof_spatial(
    mesh: Mesh,
    fields,   # (F, g_cap, N_GROUP_FIELDS)
    occ,      # (F, H/prec, W/prec)
    geo0,     # (F, H, W)
    geo1,     # (F, H, W)
    attr_y,   # (F, M, H, W)
    attr_u,   # (F, M, H/2, W/2)
    attr_v,   # (F, M, H/2, W/2)
    cfg: FrameConfig,
):
    """2D-sharded GOF reconstruction: frames over 'data', slots over 'space'.

    DRYRUN/FALLBACK GRADE ONLY: this path vmaps reconstruct_slot_range,
    i.e. batched gathers/scatters — the exact pattern measured >1000x
    slower on XLA:TPU (see PERFORMANCE.md). It exists for CPU-mesh
    correctness checks and as the non-tileable fallback; NEVER shard
    production on it — use reconstruct_gof_spatial_pretiled.

    F must divide by the 'data' axis size; s_cap by
    (space_size * slots_per_block). Returns (positions (F, s_cap, 3),
    colors16 (F, s_cap, 3), counts (F, n_space)) where each frame's rows
    [d*s_loc, d*s_loc + counts[f, d]) hold shard d's compacted points.
    """
    n_space = mesh.shape["space"]
    s_loc = cfg.s_cap // n_space
    if s_loc * n_space != cfg.s_cap or s_loc % cfg.slots_per_block != 0:
        raise ValueError("s_cap must split into whole block groups per shard")

    def per_frame(fields_f, occ_f, g0_f, g1_f, ay_f, au_f, av_f):
        d = jax.lax.axis_index("space").astype(jnp.int32)
        pos, col, cnt = reconstruct_slot_range(
            d * s_loc, s_loc, fields_f, occ_f, g0_f, g1_f, ay_f, au_f, av_f, cfg
        )
        total = jax.lax.psum(cnt, "space")  # ICI all-reduce: global count
        return pos, col, cnt, total

    def shard_fn(fields_b, occ_b, g0_b, g1_b, ay_b, au_b, av_b):
        pos, col, cnt, total = jax.vmap(per_frame)(
            fields_b, occ_b, g0_b, g1_b, ay_b, au_b, av_b
        )
        return pos, col, cnt[:, None], total[:, None]

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"),) * 7,
        out_specs=(
            P("data", "space"),
            P("data", "space"),
            P("data", "space"),
            P("data", None),
        ),
        check_vma=False,
    )
    pos, col, cnt, total = jax.jit(fn)(
        fields, occ, geo0, geo1, attr_y, attr_u, attr_v
    )
    return pos, col, cnt, total


def reconstruct_gof_spatial_pretiled(
    mesh: Mesh,
    fields,   # (F, g_cap, N_GROUP_FIELDS)
    occ_t,    # (F, nb, res/prec, res/prec) block-tiled
    geo0_t,   # (F, nb, res, res)
    geo1_t,   # (F, nb, res, res)
    ay_t,     # (F, M, nb, res, res)
    au_t,     # (F, M, nb, res/2, res/2)
    av_t,     # (F, M, nb, res/2, res/2)
    cfg: FrameConfig,
):
    """Production 2D-sharded reconstruction on the PRE-TILED fast path.

    Frames shard over ``data``; the *group* axis of the field table shards
    over ``space`` (contiguous chunks, so shard order == emission order).
    The block-tiled planes replicate over ``space`` — each shard row-gathers
    only its own groups' tiles, so the extra HBM is read-only input reuse;
    all compute and compaction (the expensive part) divides by the mesh
    size. A ``psum`` over ``space`` carries the per-frame global count.

    Returns (positions (F, s_cap, 3) u16, colors16, counts (F, n_space),
    totals (F, 1)): frame f's shard d rows are
    ``[d*s_loc, d*s_loc + counts[f, d])`` with ``s_loc = s_cap // n_space``;
    concatenating them (``stitch_spatial``) yields the reference emission
    order exactly.
    """
    from dataclasses import replace as _replace

    from ..ops.tiled import _flat_pretiled_impl

    n_space = mesh.shape["space"]
    # the group axis may be bucketed to the live group count — size the
    # shard geometry from the table shape, not cfg.g_cap
    g_tot = fields.shape[1]
    g_loc = g_tot // n_space
    if g_loc * n_space != g_tot:
        raise ValueError("the group axis must divide by the space axis")
    if cfg.smoothing is not None or cfg.attr_smoothing is not None:
        # smoothing grids must cover whole frames: the in-kernel passes
        # psum/pmin their cell stats across the 'space' shards
        cfg = _replace(cfg, shard_axis="space")

    def shard_fn(fields_b, occ_b, g0_b, g1_b, ay_b, au_b, av_b):
        pos, col, cnt = _flat_pretiled_impl(
            fields_b, occ_b, g0_b, g1_b, ay_b, au_b, av_b, cfg
        )
        total = jax.lax.psum(cnt, "space")
        return pos, col, cnt[:, None], total[:, None]

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data", "space"),) + (P("data"),) * 6,
        out_specs=(
            P("data", "space"),
            P("data", "space"),
            P("data", "space"),
            P("data", None),
        ),
        check_vma=False,
    )
    return jax.jit(fn)(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t)


def reconstruct_gof_spatial_pretiled_packed(
    mesh: Mesh,
    fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t,
    cfg: FrameConfig,
):
    """The PACKED-OUTPUT twin of :func:`reconstruct_gof_spatial_pretiled`
    (narrow path only — the caller gates on ``narrow_emit_ok`` at the
    per-shard extent): each shard returns its compacted sorted flat
    operands (2–3 lane-friendly ``(F, s_loc)`` words) + counts, and the
    host-side fetch unpacks minor-dim-3 points only at the per-shard
    prefix extent (``runtime.pipeline._fetch_sharded_packed``). Returns
    ``(ops, counts (F, n_space), totals (F, 1))`` with each op globally
    ``(F, s_cap)``, slot axis sharded over ``space``."""
    from ..ops.tiled import _flat_pretiled_impl

    n_space = mesh.shape["space"]
    g_tot = fields.shape[1]
    if (g_tot // n_space) * n_space != g_tot:
        raise ValueError("the group axis must divide by the space axis")
    if cfg.smoothing is not None or cfg.attr_smoothing is not None:
        raise ValueError("packed sharded dispatch requires the narrow path")
    n_ops = 2 if cfg.pack30 else 3

    def shard_fn(fields_b, occ_b, g0_b, g1_b, ay_b, au_b, av_b):
        ops, cnt = _flat_pretiled_impl(
            fields_b, occ_b, g0_b, g1_b, ay_b, au_b, av_b, cfg,
            _packed_out=True,
        )
        total = jax.lax.psum(cnt, "space")
        return (*ops, cnt[:, None], total[:, None])

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data", "space"),) + (P("data"),) * 6,
        out_specs=(P("data", "space"),) * n_ops
        + (P("data", "space"), P("data", None)),
        check_vma=False,
    )
    out = jax.jit(fn)(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t)
    return out[:n_ops], out[n_ops], out[n_ops + 1]


def stitch_spatial(
    positions: np.ndarray, colors16: np.ndarray, counts: np.ndarray, s_loc: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host assembly of one frame's sharded output into the global order."""
    parts_p, parts_c = [], []
    for d in range(counts.shape[0]):
        n = int(counts[d])
        parts_p.append(positions[d * s_loc : d * s_loc + n])
        parts_c.append(colors16[d * s_loc : d * s_loc + n])
    return np.concatenate(parts_p), np.concatenate(parts_c)
