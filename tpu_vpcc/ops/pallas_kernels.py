"""Pallas TPU kernel for the fused slot-compute stage.

Computes, for chunks of owned-block groups, the packed point/color payload
words and validity mask from the three packed tile planes and the group
field table — the step 4-6 tail of the tiled pipeline
(``tpu_vpcc.ops.tiled``) as one VMEM-resident kernel: unpack, depth
projection, axis permutation, duplicate suppression, YUV selection, and
u32 payload packing never round-trip intermediates through HBM.

NOT a production path (settled round 3): measured 2.5 ms/frame vs the
XLA path's 0.21 ms, and the in-kernel-compaction fusion it was carried
for is decisively negative (the sort it would replace measures free; the
cursor-DMA mechanism floor alone is 38x the whole pipeline — see
PERFORMANCE.md "In-kernel compaction: measured dead" and
tools/compaction_experiment.py). Kept in-tree as the bit-exact Mosaic
reference implementation only; the test suite holds it to the XLA
output. Select it with ``reconstruct_batch_pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..atlas import groups as G
from .reconstruct import FrameConfig

# groups per grid step; tiles are (CHUNK, res, res) blocks in VMEM.
# 12 pipelined block buffers (4 in + 8 out, double-buffered) must fit the
# ~16MB VMEM budget: 32 * 256 * 4B * 12 * 2 = 768KB.
CHUNK = 32


def _payload_kernel(cfg: FrameConfig, fields_ref, ta_ref, tb_ref, tc_ref,
                    w0m0_ref, w0m1_ref, w1m0_ref, w1m1_ref,
                    w2m0_ref, w2m1_ref, v0_ref, v1_ref):
    res = cfg.occupancy_resolution
    ch = ta_ref.shape[0]
    M10 = 0x3FF

    t_a = ta_ref[...]
    t_b = tb_ref[...]
    t_c = tc_ref[...]
    fields = fields_ref[...]

    fid = lambda idx: fields[:, idx][:, None, None]  # noqa: E731

    d0 = (t_a & M10).astype(jnp.int32) >> cfg.geo_shift
    d1 = ((t_a >> 10) & M10).astype(jnp.int32) >> cfg.geo_shift
    occ_bit = ((t_a >> 20) & 1).astype(jnp.int32)
    # planes B/C are per-map color words: y | u<<10 | v<<20 (round 6)
    cy0 = (t_b & M10).astype(jnp.int32)
    cu0 = ((t_b >> 10) & M10).astype(jnp.int32)
    cv0 = ((t_b >> 20) & M10).astype(jnp.int32)
    cy1 = (t_c & M10).astype(jnp.int32)
    cu1 = ((t_c >> 10) & M10).astype(jnp.int32)
    cv1 = ((t_c >> 20) & M10).astype(jnp.int32)

    v1 = jax.lax.broadcasted_iota(jnp.int32, (ch, res, res), 1)
    u1 = jax.lax.broadcasted_iota(jnp.int32, (ch, res, res), 2)

    d1_patch = fid(G.G_D1)
    mode = fid(G.G_MODE)
    normal_coord = lambda depth: jnp.where(  # noqa: E731
        mode == 0, depth + d1_patch, jnp.maximum(d1_patch, depth) - depth
    )
    tangent = (fid(G.G_T00) + fid(G.G_LODX) * u1) & 0xFFFF
    bitangent = (fid(G.G_B00) + fid(G.G_LODY) * v1) & 0xFFFF
    n0 = normal_coord(d0) & 0xFFFF
    if cfg.absolute_d1:
        n1 = normal_coord(d1) & 0xFFFF
    else:
        n1 = jnp.where(mode == 0, n0 + d1, n0 - d1) & 0xFFFF

    occ_on = (occ_bit > 0) & (fid(G.G_VALID) > 0)
    valid0 = occ_on
    valid1 = occ_on & (cfg.map_count > 1) & (n1 != n0)

    def assemble(n_val):
        comps = []
        for comp in range(3):
            comps.append(
                jnp.where(fid(G.G_NORMAL) == comp, n_val, 0)
                + jnp.where(fid(G.G_TANGENT) == comp, tangent, 0)
                + jnp.where(fid(G.G_BITANGENT) == comp, bitangent, 0)
            )
        return comps

    p0x, p0y, p0z = assemble(n0)
    p1x, p1y, p1z = assemble(n1)

    # outputs stay [ch, res, res] per map — Mosaic does not support the
    # 4D->2D interleaving shape-cast; the caller interleaves in XLA
    pack = lambda a, b: a.astype(jnp.uint32) | (b.astype(jnp.uint32) << 16)  # noqa: E731
    w0m0_ref[...] = pack(p0x, p0y)
    w0m1_ref[...] = pack(p1x, p1y)
    w1m0_ref[...] = pack(p0z, cy0)
    w1m1_ref[...] = pack(p1z, cy1)
    w2m0_ref[...] = pack(cu0, cv0)
    w2m1_ref[...] = pack(cu1, cv1)
    v0_ref[...] = valid0.astype(jnp.int32)
    v1_ref[...] = valid1.astype(jnp.int32)


def tiles_to_payload_pallas(fields_f, t_a, t_b, t_c, cfg: FrameConfig,
                            interpret: bool = False):
    """Run the fused payload kernel over all groups.

    fields_f: (FG, N_GROUP_FIELDS) i32; t_*: (FG, res, res) u32 tiles in
    emission order (orientation already fixed). Returns (w0, w1, w2,
    valid) with shape (FG * slots_per_block,).
    """
    FG = fields_f.shape[0]
    res = cfg.occupancy_resolution
    spb = cfg.slots_per_block
    if FG % CHUNK != 0:
        raise NotImplementedError(
            f"pallas backend needs the group count ({FG}) to be a multiple "
            f"of the chunk size ({CHUNK}); use the XLA path "
            f"(reconstruct_batch_pretiled) for other shapes"
        )
    grid = (FG // CHUNK,)

    tile_spec = pl.BlockSpec((CHUNK, res, res), lambda i: (i, 0, 0))
    field_spec = pl.BlockSpec((CHUNK, G.N_GROUP_FIELDS), lambda i: (i, 0))
    out_spec = pl.BlockSpec((CHUNK, res, res), lambda i: (i, 0, 0))

    out_u32 = jax.ShapeDtypeStruct((FG, res, res), jnp.uint32)
    out_i32 = jax.ShapeDtypeStruct((FG, res, res), jnp.int32)
    w0m0, w0m1, w1m0, w1m1, w2m0, w2m1, v0, v1 = pl.pallas_call(
        functools.partial(_payload_kernel, cfg),
        grid=grid,
        in_specs=[field_spec, tile_spec, tile_spec, tile_spec],
        out_specs=[out_spec] * 8,
        out_shape=[out_u32] * 6 + [out_i32] * 2,
        interpret=interpret,
    )(fields_f, t_a, t_b, t_c)

    def interleave(m0, m1):
        e = res * res
        return jnp.stack(
            [m0.reshape(FG, e), m1.reshape(FG, e)], axis=-1
        ).reshape(FG * spb)

    return (
        interleave(w0m0, w0m1),
        interleave(w1m0, w1m1),
        interleave(w2m0, w2m1),
        interleave(v0, v1),
    )


def reconstruct_batch_pallas(
    fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg: FrameConfig,
    interpret: bool = False,
):
    """Pre-tiled reconstruction with the compute stage in Pallas.

    Same contract as ``tpu_vpcc.ops.tiled.reconstruct_batch_pretiled``,
    EXCEPT: smoothing is not implemented in this backend (raises), and
    the group count must divide the Pallas chunk size.
    """
    from .tiled import _pretiled_gather_tiles

    if cfg.smoothing is not None or cfg.attr_smoothing is not None:
        raise NotImplementedError(
            "smoothing is not implemented in the pallas backend; use the "
            "XLA path (reconstruct_batch_pretiled)"
        )
    F = fields.shape[0]
    Gc = fields.shape[1]  # may be a shard of g_cap, like the XLA path
    S = Gc * cfg.slots_per_block
    fields_f = fields.reshape(F * Gc, G.N_GROUP_FIELDS)
    t_a, t_b, t_c = _pretiled_gather_tiles(
        fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg
    )
    # orientation fix (as in the XLA path)
    sw = (fields_f[:, G.G_SWAP] == 1)[:, None, None]
    fix = lambda t: jnp.where(sw, t.transpose(0, 2, 1), t)  # noqa: E731
    w0, w1, w2, valid32 = tiles_to_payload_pallas(
        fields_f, fix(t_a), fix(t_b), fix(t_c), cfg, interpret=interpret
    )
    valid = valid32.reshape(F, S) != 0

    key = (
        jax.lax.broadcasted_iota(jnp.int32, (F, S), 0) * 2
        + (~valid).astype(jnp.int32)
    ).reshape(F * S)
    _, s0, s1, s2 = jax.lax.sort(
        (key, w0, w1, w2), num_keys=1, is_stable=True
    )
    counts = valid.sum(axis=1, dtype=jnp.int32)
    lo = lambda w: (w & 0xFFFF).astype(jnp.uint16)  # noqa: E731
    hi = lambda w: (w >> 16).astype(jnp.uint16)  # noqa: E731
    positions = jnp.stack([lo(s0), hi(s0), lo(s1)], axis=-1).reshape(F, S, 3)
    colors16 = jnp.stack([hi(s1), lo(s2), hi(s2)], axis=-1).reshape(F, S, 3)
    return positions, colors16, counts
