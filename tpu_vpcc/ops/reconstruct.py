"""Whole-frame point-cloud reconstruction on device (JAX/XLA).

Replaces the reference's per-patch scalar hot loops (``src/codec.rs:
205-658``, HOT LOOPS 1-5 in SURVEY.md §3.5) with a *slot-major* design:

Every patch owns a contiguous range of slots, one slot per
(block v0,u0) × (pixel v1,u1) × (map i) in the exact reference emission
order. A single elementwise+gather pass computes, for every slot, its
atlas pixel, occupancy, depth, 3D point and validity; block-to-patch
ownership falls out of a segmented max over each block's slot group plus
one small scatter-max over canvas blocks; output compaction is a cumsum
over the validity mask (the slot order *is* the emission order, so no
sort is needed). Everything is static-shape and fuses under XLA; there is
no scatter in the per-pixel path.

Bit-exactness contract: positions/colors16 equal the NumPy oracle
(``tpu_vpcc.reconstruction.oracle``) on every stream in the rec0 envelope.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FrameConfig:
    """Static (compile-time) reconstruction geometry."""

    width: int
    height: int
    occupancy_resolution: int
    occupancy_precision: int
    p_max: int
    s_cap: int  # slot capacity; multiple of slots_per_block
    map_count: int = 2
    absolute_d1: bool = True
    geo_shift: int = 2  # depth = y >> geo_shift (``src/codec.rs:532-534``)

    @property
    def slots_per_block(self) -> int:
        return self.occupancy_resolution * self.occupancy_resolution * 2

    @property
    def block_w(self) -> int:
        return self.width // self.occupancy_resolution

    @property
    def block_h(self) -> int:
        return self.height // self.occupancy_resolution

    def validate(self) -> None:
        if self.s_cap % self.slots_per_block != 0:
            raise ValueError("s_cap must be a multiple of slots_per_block")


def make_config(
    width: int,
    height: int,
    occupancy_resolution: int,
    occupancy_precision: int,
    p_max: int,
    map_count: int = 2,
    absolute_d1: bool = True,
    geo_shift: int = 2,
    slot_slack: float = 1.25,
) -> FrameConfig:
    """Build a config with a bucketed slot capacity.

    Patch areas can exceed the atlas area (patches may overlap on the
    canvas), so the capacity gets head-room; it is rounded to the block
    group size to keep the segmented reduce exact.
    """
    spb = occupancy_resolution * occupancy_resolution * 2
    base = int(width * height * 2 * slot_slack)
    s_cap = ((base + spb - 1) // spb) * spb
    cfg = FrameConfig(
        width=width,
        height=height,
        occupancy_resolution=occupancy_resolution,
        occupancy_precision=occupancy_precision,
        p_max=p_max,
        s_cap=s_cap,
        map_count=map_count,
        absolute_d1=absolute_d1,
        geo_shift=geo_shift,
    )
    cfg.validate()
    return cfg


# SoA field indices (see atlas.soa.PatchSoA.as_stack)
(
    F_A, F_B, F_C, F_D,
    F_CX_BLK, F_CY_BLK, F_CX_PIX, F_CY_PIX,
    F_SIZE_U0, F_SIZE_V0,
    F_UV1_U, F_UV1_V, F_D1,
    F_LOD_X, F_LOD_Y,
    F_PROJ_MODE,
    F_NORMAL, F_TANGENT, F_BITANGENT,
) = range(19)


def _reconstruct_frame_impl(
    fields: jnp.ndarray,       # (19, p_max) int32
    slot_offset: jnp.ndarray,  # (p_max + 1,) int32, nondecreasing, [0]=0
    total_slots: jnp.ndarray,  # scalar int32
    occ: jnp.ndarray,          # (H/prec, W/prec) uint8
    geo0: jnp.ndarray,         # (H, W) uint16
    geo1: jnp.ndarray,         # (H, W) uint16 (ignored when map_count == 1)
    attr_y: jnp.ndarray,       # (map_count, H, W) uint16
    attr_u: jnp.ndarray,       # (map_count, H/2, W/2) uint16
    attr_v: jnp.ndarray,       # (map_count, H/2, W/2) uint16
    cfg: FrameConfig,
):
    """Single-frame reconstruction. Returns (positions, colors16, count):
    positions (s_cap, 3) uint16 compacted to the front, colors16 likewise,
    count scalar int32."""
    res = cfg.occupancy_resolution
    spb = cfg.slots_per_block
    S = cfg.s_cap
    bw, bh = cfg.block_w, cfg.block_h

    s = jnp.arange(S, dtype=jnp.int32)
    in_range = s < total_slots

    # --- slot → patch + local decomposition ------------------------------
    p = jnp.searchsorted(slot_offset, s, side="right").astype(jnp.int32) - 1
    p = jnp.clip(p, 0, cfg.p_max - 1)
    l = s - slot_offset[p]

    su0 = fields[F_SIZE_U0][p]
    row_slots = su0 * spb  # slots per block row (v0 line)
    # emission order: v0-major, then u0, then v1, u1, i
    v0 = l // jnp.maximum(row_slots, 1)
    rem = l - v0 * row_slots
    u0 = rem // spb
    rem2 = rem - u0 * spb
    v1 = rem2 // (res * 2)
    rem3 = rem2 - v1 * (res * 2)
    u1 = rem3 // 2
    i_map = rem3 - u1 * 2

    u = u0 * res + u1
    v = v0 * res + v1

    # --- orientation transforms ------------------------------------------
    a, b = fields[F_A][p], fields[F_B][p]
    c, d = fields[F_C][p], fields[F_D][p]
    x = a * u + b * v + fields[F_CX_PIX][p]
    y = c * u + d * v + fields[F_CY_PIX][p]
    bx = a * u0 + b * v0 + fields[F_CX_BLK][p]
    by = c * u0 + d * v0 + fields[F_CY_BLK][p]

    in_canvas = (x >= 0) & (x < cfg.width) & (y >= 0) & (y < cfg.height)
    xs = jnp.clip(x, 0, cfg.width - 1)
    ys = jnp.clip(y, 0, cfg.height - 1)

    # --- occupancy (nearest-neighbour upsample via index division) -------
    occ_val = occ[ys // cfg.occupancy_precision, xs // cfg.occupancy_precision]
    occ_val = jnp.where(in_range & in_canvas, occ_val.astype(jnp.int32), 0)

    # --- block-to-patch ownership ----------------------------------------
    # any-occupied per slot group (one group = one patch block)
    block_any = occ_val.reshape(S // spb, spb).max(axis=1) > 0
    g0 = jnp.arange(S // spb, dtype=jnp.int32) * spb  # first slot of group
    g_idx = by[g0] * bw + bx[g0]
    g_p1 = jnp.where(block_any & in_range[g0], p[g0] + 1, 0)
    g_idx = jnp.where(g_p1 > 0, g_idx, bh * bw)  # dropped when invalid
    # later patches overwrite earlier ones (``src/codec.rs:242-244``):
    # ownership = max patch index among eligible writers.
    owner = (
        jnp.zeros(bh * bw, dtype=jnp.int32)
        .at[g_idx]
        .max(g_p1, mode="drop")
    )

    owned = owner[jnp.clip(by, 0, bh - 1) * bw + jnp.clip(bx, 0, bw - 1)] == p + 1

    # --- depth → 3D points -----------------------------------------------
    d0_val = (geo0[ys, xs].astype(jnp.int32)) >> cfg.geo_shift
    d1_val = (geo1[ys, xs].astype(jnp.int32)) >> cfg.geo_shift

    d1_patch = fields[F_D1][p]
    mode = fields[F_PROJ_MODE][p]

    def normal_coord(depth):
        # ``src/decoder.rs:881-888``
        return jnp.where(
            mode == 0, depth + d1_patch, jnp.maximum(d1_patch, depth) - depth
        )

    tangent_val = u * fields[F_LOD_X][p] + fields[F_UV1_U][p]
    bitangent_val = v * fields[F_LOD_Y][p] + fields[F_UV1_V][p]

    n0 = normal_coord(d0_val)
    if cfg.absolute_d1:
        n1 = normal_coord(d1_val)
    else:
        n1 = jnp.where(mode == 0, n0 + d1_val, n0 - d1_val)

    n0 &= 0xFFFF
    n1 &= 0xFFFF
    tangent_val &= 0xFFFF
    bitangent_val &= 0xFFFF

    dup = (cfg.map_count > 1) & (n1 == n0)  # tangent/bitangent are shared
    n_sel = jnp.where(i_map == 0, n0, n1)

    # component assembly via one-hot on the axis permutation
    axes = jnp.stack(
        [fields[F_NORMAL][p], fields[F_TANGENT][p], fields[F_BITANGENT][p]]
    )  # (3, S)
    vals = jnp.stack([n_sel, tangent_val, bitangent_val])  # (3, S)
    pos = jnp.zeros((3, S), dtype=jnp.int32)
    for comp in range(3):
        pos = pos.at[comp].set(
            jnp.sum(jnp.where(axes == comp, vals, 0), axis=0)
        )

    # --- validity ---------------------------------------------------------
    valid = in_range & in_canvas & owned & (occ_val > 0)
    valid &= jnp.where(i_map == 1, (cfg.map_count > 1) & ~dup, True)

    # --- colors (YUV420 gather at the point's pixel/map) ------------------
    z = jnp.clip(i_map, 0, cfg.map_count - 1)
    col_y = attr_y[z, ys, xs]
    col_u = attr_u[z, ys // 2, xs // 2]
    col_v = attr_v[z, ys // 2, xs // 2]

    # --- compaction (slot order == emission order) ------------------------
    idx = jnp.cumsum(valid.astype(jnp.int32)) - 1
    count = jnp.where(S > 0, idx[-1] + 1, 0)
    scatter_to = jnp.where(valid, idx, S)  # OOB drops invalid slots

    positions = jnp.zeros((S, 3), dtype=jnp.uint16)
    positions = positions.at[scatter_to].set(
        pos.T.astype(jnp.uint16), mode="drop"
    )
    colors16 = jnp.zeros((S, 3), dtype=jnp.uint16)
    colors16 = colors16.at[scatter_to].set(
        jnp.stack([col_y, col_u, col_v], axis=1).astype(jnp.uint16), mode="drop"
    )
    return positions, colors16, count


@functools.partial(jax.jit, static_argnames=("cfg",))
def reconstruct_frame(
    fields, slot_offset, total_slots, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg
):
    return _reconstruct_frame_impl(
        fields, slot_offset, total_slots, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def reconstruct_batch(
    fields, slot_offset, total_slots, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg
):
    """vmapped whole-GOF reconstruction: every input has a leading frame
    axis; frames are independent (``src/decoder.rs:186``)."""
    fn = functools.partial(_reconstruct_frame_impl, cfg=cfg)
    return jax.vmap(fn)(
        fields, slot_offset, total_slots, occ, geo0, geo1, attr_y, attr_u, attr_v
    )
