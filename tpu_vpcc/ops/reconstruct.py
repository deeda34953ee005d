"""Whole-frame point-cloud reconstruction on device (JAX/XLA).

Replaces the reference's per-patch scalar hot loops (``src/codec.rs:
205-658``, HOT LOOPS 1-5 in SURVEY.md §3.5) with a *group-major* design:

The host derives the block-to-patch ownership map (occupancy-independent
for every emitted point — see ``tpu_vpcc.atlas.groups``) and packs each
owned canvas block as one *group* of ``res*res*2`` slots, in the exact
reference emission order (patch ascending, patch-space (v0,u0) raster,
pixel (v1,u1) raster, D0 before D1). The device pass is then pure
elementwise arithmetic plus a handful of gathers:

  * one row-gather of the 16-field group table per slot,
  * one gather each from the occupancy / geometry D0 / D1 planes,
  * three gathers from the attribute YUV planes,

followed by compaction via a single cumsum over the validity mask — the
slot order *is* the emission order, so no sort is needed. There is no
device-side block-ownership pass, no searchsorted, and no data-dependent
division. Slot capacity is exactly ``2 * width * height`` (each canvas
block is owned by at most one patch), independent of patch overlap.

Bit-exactness contract: positions/colors16 equal the NumPy oracle
(``tpu_vpcc.reconstruction.oracle``) on every stream in the rec0 envelope.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..atlas import groups as G


@dataclass(frozen=True)
class FrameConfig:
    """Static (compile-time) reconstruction geometry."""

    width: int
    height: int
    occupancy_resolution: int
    occupancy_precision: int
    map_count: int = 2
    absolute_d1: bool = True
    # FRAMEWORK EXTENSION (>2 maps): this dispatch is a trailing-layer
    # pass over the map pair (m-1, m) — only the D1-layer points emit
    # (the D0 slots of the pair exist solely as dedup comparands). The
    # GOF driver appends each layer's points after the map-0/1 points.
    drop_map0: bool = False
    geo_shift: int = 2  # depth = y >> geo_shift (``src/codec.rs:532-534``)
    # attribute chroma subsampling: 1 for 4:2:0 (chroma at half res), 0 for
    # 4:4:4/RGB content (``src/decoder.rs:973-980`` indexes by color format)
    chroma_shift: int = 1
    # grid-based geometry smoothing (None = off; a SmoothingConfig from
    # tpu_vpcc.ops.smoothing when the SEI is present and the toggle set)
    smoothing: object = None
    # grid-based attribute smoothing (None = off; an AttrSmoothingConfig)
    attr_smoothing: object = None
    # mesh axis name when the kernel runs inside shard_map with the slot
    # axis sharded: smoothing grids combine across shards via psum/pmin
    shard_axis: object = None
    # pre-tiled narrow path: gather RAW decoder planes per owned group
    # instead of bit-packing all blocks into u32 planes first (see
    # tiled._pretiled_gather_raw). Bit-identical output; perf switch.
    raw_gather: bool = False
    # groups are OCCUPIED precision cells (atlas.groups.build_cell_table)
    # instead of owned blocks: group tile = occupancy_precision, no
    # device occupancy test, sort extent ~ the emitted point count.
    cell_groups: bool = False
    # host-pack cat-mode only: the host already transposed SWAP-family
    # blocks in the cat (tiled.orient_cat_host), so gathered tiles
    # arrive in PATCH memory order and the device skips both the
    # orientation-fix transpose and the narrow path's iota swap.
    host_oriented: bool = False
    # FRAMEWORK EXTENSION: some patch in the dispatch projects onto a
    # 45-degree additional plane (axis_of_additional_plane != 0) — the
    # per-point inverse rotation (apply_inverse_rot45) runs after
    # component assembly, and the narrow emission path (which packs
    # coordinates via per-group multipliers and never assembles them)
    # is ineligible (tiled.narrow_emit_ok).
    additional_planes: bool = False
    # 3D geometry bit depth (asps_geometry_3d_bit_depth_minus1 + 1):
    # sets the 45-degree rotation's re-centering shift
    geometry_bitdepth_3d: int = 10
    # narrow path: pack all three coordinates into one u32 (10 bits
    # each), shrinking the compaction sort's payload from 10 B to 8 B.
    # Only legal when the HOST has proven every axis value < 1024 for
    # this dispatch (atlas.groups.coords_fit_10bit) — the dispatch sets
    # it per GOF; content that can exceed 10 bits falls back.
    pack30: bool = False
    # narrow path: sort K independent emission-contiguous group-range
    # segments (one lax.sort along the minor axis) and merge their
    # compacted prefixes with K-1 dynamic row updates per frame. The
    # bitonic sort's cost cliffs with its working set: at the 1280²
    # bucketed extent, K=2 HALVED the whole kernel (PERFORMANCE.md).
    # Requires the dispatch group count divisible by K and table order
    # == emission order (block tables; the kernel falls back to 1
    # segment otherwise).
    sort_split: int = 1
    # split-sort variant: sort all K segments in ONE minor-axis lax.sort
    # over (F*K, Sk) rows instead of K separate flat sorts; when the
    # seg-local emission rank fits 15 bits (Sk <= 2^15) the key narrows
    # to u16 (sort operands 12 B -> 10 B per element). Bit-identical.
    # (A pairwise-TREE merge of the K compacted prefixes — log2 K
    # dependency depth instead of K-1 sequential row updates — measured
    # 2.66-2.78 ms vs 2.02 sequential: the level-wise buffer
    # materializations dominate; see tools/compaction_experiment.py.)
    sort_split_batched: bool = False
    # SORT-FREE compaction (round 5): route the narrow-path words
    # through the Pallas merge + shift-network kernel
    # (ops/shift_compact.py) instead of the batched split-sort. The
    # value is the chunk extent in slots (0 = off). Requires patch-
    # order gathered tiles (SWAP tiles transposed at the gather), a
    # block table (emission-ordered), and S % extent == 0 — the host
    # dispatch gates via shift_compact.shift_supported.
    shift_compact: int = 0

    @property
    def slots_per_block(self) -> int:
        return self.occupancy_resolution * self.occupancy_resolution * 2

    @property
    def group_tile(self) -> int:
        """Pixel edge of one group's tile (block edge, or the precision
        cell edge in cell-groups mode)."""
        return (
            self.occupancy_precision if self.cell_groups
            else self.occupancy_resolution
        )

    @property
    def slots_per_group(self) -> int:
        return self.group_tile * self.group_tile * 2

    @property
    def block_w(self) -> int:
        return self.width // self.occupancy_resolution

    @property
    def block_h(self) -> int:
        return self.height // self.occupancy_resolution

    @property
    def g_cap(self) -> int:
        return self.block_h * self.block_w

    @property
    def s_cap(self) -> int:
        return self.g_cap * self.slots_per_block  # == 2 * width * height


def make_config(
    width: int,
    height: int,
    occupancy_resolution: int,
    occupancy_precision: int,
    map_count: int = 2,
    absolute_d1: bool = True,
    geo_shift: int = 2,
    chroma_shift: int = 1,
    smoothing=None,
    attr_smoothing=None,
    raw_gather: bool = False,
    cell_groups: bool = False,
    pack30: bool = False,
    sort_split: int = 1,
    sort_split_batched: bool = False,
    additional_planes: bool = False,
    geometry_bitdepth_3d: int = 10,
    **_ignored,
) -> FrameConfig:
    return FrameConfig(
        width=width,
        height=height,
        occupancy_resolution=occupancy_resolution,
        occupancy_precision=occupancy_precision,
        map_count=map_count,
        absolute_d1=absolute_d1,
        geo_shift=geo_shift,
        chroma_shift=chroma_shift,
        smoothing=smoothing,
        attr_smoothing=attr_smoothing,
        raw_gather=raw_gather,
        cell_groups=cell_groups,
        pack30=pack30,
        sort_split=sort_split,
        sort_split_batched=sort_split_batched,
        additional_planes=additional_planes,
        geometry_bitdepth_3d=geometry_bitdepth_3d,
    )


def apply_inverse_rot45(px, py, pz, plane, bitdepth: int):
    """Inverse 45-degree rotation, device twin of
    ``atlas.patches.inverse_rotate_45`` (FRAMEWORK EXTENSION — the
    reference reconstruction is ``unimplemented!`` for additional
    planes, ``src/codec.rs:429-440``; see the convention note in
    atlas.patches).

    ``px/py/pz``: int32 rotated-frame components (any broadcastable
    shape); ``plane``: int32 per-slot axis_of_additional_plane (0 =
    identity). Arithmetic right shift = floor, matching the scalar
    oracle's ``>> 1``. Returns u16-masked int32 components."""
    shift = (1 << (bitdepth - 1)) - 1

    def pair(rs, rd):
        return (rs - rd + shift) >> 1, (rs + rd - shift) >> 1

    x1, z1 = pair(px, pz)  # plane 1 mixes (x, z)
    z2, y2 = pair(pz, py)  # plane 2 mixes (z, y)
    y3, x3 = pair(py, px)  # plane 3 mixes (y, x)
    nx = jnp.where(plane == 1, x1, jnp.where(plane == 3, x3, px))
    ny = jnp.where(plane == 2, y2, jnp.where(plane == 3, y3, py))
    nz = jnp.where(plane == 1, z1, jnp.where(plane == 2, z2, pz))
    return nx & 0xFFFF, ny & 0xFFFF, nz & 0xFFFF


def compute_slots(
    fields_rows: jnp.ndarray,  # (S_range, N_GROUP_FIELDS) int32 — per-slot rows
    u1: jnp.ndarray,
    v1: jnp.ndarray,
    i_map: jnp.ndarray,
    occ: jnp.ndarray,
    geo0: jnp.ndarray,
    geo1: jnp.ndarray,
    attr_y: jnp.ndarray,
    attr_u: jnp.ndarray,
    attr_v: jnp.ndarray,
    cfg: FrameConfig,
):
    """Per-slot point/color/validity computation (shared by all drivers).

    ``fields_rows`` is the group-table row for each slot (already
    gathered); planes are single-frame. Returns (pos (3,S), col_y/u/v,
    valid).

    BIT-EXACTNESS NOTE: the point math here (normal_coord, 0xFFFF
    masking, duplicate suppression, axis one-hot) is intentionally
    duplicated in _flat_batch_impl below and in tiled._tiles_to_points —
    the three kernels gather differently but must stay semantically
    identical; change all three together."""
    fr = lambda idx: fields_rows[:, idx]  # noqa: E731

    x = fr(G.G_X00) + fr(G.G_A) * u1 + fr(G.G_B) * v1
    y = fr(G.G_Y00) + fr(G.G_C) * u1 + fr(G.G_D) * v1
    xs = jnp.clip(x, 0, cfg.width - 1)
    ys = jnp.clip(y, 0, cfg.height - 1)

    occ_val = occ[ys // cfg.occupancy_precision, xs // cfg.occupancy_precision]
    valid = (fr(G.G_VALID) > 0) & (occ_val.astype(jnp.int32) > 0)

    d0_val = geo0[ys, xs].astype(jnp.int32) >> cfg.geo_shift
    d1_val = geo1[ys, xs].astype(jnp.int32) >> cfg.geo_shift

    d1_patch = fr(G.G_D1)
    mode = fr(G.G_MODE)

    def normal_coord(depth):
        # ``src/decoder.rs:881-888``
        return jnp.where(
            mode == 0, depth + d1_patch, jnp.maximum(d1_patch, depth) - depth
        )

    tangent_val = fr(G.G_T00) + fr(G.G_LODX) * u1
    bitangent_val = fr(G.G_B00) + fr(G.G_LODY) * v1

    n0 = normal_coord(d0_val)
    if cfg.absolute_d1:
        n1 = normal_coord(d1_val)
    else:
        n1 = jnp.where(mode == 0, n0 + d1_val, n0 - d1_val)

    n0 &= 0xFFFF
    n1 &= 0xFFFF
    tangent_val &= 0xFFFF
    bitangent_val &= 0xFFFF

    # duplicate suppression (``src/codec.rs:421-427``): tangent/bitangent
    # are shared between the two maps, only the normal can differ
    dup = (cfg.map_count > 1) & (n1 == n0)
    n_sel = jnp.where(i_map == 0, n0, n1)
    valid &= jnp.where(i_map == 1, (cfg.map_count > 1) & ~dup, True)
    if cfg.drop_map0:
        # trailing-layer pass: D0 slots are dedup comparands only
        valid &= i_map == 1

    # component assembly via one-hot on the axis permutation
    axes = jnp.stack([fr(G.G_NORMAL), fr(G.G_TANGENT), fr(G.G_BITANGENT)])
    vals = jnp.stack([n_sel, tangent_val, bitangent_val])
    pos = jnp.zeros((3, x.shape[0]), dtype=jnp.int32)
    for comp in range(3):
        pos = pos.at[comp].set(jnp.sum(jnp.where(axes == comp, vals, 0), axis=0))
    if cfg.additional_planes:
        nx, ny, nz = apply_inverse_rot45(
            pos[0], pos[1], pos[2], fr(G.G_PLANE), cfg.geometry_bitdepth_3d
        )
        pos = jnp.stack([nx, ny, nz])

    # colors: chroma-subsampled gather at the point's pixel (format-driven
    # indexing like ``Image::get``, ``src/decoder.rs:973-980``)
    z = jnp.clip(i_map, 0, cfg.map_count - 1)
    csh = cfg.chroma_shift
    col_y = attr_y[z, ys, xs]
    col_u = attr_u[z, ys >> csh, xs >> csh]
    col_v = attr_v[z, ys >> csh, xs >> csh]
    return pos, col_y, col_u, col_v, valid


def _slot_indices(cfg: FrameConfig, s_start, s_len: int):
    """Decompose slot indices into (group, v1, u1, i) — all constant-divisor."""
    res = cfg.occupancy_resolution
    spb = cfg.slots_per_block
    s = s_start + jnp.arange(s_len, dtype=jnp.int32)
    g = s // spb
    r = s - g * spb
    v1 = r // (res * 2)
    r2 = r - v1 * (res * 2)
    u1 = r2 // 2
    i_map = r2 - u1 * 2
    return g, v1, u1, i_map


def reconstruct_slot_range(
    s_start,
    s_len: int,
    fields: jnp.ndarray,  # (g_cap, N_GROUP_FIELDS) int32
    occ: jnp.ndarray,
    geo0: jnp.ndarray,
    geo1: jnp.ndarray,
    attr_y: jnp.ndarray,
    attr_u: jnp.ndarray,
    attr_v: jnp.ndarray,
    cfg: FrameConfig,
):
    """Reconstruct slots [s_start, s_start + s_len) of one frame.

    Returns (positions (s_len, 3) u16 compacted to the front, colors16
    (s_len, 3) u16, count scalar i32)."""
    g, v1, u1, i_map = _slot_indices(cfg, s_start, s_len)
    fields_rows = fields[g]
    pos, col_y, col_u, col_v, valid = compute_slots(
        fields_rows, u1, v1, i_map, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg
    )
    # compaction (slot order == emission order)
    idx = jnp.cumsum(valid.astype(jnp.int32)) - 1
    count = jnp.where(s_len > 0, idx[-1] + 1, 0)
    scatter_to = jnp.where(valid, idx, s_len)
    positions = jnp.zeros((s_len, 3), dtype=jnp.uint16)
    positions = positions.at[scatter_to].set(pos.T.astype(jnp.uint16), mode="drop")
    colors16 = jnp.zeros((s_len, 3), dtype=jnp.uint16)
    colors16 = colors16.at[scatter_to].set(
        jnp.stack([col_y, col_u, col_v], axis=1).astype(jnp.uint16), mode="drop"
    )
    return positions, colors16, count


def _reconstruct_frame_impl(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg):
    return reconstruct_slot_range(
        jnp.int32(0), cfg.s_cap, fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def reconstruct_frame(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg):
    return _reconstruct_frame_impl(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg)


def _flat_batch_impl(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg):
    """Whole-GOF reconstruction with frames flattened into the slot axis.

    BIT-EXACTNESS NOTE: the per-point math duplicates compute_slots and
    tiled._tiles_to_points; change all three together.

    Semantically identical to vmapping the single-frame kernel over the
    leading axis, but every gather/scatter stays rank-1/2 (no batch
    dimensions) — XLA:TPU lowers *batched* scatters/gathers
    catastrophically (measured >1000x slower at 1280x1280). Frames are
    independent (``src/decoder.rs:186``)."""
    spb = cfg.slots_per_block
    # the group axis may be bucketed to the live group count (or sharded);
    # size the slot extent from the table shape, not cfg.s_cap
    Gb = fields.shape[1]
    S = Gb * spb
    F = fields.shape[0]
    ST = F * S
    H, W = cfg.height, cfg.width
    Hp, Wp = occ.shape[1], occ.shape[2]
    M = cfg.map_count
    H2, W2 = attr_u.shape[2], attr_u.shape[3]
    res = cfg.occupancy_resolution

    s = jnp.arange(ST, dtype=jnp.int32)
    f = s // S
    sl = s - f * S
    g = sl // spb
    r = sl - g * spb
    v1 = r // (res * 2)
    r2 = r - v1 * (res * 2)
    u1 = r2 // 2
    i_map = r2 - u1 * 2

    fields_rows = fields.reshape(F * Gb, G.N_GROUP_FIELDS)[f * Gb + g]
    fr = lambda idx: fields_rows[:, idx]  # noqa: E731

    x = fr(G.G_X00) + fr(G.G_A) * u1 + fr(G.G_B) * v1
    y = fr(G.G_Y00) + fr(G.G_C) * u1 + fr(G.G_D) * v1
    xs = jnp.clip(x, 0, W - 1)
    ys = jnp.clip(y, 0, H - 1)

    occ_flat = occ.reshape(-1)
    occ_val = occ_flat[
        (f * Hp + ys // cfg.occupancy_precision) * Wp + xs // cfg.occupancy_precision
    ]
    valid = (fr(G.G_VALID) > 0) & (occ_val.astype(jnp.int32) > 0)

    pix = (f * H + ys) * W + xs
    d0_val = geo0.reshape(-1)[pix].astype(jnp.int32) >> cfg.geo_shift
    d1_val = geo1.reshape(-1)[pix].astype(jnp.int32) >> cfg.geo_shift

    d1_patch = fr(G.G_D1)
    mode = fr(G.G_MODE)
    normal_coord = lambda depth: jnp.where(  # noqa: E731
        mode == 0, depth + d1_patch, jnp.maximum(d1_patch, depth) - depth
    )
    tangent_val = fr(G.G_T00) + fr(G.G_LODX) * u1
    bitangent_val = fr(G.G_B00) + fr(G.G_LODY) * v1

    n0 = normal_coord(d0_val)
    if cfg.absolute_d1:
        n1 = normal_coord(d1_val)
    else:
        n1 = jnp.where(mode == 0, n0 + d1_val, n0 - d1_val)
    n0 &= 0xFFFF
    n1 &= 0xFFFF
    tangent_val &= 0xFFFF
    bitangent_val &= 0xFFFF

    dup = (cfg.map_count > 1) & (n1 == n0)
    n_sel = jnp.where(i_map == 0, n0, n1)
    valid &= jnp.where(i_map == 1, (cfg.map_count > 1) & ~dup, True)
    if cfg.drop_map0:
        # trailing-layer pass: D0 slots are dedup comparands only
        valid &= i_map == 1

    axes = jnp.stack([fr(G.G_NORMAL), fr(G.G_TANGENT), fr(G.G_BITANGENT)])
    vals = jnp.stack([n_sel, tangent_val, bitangent_val])
    pos = jnp.zeros((3, ST), dtype=jnp.int32)
    for comp in range(3):
        pos = pos.at[comp].set(jnp.sum(jnp.where(axes == comp, vals, 0), axis=0))
    if cfg.additional_planes:
        # 45-degree views: rotate BEFORE smoothing — the grid smoother
        # must see true coordinates (the oracle rotates at generation)
        nx, ny, nz = apply_inverse_rot45(
            pos[0], pos[1], pos[2], fr(G.G_PLANE), cfg.geometry_bitdepth_3d
        )
        pos = jnp.stack([nx, ny, nz])

    if cfg.smoothing is not None:
        from .smoothing import smooth_flat

        sm_x, sm_y, sm_z = smooth_flat(
            pos[0], pos[1], pos[2], valid, fr(G.G_PATCH), f, F,
            cfg.smoothing, shard_axis=cfg.shard_axis,
        )
        pos = jnp.stack([sm_x, sm_y, sm_z])

    z = jnp.clip(i_map, 0, M - 1)
    csh = cfg.chroma_shift
    col_y = attr_y.reshape(-1)[((f * M + z) * H + ys) * W + xs]
    col_u = attr_u.reshape(-1)[((f * M + z) * H2 + (ys >> csh)) * W2 + (xs >> csh)]
    col_v = attr_v.reshape(-1)[((f * M + z) * H2 + (ys >> csh)) * W2 + (xs >> csh)]

    if cfg.attr_smoothing is not None:
        from .smoothing import smooth_colors_flat

        col_y, col_u, col_v = smooth_colors_flat(
            pos[0], pos[1], pos[2], col_y, col_u, col_v, valid,
            fr(G.G_PATCH), f, F, cfg.attr_smoothing,
            shard_axis=cfg.shard_axis,
        )

    # per-frame compaction via one global cumsum
    cum = jnp.cumsum(valid.astype(jnp.int32))
    idx = cum - 1
    frame_end = cum[(jnp.arange(F, dtype=jnp.int32) + 1) * S - 1]
    frame_base = jnp.concatenate([jnp.zeros(1, jnp.int32), frame_end[:-1]])
    counts = frame_end - frame_base
    scatter_to = jnp.where(valid, idx - frame_base[f] + f * S, ST)

    positions = jnp.zeros((ST, 3), dtype=jnp.uint16)
    positions = positions.at[scatter_to].set(pos.T.astype(jnp.uint16), mode="drop")
    colors16 = jnp.zeros((ST, 3), dtype=jnp.uint16)
    colors16 = colors16.at[scatter_to].set(
        jnp.stack([col_y, col_u, col_v], axis=1).astype(jnp.uint16), mode="drop"
    )
    return positions.reshape(F, S, 3), colors16.reshape(F, S, 3), counts


@functools.partial(jax.jit, static_argnames=("cfg",))
def reconstruct_batch(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg):
    """Whole-GOF reconstruction (leading frame axis on every input)."""
    return _flat_batch_impl(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def reconstruct_batch_vmap(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg):
    """vmapped batch — CPU cross-check only (slow on TPU, see above)."""
    fn = functools.partial(_reconstruct_frame_impl, cfg=cfg)
    return jax.vmap(fn)(fields, occ, geo0, geo1, attr_y, attr_u, attr_v)
