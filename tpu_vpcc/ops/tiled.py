"""Tiled whole-frame reconstruction — the production fast path.

Eliminates every per-slot gather of the baseline kernel
(``tpu_vpcc.ops.reconstruct``): for the orientations real tmc2-rs
streams can contain (DEFAULT; SWAP/MROT270 = transposed), a patch
block's pixels are exactly one canvas-aligned tile. The round-4
production pass (3.0 ms / 331+ fps per chip at 1M points, within
~0.25 ms of the bare sort primitive — PERFORMANCE.md):

  1. the HOST buckets the group table to the live group count
     (quarter-pow2; ``atlas.groups.bucket_group_count``) so every
     device stage sees ~the live slot set, not the canvas capacity;
  2. geometry D0/D1/occupancy-bit and the two attribute maps' YUV are
     bit-packed into three u32 planes in the block-tiled layout the
     native video bridge emits, CONCATENATED row-wise, and each owned
     group fetched by ONE 3 KB row gather (``_pretiled_gather_megarow``
     — row gathers pay per row, not per byte);
  3. per-slot compute runs on flat ``[groups, res²]`` grids with the
     axis permutation folded into the payload pack by per-group
     multipliers (``pack30``: all three coords in one u32 when the
     host proves them < 1024);
  4. compaction is ONE unique-key unstable sort whose key embeds each
     slot's EMISSION index (G_EMITBASE + in-tile patch raster + map),
     so the orientation transpose AND the D0/D1 map interleave ride
     the sort as free permutations — maps are emitted concatenated,
     never interleaved in memory.

Smoothing (needs unpacked coordinates mid-pipeline) and dispatches
outside the narrow-key budget take the wide tail: explicit transposes,
per-pixel interleaves, a stable payload sort. Frames whose patches use
non-block-aligned orientations fall back to the gather kernel
(``GroupTable.tiled_ok`` gates this on the host).

Bit-exactness contract: identical output to the oracle and to the
baseline kernel, on every path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..atlas import groups as G
from .reconstruct import FrameConfig


def tiled_supported(cfg: FrameConfig) -> bool:
    res = cfg.occupancy_resolution
    return (
        res >= 2
        and res % 2 == 0
        and res % cfg.occupancy_precision == 0
        # the u32 packing carries 10-bit sample fields; geo_shift > 2
        # implies >10-bit decoded geometry (attribute depth is gated in
        # the pipeline's packed10_ok, which also covers this)
        and cfg.geo_shift <= 2
    )


def _upsample2d(t, factor: int):
    """Nearest-neighbour 2x2-style upsample of the last two axes —
    bit-identical to jnp.repeat along -2 then -1.

    On TPU this is yet another FIXED data movement (round 6): the
    broadcast+reshape lowers as a minor-dim relayout that the
    integration probe measured at ~0.08 ms/frame inside the pack
    stage, while the equivalent 0/1 replication matmul
    ``t_flat @ P_up`` ((N, h*w) @ (h*w, H*W), one term per output, so
    any input-exact precision is bit-exact; values are <= 10-bit) is
    MXU noise. Policy via :func:`_mxu_policy` (TPU default; knobs
    TPU_VPCC_MM_UP / TPU_VPCC_NO_MM_UP); the broadcast form remains
    for other backends."""
    if factor == 1:
        return t
    *lead, h, w = t.shape
    if _mxu_policy("TPU_VPCC_MM_UP", "TPU_VPCC_NO_MM_UP"):
        H, W = h * factor, w * factor
        j = jnp.arange(H * W)
        src = (j // W // factor) * w + (j % W) // factor
        P = (src[None, :] == jnp.arange(h * w)[:, None]).astype(
            jnp.float32
        )
        flat = t.reshape(-1, h * w).astype(jnp.float32)
        up = jax.lax.dot(
            flat, P,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return up.astype(t.dtype).reshape(*lead, H, W)
    t = jnp.broadcast_to(
        t[..., :, None, :, None], (*lead, h, factor, w, factor)
    )
    return t.reshape(*lead, h * factor, w * factor)


def _tile_slices(plane, r0, c0, th: int, tw: int):
    """Batched [n, th, tw] tile extraction at (r0[i], c0[i])."""
    return jax.vmap(
        lambda r, c: jax.lax.dynamic_slice(plane, (r, c), (th, tw))
    )(r0, c0)


def _flat_tiled_impl(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg):
    """Flat-batch tiled reconstruction. All inputs have a leading frame
    axis; returns (positions (F, s_cap, 3) u16, colors16, counts (F,)).

    All per-pixel data is bit-packed into THREE u32 canvas planes so the
    tile extraction is exactly three uniform 16x16 slice batches (small
    chroma/occupancy tiles measured ~10x slower per element than 16x16):

      plane A: d0 | d1 << 10 | occ_bit << 20      (raw 10-bit depths)
      plane B: y0 | y1 << 10 | u0 << 20           (10-bit attr samples)
      plane C: v0 | v1 << 10 | u1 << 20

    Chroma and occupancy are densely upsampled to canvas resolution
    before packing (nearest-neighbour — bit-identical to the reference's
    index-division sampling).
    """
    res = cfg.occupancy_resolution
    spb = cfg.slots_per_block
    # group count from the table shape (not cfg.g_cap): the group axis may
    # be sharded across a mesh 'space' axis, in which case this runs on a
    # contiguous group slice with the full canvas planes
    Gc = fields.shape[1]
    F = fields.shape[0]
    FG = F * Gc
    S = Gc * spb
    H, W = cfg.height, cfg.width
    bw = cfg.block_w

    # --- 1. dense upsample + bit-pack into 3 u32 planes -------------------
    plane_a, plane_b, plane_c = _pack_u32_planes(
        occ, geo0, geo1, attr_y, attr_u, attr_v, cfg
    )

    # stack frames vertically so one dynamic_slice domain covers the batch
    a_cat = plane_a.reshape(F * H, W)
    b_cat = plane_b.reshape(F * H, W)
    c_cat = plane_c.reshape(F * H, W)

    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731

    f_of_g = (
        jax.lax.broadcasted_iota(jnp.int32, (F, Gc), 0).reshape(FG)
    )
    bid = fid(G.G_BLOCKID)
    br = bid // bw
    bc = bid - br * bw
    r0 = f_of_g * H + br * res
    c0 = bc * res

    # --- 2. three uniform tile-slice batches ------------------------------
    t_a = _tile_slices(a_cat, r0, c0, res, res)
    t_b = _tile_slices(b_cat, r0, c0, res, res)
    t_c = _tile_slices(c_cat, r0, c0, res, res)

    return _tiles_to_points(fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg)


def _mxu_policy(on_env: str, off_env: str) -> bool:
    """Trace-time policy for the MXU data-movement variants: default ON
    for the TPU backend (measured wins, PERFORMANCE.md round-5 probe),
    opt-in elsewhere via ``on_env=1`` (CPU parity coverage in tests),
    force-off via ``off_env=1`` (A/B knob)."""
    import os

    if os.environ.get(off_env):
        return False
    if os.environ.get(on_env):
        return True
    return jax.default_backend() == "tpu"


def _tile_transpose_mm(t_a, t_b, t_c, sw, tile: int):
    """Orientation fix (transpose SWAP-family tiles) as ONE MXU matmul.

    ``t.transpose(0, 2, 1)`` on (FG, tile, tile) u32 is a STATIC
    permutation of the tile*tile minor elements — XLA lowers the
    transpose+select as a relayout through (8,128)-padded tiles that
    the round-5 integration probe measured at 0.505 ms/frame, the
    single largest non-kernel cost. A permutation is a 0/1 matmul:
    ``out = rows @ P`` with ``P[src, j] = 1`` puts exactly ONE term in
    every output, so any precision that represents the INPUTS exactly
    is bit-exact. Plane A packs 21 bits (f32-exact); planes B/C pack 30
    bits and are split into 15-bit halves (f32-exact). One
    (5*FG, T2) @ (T2, T2) HIGHEST-precision f32 dot runs on the MXU at
    ~2 GFLOP — noise next to the 0.5 ms relayout.

    ``sw``: (FG, 1, 1) bool — per-group select, as in the where-based
    fix. Bit-exact twin pinned by tests/test_pretiled.py.
    """
    FG = t_a.shape[0]
    T2 = tile * tile
    # P[src, j] = 1 where src = (j % tile) * tile + j // tile
    # (out[r, c] = in[c, r] with j = r * tile + c)
    j = jnp.arange(T2)
    src = (j % tile) * tile + j // tile
    P = (src[:, None] == jnp.arange(T2)[None, :]).astype(jnp.float32)
    a = t_a.reshape(FG, T2)
    b = t_b.reshape(FG, T2)
    c = t_c.reshape(FG, T2)
    M15 = jnp.uint32(0x7FFF)
    rows = jnp.concatenate(
        [
            a.astype(jnp.float32),
            (b & M15).astype(jnp.float32),
            (b >> 15).astype(jnp.float32),
            (c & M15).astype(jnp.float32),
            (c >> 15).astype(jnp.float32),
        ],
        axis=0,
    )
    tt = jax.lax.dot(
        rows, P,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    u = lambda k: tt[k * FG : (k + 1) * FG].astype(jnp.uint32)  # noqa: E731
    aT = u(0)
    bT = u(1) | (u(2) << 15)
    cT = u(3) | (u(4) << 15)
    sel = sw.reshape(FG, 1)
    out = lambda t, tT: jnp.where(sel, tT, t.reshape(FG, T2)).reshape(  # noqa: E731
        FG, tile, tile
    )
    return out(t_a, aT), out(t_b, bT), out(t_c, cT)


def _tiles_to_words(fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg,
                    _fix_orientation=True, _color=True,
                    _narrow_emit=False, _patch_order=False):
    """Steps 3-6 of the tail: orientation fix, unpack, point/color
    compute, optional smoothing, u32 payload packing — everything up to
    (but not including) compaction. Returns ``(w0, w1, w2, valid)``,
    each ``(F, S)``, in emission order.

    ``_fix_orientation=False`` / ``_color=False`` are COST-PROBE switches
    for tools/compaction_experiment.py stage decomposition (outputs wrong
    / colors zeroed); production always uses the defaults.

    BIT-EXACTNESS NOTE: the per-point math duplicates
    reconstruct.compute_slots and reconstruct._flat_batch_impl; change
    all three together."""
    res = cfg.occupancy_resolution
    sw = (fid(G.G_SWAP) == 1)[:, None, None]

    # --- 3. orientation fix (transpose SWAP-family tiles) -----------------
    # The narrow-emit path SKIPS the three [N,res,res] tile transposes:
    # it keeps canvas memory order, swaps the patch-space iotas instead,
    # and lets the compaction sort land every slot at its emission rank
    # (the sort key embeds a slot index anyway, so ordering by emission
    # rank costs nothing — the transpose rides the sort for free).
    # The shift-compact path (``_patch_order``) needs PATCH memory order
    # (its elementwise destination cumsum runs over the emission pixel
    # raster), so it transposes the three gathered tile batches like the
    # wide path — but at the bucketed extent, not the canvas.
    # ``cfg.host_oriented``: the host already transposed SWAP blocks in
    # the packed cat (orient_cat_host) — tiles arrive in patch order.
    if (
        _fix_orientation
        and not cfg.host_oriented
        and (not _narrow_emit or _patch_order)
    ):
        if _mxu_policy("TPU_VPCC_MM_TR", "TPU_VPCC_NO_MM_TR"):
            t_a, t_b, t_c = _tile_transpose_mm(t_a, t_b, t_c, sw, res)
        else:
            fix = lambda t: jnp.where(sw, t.transpose(0, 2, 1), t)  # noqa: E731
            t_a = fix(t_a)
            t_b = fix(t_b)
            t_c = fix(t_c)

    # --- 4. unpack to slot grids [FG, res, res] ---------------------------
    M10 = 0x3FF
    d0 = (t_a & M10).astype(jnp.int32) >> cfg.geo_shift
    d1 = ((t_a >> 10) & M10).astype(jnp.int32) >> cfg.geo_shift
    occ_bit_t = ((t_a >> 20) & 1).astype(jnp.int32)
    if _color:
        # planes B/C carry per-map COLOR WORDS (y | u<<10 | v<<20);
        # the narrow path forwards them packed (no unpack/repack) and
        # only the wide/smoothing tail unpacks the fields
        cy0 = (t_b & M10).astype(jnp.int32)
        cu0 = ((t_b >> 10) & M10).astype(jnp.int32)
        cv0 = ((t_b >> 20) & M10).astype(jnp.int32)
        cy1 = (t_c & M10).astype(jnp.int32)
        cu1 = ((t_c >> 10) & M10).astype(jnp.int32)
        cv1 = ((t_c >> 20) & M10).astype(jnp.int32)
        packed_wc = (t_b, t_c)
    else:  # cost probe: drop the whole color path (t_b/t_c dead)
        cy0 = cy1 = cu0 = cv0 = cv1 = cu1 = jnp.zeros(
            (FG, res, res), jnp.int32
        )
        packed_wc = None
    return _grids_to_words(
        fields_f, fid,
        (d0, d1, occ_bit_t, cy0, cy1, cu0, cu1, cv0, cv1),
        F, FG, S, cfg, _narrow_emit=_narrow_emit, _patch_order=_patch_order,
        _packed_wc=packed_wc,
    )


def _grids_to_words(fields_f, fid, grids, F, FG, S, cfg, _narrow_emit=False,
                    _patch_order=False, _packed_wc=None):
    """Steps 5-6 on unpacked slot grids ``(d0, d1, occ_bit, cy0, cy1,
    cu0, cu1, cv0, cv1)``, each [FG, tile, tile] int32 in CANVAS memory
    order (the packed-tile path unpacks into these; the raw-gather path
    produces them directly; ``tile`` is the block edge for block tables
    and occ_precision for cell tables, whose ``occ_bit`` is None — cell
    groups are occupied by construction).

    LAYOUT: all per-slot compute runs on grids FLATTENED to
    ``(FG, tile*tile)`` — a [N, 16, 16] int32 array puts 16 elements in
    the 128-wide vector lane dimension, wasting 7/8 of every VPU op and
    (when materialized padded) 8x the HBM traffic; the flat form fills
    two full vector registers per row. The in-tile coordinates become
    index arithmetic on one flat iota."""
    res = cfg.occupancy_resolution
    tile = cfg.group_tile
    T2 = tile * tile
    mc = cfg.map_count
    fl = lambda g: None if g is None else g.reshape(FG, T2)  # noqa: E731
    d0, d1, occ_bit_t, cy0, cy1, cu0, cu1, cv0, cv1 = (
        fl(g) for g in grids
    )
    sw = (fid(G.G_SWAP) == 1)[:, None]

    # --- 5. per-slot compute with group-field broadcasting ----------------
    bcast = lambda idx: fid(idx)[:, None]  # noqa: E731
    flat = jax.lax.broadcasted_iota(jnp.int32, (FG, T2), 1)
    if tile & (tile - 1) == 0:
        sh = tile.bit_length() - 1
        v1 = flat >> sh
        u1 = flat & (tile - 1)
    else:
        v1 = flat // tile
        u1 = flat - v1 * tile
    if _narrow_emit and not _patch_order and not cfg.host_oriented:
        # canvas memory order: a SWAP-family slot at memory (row, col)
        # is patch-space (u, v) = (row, col) — swap the iotas instead of
        # transposing the data tiles. (_patch_order / host_oriented: the
        # tiles were transposed at the gather / on the host, so plain
        # iotas ARE patch coords.)
        u1, v1 = jnp.where(sw, v1, u1), jnp.where(sw, u1, v1)

    d1_patch = bcast(G.G_D1)
    mode = bcast(G.G_MODE)
    normal_coord = lambda depth: jnp.where(  # noqa: E731
        mode == 0, depth + d1_patch, jnp.maximum(d1_patch, depth) - depth
    )
    tangent = (bcast(G.G_T00) + bcast(G.G_LODX) * u1) & 0xFFFF
    bitangent = (bcast(G.G_B00) + bcast(G.G_LODY) * v1) & 0xFFFF
    n0 = normal_coord(d0) & 0xFFFF
    if cfg.absolute_d1:
        n1 = normal_coord(d1) & 0xFFFF
    else:
        n1 = jnp.where(mode == 0, n0 + d1, n0 - d1) & 0xFFFF

    occ_on = (bcast(G.G_VALID) > 0)
    if occ_bit_t is not None:
        occ_on &= occ_bit_t > 0
    else:
        occ_on = jnp.broadcast_to(occ_on, d0.shape)
    dup = n1 == n0
    # trailing-layer pass (cfg.drop_map0): the D0 slots are dedup
    # comparands only — never emitted
    valid0 = occ_on if not cfg.drop_map0 else jnp.zeros_like(occ_on)
    valid1 = occ_on & (mc > 1) & ~dup

    # --- 6. interleave maps into slot order, optional smoothing, pack ----
    def interleave(a, b):
        return jnp.stack([a, b], axis=-1).reshape(F, S)

    def emit_concat(a, b):
        """Maps CONCATENATED along the slot axis — a layout-preserving
        copy, unlike the per-pixel interleave whose stack materializes a
        minor-dim-2 intermediate (catastrophic lane padding on TPU). The
        narrow sort orders slots by the emission index anyway, so memory
        order is free: the D0/D1 interleave rides the sort like the
        orientation transpose does."""
        return jnp.concatenate(
            [a.reshape(F, S // 2), b.reshape(F, S // 2)], axis=1
        )

    if _narrow_emit:
        # pack per-map in GRID space and interleave only five arrays
        # (w0, zs, wc, valid, emission index) instead of seven —
        # equivalent because elementwise packing commutes with the
        # interleave permutation; feeds _compact_narrow_triple directly
        # (10 B sort payload, no intermediate w1/w2). Only valid when
        # nothing downstream needs unpacked coordinates (smoothing off).
        #
        # The axis permutation is folded INTO the payload pack: each of
        # (n, t, b) lands at bit 0 / bit 16 of w0 or in zs, selected by
        # a PER-GROUP multiplier (three [FG,1,1] scalars from the axis
        # fields) — w0 = n*wn + t*wt + b*wb with disjoint 16-bit slots,
        # replacing the 9-term one-hot component assembly (per-slot
        # where-passes) with broadcast multiply-adds.
        u32 = lambda a: a.astype(jnp.uint32)  # noqa: E731
        if cfg.pack30:
            # host-certified <1024 coordinates: all three components
            # pack into ONE u32 (x | y<<10 | z<<20) — the zs sort
            # operand disappears (8 B payload)
            def packmul30(axis_field):
                ax = bcast(axis_field)
                return (
                    u32(ax == 0)
                    + (u32(ax == 1) << 10)
                    + (u32(ax == 2) << 20)
                )

            wn = packmul30(G.G_NORMAL)
            wt = packmul30(G.G_TANGENT)
            wb = packmul30(G.G_BITANGENT)
        else:
            def packmul(axis_field):
                ax = bcast(axis_field)
                return (
                    u32(ax == 0) + (u32(ax == 1) << 16),  # -> w0 slot
                    u32(ax == 2),  # -> zs
                )

            wn, zn = packmul(G.G_NORMAL)
            wt, zt = packmul(G.G_TANGENT)
            wb, zb = packmul(G.G_BITANGENT)
        tan_u = u32(tangent)
        bit_u = u32(bitangent)
        w0_of = lambda n: u32(n) * wn + tan_u * wt + bit_u * wb  # noqa: E731
        wc_of = lambda cy, cu, cv: (  # noqa: E731
            cy.astype(jnp.uint32)
            | (cu.astype(jnp.uint32) << 10)
            | (cv.astype(jnp.uint32) << 20)
        )
        w0 = emit_concat(w0_of(n0), w0_of(n1))
        if cfg.pack30:
            zs = None
        else:
            zs_of = lambda n: (  # noqa: E731
                u32(n) * zn + tan_u * zt + bit_u * zb
            ).astype(jnp.uint16)
            zs = emit_concat(zs_of(n0), zs_of(n1))
        if _packed_wc is not None:
            # planes B/C already ARE the per-map color words (the pack
            # emits y | u<<10 | v<<20, upper 2 bits zero) — pure reshape
            pb, pc = _packed_wc
            wc = emit_concat(fl(pb), fl(pc))
        else:
            wc = emit_concat(wc_of(cy0, cu0, cv0), wc_of(cy1, cu1, cv1))
        valid = emit_concat(valid0, valid1)
        # per-slot EMISSION index within its frame: G_EMITBASE carries
        # the group's patch-space-origin slot index (block tables:
        # group_idx * res² * 2, reproducing the old group-iota rank;
        # cell tables: the cell's exact slot base), plus the in-tile
        # patch-space raster (u1/v1 already in patch space — step 5) and
        # the per-pixel map interleave. Memory order stays canvas
        # order; the sort key lands every slot at this rank, replacing
        # the tile transposes of the general path.
        rank = v1.astype(jnp.uint32) * res + u1.astype(jnp.uint32)
        base = bcast(G.G_EMITBASE).astype(jnp.uint32) + rank * 2
        emi = emit_concat(base, base + 1)
        return w0, zs, wc, valid, emi

    # wide path: explicit component assembly via one-hot on the axis
    # permutation (smoothing needs unpacked coordinates)
    def assemble(n_val):
        comps = []
        for comp in range(3):
            comps.append(
                jnp.where(bcast(G.G_NORMAL) == comp, n_val, 0)
                + jnp.where(bcast(G.G_TANGENT) == comp, tangent, 0)
                + jnp.where(bcast(G.G_BITANGENT) == comp, bitangent, 0)
            )
        return comps  # [x, y, z] each [FG, tile, tile]

    p0x, p0y, p0z = assemble(n0)
    p1x, p1y, p1z = assemble(n1)
    if cfg.additional_planes:
        # 45-degree views (framework extension): per-slot inverse
        # rotation on the assembled components, before interleave and
        # smoothing. Narrow emission is ineligible (narrow_emit_ok) —
        # its multiplier pack never assembles components.
        from .reconstruct import apply_inverse_rot45

        plane = jnp.broadcast_to(bcast(G.G_PLANE), p0x.shape)
        p0x, p0y, p0z = apply_inverse_rot45(
            p0x, p0y, p0z, plane, cfg.geometry_bitdepth_3d
        )
        p1x, p1y, p1z = apply_inverse_rot45(
            p1x, p1y, p1z, plane, cfg.geometry_bitdepth_3d
        )

    xs = interleave(p0x, p1x)
    ys = interleave(p0y, p1y)
    zs = interleave(p0z, p1z)
    cys = interleave(cy0, cy1)
    cus = interleave(cu0, cu1)
    cvs = interleave(cv0, cv1)
    valid = jnp.stack([valid0, valid1], axis=-1).reshape(F, S)

    if cfg.smoothing is not None or cfg.attr_smoothing is not None:
        pid_grid = jnp.broadcast_to(bcast(G.G_PATCH), (FG, T2))
        pid = interleave(pid_grid, pid_grid)
    if cfg.smoothing is not None:
        from .smoothing import smooth_batch

        xs, ys, zs = smooth_batch(
            xs, ys, zs, valid, pid, cfg.smoothing, shard_axis=cfg.shard_axis
        )
    if cfg.attr_smoothing is not None:
        from .smoothing import smooth_colors_batch

        # colors smooth on the (geometry-smoothed) 3D positions' grid
        cys, cus, cvs = smooth_colors_batch(
            xs, ys, zs, cys, cus, cvs, valid, pid, cfg.attr_smoothing,
            shard_axis=cfg.shard_axis,
        )

    def pack(a, b):
        return a.astype(jnp.uint32) | (b.astype(jnp.uint32) << 16)

    w0 = pack(xs, ys)
    w1 = pack(zs, cys)
    w2 = pack(cus, cvs)
    return w0, w1, w2, valid


def _compact_words(w0, w1, w2, valid, F, S):
    """Step 7 of the tail — compaction — plus the u16 unpack into
    positions/colors.

    Production strategy (round 3): the NARROW UNIQUE-KEY sort — one
    u32 key ``(frame*2 + invalid) << 27 | slot index`` (embedded index
    = stability for free, so ``is_stable=False`` and no hidden XLA
    stability operand) carrying a tightened 10 B payload (u32 xs|ys,
    u16 zs, u32 cy|cu|cv — valid because the tiled path guarantees
    10-bit attribute samples, ``packed10_ok``). XLA:TPU's sort is a
    bitonic network whose cost is proportional to operand bytes, so
    14 B/element vs the naive 16 B (plus the dropped stability operand)
    measured 8.5 ms vs 14.7 ms at 3.3M slots. Falls back to the plain
    4-operand stable payload sort outside the narrow key budget
    (``_narrow_sort_ok``: flat index < 2^27 AND F <= 16). Measured-worse
    alternatives (index sort +
    gathers, scatter partition, per-segment sorts) are preserved below
    and in PERFORMANCE.md.

    Round 6: the wide path's memory order IS the emission order (maps
    interleaved per pixel, tiles transposed), so the sort-free Pallas
    compaction applies here too — and WITHOUT its merge phase (dest is
    already nondecreasing over the flat order). Same policy knobs as
    the narrow path (TPU default; TPU_VPCC_SHIFT / TPU_VPCC_NO_SHIFT);
    sorts remain for non-dividing extents and non-TPU backends.
    """
    if _mxu_policy("TPU_VPCC_SHIFT", "TPU_VPCC_NO_SHIFT"):
        from .shift_compact import shift_compact_full_order, shift_supported

        for extent in (32768, 16384, 8192):
            if shift_supported(S, extent):
                ops, _counts = shift_compact_full_order(
                    (w0, w1, w2), valid, F, S, extent=extent
                )
                return _unpack_sorted(*ops, valid, F, S)
    if _narrow_sort_ok(F * S, F):
        return _compact_words_narrow_unique(w0, w1, w2, valid, F, S)
    return _compact_words_payload_sort(w0, w1, w2, valid, F, S)


def _compact_words_payload_sort(w0, w1, w2, valid, F, S):
    """The 4-operand stable payload sort (fallback for dispatches
    outside the narrow key budget: flat index >= 2^27 or F > 16)."""
    key = (
        jax.lax.broadcasted_iota(jnp.int32, (F, S), 0) * 2
        + (~valid).astype(jnp.int32)
    ).reshape(F * S)
    _, s0, s1, s2 = jax.lax.sort(
        (key, w0.reshape(-1), w1.reshape(-1), w2.reshape(-1)),
        num_keys=1,
        is_stable=True,
    )
    return _unpack_sorted(s0, s1, s2, valid, F, S)


# --- alternative compaction strategies (round-3 candidates) ---------------
# The 4-operand payload sort measured 22 ms/frame once the benchmark's
# DCE hole was fixed (XLA:TPU sort is a bitonic network — O(n log^2 n)
# memory passes over every operand byte). These variants shrink the
# bytes moving through the sort network, or avoid the sort entirely.
# Bit-exactness: all produce the identical compacted prefix; pinned by
# tests/test_tiled.py.

_IDX_BITS = 27  # flat slot index budget: F*S < 2^27 AND 2F <= 2^5 = 32
# (the 5 high key bits hold frame*2+invalid, so the narrow path caps at
# F = 16 frames per dispatch regardless of atlas size)


def _narrow_sort_ok(N: int, F: int) -> bool:
    """Single eligibility predicate for the narrow unique-key sort —
    shared by the emission fast path and the compaction dispatcher so
    they can never disagree."""
    return N < (1 << _IDX_BITS) and 2 * F <= (1 << (32 - _IDX_BITS))


# production split-sort K for the FLAT (per-segment sorts) variant
# (round-4 sweep at the 1280² bucketed extent: K=1 2.99, 2 2.84, 4 2.54,
# 8 2.42, 16 2.16, 32 2.44, 64 2.26 ms/frame) and the dispatch size
# below which splitting is pointless overhead
SORT_SPLIT_K = 16
_MIN_SPLIT_SLOTS = 1 << 19
# the BATCHED variant (one minor-axis sort over (F*K, Sk) rows, u16
# keys) bottoms at segment extent Sk = 16384 slots on the real chip:
# Sk 98304(K=16) 2.57, 32768(K=48) 2.04, 24576(K=64) 2.19,
# 16384(K=96) 1.97-2.02, 8192(K=192) 2.23, 4096(K=384) 2.15 ms/frame
# vs 2.12-2.16 for the flat K=16 production sort — power-of-two
# segment lengths win (the bitonic network pads any other extent up)
_BATCHED_SEG_SLOTS = 1 << 14


def choose_sort_split(g_bucket: int, slots_per_group: int,
                      cell_groups: bool) -> "tuple[int, bool]":
    """The host-side split-sort policy for a dispatch: returns
    ``(K, batched)`` for ``cfg.sort_split`` / ``cfg.sort_split_batched``.

    Preferred: the batched variant at segment extent ``Sk = 16384``
    slots (measured optimum; see the constants above), when the group
    bucket divides into whole ``Gk = Sk / slots_per_group`` group
    segments. Fallback: the flat K=16 variant. Cell tables (not
    emission-ordered) and small dispatches keep one sort."""
    if cell_groups or g_bucket * slots_per_group < _MIN_SPLIT_SLOTS:
        return 1, False
    gk = _BATCHED_SEG_SLOTS // slots_per_group
    if gk >= 1 and _BATCHED_SEG_SLOTS % slots_per_group == 0 \
            and g_bucket % gk == 0:
        return g_bucket // gk, True
    if g_bucket % SORT_SPLIT_K == 0:
        return SORT_SPLIT_K, False
    return 1, False


def choose_compaction(g_bucket: int, slots_per_group: int,
                      cell_groups: bool) -> "tuple[int, int, bool]":
    """Host-side compaction policy for a dispatch: returns
    ``(shift_extent, sort_split_K, sort_split_batched)``.

    Production default (round 5): the Pallas shift-compact kernel
    whenever a supported chunk extent divides the dispatch slot extent
    — full-graph A/B measured 1.363 vs 1.917 ms/frame (733.7 vs 521.7
    fps) at the 1280² bucketed extent (PERFORMANCE.md). The sort path
    remains for cell tables, non-dividing extents, mesh shards, and
    the TPU_VPCC_NO_SHIFT=1 A/B knob. On non-TPU backends the kernel
    only runs interpreted (slow), so the default stays the sort there;
    TPU_VPCC_SHIFT=1 forces it on (CPU e2e coverage in the tests)."""
    import os

    import jax

    S = g_bucket * slots_per_group
    want_default = jax.default_backend() == "tpu" or bool(
        os.environ.get("TPU_VPCC_SHIFT")
    )
    if (
        not cell_groups
        and want_default
        and not os.environ.get("TPU_VPCC_NO_SHIFT")
    ):
        from .shift_compact import DEFAULT_EXTENT, shift_supported

        # on-chip extent sweep at the 1280² bucketed shape: 32768 =
        # 0.873, 16384 = 0.893, 8192 = 0.919 ms per chained stage run
        # (fewer grid steps win; see PERFORMANCE.md) — prefer larger
        for extent in (32768, DEFAULT_EXTENT, 8192):
            if shift_supported(S, extent):
                return extent, 1, False
    k, b = choose_sort_split(g_bucket, slots_per_group, cell_groups)
    return 0, k, b


def narrow_emit_ok(cfg, F: int, S: int) -> bool:
    """FULL eligibility for the emission-rank narrow path — the single
    source of truth shared by the kernels and the host dispatch gates
    (smoothing needs unpacked coordinates; the sort key carries the
    G_EMITBASE emission rank, which spans the full frame slot space, in
    ``_IDX_BITS`` bits)."""
    return (
        cfg.smoothing is None
        and cfg.attr_smoothing is None
        # 45-degree views need assembled components for the inverse
        # rotation; the narrow multiplier pack never assembles them
        and not cfg.additional_planes
        and _narrow_sort_ok(F * S, F)
        and cfg.s_cap < (1 << _IDX_BITS)
    )


def _unpack_sorted(s0, s1, s2, valid, F, S):
    counts = valid.sum(axis=1, dtype=jnp.int32)
    lo = lambda w: (w & 0xFFFF).astype(jnp.uint16)  # noqa: E731
    hi = lambda w: (w >> 16).astype(jnp.uint16)  # noqa: E731
    positions = jnp.stack([lo(s0), hi(s0), lo(s1)], axis=-1).reshape(F, S, 3)
    colors16 = jnp.stack([hi(s1), lo(s2), hi(s2)], axis=-1).reshape(F, S, 3)
    return positions, colors16, counts


def _compact_words_packed_sort(w0, w1, w2, valid, F, S):
    """Compaction via ONE single-operand u32 sort of (key << 27 | slot
    index) — the embedded index makes the sort stable for free — then
    three payload gathers by the recovered index. 4 B/element of sort
    traffic instead of the payload sort's 16 B/element."""
    N = F * S
    assert N < (1 << _IDX_BITS) and 2 * F <= (1 << (32 - _IDX_BITS))
    key = (
        jax.lax.broadcasted_iota(jnp.uint32, (F, S), 0) * 2
        + (~valid).astype(jnp.uint32)
    ).reshape(-1)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (N, 1), 0).reshape(-1)
    s = jax.lax.sort((key << _IDX_BITS) | idx)
    si = (s & ((1 << _IDX_BITS) - 1)).astype(jnp.int32)
    return _unpack_sorted(
        w0.reshape(-1)[si], w1.reshape(-1)[si], w2.reshape(-1)[si],
        valid, F, S,
    )


def _compact_words_key_iota(w0, w1, w2, valid, F, S):
    """Compaction via a (key, iota) 2-operand stable sort + 3 payload
    gathers (8 B/element of sort traffic)."""
    N = F * S
    key = (
        jax.lax.broadcasted_iota(jnp.int32, (F, S), 0) * 2
        + (~valid).astype(jnp.int32)
    ).reshape(-1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).reshape(-1)
    _, si = jax.lax.sort((key, idx), num_keys=1, is_stable=True)
    return _unpack_sorted(
        w0.reshape(-1)[si], w1.reshape(-1)[si], w2.reshape(-1)[si],
        valid, F, S,
    )


def _repack_for_narrow_sort(w0, w1, w2):
    """(w0, w1, w2) = (xs|ys, zs|cy, cu|cv) → (w0, zs u16, colors u32):
    the 78 payload bits tightened from 12 B to 10 B per element."""
    zs = (w1 & 0xFFFF).astype(jnp.uint16)
    cy = w1 >> 16
    cu = w2 & 0xFFFF
    cv = w2 >> 16
    wc = cy | (cu << 10) | (cv << 20)  # 10-bit samples, 30 bits total
    return w0, zs, wc


def _m10_triplet(w, F, S):
    """(F,S,3) u16 from three 10-bit fields of a u32 word array."""
    m10 = lambda s: ((w >> s) & 0x3FF).astype(jnp.uint16)  # noqa: E731
    return jnp.stack([m10(0), m10(10), m10(20)], axis=-1).reshape(F, S, 3)


def _unpack_narrow_sorted(s0, sz, sc, valid, F, S):
    counts = valid.sum(axis=1, dtype=jnp.int32)
    lo = lambda w: (w & 0xFFFF).astype(jnp.uint16)  # noqa: E731
    hi = lambda w: (w >> 16).astype(jnp.uint16)  # noqa: E731
    positions = jnp.stack([lo(s0), hi(s0), sz], axis=-1).reshape(F, S, 3)
    return positions, _m10_triplet(sc, F, S), counts


def _unpack_pack30(w, wc, valid, F, S):
    """Unpack the pack30 layout (x|y<<10|z<<20 and the color word)."""
    counts = valid.sum(axis=1, dtype=jnp.int32)
    return _m10_triplet(w, F, S), _m10_triplet(wc, F, S), counts


def _compact_words_narrow_stable(w0, w1, w2, valid, F, S):
    """Payload sort with tightened operands: u8 key + (u32, u16, u32)
    payload = 11 B/element through the sort network (vs 16 B for the
    production 4×32-bit sort). Stability via is_stable (XLA may pay a
    hidden index operand for it — measured against the unique-key twin)."""
    assert 2 * F <= 255
    key = (
        jax.lax.broadcasted_iota(jnp.uint8, (F, S), 0) * 2
        + (~valid).astype(jnp.uint8)
    ).reshape(-1)
    p0, pz, pc = _repack_for_narrow_sort(
        w0.reshape(-1), w1.reshape(-1), w2.reshape(-1)
    )
    _, s0, sz, sc = jax.lax.sort(
        (key, p0, pz, pc), num_keys=1, is_stable=True
    )
    return _unpack_narrow_sorted(
        s0.reshape(F, S), sz.reshape(F, S), sc.reshape(F, S), valid, F, S
    )


def _compact_words_narrow_unique(w0, w1, w2, valid, F, S):
    """Like the narrow-stable sort but with a UNIQUE u32 key
    (key << 27 | slot index) so the sort need not be stable — no hidden
    stability operand; 14 B/element total."""
    N = F * S
    assert N < (1 << _IDX_BITS) and 2 * F <= (1 << (32 - _IDX_BITS))
    key = (
        jax.lax.broadcasted_iota(jnp.uint32, (F, S), 0) * 2
        + (~valid).astype(jnp.uint32)
    ).reshape(-1)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (N, 1), 0).reshape(-1)
    p0, pz, pc = _repack_for_narrow_sort(
        w0.reshape(-1), w1.reshape(-1), w2.reshape(-1)
    )
    _, s0, sz, sc = jax.lax.sort(
        ((key << _IDX_BITS) | idx, p0, pz, pc), num_keys=1, is_stable=False
    )
    return _unpack_narrow_sorted(
        s0.reshape(F, S), sz.reshape(F, S), sc.reshape(F, S), valid, F, S
    )


def _compact_words_scatter(w0, w1, w2, valid, F, S):
    """Compaction with NO sort: exclusive-cumsum destination ranks + one
    u32 permutation scatter (unique indices) to build the inverse
    permutation + 3 payload gathers. Risk: XLA:TPU scatter lowering."""
    N = F * S
    v = valid.astype(jnp.int32)
    rank_v = jnp.cumsum(v, axis=1) - v
    nv = 1 - v
    rank_i = jnp.cumsum(nv, axis=1) - nv
    counts = v.sum(axis=1, dtype=jnp.int32)
    base = jax.lax.broadcasted_iota(jnp.int32, (F, S), 0) * S
    dest = base + jnp.where(valid, rank_v, counts[:, None] + rank_i)
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).reshape(-1)
    inv = (
        jnp.zeros(N, jnp.int32)
        .at[dest.reshape(-1)]
        .set(iota, unique_indices=True)
    )
    return _unpack_sorted(
        w0.reshape(-1)[inv], w1.reshape(-1)[inv], w2.reshape(-1)[inv],
        valid, F, S,
    )


def _narrow_sort_ops(w0, zs, wc, valid, emi, F, S):
    """The narrow unique-key sort; returns the sorted payload operands
    (each (F, S)) WITHOUT unpacking — the split-sort path merges
    segments on these lane-friendly flat arrays before one unpack."""
    key = (
        jax.lax.broadcasted_iota(jnp.uint32, (F, S), 0) * 2
        + (~valid).astype(jnp.uint32)
    )
    full_key = (key << _IDX_BITS) | emi
    ops = [full_key, w0] + ([] if zs is None else [zs]) + [wc]
    sorted_ops = jax.lax.sort(
        tuple(a.reshape(-1) for a in ops),
        num_keys=1, is_stable=False,
    )
    return [a.reshape(F, S) for a in sorted_ops[1:]]


def _unpack_ops_points(merged, F, S):
    """(positions (F,S,3) u16, colors16 (F,S,3) u16) from sorted/merged
    flat operands: 2 operands = pack30 layout, 3 = the split zs layout."""
    if len(merged) == 2:
        return _m10_triplet(merged[0], F, S), _m10_triplet(merged[1], F, S)
    s0, sz, sc = merged
    lo = lambda w: (w & 0xFFFF).astype(jnp.uint16)  # noqa: E731
    hi = lambda w: (w >> 16).astype(jnp.uint16)  # noqa: E731
    positions = jnp.stack([lo(s0), hi(s0), sz], axis=-1).reshape(F, S, 3)
    return positions, _m10_triplet(sc, F, S)


def _unpack_narrow_ops(merged, valid_or_counts, F, S):
    """Final unpack of (merged) sorted operands: 2 operands = pack30
    layout, 3 = the split zs layout. ``valid_or_counts`` is the (F, S)
    validity mask or a precomputed (F,) count vector."""
    if valid_or_counts.ndim == 2:
        counts = valid_or_counts.sum(axis=1, dtype=jnp.int32)
    else:
        counts = valid_or_counts
    positions, colors16 = _unpack_ops_points(merged, F, S)
    return positions, colors16, counts


def _compact_narrow_triple(w0, zs, wc, valid, emi, F, S):
    """The narrow unique-key compaction on natively-narrow inputs
    (w0 = xs|ys u32, zs u16, wc = cy|cu|cv u32 — or, with ``zs=None``,
    the pack30 layout where w0 = x|y<<10|z<<20 and the zs operand is
    gone). ``emi`` is each slot's per-frame EMISSION index — for
    SWAP-family groups it differs from the memory index, so this sort
    also performs the orientation transpose (and the D0/D1 map
    interleave) the general path pays dense passes for."""
    merged = _narrow_sort_ops(w0, zs, wc, valid, emi, F, S)
    return _unpack_narrow_ops(merged, valid, F, S)


def _merge_sorted_segments(seg_ops, counts_seg, F):
    """Concatenate K per-segment compacted prefixes on the SORTED FLAT
    operands: sequential dynamic row updates on lane-friendly (S_k,)
    arrays, one segment per ``lax.scan`` step. Safe by construction —
    the cumulative offset before segment k is at most the sum of earlier
    segment capacities, so every update stays in bounds; each lands at
    the running valid count, overwriting the previous segment's invalid
    tail and leaving one contiguous valid prefix (tail garbage beyond
    the total count is outside the API contract).

    ``seg_ops`` is a list of K per-segment operand lists (each operand
    ``(F, Sk)``); :func:`_merge_segment_stacks` is the stacked-input twin
    the batched split-sort feeds directly."""
    K = len(seg_ops)
    n_ops = len(seg_ops[0])
    payload = [
        jnp.stack([seg_ops[k][j] for k in range(K)], axis=1)
        for j in range(n_ops)
    ]
    return _merge_segment_stacks(payload, counts_seg, F)


def _merge_segment_stacks(payload, counts_seg, F):
    """Scan-based segment merge on stacked operands (each ``(F, K,
    Sk)``). One ``lax.scan`` step per segment replaces a Python-unrolled
    chain of K*F*n_ops separate dynamic_update_slice ops — measured
    bandwidth-cheap but HLO-heavy: at K=96 the unrolled merge dominated
    the program's op count, slowing every compile and pushing the
    serialized executable past the backend's cache-persistence size
    limit (see PERFORMANCE.md). The scan body carries the (F, S)
    outputs in place; runtime is the same sequential in-place row-copy
    chain."""
    K = payload[0].shape[1]
    S = K * payload[0].shape[2]
    # (F, K) start offset of segment k = valid points in segments < k
    offs = jnp.concatenate(
        [
            jnp.zeros((F, 1), counts_seg.dtype),
            jnp.cumsum(counts_seg[:, :-1], axis=1),
        ],
        axis=1,
    )

    def body(carry, xs):
        segs, off = xs[:-1], xs[-1]  # segs: per-op (F, Sk); off: (F,)
        out = []
        for dst, seg in zip(carry, segs):
            for f in range(F):
                dst = jax.lax.dynamic_update_slice(
                    dst, seg[f][None], (f, off[f])
                )
            out.append(dst)
        return tuple(out), None

    init = tuple(jnp.zeros((F, S), p.dtype) for p in payload)
    xs = tuple(p.swapaxes(0, 1) for p in payload) + (offs.T,)
    merged, _ = jax.lax.scan(body, init, xs)
    return list(merged)


def _tiles_to_points(fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg):
    """Shared tail: payload-word computation + sort-based compaction.

    Fast path (no smoothing, narrow-key budget holds): pack per-map in
    grid space and run the narrow unique-key sort directly — four
    interleaved arrays and 10 B of sort payload instead of seven arrays
    and the 12 B w1/w2 detour. Smoothing needs unpacked coordinates, so
    it takes the general path (whose _compact_words re-narrows anyway).
    """
    narrow_ok = narrow_emit_ok(cfg, F, S)
    if narrow_ok:
        w0, zs, wc, valid, emi = _tiles_to_words(
            fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg, _narrow_emit=True
        )
        return _compact_narrow_triple(w0, zs, wc, valid, emi, F, S)
    w0, w1, w2, valid = _tiles_to_words(
        fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg
    )
    return _compact_words(w0, w1, w2, valid, F, S)


@functools.partial(jax.jit, static_argnames=("cfg",))
def reconstruct_batch_tiled(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg):
    return _flat_tiled_impl(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg)


# ---------------------------------------------------------------------------
# Pre-tiled fast path: block-tiled plane inputs, contiguous row gathers
# ---------------------------------------------------------------------------


def tile_plane(plane: "object", tile: int):
    """Host-side block tiling: (..., H, W) -> (..., H//tile * W//tile,
    tile, tile). In production the native video bridge emits this layout
    directly during its decode memcpy (strided copy, no extra cost)."""
    import numpy as np

    *lead, H, W = plane.shape
    bh, bw = H // tile, W // tile
    t = plane.reshape(*lead, bh, tile, bw, tile)
    t = np.moveaxis(t, -3, -2)  # (..., bh, bw, tile, tile)
    return np.ascontiguousarray(t.reshape(*lead, bh * bw, tile, tile))


def untile_plane(tiled: "object", bh: int, bw: int):
    """Host-side inverse of :func:`tile_plane`:
    (..., bh*bw, t, t) -> (..., bh*t, bw*t)."""
    import numpy as np

    *lead, nb, t, _ = tiled.shape
    assert nb == bh * bw
    x = tiled.reshape(*lead, bh, bw, t, t)
    x = np.moveaxis(x, -2, -3)  # (..., bh, t, bw, t)
    return np.ascontiguousarray(x.reshape(*lead, bh * t, bw * t))


def _pack_u32_planes(occ, geo0, geo1, ay, au, av, cfg):
    """Dense upsample + bit-pack into the three u32 sample planes:

      plane A: d0 | d1 << 10 | occ_bit << 20      (raw 10-bit depths)
      plane B: y0 | u0 << 10 | v0 << 20           (map-0 COLOR WORD)
      plane C: y1 | u1 << 10 | v1 << 20           (map-1 COLOR WORD)

    Planes B/C carry each map's samples already in the y|u<<10|v<<20
    layout the emission consumes (``wc``), so the narrow path's color
    stage is a pure reshape of the gathered tiles — no unpack/repack
    (round 6; the old y0|y1|u0 / v0|v1|u1 split cost ~8 elementwise
    passes in the words stage). Chroma and occupancy are upsampled
    nearest-neighbour (bit-identical to the reference's index-division
    sampling). Shape-agnostic: works on canvas planes ((F, H, W)) and
    block-tiled planes ((F, nb, t, t)) alike — ``ay/au/av`` carry a
    map axis at position 1.
    """
    mc = cfg.map_count
    up = _upsample2d

    occ_bit = (up(occ, cfg.occupancy_precision) > 0).astype(jnp.uint32)
    d0r = geo0.astype(jnp.uint32)
    d1r = geo1.astype(jnp.uint32) if mc > 1 else d0r
    plane_a = d0r | (d1r << 10) | (occ_bit << 20)

    cup = 1 << cfg.chroma_shift  # chroma upsample factor (4:2:0 -> 2)
    y0 = ay[:, 0].astype(jnp.uint32)
    u0p = up(au[:, 0], cup).astype(jnp.uint32)
    v0p = up(av[:, 0], cup).astype(jnp.uint32)
    plane_b = y0 | (u0p << 10) | (v0p << 20)
    if mc > 1:
        y1 = ay[:, 1].astype(jnp.uint32)
        u1p = up(au[:, 1], cup).astype(jnp.uint32)
        v1p = up(av[:, 1], cup).astype(jnp.uint32)
        plane_c = y1 | (u1p << 10) | (v1p << 20)
    else:
        plane_c = plane_b
    return plane_a, plane_b, plane_c


def _pretiled_gather_tiles(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg):
    """Pack block-tiled planes into 3 u32 tiled planes and gather each
    group's tile rows (contiguous). Returns (t_a, t_b, t_c), canvas-order
    tiles [FG, res, res] u32 (orientation not yet applied)."""
    res = cfg.occupancy_resolution
    Gc = fields.shape[1]  # may be a shard of g_cap (see _flat_tiled_impl)
    F = fields.shape[0]
    FG = F * Gc
    nb = cfg.block_h * cfg.block_w

    planes = _pack_u32_planes(occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg)
    plane_a, plane_b, plane_c = (
        p.reshape(F * nb, res, res) for p in planes
    )

    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    f_of_g = jax.lax.broadcasted_iota(jnp.int32, (F, Gc), 0).reshape(FG)
    row_idx = f_of_g * nb + fid(G.G_BLOCKID)

    # contiguous row gathers
    t_a = plane_a[row_idx]
    t_b = plane_b[row_idx]
    t_c = plane_c[row_idx]
    return t_a, t_b, t_c


def _pretiled_gather_raw(fields_f, fid, occ_t, geo0_t, geo1_t, ay_t, au_t,
                         av_t, cfg, F):
    """Row-gather the RAW block-tiled planes for each owned group, then
    upsample per gathered tile — NO canvas-sized packing pass.

    The packed-plane path (:func:`_pretiled_gather_tiles`) upsamples and
    bit-packs ALL ``n_blocks`` tiles into three u32 planes before
    gathering the owned rows; with the group axis bucketed to the live
    count, that preparation touches ~2x more blocks than the gathers
    read. Here the gathers go straight at the decoder-emitted planes
    (9 row gathers of 16B-512B contiguous rows instead of 3 of 1KB) and
    the upsample/typecast work is bucket-sized. Returns the unpacked
    slot grids of :func:`_grids_to_words` in canvas memory order —
    bit-identical to unpacking the packed tiles.
    """
    tile = cfg.group_tile
    nb = (cfg.height // tile) * (cfg.width // tile)
    rp = tile // cfg.occupancy_precision  # 1 in cell-groups mode
    rc = tile >> cfg.chroma_shift
    mc = cfg.map_count
    cup = 1 << cfg.chroma_shift
    FG = fields_f.shape[0]
    up = _upsample2d
    i32 = lambda a: a.astype(jnp.int32)  # noqa: E731

    f_of_g = jax.lax.broadcasted_iota(jnp.int32, (F, FG // F), 0).reshape(FG)
    row_idx = f_of_g * nb + fid(G.G_BLOCKID)

    if cfg.cell_groups:
        # cell groups are occupied by construction (the host filtered on
        # the decoded occupancy sample) — no device occupancy input
        occ_bit = None
    else:
        occ_bit = i32(
            up(occ_t.reshape(F * nb, rp, rp)[row_idx], cfg.occupancy_precision)
            > 0
        )
    d0 = i32(geo0_t.reshape(F * nb, tile, tile)[row_idx]) >> cfg.geo_shift
    d1 = (
        i32(geo1_t.reshape(F * nb, tile, tile)[row_idx]) >> cfg.geo_shift
        if mc > 1 else d0
    )
    cy0 = i32(ay_t[:, 0].reshape(F * nb, tile, tile)[row_idx])
    cu0 = i32(up(au_t[:, 0].reshape(F * nb, rc, rc)[row_idx], cup))
    cv0 = i32(up(av_t[:, 0].reshape(F * nb, rc, rc)[row_idx], cup))
    if mc > 1:
        cy1 = i32(ay_t[:, 1].reshape(F * nb, tile, tile)[row_idx])
        cu1 = i32(up(au_t[:, 1].reshape(F * nb, rc, rc)[row_idx], cup))
        cv1 = i32(up(av_t[:, 1].reshape(F * nb, rc, rc)[row_idx], cup))
    else:
        cy1, cu1, cv1 = cy0, cu0, cv0
    return d0, d1, occ_bit, cy0, cy1, cu0, cu1, cv0, cv1


def _pretiled_gather_megarow(fields, occ_t, geo0_t, geo1_t, ay_t, au_t,
                             av_t, cfg):
    """Pack the three u32 planes tile-space (as :func:`_pretiled_gather_
    tiles` does) but CONCATENATE them into one (F*nb, 3*res*res) row
    layout and fetch each owned group with a SINGLE 3 KB row gather.

    XLA:TPU row gathers pay a fixed per-ROW cost (~0.25 us measured:
    contiguous, sorted, and random indices all time identically, and
    stage costs scale with row count, not bytes) — so the gather bill is
    minimized by gathering the fewest, fattest rows. One gather of
    n_groups rows replaces three (packed) or nine (raw)."""
    res = cfg.occupancy_resolution
    T2 = res * res
    Gc = fields.shape[1]
    F = fields.shape[0]
    FG = F * Gc
    nb = cfg.block_h * cfg.block_w

    planes = _pack_u32_planes(occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg)
    cat = jnp.concatenate(
        [p.reshape(F * nb, T2) for p in planes], axis=1
    )
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    f_of_g = jax.lax.broadcasted_iota(jnp.int32, (F, Gc), 0).reshape(FG)
    rows = cat[f_of_g * nb + fid(G.G_BLOCKID)]
    t_a = rows[:, :T2].reshape(FG, res, res)
    t_b = rows[:, T2 : 2 * T2].reshape(FG, res, res)
    t_c = rows[:, 2 * T2 :].reshape(FG, res, res)
    return t_a, t_b, t_c


def _pretiled_gather_megaraw(fields_f, fid, occ_t, geo0_t, geo1_t, ay_t,
                             au_t, av_t, cfg, F):
    """One mega-row gather over the RAW u16 planes concatenated
    row-wise (no canvas-sized pack/upsample prep — only a cast+concat
    copy); unpack + upsample happen per gathered tile (bucket-sized).
    Returns the slot grids of :func:`_grids_to_words`."""
    res = cfg.occupancy_resolution
    rp = res // cfg.occupancy_precision
    rc = res >> cfg.chroma_shift
    mc = cfg.map_count
    cup = 1 << cfg.chroma_shift
    up = _upsample2d
    i32 = lambda a: a.astype(jnp.int32)  # noqa: E731

    cut = _megaraw_row_cut(
        fields_f, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, F
    )

    occ_bit = i32(up(cut(0, rp), cfg.occupancy_precision) > 0)
    d0 = i32(cut(1, res)) >> cfg.geo_shift
    cy0 = i32(cut(2, res))
    cu0 = i32(up(cut(3, rc), cup))
    cv0 = i32(up(cut(4, rc), cup))
    if mc > 1:
        d1 = i32(cut(5, res)) >> cfg.geo_shift
        cy1 = i32(cut(6, res))
        cu1 = i32(up(cut(7, rc), cup))
        cv1 = i32(up(cut(8, rc), cup))
    else:
        d1, cy1, cu1, cv1 = d0, cy0, cu0, cv0
    return d0, d1, occ_bit, cy0, cy1, cu0, cu1, cv0, cv1


def _bpack_policy() -> bool:
    """Gather-then-pack (``_pretiled_gather_megaraw_pack``) vs
    pack-then-gather (``_pretiled_gather_megarow``): MEASURED NEGATIVE
    on-chip (+0.06-0.08 ms/frame over interleaved A/B pairs — bpack
    0.515/0.537 vs 0.452/0.460; the 9-part raw concat + per-tile
    upsample relayouts cost more than the canvas-extent pack they
    replace, even at ~2x fewer touched blocks). Default OFF everywhere;
    opt-in via TPU_VPCC_BPACK for re-measurement."""
    import os

    return bool(os.environ.get("TPU_VPCC_BPACK")) and not bool(
        os.environ.get("TPU_VPCC_NO_BPACK")
    )


def _gather_tiles(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg):
    """The production tile fetch: ONE mega-row gather, with the u32
    pack before or after the gather per :func:`_bpack_policy` (the two
    are bit-identical twins).

    HOST-PACK mode (round 7, the production TPU default): when
    ``geo0_t is None``, ``occ_t`` carries the pre-packed concatenated
    planes (``(F, nb, 3*T2)`` u32 from :func:`pack_planes_host` — the
    host emits them next to the tiled layout it already produces) and
    the device graph starts at the row gather: the canvas-extent pack
    (0.125 ms/frame, the largest non-kernel stage on the merge-free
    graph) leaves the device entirely for ~1.2x H2D bytes. On-chip
    interleaved A/B: -0.058/-0.059/-0.090/-0.043 ms/frame over four
    pairs (tools/integration_probe.py hostpack variant)."""
    if geo0_t is None:
        res = cfg.occupancy_resolution
        T2 = res * res
        Gc = fields.shape[1]
        F = fields.shape[0]
        FG = F * Gc
        nb = occ_t.shape[1]
        fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
        f_of_g = jax.lax.broadcasted_iota(jnp.int32, (F, Gc), 0).reshape(FG)
        rows = occ_t.reshape(F * nb, 3 * T2)[
            f_of_g * nb + fields_f[:, G.G_BLOCKID]
        ]
        return (
            rows[:, :T2].reshape(FG, res, res),
            rows[:, T2 : 2 * T2].reshape(FG, res, res),
            rows[:, 2 * T2 :].reshape(FG, res, res),
        )
    fn = (
        _pretiled_gather_megaraw_pack if _bpack_policy()
        else _pretiled_gather_megarow
    )
    return fn(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg)


def hostpack_policy() -> bool:
    """Host-side plane pack (``pack_planes_host`` + the cat-mode
    dispatch): default ON for the TPU backend — the device graph drops
    its largest non-kernel stage (see :func:`_gather_tiles`) for ~1.2x
    H2D bytes (12 vs ~10 B/px; the tunnel stages either way, and on
    real hosts the native bridge emits the packed layout during its
    decode memcpy). Knobs TPU_VPCC_HOSTPACK / TPU_VPCC_NO_HOSTPACK."""
    return _mxu_policy("TPU_VPCC_HOSTPACK", "TPU_VPCC_NO_HOSTPACK")


def pack_planes_host(occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg,
                     swap=None):
    """Host (numpy) twin of :func:`_pack_u32_planes` + row-wise concat:
    returns the packed cat ``(F, nb, 3*res*res)`` u32 the cat-mode
    dispatch gathers from (see :func:`_gather_tiles`). ``swap``:
    optional (F, nb) 0/1 mask of SWAP-family owned blocks — flagged
    blocks are emitted TRANSPOSED (the host orientation fix; the
    native pack folds it into its per-pixel write for free).

    Layout contract (bit-identical to the device pack, pinned by
    tests/test_pretiled.py):

      [:T2]    plane A: d0 | d1 << 10 | occ_bit << 20
      [T2:2T2] plane B: y0 | u0 << 10 | v0 << 20
      [2T2:]   plane C: y1 | u1 << 10 | v1 << 20  (== B when mc == 1)

    The C twin in the native bridge (``video/native/pack_planes.cc``,
    ~10x this numpy form on one core) is tried first; numpy is the
    portable fallback. Either way the cost rides host_prepare,
    overlapped with the previous GOF's device work."""
    import numpy as np

    try:
        from ..video.codec import native_pack_planes

        cat = native_pack_planes(
            occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, swap=swap
        )
        if cat is not None:
            return cat
    except Exception:  # pragma: no cover - defensive: numpy is exact
        pass

    mc = cfg.map_count
    T2 = cfg.occupancy_resolution * cfg.occupancy_resolution
    F, nb = occ_t.shape[0], occ_t.shape[1]

    def up(t, f):
        return t if f == 1 else t.repeat(f, axis=-2).repeat(f, axis=-1)

    occ_bit = (up(occ_t, cfg.occupancy_precision) > 0).astype(np.uint32)
    d0 = geo0_t.astype(np.uint32)
    d1 = geo1_t.astype(np.uint32) if mc > 1 else d0
    plane_a = d0 | (d1 << 10) | (occ_bit << 20)

    cup = 1 << cfg.chroma_shift

    def color(m):
        return (
            ay_t[:, m].astype(np.uint32)
            | (up(au_t[:, m], cup).astype(np.uint32) << 10)
            | (up(av_t[:, m], cup).astype(np.uint32) << 20)
        )

    plane_b = color(0)
    plane_c = color(1) if mc > 1 else plane_b
    cat = np.ascontiguousarray(
        np.concatenate(
            [p.reshape(F, nb, T2) for p in (plane_a, plane_b, plane_c)],
            axis=2,
        )
    )
    if swap is not None:
        _transpose_swap_blocks(cat, swap, cfg.occupancy_resolution)
    return cat


def _transpose_swap_blocks(cat, swap, res: int):
    """Transpose the masked blocks of a packed cat IN PLACE (the
    layout's single transpose routine — the native pack folds the same
    movement into its per-pixel write)."""
    import numpy as np

    T2 = res * res
    for f in range(swap.shape[0]):
        blk = np.nonzero(swap[f])[0]
        if blk.size:
            t = cat[f, blk].reshape(-1, 3, res, res)
            cat[f, blk] = np.ascontiguousarray(t.swapaxes(2, 3)).reshape(
                -1, 3 * T2
            )
    return cat


def hostorient_policy() -> bool:
    """Host-side orientation fix (``orient_cat_host``): default ON for
    the TPU backend when the host pack is active — SWAP-family blocks
    are transposed once in the packed cat (each canvas block is owned
    by at most one patch, so the per-block transpose is well-defined),
    deleting the device's orientation-fix stage AND the narrow path's
    iota swap (``cfg.host_oriented``). Knobs TPU_VPCC_HOSTORIENT /
    TPU_VPCC_NO_HOSTORIENT."""
    return _mxu_policy("TPU_VPCC_HOSTORIENT", "TPU_VPCC_NO_HOSTORIENT")


def swap_mask_host(fields, nb: int):
    """(F, nb) u8 mask of SWAP-family OWNED blocks, from the group
    table. Legal to transpose exactly these once in the cat: each
    canvas block is owned by at most one patch per frame
    (``atlas.groups.build_group_table``); bucket-padding table rows are
    all-zero (G_VALID=0) and excluded."""
    import numpy as np

    fields = np.asarray(fields)
    m = np.zeros((fields.shape[0], nb), np.uint8)
    for f in range(fields.shape[0]):
        sel = (fields[f, :, G.G_SWAP] == 1) & (fields[f, :, G.G_VALID] > 0)
        m[f, fields[f, sel, G.G_BLOCKID]] = 1
    return m


def orient_cat_host(cat, fields, res: int):
    """Transpose SWAP-family owned blocks IN PLACE in the packed cat
    ``(F, nb, 3*res*res)`` (see :func:`pack_planes_host`), putting every
    gathered tile in PATCH memory order. The staging helper folds this
    into the pack itself (``swap=`` — free in the native pack's
    per-pixel loop); this standalone pass covers pre-packed cats."""
    return _transpose_swap_blocks(
        cat, swap_mask_host(fields, cat.shape[1]), res
    )


def trim_extent_bits(cat, fields, trims, res: int, host_oriented: bool):
    """Clear the packed occupancy bit (plane A bit 20) of pixels past a
    quantized patch's exact extent, IN PLACE (FRAMEWORK EXTENSION,
    patch size quantizer; see ``atlas.groups.GroupTable.trim``).

    ``trims``: (F, nb_groups, 2) patch-space pixel limits per group
    (lim == res means untrimmed). The cat tile of a group is stored in
    PATCH raster order when the host orientation fix ran
    (``host_oriented``), else in canvas order — SWAP-family groups then
    need the transposed mask. Only edge blocks of quantized patches are
    touched, so the per-block python loop is cheap."""
    import numpy as np

    T2 = res * res
    mask_bit = ~np.uint32(1 << 20)
    fields = np.asarray(fields)
    trims = np.asarray(trims)
    for f in range(trims.shape[0]):
        rows = np.nonzero(
            (fields[f, :, G.G_VALID] > 0)
            & ((trims[f, :, 0] < res) | (trims[f, :, 1] < res))
        )[0]
        for g in rows:
            lu, lv = int(trims[f, g, 0]), int(trims[f, g, 1])
            m = np.zeros((res, res), dtype=bool)  # (vp, up) patch order
            m[:, lu:] = True
            m[lv:, :] = True
            if not host_oriented and fields[f, g, G.G_SWAP] == 1:
                m = m.T  # stored canvas order: patch (up, vp) swapped
            b = int(fields[f, g, G.G_BLOCKID])
            cat[f, b, :T2][m.ravel()] &= mask_bit
    return cat


def cat_mode_ok(cfg) -> bool:
    """Host-pack eligibility for a (tiled) dispatch config: the cat
    layout carries block tables' packed planes only — cell tables and
    the raw-gather debug path keep raw planes — and the policy knob
    must be on. Callers add their own ``use_tiled`` condition."""
    return (
        not cfg.cell_groups and not cfg.raw_gather and hostpack_policy()
    )


def stage_cat_inputs(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg,
                     trims=None):
    """The ONE host staging routine for the cat-mode dispatch — used by
    the pipeline, bench.py, and tools/integration_probe.py so the
    staged graph never drifts between them. Packs the tiled planes into
    the cat (:func:`pack_planes_host`), applies the host orientation
    fix per :func:`hostorient_policy`, and returns
    ``((fields, cat, None x5), cfg)`` with ``cfg.host_oriented`` set
    when the orientation moved to the host. ``trims``: optional
    quantized patch extents (see :func:`trim_extent_bits`). Callers
    gate on :func:`cat_mode_ok` (+ their own ``use_tiled``
    condition)."""
    from dataclasses import replace

    swap = None
    if hostorient_policy():
        swap = swap_mask_host(fields, occ_t.shape[1])
        cfg = replace(cfg, host_oriented=True)
    cat = pack_planes_host(
        occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, swap=swap
    )
    if trims is not None:
        trim_extent_bits(
            cat, fields, trims, cfg.occupancy_resolution,
            host_oriented=swap is not None,
        )
    return (fields, cat, None, None, None, None, None), cfg


def _megaraw_row_cut(fields_f, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t,
                     cfg, F):
    """Shared scaffold of the raw-plane mega-row gather: concatenate
    the decoder-emitted raw planes row-wise, gather each owned group's
    row, and return a ``cut(k, n)`` accessor over the gathered parts
    (part order: occ, geo0, ay0, au0, av0[, geo1, ay1, au1, av1])."""
    res = cfg.occupancy_resolution
    T2 = res * res
    rp = res // cfg.occupancy_precision
    rc = res >> cfg.chroma_shift
    P2 = rp * rp
    C2 = rc * rc
    nb = cfg.block_h * cfg.block_w
    mc = cfg.map_count
    FG = fields_f.shape[0]

    FN = F * nb
    parts = [
        occ_t.reshape(FN, P2).astype(jnp.uint16),
        geo0_t.reshape(FN, T2),
        ay_t[:, 0].reshape(FN, T2),
        au_t[:, 0].reshape(FN, C2),
        av_t[:, 0].reshape(FN, C2),
    ]
    if mc > 1:
        parts += [
            geo1_t.reshape(FN, T2),
            ay_t[:, 1].reshape(FN, T2),
            au_t[:, 1].reshape(FN, C2),
            av_t[:, 1].reshape(FN, C2),
        ]
    cat = jnp.concatenate(parts, axis=1)
    f_of_g = jax.lax.broadcasted_iota(jnp.int32, (F, FG // F), 0).reshape(FG)
    rows = cat[f_of_g * nb + fields_f[:, G.G_BLOCKID]]

    off = [0]
    for p in parts:
        off.append(off[-1] + p.shape[1])
    return lambda k, n: rows[:, off[k] : off[k] + n * n].reshape(FG, n, n)


def _pretiled_gather_megaraw_pack(fields, occ_t, geo0_t, geo1_t, ay_t,
                                  au_t, av_t, cfg):
    """Bit-exact twin of :func:`_pretiled_gather_megarow` with the
    upsample + u32 pack at the BUCKET extent instead of the canvas.

    Hypothesis: the packed-plane path upsamples occupancy/chroma and
    bit-packs ALL ``n_blocks`` canvas blocks before gathering the owned
    rows; with the group axis bucketed to the live count that
    preparation touches ~2x more blocks than the gather reads (the
    round-7 integration probe ranked the pack the largest non-kernel
    stage, ~0.14 ms/frame of ~0.455). Here the mega-row gather goes
    straight at the decoder-emitted raw planes (one u16 row per group)
    and the upsample/pack runs per GATHERED tile; per-tile ops commute
    with the row gather, so (t_a, t_b, t_c) are bit-identical (pinned
    by tests/test_pretiled.py). MEASURED NEGATIVE on-chip — see
    :func:`_bpack_policy`; kept as a knob-gated variant for the
    record."""
    res = cfg.occupancy_resolution
    rp = res // cfg.occupancy_precision
    rc = res >> cfg.chroma_shift
    F = fields.shape[0]
    FG = F * fields.shape[1]
    mc = cfg.map_count
    cup = 1 << cfg.chroma_shift
    up = _upsample2d
    u32 = lambda a: a.astype(jnp.uint32)  # noqa: E731

    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    cut = _megaraw_row_cut(
        fields_f, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, F
    )

    occ_bit = u32(up(cut(0, rp), cfg.occupancy_precision) > 0)
    g0 = u32(cut(1, res))
    g1 = u32(cut(5, res)) if mc > 1 else g0
    t_a = g0 | (g1 << 10) | (occ_bit << 20)
    t_b = (
        u32(cut(2, res))
        | (u32(up(cut(3, rc), cup)) << 10)
        | (u32(up(cut(4, rc), cup)) << 20)
    )
    if mc > 1:
        t_c = (
            u32(cut(6, res))
            | (u32(up(cut(7, rc), cup)) << 10)
            | (u32(up(cut(8, rc), cup)) << 20)
        )
    else:
        t_c = t_b
    return t_a, t_b, t_c


def _flat_pretiled_impl(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg,
                        _packed_out=False):
    """Flat-batch reconstruction from block-tiled planes.

    Identical math to :func:`_flat_tiled_impl`, but plane data arrives
    block-tiled ((F, [M,] n_blocks, t, t)), so per-group tile extraction
    is a gather of CONTIGUOUS rows — measured several times faster than
    the strided 16x16 dynamic-slice batches (each 2D slice touches 16
    non-contiguous 64B pieces; a tiled row is one 1KB piece).

      occ_t: (F, nb, res/prec, res/prec) u8
      geo*_t: (F, nb, res, res) u16
      ay_t: (F, M, nb, res, res) u16 ; au_t/av_t: (F, M, nb, res/2, res/2)

    ``_packed_out=True`` (narrow path only — the host gates on
    :func:`narrow_emit_ok`) returns ``(ops, counts)`` with ``ops`` the
    compacted sorted flat operands (2 for pack30, else 3), each
    ``(F, S)`` and lane-friendly, INSTEAD of unpacking to the
    (F, S, 3) minor-dim-3 point arrays at full slot extent: the
    production dispatch defers the unpack to the prefix-fetch jit,
    which materializes it at the much smaller compacted-prefix extent
    (a 3-wide minor axis pads to the 128-lane tile on TPU — see
    PERFORMANCE.md).
    """
    F = fields.shape[0]
    FG = F * fields.shape[1]
    S = fields.shape[1] * cfg.slots_per_group
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    narrow_ok = narrow_emit_ok(cfg, F, S)
    if cfg.cell_groups and not narrow_ok:
        # the host gates cell tables on exactly these conditions
        # (_cell_mode_ok); reaching here is a dispatch bug
        raise ValueError("cell-groups dispatch outside the narrow envelope")
    if (
        cfg.shift_compact
        and narrow_ok
        and not cfg.cell_groups
        and not cfg.raw_gather
    ):
        # SORT-FREE compaction (round 5): gathered tiles transposed to
        # patch order, destinations from one validity cumsum, and the
        # Pallas merge + shift-network kernel moves every element to
        # its known rank (ops/shift_compact.py). Bit-exact twin of the
        # sort path (tests/test_shift_compact.py + test_pretiled.py).
        from .shift_compact import shift_compact_ops, shift_supported

        assert shift_supported(S, cfg.shift_compact), (S, cfg.shift_compact)
        w0, zs, wc, valid, _emi = _narrow_pipeline_words(
            fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, F,
            _patch_order=True,
        )
        ops, counts = shift_compact_ops(
            w0, zs, wc, valid, F, S, extent=cfg.shift_compact
        )
        if _packed_out:
            return tuple(ops), counts
        return _unpack_narrow_ops(ops, counts, F, S)
    K = cfg.sort_split
    if (
        K > 1
        and narrow_ok
        and not cfg.cell_groups  # cell tables are not emission-ordered
        and fields.shape[1] % K == 0
    ):
        # SPLIT-SORT (round 4): run the narrow pipeline through the
        # sort on K emission-contiguous group-range segments, merge the
        # SORTED FLAT operands (lane-friendly dynamic row updates; the
        # post-unpack merge wastes ~1.5 ms on minor-dim-3 layouts), and
        # unpack once. Block-table group ranges own disjoint
        # consecutive emission ranges, so concatenated prefixes ARE the
        # frame prefix. The bitonic sort's cost cliffs with working-set
        # residency: segment sorts that fit run dramatically faster
        # (PERFORMANCE.md).
        Gk = fields.shape[1] // K
        Sk = Gk * cfg.slots_per_group
        # ONE full-extent gather + words stage; a segment is one
        # contiguous group-major chunk in EACH map half of the words
        # slot axis ([D0 half | D1 half], emit_concat), so segmentation
        # is a block transpose/slice of the words arrays — not K
        # separate pipeline subgraphs (which multiplied the HLO by K,
        # fragmented the megarow gather into K small gathers, and
        # pushed the serialized executable past the backend's
        # persistence limit)
        words = _narrow_pipeline_words(
            fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, F
        )
        if cfg.sort_split_batched:
            # ONE minor-axis sort over all (frame, segment) rows; u16
            # keys when the seg-local rank fits (see _batched_split_sort)
            seg_bases = fields[:, ::Gk, G.G_EMITBASE].astype(jnp.uint32)
            payload, counts_seg = _batched_split_sort(
                words, seg_bases, F, K, Sk
            )
            merged = _merge_segment_stacks(payload, counts_seg, F)
            if _packed_out:
                return tuple(merged), counts_seg.sum(axis=1)
            return _unpack_narrow_ops(
                merged, counts_seg.sum(axis=1), F, S
            )
        else:
            w0, zs, wc, valid, emi = words
            # segment k = one contiguous chunk in EACH map half of the
            # words slot axis (see _batched_split_sort)
            h = S // 2
            k2 = Sk // 2
            sl = lambda a, k: (  # noqa: E731
                None if a is None else jnp.concatenate(
                    [a[:, k * k2 : (k + 1) * k2],
                     a[:, h + k * k2 : h + (k + 1) * k2]], axis=1
                )
            )
            seg_ops = []
            seg_counts = []
            for k in range(K):
                seg_ops.append(_narrow_sort_ops(
                    sl(w0, k), sl(zs, k), sl(wc, k), sl(valid, k),
                    sl(emi, k), F, Sk,
                ))
                seg_counts.append(
                    sl(valid, k).sum(axis=1, dtype=jnp.int32)
                )
            counts_seg = jnp.stack(seg_counts, axis=1)  # (F, K)
        merged = _merge_sorted_segments(seg_ops, counts_seg, F)
        if _packed_out:
            return tuple(merged), counts_seg.sum(axis=1)
        return _unpack_narrow_ops(
            merged, counts_seg.sum(axis=1), F, S
        )
    if narrow_ok:
        ops, counts = _narrow_pipeline_ops(
            fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, F
        )
        if _packed_out:
            return tuple(ops), counts
        return _unpack_narrow_ops(ops, counts, F, S)
    if _packed_out:
        # the host gates packed dispatch on narrow_emit_ok; reaching the
        # wide tail here is a dispatch bug
        raise ValueError("packed output requested outside the narrow path")
    # one mega-row gather for the wide/smoothing tail too (round 4):
    # measured 3.8 ms/frame vs 7.4-8.1 for every other gather/emission
    # combination on the narrow path (see PERFORMANCE.md)
    t_a, t_b, t_c = _gather_tiles(
        fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg
    )
    return _tiles_to_points(fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg)


def _narrow_pipeline_words(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t,
                           cfg, F, _patch_order=False):
    """The narrow path UP TO the compaction sort for one (segment of a)
    dispatch: gather (megarow, or raw for cell/experimental configs)
    plus the words stage. Returns ``(w0, zs, wc, valid, emi)``, each
    ``(F, S_seg)``."""
    Gc = fields.shape[1]
    FG = F * Gc
    S = Gc * cfg.slots_per_group
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    if cfg.raw_gather or cfg.cell_groups:
        assert not _patch_order  # shift-compact dispatch gates these off
        assert geo0_t is not None  # host gates cat-mode off these paths
        grids = _pretiled_gather_raw(
            fields_f, fid, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, F
        )
        return _grids_to_words(
            fields_f, fid, grids, F, FG, S, cfg, _narrow_emit=True
        )
    t_a, t_b, t_c = _gather_tiles(
        fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg
    )
    return _tiles_to_words(
        fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg, _narrow_emit=True,
        _patch_order=_patch_order,
    )


def _narrow_pipeline_ops(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t,
                         cfg, F):
    """The narrow path through the compaction sort for one (segment of
    a) dispatch: gather, words, sort. Returns (sorted flat operands,
    (F,) counts) — unpacking is the caller's job so split segments can
    merge first."""
    S = fields.shape[1] * cfg.slots_per_group
    w0, zs, wc, valid, emi = _narrow_pipeline_words(
        fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, F
    )
    ops = _narrow_sort_ops(w0, zs, wc, valid, emi, F, S)
    return ops, valid.sum(axis=1, dtype=jnp.int32)


def _batched_split_sort(words, seg_bases, F, K, Sk):
    """Sort all K emission-contiguous segments in ONE minor-axis
    ``lax.sort`` over ``(F*K, Sk)`` rows instead of K separate flat
    sorts. ``words`` are the FULL-extent narrow-pipeline arrays (each
    ``(F, K*Sk)``); a segment is a contiguous slot range, so the row
    layout is a reshape. The key drops the frame/segment bits the flat
    sort needed (each row IS one frame-segment) and carries only the
    SEG-LOCAL emission rank: segment k's valid slots own emission
    indices exactly ``[base_k, base_k + Sk)`` where ``base_k`` is the
    segment's first table row's G_EMITBASE (``seg_bases`` ``(F, K)`` —
    block tables: ``row * spb``; the row index is GLOBAL under spatial
    sharding, so the base is read from the table rather than assumed
    ``k*Sk``), so ``emi - base_k`` fits 15 bits whenever ``Sk <= 2^15``
    and the whole key narrows to u16 — 10 B of sort operands per
    element instead of 12. Invalid slots (incl. bucket-padding rows
    whose G_EMITBASE is garbage here) mask into the upper key half,
    where order is irrelevant (the merge overwrites invalid tails); a
    partially padded segment's base is still its first LIVE row's
    (tables are live-prefix), and an all-padding segment has no valid
    slots.

    Returns ``(payload, counts_seg)`` — stacked sorted operands (each
    ``(F, K, Sk)``) shaped for :func:`_merge_segment_stacks`."""
    w0, zs, wc, valid, emi = words
    has_zs = zs is not None
    # the words slot axis is [D0 half | D1 half], each half group-major
    # (emit_concat) — so segment k's slots are one contiguous chunk in
    # EACH half; the row layout is a (2, K) block transpose (fuses into
    # the elementwise words producers)
    rows = lambda a: (  # noqa: E731
        a.reshape(F, 2, K, Sk // 2).swapaxes(1, 2).reshape(F * K, Sk)
    )
    valid_b = rows(valid)
    emi_b = (
        rows(emi).reshape(F, K, Sk) - seg_bases[:, :, None]
    ).reshape(F * K, Sk)
    inv = ~valid_b
    if Sk <= (1 << 15):
        key = (inv.astype(jnp.uint16) << 15) | (
            emi_b.astype(jnp.uint16) & jnp.uint16(0x7FFF)
        )
    else:
        key = (inv.astype(jnp.uint32) << 31) | (
            emi_b & jnp.uint32(0x7FFFFFFF)
        )
    ops = [key, rows(w0)] + ([rows(zs)] if has_zs else []) + [rows(wc)]
    sorted_ops = jax.lax.sort(
        tuple(ops), dimension=1, num_keys=1, is_stable=False
    )
    payload = [o.reshape(F, K, Sk) for o in sorted_ops[1:]]
    counts_seg = valid_b.reshape(F, K, Sk).sum(axis=2, dtype=jnp.int32)
    return payload, counts_seg


@functools.partial(jax.jit, static_argnames=("cfg",))
def reconstruct_batch_pretiled(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg):
    return _flat_pretiled_impl(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def reconstruct_batch_pretiled_packed(
    fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg
):
    """Production narrow-path dispatch with PACKED outputs: returns
    ``(ops, counts)`` where ``ops`` are the compacted sorted flat
    operands (each (F, S), lane-friendly). The caller unpacks the
    compacted prefix in the fetch jit (``runtime.pipeline``) — the
    full-extent (F, S, 3) minor-dim-3 materialization never happens on
    device. Host gate: :func:`narrow_emit_ok`."""
    return _flat_pretiled_impl(
        fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg,
        _packed_out=True,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def reconstruct_frame_tiled(fields, occ, geo0, geo1, attr_y, attr_u, attr_v, cfg):
    pos, col, cnt = _flat_tiled_impl(
        fields[None], occ[None], geo0[None], geo1[None],
        attr_y[None], attr_u[None], attr_v[None], cfg,
    )
    return pos[0], col[0], cnt[0]
