"""Pre-tiled fast path: bit-exactness vs the baseline gather kernel."""

import numpy as np
import pytest

from tpu_vpcc.atlas.groups import build_group_table
from tpu_vpcc.ops.reconstruct import make_config, reconstruct_frame
from tpu_vpcc.ops.tiled import reconstruct_batch_pretiled, tile_plane
from tpu_vpcc.utils.synthetic import make_synthetic_frame


def tiled_inputs(sf, res):
    gt = build_group_table(sf.meta)
    geo0 = sf.geo_planes[0]
    geo1 = sf.geo_planes[1] if sf.map_count > 1 else sf.geo_planes[0]
    ay = np.stack([p[0] for p in sf.attr_planes])
    au = np.stack([p[1] for p in sf.attr_planes])
    av = np.stack([p[2] for p in sf.attr_planes])
    raw = (gt.fields, sf.occ_plane, geo0, geo1, ay, au, av)
    tiled = (
        gt.fields[None],
        tile_plane(sf.occ_plane, res // sf.occupancy_precision)[None],
        tile_plane(geo0, res)[None],
        tile_plane(geo1, res)[None],
        tile_plane(ay, res)[None],
        tile_plane(au, res // 2)[None],
        tile_plane(av, res // 2)[None],
    )
    return raw, tiled


@pytest.mark.parametrize("seed,res,prec,mc", [
    (0, 8, 4, 2), (1, 8, 4, 2), (2, 8, 2, 1), (3, 16, 4, 2),
])
def test_pretiled_matches_baseline(seed, res, prec, mc):
    rng = np.random.default_rng(seed)
    width = 128 if res == 16 else 64
    sf = make_synthetic_frame(
        rng, width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc, n_patches=4,
    )
    cfg = make_config(
        width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc,
    )
    raw, tiled = tiled_inputs(sf, res)
    p1, c1, n1 = reconstruct_frame(*raw, cfg=cfg)
    p2, c2, n2 = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    n1, n2 = int(n1), int(n2[0])
    assert n1 == n2
    np.testing.assert_array_equal(np.asarray(p1)[:n1], np.asarray(p2)[0][:n1])
    np.testing.assert_array_equal(np.asarray(c1)[:n1], np.asarray(c2)[0][:n1])


def test_tile_plane_roundtrip():
    rng = np.random.default_rng(5)
    plane = rng.integers(0, 1000, (2, 3, 32, 48)).astype(np.uint16)
    t = tile_plane(plane, 8)
    assert t.shape == (2, 3, 4 * 6, 8, 8)
    # spot-check one tile
    np.testing.assert_array_equal(
        t[1, 2, 1 * 6 + 2], plane[1, 2, 8:16, 16:24]
    )


@pytest.mark.parametrize("seed,res,prec,mc", [
    (0, 8, 4, 2), (1, 8, 4, 2), (2, 8, 2, 1), (3, 16, 4, 2),
])
def test_raw_gather_path_bit_identical(seed, res, prec, mc):
    """The raw-tile-gather narrow path (cfg.raw_gather) produces the
    identical compacted prefix to the packed-plane path."""
    from dataclasses import replace

    rng = np.random.default_rng(seed)
    width = 128 if res == 16 else 64
    sf = make_synthetic_frame(
        rng, width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc, n_patches=4,
    )
    cfg = make_config(
        width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc,
    )
    _, tiled = tiled_inputs(sf, res)
    p1, c1, n1 = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    p2, c2, n2 = reconstruct_batch_pretiled(
        *tiled, cfg=replace(cfg, raw_gather=True)
    )
    n1, n2 = int(n1[0]), int(n2[0])
    assert n1 == n2 and n1 > 0
    np.testing.assert_array_equal(np.asarray(p1)[0][:n1], np.asarray(p2)[0][:n1])
    np.testing.assert_array_equal(np.asarray(c1)[0][:n1], np.asarray(c2)[0][:n1])


def test_raw_gather_with_swap_orientation_and_bucketing():
    """raw_gather composes with SWAP-family orientations (emission-rank
    sort reorder) and a bucketed group axis."""
    from dataclasses import replace as dreplace

    from tpu_vpcc.atlas.groups import bucket_group_count, build_group_table
    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.v3c.syntax import PatchOrientation

    p0 = Patch(uv0=(0, 0), size_uv0=(2, 2), uv1=(8, 16),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.SWAP)
    p0.set_view_id(0)
    p0.d1 = 50
    p0.size_d = 255
    p1 = Patch(uv0=(3, 3), size_uv0=(2, 1), uv1=(4, 4),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.DEFAULT)
    p1.set_view_id(2)
    p1.d1 = 10
    p1.size_d = 255
    rng = np.random.default_rng(9)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
        patches=[dreplace(p0), dreplace(p1)],
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 8)
    gt = build_group_table(sf.meta)
    b = bucket_group_count(gt.n_groups, cfg.g_cap, min_bucket=1)
    sliced = (np.ascontiguousarray(tiled[0][:, :b]),) + tiled[1:]
    p1_, c1_, n1_ = reconstruct_batch_pretiled(*sliced, cfg=cfg)
    p2_, c2_, n2_ = reconstruct_batch_pretiled(
        *sliced, cfg=dreplace(cfg, raw_gather=True)
    )
    n1_, n2_ = int(n1_[0]), int(n2_[0])
    assert n1_ == n2_ and n1_ > 0
    np.testing.assert_array_equal(np.asarray(p1_)[0][:n1_], np.asarray(p2_)[0][:n1_])
    np.testing.assert_array_equal(np.asarray(c1_)[0][:n1_], np.asarray(c2_)[0][:n1_])


def cell_inputs(sf, res, prec, cell_bucket=0):
    """Cell-granular device inputs: cell table (padded) + prec-tiled planes."""
    from tpu_vpcc.atlas.groups import N_GROUP_FIELDS, build_cell_table

    ct = build_cell_table(sf.meta, sf.occ_plane, prec, occupancy_resolution=res)
    n = ct.n_groups
    cap = cell_bucket if cell_bucket else max(n, 1)
    fields = np.zeros((cap, N_GROUP_FIELDS), np.int32)
    fields[:n] = ct.fields[:n]
    geo0 = sf.geo_planes[0]
    geo1 = sf.geo_planes[1] if sf.map_count > 1 else sf.geo_planes[0]
    ay = np.stack([p[0] for p in sf.attr_planes])
    au = np.stack([p[1] for p in sf.attr_planes])
    av = np.stack([p[2] for p in sf.attr_planes])
    occ_dummy = np.zeros((1, 1, 1), np.uint8)  # unused in cell mode
    return (
        fields[None],
        occ_dummy[None],
        tile_plane(geo0, prec)[None],
        tile_plane(geo1, prec)[None],
        tile_plane(ay, prec)[None],
        tile_plane(au, prec // 2)[None],
        tile_plane(av, prec // 2)[None],
    )


@pytest.mark.parametrize("seed,res,prec,mc", [
    (0, 8, 4, 2), (1, 8, 4, 2), (3, 16, 4, 2), (4, 16, 8, 2), (5, 8, 4, 1),
])
def test_cell_groups_bit_identical(seed, res, prec, mc):
    """Cell-granular groups (occupied precision cells, G_EMITBASE ranks,
    no device occupancy input) produce the identical compacted prefix to
    the block-granular path."""
    from dataclasses import replace

    rng = np.random.default_rng(seed)
    width = 128 if res == 16 else 64
    sf = make_synthetic_frame(
        rng, width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc, n_patches=4,
    )
    cfg = make_config(
        width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc,
    )
    _, tiled = tiled_inputs(sf, res)
    p1, c1, n1 = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    cell = cell_inputs(sf, res, prec)
    p2, c2, n2 = reconstruct_batch_pretiled(
        *cell, cfg=replace(cfg, cell_groups=True)
    )
    n1, n2 = int(n1[0]), int(n2[0])
    assert n1 == n2 and n1 > 0
    np.testing.assert_array_equal(np.asarray(p1)[0][:n1], np.asarray(p2)[0][:n1])
    np.testing.assert_array_equal(np.asarray(c1)[0][:n1], np.asarray(c2)[0][:n1])


def test_cell_groups_swap_orientation():
    """Cell mode with a SWAP patch: the emission permutation (G_EMITBASE
    + swapped in-cell iotas) must reproduce patch-space raster order."""
    from dataclasses import replace as dreplace

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.v3c.syntax import PatchOrientation

    p0 = Patch(uv0=(0, 0), size_uv0=(2, 2), uv1=(8, 16),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.SWAP)
    p0.set_view_id(0)
    p0.d1 = 50
    p0.size_d = 255
    p1 = Patch(uv0=(3, 3), size_uv0=(2, 1), uv1=(4, 4),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.MROT270)
    p1.set_view_id(2)
    p1.d1 = 10
    p1.size_d = 255
    rng = np.random.default_rng(21)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
        patches=[dreplace(p0), dreplace(p1)],
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 8)
    p1_, c1_, n1_ = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    cell = cell_inputs(sf, 8, 4)
    p2_, c2_, n2_ = reconstruct_batch_pretiled(
        *cell, cfg=dreplace(cfg, cell_groups=True)
    )
    n1_, n2_ = int(n1_[0]), int(n2_[0])
    assert n1_ == n2_ and n1_ > 0
    np.testing.assert_array_equal(np.asarray(p1_)[0][:n1_], np.asarray(p2_)[0][:n1_])
    np.testing.assert_array_equal(np.asarray(c1_)[0][:n1_], np.asarray(c2_)[0][:n1_])


@pytest.mark.parametrize("seed,res,prec,mc", [(0, 8, 4, 2), (3, 16, 4, 2)])
def test_pack30_bit_identical(seed, res, prec, mc):
    """pack30 (one-u32 xyz) produces the identical compacted prefix when
    the host bound holds."""
    from dataclasses import replace

    from tpu_vpcc.atlas.groups import build_group_table, coords_fit_10bit

    rng = np.random.default_rng(seed)
    width = 128 if res == 16 else 64
    sf = make_synthetic_frame(
        rng, width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc, n_patches=4,
    )
    cfg = make_config(
        width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc,
    )
    gt = build_group_table(sf.meta)
    assert coords_fit_10bit(
        gt.fields, gt.n_groups, cfg.group_tile, cfg.geo_shift,
        cfg.absolute_d1,
    ), "fixture should satisfy the 10-bit bound"
    _, tiled = tiled_inputs(sf, res)
    p1, c1, n1 = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    p2, c2, n2 = reconstruct_batch_pretiled(
        *tiled, cfg=replace(cfg, pack30=True)
    )
    n1, n2 = int(n1[0]), int(n2[0])
    assert n1 == n2 and n1 > 0
    np.testing.assert_array_equal(np.asarray(p1)[0][:n1], np.asarray(p2)[0][:n1])
    np.testing.assert_array_equal(np.asarray(c1)[0][:n1], np.asarray(c2)[0][:n1])


def test_pack30_bound_rejects_wide_coordinates():
    """The host bound must refuse tables whose coordinates can reach
    1024 (e.g. large d1), and the pipeline then keeps the split layout."""
    from tpu_vpcc.atlas.groups import build_group_table, coords_fit_10bit
    from tpu_vpcc.atlas.patches import Patch

    p = Patch(uv0=(0, 0), size_uv0=(2, 2), uv1=(8, 16),
              occupancy_resolution=8)
    p.set_view_id(0)
    p.d1 = 900  # 900 + depth_max(255) >= 1024
    p.size_d = 255
    rng = np.random.default_rng(3)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, patches=[p],
    )
    gt = build_group_table(sf.meta)
    assert not coords_fit_10bit(gt.fields, gt.n_groups, 8, 2, True)
    # relative-D1 coding is always excluded
    assert not coords_fit_10bit(gt.fields, gt.n_groups, 8, 2, False)


def test_pipeline_enables_pack30_for_10bit_content():
    from tpu_vpcc.runtime.pipeline import _gof_frame_tables, prepare_gof
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
    from tpu_vpcc.bitio import Bitstream
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(8)
    frames = [
        make_synthetic_frame(
            rng, width=128, height=128, occupancy_resolution=16,
            occupancy_precision=4, n_patches=4, frame_index=0,
        )
    ]
    stream = build_fixture_stream(frames)
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    gof = prepare_gof(ctx)
    cfg, _ = _gof_frame_tables(gof, gof.metas)
    assert cfg.pack30


def test_pack30_with_swap_orientation():
    """pack30 composes with SWAP/MROT270 emission-rank reordering."""
    from dataclasses import replace as dreplace

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.v3c.syntax import PatchOrientation

    p0 = Patch(uv0=(0, 0), size_uv0=(2, 2), uv1=(8, 16),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.SWAP)
    p0.set_view_id(0)
    p0.d1 = 50
    p0.size_d = 255
    p1 = Patch(uv0=(3, 3), size_uv0=(2, 1), uv1=(4, 4),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.MROT270)
    p1.set_view_id(2)
    p1.d1 = 10
    p1.size_d = 255
    rng = np.random.default_rng(33)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
        patches=[dreplace(p0), dreplace(p1)],
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 8)
    a = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    b = reconstruct_batch_pretiled(*tiled, cfg=dreplace(cfg, pack30=True))
    na, nb = int(a[2][0]), int(b[2][0])
    assert na == nb and na > 0
    np.testing.assert_array_equal(np.asarray(a[0])[0][:na], np.asarray(b[0])[0][:nb])
    np.testing.assert_array_equal(np.asarray(a[1])[0][:na], np.asarray(b[1])[0][:nb])


@pytest.mark.parametrize("K", [2, 4])
def test_sort_split_bit_identical(K):
    """Split-sort (cfg.sort_split=K) produces the identical compacted
    prefix, including SWAP orientations and pack30."""
    from dataclasses import replace

    rng = np.random.default_rng(41)
    sf = make_synthetic_frame(
        rng, width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2, n_patches=5,
    )
    cfg = make_config(
        width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 16)
    assert tiled[0].shape[1] % K == 0
    for pk in (False, True):
        base = replace(cfg, pack30=pk)
        a = reconstruct_batch_pretiled(*tiled, cfg=base)
        b = reconstruct_batch_pretiled(
            *tiled, cfg=replace(base, sort_split=K)
        )
        na, nb = int(a[2][0]), int(b[2][0])
        assert na == nb and na > 0
        np.testing.assert_array_equal(
            np.asarray(a[0])[0][:na], np.asarray(b[0])[0][:nb]
        )
        np.testing.assert_array_equal(
            np.asarray(a[1])[0][:na], np.asarray(b[1])[0][:nb]
        )


@pytest.mark.parametrize("K", [2, 4])
def test_sort_split_batched_bit_identical(K):
    """The batched split-sort (one minor-axis sort over (F*K, Sk) rows,
    u16 keys — Sk <= 2^15 here) matches the per-segment split-sort and
    the single sort bit-for-bit, incl. SWAP orientations and pack30."""
    from dataclasses import replace

    rng = np.random.default_rng(47)
    sf = make_synthetic_frame(
        rng, width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2, n_patches=5,
    )
    cfg = make_config(
        width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 16)
    assert tiled[0].shape[1] % K == 0
    # Sk <= 2^15 -> the u16 key path
    assert tiled[0].shape[1] // K * cfg.slots_per_group <= (1 << 15)
    for pk in (False, True):
        base = replace(cfg, pack30=pk)
        a = reconstruct_batch_pretiled(*tiled, cfg=base)
        b = reconstruct_batch_pretiled(
            *tiled, cfg=replace(base, sort_split=K, sort_split_batched=True)
        )
        na, nb = int(a[2][0]), int(b[2][0])
        assert na == nb and na > 0
        np.testing.assert_array_equal(
            np.asarray(a[0])[0][:na], np.asarray(b[0])[0][:nb]
        )
        np.testing.assert_array_equal(
            np.asarray(a[1])[0][:na], np.asarray(b[1])[0][:nb]
        )


def test_sort_split_batched_padding_segments():
    """Zero-padding table rows (G_VALID=0, G_EMITBASE=0) in LATER
    segments underflow the batched key's seg-local subtraction; the
    masking must keep them in the invalid key half. Pad the table so
    the last two segments are pure padding."""
    from dataclasses import replace

    rng = np.random.default_rng(59)
    sf = make_synthetic_frame(
        rng, width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2, n_patches=5,
    )
    cfg = make_config(
        width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 16)
    fields = np.concatenate(
        [tiled[0], np.zeros_like(tiled[0])], axis=1
    )
    padded = (fields,) + tiled[1:]
    a = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    b = reconstruct_batch_pretiled(
        *padded, cfg=replace(cfg, sort_split=4, sort_split_batched=True)
    )
    na, nb = int(a[2][0]), int(b[2][0])
    assert na == nb and na > 0
    np.testing.assert_array_equal(
        np.asarray(a[0])[0][:na], np.asarray(b[0])[0][:nb]
    )
    np.testing.assert_array_equal(
        np.asarray(a[1])[0][:na], np.asarray(b[1])[0][:nb]
    )


def test_sort_split_batched_u32_key_and_multi_frame():
    """A segment extent above 2^15 slots exercises the batched path's
    u32 key; F=2 exercises per-(frame, segment) rows."""
    from dataclasses import replace

    rng = np.random.default_rng(53)
    sfs = [
        make_synthetic_frame(
            rng, width=256, height=256, occupancy_resolution=16,
            occupancy_precision=4, map_count=2, n_patches=4,
        )
        for _ in range(2)
    ]
    cfg = make_config(
        width=256, height=256, occupancy_resolution=16,
        occupancy_precision=4, map_count=2,
    )
    ins = [tiled_inputs(sf, 16)[1] for sf in sfs]
    batch = tuple(
        np.concatenate([ins[0][i], ins[1][i]]) for i in range(7)
    )
    K = 2
    assert batch[0].shape[1] // K * cfg.slots_per_group > (1 << 15)
    a = reconstruct_batch_pretiled(*batch, cfg=cfg)
    b = reconstruct_batch_pretiled(
        *batch, cfg=replace(cfg, sort_split=K, sort_split_batched=True)
    )
    na = np.asarray(a[2])
    nb = np.asarray(b[2])
    np.testing.assert_array_equal(na, nb)
    for f in range(2):
        np.testing.assert_array_equal(
            np.asarray(a[0])[f][: na[f]], np.asarray(b[0])[f][: nb[f]]
        )
        np.testing.assert_array_equal(
            np.asarray(a[1])[f][: na[f]], np.asarray(b[1])[f][: nb[f]]
        )


def test_sort_split_multi_frame_and_indivisible():
    """F=2 merging uses per-frame offsets; an indivisible group count
    falls back to the single sort."""
    from dataclasses import replace

    rng = np.random.default_rng(43)
    sfs = [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=3,
        )
        for _ in range(2)
    ]
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    ins = [tiled_inputs(sf, 8)[1] for sf in sfs]
    batch = tuple(np.concatenate([a[i], b[i]]) for (a, b) in [
        (ins[0], ins[1])
    ] for i in range(7))
    a = reconstruct_batch_pretiled(*batch, cfg=cfg)
    b = reconstruct_batch_pretiled(*batch, cfg=replace(cfg, sort_split=2))
    # indivisible: 64-group axis sliced to 63 -> falls back, still equal
    odd = (np.ascontiguousarray(batch[0][:, :63]),) + batch[1:]
    c = reconstruct_batch_pretiled(*odd, cfg=replace(cfg, sort_split=2))
    c_ref = reconstruct_batch_pretiled(*odd, cfg=cfg)
    for x, y in ((a, b), (c_ref, c)):
        nx = np.asarray(x[2])
        ny = np.asarray(y[2])
        np.testing.assert_array_equal(nx, ny)
        for f in range(2):
            np.testing.assert_array_equal(
                np.asarray(x[0])[f][: nx[f]], np.asarray(y[0])[f][: ny[f]]
            )
            np.testing.assert_array_equal(
                np.asarray(x[1])[f][: nx[f]], np.asarray(y[1])[f][: ny[f]]
            )


def test_choose_sort_split_policy():
    """The host policy prefers the batched variant at Sk=16384-slot
    segments, falls back to flat K=16, and keeps one sort for cell
    tables and small dispatches."""
    from tpu_vpcc.ops.tiled import choose_sort_split

    # production extent: 3072 groups x 512 slots -> Gk=32, K=96 batched
    assert choose_sort_split(3072, 512, False) == (96, True)
    # map_count=1 (256 slots/group): Gk=64
    assert choose_sort_split(2048, 256, False) == (32, True)
    # bucket not divisible by Gk=32 -> flat K=16 fallback
    assert choose_sort_split(1040, 512, False) == (16, False)
    # neither divisible -> single sort
    assert choose_sort_split(1035, 512, False) == (1, False)
    # small dispatch (below 2^19 slots) -> single sort
    assert choose_sort_split(512, 512, False) == (1, False)
    # cell tables are not emission-ordered -> single sort
    assert choose_sort_split(3072, 512, True) == (1, False)


def test_sort_split_batched_shard_offset():
    """Spatial shards run the impl on a table CHUNK whose G_EMITBASE
    values are GLOBAL row indices; the batched key must subtract the
    segment's true base read from the table, not ``k*Sk`` — a chunk
    whose segment emission range crosses a 2^15 boundary would
    otherwise wrap under the u16 key mask and mis-order the emission.
    Chunk rows [48:112): segment 0 spans slots [24576, 40960), crossing
    32768."""
    from dataclasses import replace

    from tpu_vpcc.atlas import groups as G

    rng = np.random.default_rng(61)
    sf = make_synthetic_frame(
        rng, width=256, height=256, occupancy_resolution=16,
        occupancy_precision=4, map_count=2, n_patches=24,
    )
    cfg = make_config(
        width=256, height=256, occupancy_resolution=16,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 16)
    n_live = int(tiled[0][0, :, G.G_VALID].sum())
    assert n_live >= 112, f"need a fully live chunk, got {n_live} groups"
    chunk = (np.ascontiguousarray(tiled[0][:, 48:112]),) + tiled[1:]
    a = reconstruct_batch_pretiled(*chunk, cfg=cfg)
    b = reconstruct_batch_pretiled(
        *chunk, cfg=replace(cfg, sort_split=2, sort_split_batched=True)
    )
    na, nb_ = int(a[2][0]), int(b[2][0])
    assert na == nb_ and na > 0
    np.testing.assert_array_equal(
        np.asarray(a[0])[0][:na], np.asarray(b[0])[0][:na]
    )
    np.testing.assert_array_equal(
        np.asarray(a[1])[0][:na], np.asarray(b[1])[0][:na]
    )


@pytest.mark.parametrize("split", [False, True])
def test_packed_output_matches_unpacked(split):
    """The packed dispatch (reconstruct_batch_pretiled_packed +
    _fetch_prefixes_packed) yields byte-identical compacted prefixes to
    the standard (F, S, 3) output path — pack30 on/off, split-sort
    on/off, and both the raw and the exact-yuv10 color finalization.
    This is the production single-device dispatch shape (the full-extent
    minor-dim-3 unpack never materializes on device)."""
    from dataclasses import replace

    from tpu_vpcc.ops.tiled import reconstruct_batch_pretiled_packed
    from tpu_vpcc.runtime.pipeline import (
        _convert_colors_device,
        _fetch_prefixes,
        _fetch_prefixes_packed,
    )

    rng = np.random.default_rng(53)
    sf = make_synthetic_frame(
        rng, width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2, n_patches=5,
    )
    cfg = make_config(
        width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 16)
    for pk in (False, True):
        base = replace(
            cfg, pack30=pk,
            sort_split=4 if split else 1, sort_split_batched=split,
        )
        pos, col16, cnt = reconstruct_batch_pretiled(*tiled, cfg=base)
        cnt = np.asarray(cnt)
        ops, cntp = reconstruct_batch_pretiled_packed(*tiled, cfg=base)
        np.testing.assert_array_equal(cnt, np.asarray(cntp))
        assert len(ops) == (2 if pk else 3)
        for mode in ("raw", "yuv10"):
            pa, ca = _fetch_prefixes(pos, col16, cnt, color_mode=mode)
            pb, cb = _fetch_prefixes_packed(ops, cnt, color_mode=mode)
            n = int(cnt[0])
            assert n > 0
            np.testing.assert_array_equal(pa[0][:n], pb[0][:n])
            np.testing.assert_array_equal(ca[0][:n], cb[0][:n])


def test_packed_output_rejects_wide_path():
    """Packed output outside the narrow envelope (smoothing set) is a
    dispatch bug and raises."""
    from dataclasses import replace

    from tpu_vpcc.ops.smoothing import SmoothingConfig
    from tpu_vpcc.ops.tiled import reconstruct_batch_pretiled_packed

    rng = np.random.default_rng(5)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=3,
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 8)
    with pytest.raises(ValueError, match="narrow path"):
        reconstruct_batch_pretiled_packed(
            *tiled, cfg=replace(cfg, smoothing=SmoothingConfig(8, 16, 10))
        )

@pytest.mark.parametrize("seed,res,prec,mc", [
    (0, 16, 4, 2), (3, 16, 4, 2), (5, 16, 4, 1),
])
def test_shift_compact_path_bit_identical(seed, res, prec, mc):
    """The sort-free Pallas shift-compact path (cfg.shift_compact)
    produces the identical compacted prefix to the sort path."""
    from dataclasses import replace

    rng = np.random.default_rng(seed)
    width = 128
    sf = make_synthetic_frame(
        rng, width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc, n_patches=5,
    )
    cfg = make_config(
        width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc,
    )
    _, tiled = tiled_inputs(sf, res)
    S = cfg.g_cap * cfg.slots_per_block
    from tpu_vpcc.ops.shift_compact import shift_supported
    assert shift_supported(S, 8192), S
    p1, c1, n1 = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    p2, c2, n2 = reconstruct_batch_pretiled(
        *tiled, cfg=replace(cfg, shift_compact=8192)
    )
    n1, n2 = int(n1[0]), int(n2[0])
    assert n1 == n2 and n1 > 0
    np.testing.assert_array_equal(np.asarray(p1)[0][:n1], np.asarray(p2)[0][:n1])
    np.testing.assert_array_equal(np.asarray(c1)[0][:n1], np.asarray(c2)[0][:n1])


def test_shift_compact_with_swap_orientation():
    """shift-compact composes with SWAP-family orientations: the
    gathered tiles are transposed to patch order so the elementwise
    destination cumsum sees the emission raster."""
    from dataclasses import replace as dreplace

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.v3c.syntax import PatchOrientation

    p0 = Patch(uv0=(0, 0), size_uv0=(3, 2), uv1=(8, 16),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.SWAP)
    p0.set_view_id(0)
    p0.d1 = 50
    p0.size_d = 255
    p1 = Patch(uv0=(4, 3), size_uv0=(2, 2), uv1=(4, 4),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.MROT270)
    p1.set_view_id(2)
    p1.d1 = 10
    p1.size_d = 255
    rng = np.random.default_rng(9)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
        patches=[dreplace(p0), dreplace(p1)],
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 8)
    S = cfg.g_cap * cfg.slots_per_block
    assert S == 8192
    p1_, c1_, n1_ = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    p2_, c2_, n2_ = reconstruct_batch_pretiled(
        *tiled, cfg=dreplace(cfg, shift_compact=8192)
    )
    n1_, n2_ = int(n1_[0]), int(n2_[0])
    assert n1_ == n2_ and n1_ > 0
    np.testing.assert_array_equal(
        np.asarray(p1_)[0][:n1_], np.asarray(p2_)[0][:n1_])
    np.testing.assert_array_equal(
        np.asarray(c1_)[0][:n1_], np.asarray(c2_)[0][:n1_])


def test_shift_compact_mxu_variants_bit_identical(monkeypatch):
    """The MXU data-movement formulations (matmul tile transpose +
    blockwise matmul destination cumsum — the TPU defaults) produce the
    identical compacted output through the full shift-compact dispatch,
    including SWAP-family orientations (the transpose actually fires)."""
    from dataclasses import replace as dreplace

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.v3c.syntax import PatchOrientation

    p0 = Patch(uv0=(0, 0), size_uv0=(3, 2), uv1=(8, 16),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.SWAP)
    p0.set_view_id(0)
    p0.d1 = 50
    p0.size_d = 255
    p1 = Patch(uv0=(4, 3), size_uv0=(2, 2), uv1=(4, 4),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.ROT90)
    p1.set_view_id(2)
    p1.d1 = 10
    p1.size_d = 255
    rng = np.random.default_rng(13)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
        patches=[dreplace(p0), dreplace(p1)],
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 8)
    scfg = dreplace(cfg, shift_compact=8192)
    monkeypatch.setenv("TPU_VPCC_NO_MM_TR", "1")
    monkeypatch.setenv("TPU_VPCC_NO_MM_CS", "1")
    p_ref, c_ref, n_ref = reconstruct_batch_pretiled(*tiled, cfg=scfg)
    monkeypatch.setenv("TPU_VPCC_MM_TR", "1")
    monkeypatch.setenv("TPU_VPCC_MM_CS", "1")
    monkeypatch.delenv("TPU_VPCC_NO_MM_TR")
    monkeypatch.delenv("TPU_VPCC_NO_MM_CS")
    # the env knobs are read at TRACE time; without this the second
    # call hits the jit cache (same avals, same static cfg) and the
    # test compares the reference path to itself
    import jax

    jax.clear_caches()
    p_mm, c_mm, n_mm = reconstruct_batch_pretiled(*tiled, cfg=scfg)
    n_ref, n_mm = int(n_ref[0]), int(n_mm[0])
    assert n_ref == n_mm and n_ref > 0
    np.testing.assert_array_equal(
        np.asarray(p_ref)[0][:n_ref], np.asarray(p_mm)[0][:n_ref])
    np.testing.assert_array_equal(
        np.asarray(c_ref)[0][:n_ref], np.asarray(c_mm)[0][:n_ref])


@pytest.mark.parametrize("seed,res,prec,mc", [
    (0, 8, 4, 2), (2, 8, 2, 1), (3, 16, 4, 2),
])
def test_bpack_gather_twin_bit_identical(seed, res, prec, mc):
    """_pretiled_gather_megaraw_pack (gather raw rows, then upsample +
    u32-pack at the bucket extent) returns tiles bit-identical to
    _pretiled_gather_megarow (pack at the canvas extent, then gather):
    per-tile ops commute with the row gather."""
    from tpu_vpcc.ops.tiled import (
        _pretiled_gather_megaraw_pack,
        _pretiled_gather_megarow,
    )

    rng = np.random.default_rng(seed)
    width = 128 if res == 16 else 64
    sf = make_synthetic_frame(
        rng, width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc, n_patches=4,
    )
    cfg = make_config(
        width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc,
    )
    _, tiled = tiled_inputs(sf, res)
    fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t = tiled
    import jax.numpy as jnp

    args = tuple(jnp.asarray(a) for a in tiled)
    ref = _pretiled_gather_megarow(*args, cfg)
    got = _pretiled_gather_megaraw_pack(*args, cfg)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bpack_dispatch_bit_identical(monkeypatch):
    """Full-dispatch parity across the bpack knob, including a SWAP
    orientation (the post-gather transpose runs on bpack tiles too)."""
    from dataclasses import replace as dreplace

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.v3c.syntax import PatchOrientation

    p0 = Patch(uv0=(0, 0), size_uv0=(3, 2), uv1=(8, 16),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.SWAP)
    p0.set_view_id(0)
    p0.d1 = 50
    p0.size_d = 255
    p1 = Patch(uv0=(4, 3), size_uv0=(2, 2), uv1=(4, 4),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.ROT90)
    p1.set_view_id(2)
    p1.d1 = 10
    p1.size_d = 255
    rng = np.random.default_rng(17)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
        patches=[dreplace(p0), dreplace(p1)],
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 8)
    scfg = dreplace(cfg, shift_compact=8192)
    monkeypatch.setenv("TPU_VPCC_NO_BPACK", "1")
    p_ref, c_ref, n_ref = reconstruct_batch_pretiled(*tiled, cfg=scfg)
    monkeypatch.setenv("TPU_VPCC_BPACK", "1")
    monkeypatch.delenv("TPU_VPCC_NO_BPACK")
    # the env knob is read at TRACE time (see the MXU variants test)
    import jax

    jax.clear_caches()
    p_bp, c_bp, n_bp = reconstruct_batch_pretiled(*tiled, cfg=scfg)
    n_ref, n_bp = int(n_ref[0]), int(n_bp[0])
    assert n_ref == n_bp and n_ref > 0
    np.testing.assert_array_equal(
        np.asarray(p_ref)[0][:n_ref], np.asarray(p_bp)[0][:n_ref])
    np.testing.assert_array_equal(
        np.asarray(c_ref)[0][:n_ref], np.asarray(c_bp)[0][:n_ref])


@pytest.mark.parametrize("seed,res,prec,mc", [
    (0, 8, 4, 2), (2, 8, 2, 1), (3, 16, 4, 2),
])
def test_pack_planes_host_matches_device(seed, res, prec, mc):
    """The numpy host pack emits the exact cat the device pack+concat
    produces (layout contract of the cat-mode dispatch)."""
    import jax.numpy as jnp

    from tpu_vpcc.ops.tiled import _pack_u32_planes, pack_planes_host

    rng = np.random.default_rng(seed)
    width = 128 if res == 16 else 64
    sf = make_synthetic_frame(
        rng, width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc, n_patches=4,
    )
    cfg = make_config(
        width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc,
    )
    _, tiled = tiled_inputs(sf, res)
    _, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t = tiled
    host_cat = pack_planes_host(occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg)
    planes = _pack_u32_planes(
        *(jnp.asarray(a) for a in (occ_t, geo0_t, geo1_t, ay_t, au_t, av_t)),
        cfg,
    )
    T2 = res * res
    F, nb = occ_t.shape[0], occ_t.shape[1]
    dev_cat = np.concatenate(
        [np.asarray(p).reshape(F, nb, T2) for p in planes], axis=2
    )
    assert host_cat.shape == (F, nb, 3 * T2)
    np.testing.assert_array_equal(host_cat, dev_cat)


@pytest.mark.parametrize("packed", [False, True])
def test_hostpack_dispatch_bit_identical(packed):
    """Cat-mode dispatch (fields, host-packed cat, None x 5) produces
    the identical output to the plane dispatch, including SWAP/ROT90
    orientations (the orientation fix runs on cat-gathered tiles)."""
    from dataclasses import replace as dreplace

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.ops.tiled import (
        pack_planes_host,
        reconstruct_batch_pretiled_packed,
    )
    from tpu_vpcc.v3c.syntax import PatchOrientation

    p0 = Patch(uv0=(0, 0), size_uv0=(3, 2), uv1=(8, 16),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.SWAP)
    p0.set_view_id(0)
    p0.d1 = 50
    p0.size_d = 255
    p1 = Patch(uv0=(4, 3), size_uv0=(2, 2), uv1=(4, 4),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.ROT90)
    p1.set_view_id(2)
    p1.d1 = 10
    p1.size_d = 255
    rng = np.random.default_rng(23)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
        patches=[dreplace(p0), dreplace(p1)],
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 8)
    fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t = tiled
    cat = pack_planes_host(occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg)
    scfg = dreplace(cfg, shift_compact=8192)
    entry = reconstruct_batch_pretiled_packed if packed \
        else reconstruct_batch_pretiled
    for c in (cfg, scfg):
        ref = entry(*tiled, cfg=c)
        got = entry(fields, cat, None, None, None, None, None, cfg=c)
        if packed:
            ops_r, n_r = ref
            ops_g, n_g = got
            n_r, n_g = int(n_r[0]), int(n_g[0])
            assert n_r == n_g and n_r > 0
            for a, b in zip(ops_r, ops_g):
                np.testing.assert_array_equal(
                    np.asarray(a)[0][:n_r], np.asarray(b)[0][:n_r]
                )
        else:
            p_r, c_r, n_r = ref
            p_g, c_g, n_g = got
            n_r, n_g = int(n_r[0]), int(n_g[0])
            assert n_r == n_g and n_r > 0
            np.testing.assert_array_equal(
                np.asarray(p_r)[0][:n_r], np.asarray(p_g)[0][:n_r])
            np.testing.assert_array_equal(
                np.asarray(c_r)[0][:n_r], np.asarray(c_g)[0][:n_r])


@pytest.mark.parametrize("packed", [False, True])
def test_hostorient_dispatch_bit_identical(packed):
    """Host-oriented cat (SWAP blocks transposed on the host +
    cfg.host_oriented, which drops the device transpose AND the narrow
    iota swap) matches the plane dispatch, across the sort and
    shift-compact compaction paths."""
    from dataclasses import replace as dreplace

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.ops.tiled import (
        orient_cat_host,
        pack_planes_host,
        reconstruct_batch_pretiled_packed,
    )
    from tpu_vpcc.v3c.syntax import PatchOrientation

    p0 = Patch(uv0=(0, 0), size_uv0=(3, 2), uv1=(8, 16),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.SWAP)
    p0.set_view_id(0)
    p0.d1 = 50
    p0.size_d = 255
    p1 = Patch(uv0=(4, 3), size_uv0=(2, 2), uv1=(4, 4),
               occupancy_resolution=8,
               patch_orientation=PatchOrientation.MROT90)
    p1.set_view_id(2)
    p1.d1 = 10
    p1.size_d = 255
    rng = np.random.default_rng(31)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
        patches=[dreplace(p0), dreplace(p1)],
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    _, tiled = tiled_inputs(sf, 8)
    fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t = tiled
    cat = pack_planes_host(occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg)
    cat = orient_cat_host(cat, np.asarray(fields), 8)
    entry = reconstruct_batch_pretiled_packed if packed \
        else reconstruct_batch_pretiled
    for c in (
        cfg,  # plain narrow sort
        dreplace(cfg, shift_compact=8192),  # shift-compact
        dreplace(cfg, sort_split=2, sort_split_batched=True),  # split-sort
    ):
        ref = entry(*tiled, cfg=c)
        got = entry(
            fields, cat, None, None, None, None, None,
            cfg=dreplace(c, host_oriented=True),
        )
        if packed:
            (ops_r, n_r), (ops_g, n_g) = ref, got
            n_r, n_g = int(n_r[0]), int(n_g[0])
            assert n_r == n_g and n_r > 0
            for a, b in zip(ops_r, ops_g):
                np.testing.assert_array_equal(
                    np.asarray(a)[0][:n_r], np.asarray(b)[0][:n_r]
                )
        else:
            (p_r, c_r, n_r), (p_g, c_g, n_g) = ref, got
            n_r, n_g = int(n_r[0]), int(n_g[0])
            assert n_r == n_g and n_r > 0
            np.testing.assert_array_equal(
                np.asarray(p_r)[0][:n_r], np.asarray(p_g)[0][:n_r])
            np.testing.assert_array_equal(
                np.asarray(c_r)[0][:n_r], np.asarray(c_g)[0][:n_r])


@pytest.mark.parametrize("occ_dt,attr_dt,mc,prec", [
    ("uint8", "uint16", 2, 4),
    ("uint8", "uint8", 1, 2),
    ("uint16", "uint16", 2, 2),
])
def test_native_pack_planes_matches_numpy(occ_dt, attr_dt, mc, prec):
    """The C pack (video/native/pack_planes.cc) is bit-identical to the
    numpy twin across the decoded-plane dtype combinations (u8 for
    8-bit streams, u16 for 10-bit)."""
    from tpu_vpcc.ops.tiled import pack_planes_host
    from tpu_vpcc.video.codec import native_pack_planes

    cfg = make_config(
        width=256, height=256, occupancy_resolution=16,
        occupancy_precision=prec, map_count=mc,
    )
    rng = np.random.default_rng(41)
    F, nb, res = 2, 256, 16
    rp, rc = res // prec, res >> cfg.chroma_shift
    occ = rng.integers(0, 2, (F, nb, rp, rp), dtype=occ_dt)
    geo0 = rng.integers(0, 1024, (F, nb, res, res), dtype=np.uint16)
    geo1 = rng.integers(0, 1024, (F, nb, res, res), dtype=np.uint16)
    hi = 256 if attr_dt == "uint8" else 1024
    ay = rng.integers(0, hi, (F, mc, nb, res, res), dtype=attr_dt)
    au = rng.integers(0, hi, (F, mc, nb, rc, rc), dtype=attr_dt)
    av = rng.integers(0, hi, (F, mc, nb, rc, rc), dtype=attr_dt)
    nat = native_pack_planes(occ, geo0, geo1, ay, au, av, cfg)
    if nat is None:
        pytest.skip("native bridge unavailable")
    import tpu_vpcc.video.codec as VC

    orig = VC.native_pack_planes
    VC.native_pack_planes = lambda *a: None  # force the numpy body
    try:
        ref = pack_planes_host(occ, geo0, geo1, ay, au, av, cfg)
    finally:
        VC.native_pack_planes = orig
    np.testing.assert_array_equal(nat, ref)


def test_pack_planes_swap_folded_matches_orient_pass(monkeypatch):
    """pack_planes_host(swap=mask) (the orientation fix folded into the
    pack — free in the native per-pixel loop) equals pack-then-
    orient_cat_host, through both the native and numpy implementations."""
    import tpu_vpcc.video.codec as VC
    from tpu_vpcc.ops.tiled import orient_cat_host, pack_planes_host

    cfg = make_config(
        width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2,
    )
    rng = np.random.default_rng(43)
    F, nb, res = 2, 64, 16
    occ = rng.integers(0, 2, (F, nb, 4, 4), dtype=np.uint8)
    geo0 = rng.integers(0, 1024, (F, nb, res, res), dtype=np.uint16)
    geo1 = rng.integers(0, 1024, (F, nb, res, res), dtype=np.uint16)
    ay = rng.integers(0, 1024, (F, 2, nb, res, res), dtype=np.uint16)
    au = rng.integers(0, 1024, (F, 2, nb, 8, 8), dtype=np.uint16)
    av = rng.integers(0, 1024, (F, 2, nb, 8, 8), dtype=np.uint16)
    swap = rng.integers(0, 2, (F, nb), dtype=np.uint8)
    args = (occ, geo0, geo1, ay, au, av, cfg)

    # reference: unswapped pack, then the standalone transpose pass
    # (orient_cat_host takes a fields table; transpose directly here)
    ref = pack_planes_host(*args)
    T2 = res * res
    for f in range(F):
        blk = np.nonzero(swap[f])[0]
        t = ref[f, blk].reshape(-1, 3, res, res)
        ref[f, blk] = np.ascontiguousarray(t.swapaxes(2, 3)).reshape(
            -1, 3 * T2
        )

    got_nat = VC.native_pack_planes(*args, swap=swap)
    if got_nat is None:
        pytest.skip("native bridge unavailable")
    np.testing.assert_array_equal(got_nat, ref)
    monkeypatch.setattr(VC, "native_pack_planes", lambda *a, **k: None)
    got_np = pack_planes_host(*args, swap=swap)  # numpy fallback
    np.testing.assert_array_equal(got_np, ref)


@pytest.mark.parametrize("mode", ["highest", "high", "chunk8"])
@pytest.mark.parametrize("pack30", [False, True])
def test_interleave_mm_precision_modes_bit_identical(mode, pack30,
                                                     monkeypatch):
    """All arithmetic modes of the interleave permutation matmul
    (one term per output => any input-exact representation is exact)
    produce the identical compacted output through the shift-compact
    dispatch, for both the pack30 (5-pair) and zs (6-pair) operand
    sets."""
    from dataclasses import replace as dreplace

    rng = np.random.default_rng(47)
    sf = make_synthetic_frame(
        rng, width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2, n_patches=5,
    )
    cfg = make_config(
        width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2, pack30=pack30,
    )
    _, tiled = tiled_inputs(sf, 16)
    scfg = dreplace(cfg, shift_compact=8192)
    monkeypatch.setenv("TPU_VPCC_IL_PREC", "highest")
    p_ref, c_ref, n_ref = reconstruct_batch_pretiled(*tiled, cfg=scfg)
    monkeypatch.setenv("TPU_VPCC_IL_PREC", mode)
    import jax

    jax.clear_caches()  # the env knob is read at trace time
    p_m, c_m, n_m = reconstruct_batch_pretiled(*tiled, cfg=scfg)
    n_ref, n_m = int(n_ref[0]), int(n_m[0])
    assert n_ref == n_m and n_ref > 0
    np.testing.assert_array_equal(
        np.asarray(p_ref)[0][:n_ref], np.asarray(p_m)[0][:n_ref])
    np.testing.assert_array_equal(
        np.asarray(c_ref)[0][:n_ref], np.asarray(c_m)[0][:n_ref])


def test_shift_compact_pack30_packed_out():
    """pack30 x shift_compact through the PACKED dispatch (2 operands)."""
    from dataclasses import replace

    from tpu_vpcc.ops.tiled import reconstruct_batch_pretiled_packed

    rng = np.random.default_rng(7)
    sf = make_synthetic_frame(
        rng, width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2, n_patches=5,
    )
    cfg = make_config(
        width=128, height=128, occupancy_resolution=16,
        occupancy_precision=4, map_count=2, pack30=True,
    )
    _, tiled = tiled_inputs(sf, 16)
    ops1, n1 = reconstruct_batch_pretiled_packed(*tiled, cfg=cfg)
    ops2, n2 = reconstruct_batch_pretiled_packed(
        *tiled, cfg=replace(cfg, shift_compact=8192)
    )
    assert len(ops1) == 2 and len(ops2) == 2
    n1, n2 = int(n1[0]), int(n2[0])
    assert n1 == n2 and n1 > 0
    for a, b in zip(ops1, ops2):
        np.testing.assert_array_equal(
            np.asarray(a)[0][:n1], np.asarray(b)[0][:n1]
        )
