"""Deterministic coverage: every reachable view id and orientation,
bit-exact across oracle, baseline, tiled, and pretiled.

Block-aligned orientations (DEFAULT/SWAP) run at resolution 8 on all
kernel variants; the rotated/mirrored orientations run at resolution 1 —
exactly where the reference's quirked transform stays in-canvas and it
decodes them successfully (``src/decoder.rs:853-867``)."""

import numpy as np
import pytest

from tpu_vpcc.atlas.groups import build_group_table
from tpu_vpcc.atlas.patches import FrameMeta, Patch
from tpu_vpcc.ops.reconstruct import make_config, reconstruct_frame
from tpu_vpcc.ops.tiled import (
    reconstruct_batch_pretiled,
    reconstruct_frame_tiled,
    tile_plane,
)
from tpu_vpcc.reconstruction.oracle import (
    GeneratePointCloudParams,
    generate_point_cloud,
)
from tpu_vpcc.v3c.syntax import PatchOrientation


def make_frame(view_id, orientation):
    res = 8
    patch = Patch(
        uv0=(1, 2),
        size_uv0=(3, 2),
        uv1=(40, 80),
        occupancy_resolution=res,
        patch_orientation=orientation,
    )
    patch.set_view_id(view_id)
    patch.d1 = 100 if patch.projection_mode == 0 else 900
    meta = FrameMeta(width=64, height=64, patches=[patch])
    rng = np.random.default_rng(view_id * 10 + int(orientation))
    occ = (rng.random((16, 16)) < 0.7).astype(np.uint8)
    d0 = rng.integers(0, 256, (64, 64)).astype(np.uint16) * 4
    d1 = np.minimum(d0 // 4 + rng.integers(0, 3, (64, 64)), 255).astype(np.uint16) * 4
    ay = rng.integers(0, 1024, (2, 64, 64)).astype(np.uint16)
    au = rng.integers(0, 1024, (2, 32, 32)).astype(np.uint16)
    av = rng.integers(0, 1024, (2, 32, 32)).astype(np.uint16)
    return meta, occ, d0, d1, ay, au, av


@pytest.mark.parametrize("view_id", range(6))
@pytest.mark.parametrize(
    "orientation", [PatchOrientation.DEFAULT, PatchOrientation.SWAP]
)
def test_all_views_and_orientations(view_id, orientation):
    meta, occ, d0, d1, ay, au, av = make_frame(view_id, orientation)
    params = GeneratePointCloudParams(
        occupancy_resolution=8, occupancy_precision=4, map_count_minus1=1
    )
    ps, _, _ = generate_point_cloud(
        meta, params, occ, [d0, d1],
        [[[ay[0], au[0], av[0]], [ay[1], au[1], av[1]]]],
    )
    gt = build_group_table(meta)
    cfg = make_config(width=64, height=64, occupancy_resolution=8,
                      occupancy_precision=4, map_count=2)
    raw = (gt.fields, occ, d0, d1, ay, au, av)
    for name, (pos, col, cnt) in {
        "baseline": reconstruct_frame(*raw, cfg=cfg),
        "tiled": reconstruct_frame_tiled(*raw, cfg=cfg),
    }.items():
        n = int(cnt)
        assert n == ps.point_count, (name, n, ps.point_count)
        np.testing.assert_array_equal(np.asarray(pos)[:n], ps.positions, err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(col)[:n], ps.colors16bit, err_msg=name
        )
    tp, tc, tn = reconstruct_batch_pretiled(
        gt.fields[None],
        tile_plane(occ, 2)[None],
        tile_plane(d0, 8)[None],
        tile_plane(d1, 8)[None],
        tile_plane(ay, 8)[None],
        tile_plane(au, 4)[None],
        tile_plane(av, 4)[None],
        cfg,
    )
    n = int(tn[0])
    assert n == ps.point_count
    np.testing.assert_array_equal(np.asarray(tp)[0][:n], ps.positions)
    np.testing.assert_array_equal(np.asarray(tc)[0][:n], ps.colors16bit)


ALL_BITSTREAM_ORIENTATIONS = [
    PatchOrientation.DEFAULT, PatchOrientation.SWAP,
    PatchOrientation.ROT90, PatchOrientation.ROT180,
    PatchOrientation.ROT270, PatchOrientation.MIRROR,
    PatchOrientation.MROT90, PatchOrientation.MROT180,
]


def test_overlapping_rotated_patch_uses_occupancy_gated_ownership():
    """A quirk-admitted ROT90 patch at res>1 overlapping a DEFAULT patch:
    the reference's ownership is occupancy-gated over the ROT90 patch's
    OWN (misaligned) pixel set, so when those pixels are unoccupied the
    DEFAULT patch keeps the block and emits. The occupancy-ignored owner
    would silently drop those points (round-3 review finding)."""
    res = 4
    p0 = Patch(uv0=(3, 1), size_uv0=(1, 1), uv1=(40, 80),
               occupancy_resolution=res,
               patch_orientation=PatchOrientation.DEFAULT)
    p0.set_view_id(0)
    p0.d1 = 100
    p1 = Patch(uv0=(2, 1), size_uv0=(2, 2), uv1=(10, 20),
               occupancy_resolution=res,
               patch_orientation=PatchOrientation.ROT90)
    p1.set_view_id(1)
    p1.d1 = 100
    meta = FrameMeta(width=16, height=16, patches=[p0, p1])

    # occupancy only inside p0's block (x 12-15, y 4-7); p1's own pixel
    # set (x 2-9, y 4-11) is fully unoccupied
    occ = np.zeros((16, 16), np.uint8)
    occ[4:8, 12:16] = 1
    rng = np.random.default_rng(9)
    d0 = rng.integers(0, 256, (16, 16)).astype(np.uint16) * 4
    d1 = np.minimum(d0 // 4 + rng.integers(0, 3, (16, 16)), 255).astype(np.uint16) * 4
    ay = rng.integers(0, 1024, (2, 16, 16)).astype(np.uint16)
    au = rng.integers(0, 1024, (2, 8, 8)).astype(np.uint16)
    av = rng.integers(0, 1024, (2, 8, 8)).astype(np.uint16)

    params = GeneratePointCloudParams(
        occupancy_resolution=res, occupancy_precision=1, map_count_minus1=1
    )
    ps, _, _ = generate_point_cloud(
        meta, params, occ, [d0, d1],
        [[[ay[0], au[0], av[0]], [ay[1], au[1], av[1]]]],
    )
    assert ps.point_count > 0, "p0's occupied block must emit in the oracle"

    # without occupancy, the hazard is detected and refused
    with pytest.raises(Exception):
        build_group_table(meta)

    gt = build_group_table(meta, occ_provider=lambda: occ, occ_precision=1)
    cfg = make_config(width=16, height=16, occupancy_resolution=res,
                      occupancy_precision=1, map_count=2)
    pos, col, cnt = reconstruct_frame(gt.fields, occ, d0, d1, ay, au, av, cfg=cfg)
    n = int(cnt)
    assert n == ps.point_count
    np.testing.assert_array_equal(np.asarray(pos)[:n], ps.positions)
    np.testing.assert_array_equal(np.asarray(col)[:n], ps.colors16bit)


def test_e2e_overlapping_rotated_patch_occupancy_gated():
    """Full-bitstream version of the ownership hazard: a ROT90 patch at
    res=16 overlapping a DEFAULT patch, with the ROT90 patch's own pixel
    set unoccupied — exercises the occ_provider plumbing through
    _gof_device_inputs (device output must equal the oracle)."""
    from tpu_vpcc.atlas.patches import Patch as P
    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.ply import format_ply
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    p0 = P(uv0=(3, 1), size_uv0=(1, 1), uv1=(40, 80),
           occupancy_resolution=16, patch_orientation=PatchOrientation.DEFAULT)
    p0.set_view_id(0)
    p0.d1 = 100
    p0.size_d = 255
    p1 = P(uv0=(2, 1), size_uv0=(2, 2), uv1=(10, 20),
           occupancy_resolution=16, patch_orientation=PatchOrientation.ROT90)
    p1.set_view_id(1)
    p1.d1 = 100
    p1.size_d = 255
    rng = np.random.default_rng(13)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=16,
        occupancy_precision=4, patches=[p0, p1],
    )
    # only p0's block (pixels x 48-63, y 16-31) is occupied; p1's own
    # quirked pixel set (x 2-33, y 16-47) is fully unoccupied
    sf.occ_plane[:] = 0
    sf.occ_plane[4:8, 12:16] = 1
    stream = build_fixture_stream([sf])

    d1 = Decoder(Params(stream, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(stream, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 1
    assert len(orc[0]) > 0, "p0's occupied block must emit"
    assert format_ply(dev[0]) == format_ply(orc[0])


def test_occupancy_gated_owner_matches_oracle_randomized():
    """The vectorized occupancy-gated ownership pass (groups.py fallback)
    and the oracle's loop-port (generate_block_to_patch) implement the
    same reference pass (codec.rs:205-250); pin them to each other on
    randomized mixed-orientation configs so they cannot silently
    diverge."""
    from tpu_vpcc.atlas.groups import _occupancy_gated_owner
    from tpu_vpcc.atlas.patches import _check_orientation_in_range
    from tpu_vpcc.reconstruction.oracle import generate_block_to_patch
    from tpu_vpcc.v3c.syntax import UnsupportedFeature

    res, W, H, prec = 4, 32, 32, 2
    bw, bh = W // res, H // res
    rng = np.random.default_rng(31)
    checked = 0
    for trial in range(40):
        patches = []
        while len(patches) < 4:
            p = Patch(
                uv0=(int(rng.integers(0, bw)), int(rng.integers(0, bh))),
                size_uv0=(int(rng.integers(1, 4)), int(rng.integers(1, 4))),
                occupancy_resolution=res,
                patch_orientation=PatchOrientation(int(rng.integers(0, 8))),
            )
            p.set_view_id(int(rng.integers(0, 6)))
            p.d1 = 100
            try:
                _check_orientation_in_range(p, W, H)
            except UnsupportedFeature:
                continue
            patches.append(p)
        meta = FrameMeta(width=W, height=H, patches=patches)
        occ = (rng.random((H // prec, W // prec)) < 0.3).astype(np.uint8)

        per_patch = []
        for p in patches:
            a, b, cxb, c, d, cyb = p.orientation_coeffs(1)
            u0g, v0g = np.meshgrid(
                np.arange(p.size_uv0[0], dtype=np.int64),
                np.arange(p.size_uv0[1], dtype=np.int64),
            )
            per_patch.append((u0g, v0g, a * u0g + b * v0g + cxb,
                              c * u0g + d * v0g + cyb))
        got = _occupancy_gated_owner(meta, per_patch, (bh, bw), occ, prec)
        want = generate_block_to_patch(meta, occ, res, prec).reshape(bh, bw)
        np.testing.assert_array_equal(got, want.astype(np.int32))
        checked += 1
    assert checked == 40


def test_randomized_mixed_orientation_overlap_device_matches_oracle():
    """Randomized frames mixing gate-admitted orientations (incl. quirked
    rotated at res>1) with OVERLAPPING footprints and random occupancy:
    gather kernel == oracle bit-exactly, including emission order, via
    the occupancy-gated ownership fallback."""
    from tpu_vpcc.atlas.patches import _check_orientation_in_range
    from tpu_vpcc.v3c.syntax import UnsupportedFeature

    res, W, H, prec = 4, 32, 32, 2
    bw, bh = W // res, H // res
    rng = np.random.default_rng(23)
    nonempty = 0
    for trial in range(12):
        patches = []
        while len(patches) < 5:
            p = Patch(
                uv0=(int(rng.integers(0, bw)), int(rng.integers(0, bh))),
                size_uv0=(int(rng.integers(1, 4)), int(rng.integers(1, 4))),
                uv1=(int(rng.integers(0, 200)), int(rng.integers(0, 200))),
                occupancy_resolution=res,
                patch_orientation=PatchOrientation(int(rng.integers(0, 8))),
            )
            p.set_view_id(int(rng.integers(0, 6)))
            p.d1 = 100 if p.projection_mode == 0 else 900
            try:
                _check_orientation_in_range(p, W, H)
            except UnsupportedFeature:
                continue
            patches.append(p)
        meta = FrameMeta(width=W, height=H, patches=patches)
        occ = (rng.random((H // prec, W // prec)) < 0.5).astype(np.uint8)
        d0 = rng.integers(0, 256, (H, W)).astype(np.uint16) * 4
        d1 = np.minimum(d0 // 4 + rng.integers(0, 3, (H, W)), 255).astype(np.uint16) * 4
        ay = rng.integers(0, 1024, (2, H, W)).astype(np.uint16)
        au = rng.integers(0, 1024, (2, H // 2, W // 2)).astype(np.uint16)
        av = rng.integers(0, 1024, (2, H // 2, W // 2)).astype(np.uint16)

        params = GeneratePointCloudParams(
            occupancy_resolution=res, occupancy_precision=prec,
            map_count_minus1=1,
        )
        ps, _, _ = generate_point_cloud(
            meta, params, occ, [d0, d1],
            [[[ay[0], au[0], av[0]], [ay[1], au[1], av[1]]]],
        )
        gt = build_group_table(meta, occ_provider=lambda: occ,
                               occ_precision=prec)
        cfg = make_config(width=W, height=H, occupancy_resolution=res,
                          occupancy_precision=prec, map_count=2)
        pos, col, cnt = reconstruct_frame(
            gt.fields, occ, d0, d1, ay, au, av, cfg=cfg
        )
        n = int(cnt)
        assert n == ps.point_count, trial
        np.testing.assert_array_equal(np.asarray(pos)[:n], ps.positions)
        np.testing.assert_array_equal(np.asarray(col)[:n], ps.colors16bit)
        nonempty += ps.point_count > 0
    assert nonempty >= 8, "most random configs should emit points"


def test_block_out_of_range_rejected_where_pixels_pass():
    """Pixel-in-range but block-out-of-range (the reference's block-level
    assert panics, decoder.rs:835): the gate must raise UnsupportedFeature
    rather than let a deep ValueError/AssertionError surface."""
    from tpu_vpcc.atlas.patches import _check_orientation_in_range
    from tpu_vpcc.v3c.syntax import UnsupportedFeature

    patch = Patch(uv0=(3, 0), size_uv0=(1, 2), occupancy_resolution=16,
                  patch_orientation=PatchOrientation.ROT90)
    # pixel x = 49 - v in [18, 49] < 64 (passes); block x = 4 - v_blk
    # reaches 4 >= bw=4 (reference panics)
    with pytest.raises(UnsupportedFeature):
        _check_orientation_in_range(patch, 64, 64)


def test_zero_size_derived_patch_decodes_as_empty():
    """Zero-size patches (reachable via inter/merge signed size deltas)
    pass the gate (the reference's loops never execute) and contribute
    zero groups; negative sizes raise (the reference's usize wraps)."""
    from tpu_vpcc.atlas.patches import _check_orientation_in_range
    from tpu_vpcc.v3c.syntax import UnsupportedFeature

    patch = Patch(uv0=(0, 0), size_uv0=(0, 2), occupancy_resolution=8,
                  patch_orientation=PatchOrientation.DEFAULT)
    _check_orientation_in_range(patch, 64, 64)  # must not raise
    meta = FrameMeta(width=64, height=64, patches=[patch])
    gt = build_group_table(meta)
    assert gt.n_groups == 0

    bad = Patch(uv0=(0, 0), size_uv0=(-1, 2), occupancy_resolution=8,
                patch_orientation=PatchOrientation.DEFAULT)
    with pytest.raises(UnsupportedFeature):
        _check_orientation_in_range(bad, 64, 64)


@pytest.mark.parametrize("orientation", ALL_BITSTREAM_ORIENTATIONS)
@pytest.mark.parametrize("view_id", [0, 4])
def test_all_orientations_res1(view_id, orientation):
    """Every bitstream-expressible orientation at resolution 1 (where the
    reference decodes them): device gather kernel == oracle, bit-exact."""
    res = 1
    patch = Patch(
        uv0=(11, 17),
        size_uv0=(5, 3),
        uv1=(40, 80),
        occupancy_resolution=res,
        patch_orientation=orientation,
    )
    patch.set_view_id(view_id)
    patch.d1 = 100 if patch.projection_mode == 0 else 900
    meta = FrameMeta(width=32, height=32, patches=[patch])
    rng = np.random.default_rng(int(orientation) * 7 + view_id)
    occ = (rng.random((32, 32)) < 0.7).astype(np.uint8)
    d0 = rng.integers(0, 256, (32, 32)).astype(np.uint16) * 4
    d1 = np.minimum(d0 // 4 + rng.integers(0, 3, (32, 32)), 255).astype(np.uint16) * 4
    ay = rng.integers(0, 1024, (2, 32, 32)).astype(np.uint16)
    au = rng.integers(0, 1024, (2, 16, 16)).astype(np.uint16)
    av = rng.integers(0, 1024, (2, 16, 16)).astype(np.uint16)

    params = GeneratePointCloudParams(
        occupancy_resolution=res, occupancy_precision=1, map_count_minus1=1
    )
    ps, _, _ = generate_point_cloud(
        meta, params, occ, [d0, d1],
        [[[ay[0], au[0], av[0]], [ay[1], au[1], av[1]]]],
    )
    assert ps.point_count > 0
    gt = build_group_table(meta)
    cfg = make_config(width=32, height=32, occupancy_resolution=res,
                      occupancy_precision=1, map_count=2)
    pos, col, cnt = reconstruct_frame(gt.fields, occ, d0, d1, ay, au, av, cfg=cfg)
    n = int(cnt)
    assert n == ps.point_count
    np.testing.assert_array_equal(np.asarray(pos)[:n], ps.positions)
    np.testing.assert_array_equal(np.asarray(col)[:n], ps.colors16bit)
