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
