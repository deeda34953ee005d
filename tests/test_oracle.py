"""Oracle reconstruction tests: hand-computed micro-cases plus structural
properties on synthetic frames."""

import numpy as np
import pytest

from tpu_vpcc.atlas.patches import FrameMeta, Patch
from tpu_vpcc.reconstruction.oracle import (
    GeneratePointCloudParams,
    generate_block_to_patch,
    generate_point_cloud,
    upsample_occupancy,
)
from tpu_vpcc.reconstruction.pointset import convert_yuv10_to_rgb8
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.v3c.syntax import PatchOrientation


def micro_frame():
    """One 1-block patch (res 4) at block (1, 1) of a 16x16 atlas."""
    patch = Patch(
        uv0=(1, 1),
        size_uv0=(1, 1),
        uv1=(10, 20),
        d1=100,
        occupancy_resolution=4,
    )
    patch.set_view_id(0)  # axes (0,2,1), mode 0
    meta = FrameMeta(width=16, height=16, patches=[patch])
    occ = np.zeros((8, 8), dtype=np.uint8)  # precision 2
    occ[2:4, 2:4] = 1  # the patch's 4x4 pixel block fully occupied
    d0 = np.zeros((16, 16), dtype=np.uint16)
    d1 = np.zeros((16, 16), dtype=np.uint16)
    for v in range(4):
        for u in range(4):
            d0[4 + v, 4 + u] = (v * 4 + u) * 4  # depth = v*4+u after /4
            d1[4 + v, 4 + u] = (v * 4 + u + 1) * 4
    return meta, occ, [d0, d1]


def test_micro_positions_and_order():
    meta, occ, geo = micro_frame()
    params = GeneratePointCloudParams(
        occupancy_resolution=4, occupancy_precision=2, map_count_minus1=1
    )
    ps, partition, p2p = generate_point_cloud(meta, params, occ, geo)
    # 16 pixels, 2 maps, no duplicates (d1 = d0+1 everywhere)
    assert ps.point_count == 32
    assert partition == [0] * 32
    # first pixel (u=0,v=0): depth0=0 -> point (100, 10, 20) with axes (0,2,1):
    # normal=axis0, tangent=axis2, bitangent=axis1
    assert ps.positions[0].tolist() == [100, 20, 10]
    assert ps.positions[1].tolist() == [101, 20, 10]
    # emission order: (v,u) raster within the block, D0 before D1
    expected_pixels = []
    for v in range(4):
        for u in range(4):
            for i in range(2):
                expected_pixels.append((4 + u, 4 + v, i))
    assert p2p == expected_pixels


def test_micro_duplicate_suppression():
    meta, occ, geo = micro_frame()
    geo[1][:] = geo[0][:]  # D1 == D0 -> all duplicates suppressed
    params = GeneratePointCloudParams(
        occupancy_resolution=4, occupancy_precision=2, map_count_minus1=1
    )
    ps, _, p2p = generate_point_cloud(meta, params, occ, geo)
    assert ps.point_count == 16
    assert all(z == 0 for (_, _, z) in p2p)


def test_micro_single_map():
    meta, occ, geo = micro_frame()
    params = GeneratePointCloudParams(
        occupancy_resolution=4, occupancy_precision=2, map_count_minus1=0
    )
    ps, _, _ = generate_point_cloud(meta, params, occ, [geo[0]])
    assert ps.point_count == 16


def test_micro_projection_mode1():
    meta, occ, geo = micro_frame()
    patch = meta.patches[0]
    patch.set_view_id(3)  # axes (0,2,1), mode 1
    patch.d1 = 200
    params = GeneratePointCloudParams(
        occupancy_resolution=4, occupancy_precision=2, map_count_minus1=1
    )
    ps, _, _ = generate_point_cloud(meta, params, occ, geo)
    # depth 0 -> max(200,0)-0 = 200
    assert ps.positions[0][0] == 200
    # depth 1 -> 199
    assert ps.positions[1][0] == 199


def test_block_to_patch_overwrite_semantics():
    """Later patches own contested blocks (``src/codec.rs:242-244``)."""
    p1 = Patch(uv0=(0, 0), size_uv0=(2, 2), occupancy_resolution=4)
    p1.set_view_id(0)
    p2 = Patch(uv0=(1, 1), size_uv0=(1, 1), occupancy_resolution=4)
    p2.set_view_id(0)
    meta = FrameMeta(width=16, height=16, patches=[p1, p2])
    occ = np.ones((8, 8), dtype=np.uint8)
    btp = generate_block_to_patch(meta, occ, 4, 2)
    # 4x4 block grid; block (1,1) contested -> owned by patch 2
    assert btp[1 * 4 + 1] == 2
    assert btp[0] == 1


def test_swap_orientation_block_mapping():
    p = Patch(uv0=(1, 0), size_uv0=(2, 1), occupancy_resolution=4,
              patch_orientation=PatchOrientation.SWAP)
    p.set_view_id(0)
    # block transform: x = vblk + u0, y = ublk + v0
    assert p.patch_block_to_canvas_block(0, 0, 4, 4) == 0 * 4 + 1
    assert p.patch_block_to_canvas_block(1, 0, 4, 4) == 1 * 4 + 1


def test_upsample_occupancy_nearest():
    meta = FrameMeta(width=8, height=8)
    occ = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = upsample_occupancy(meta, occ, 2)
    assert up.shape == (8, 8)
    assert up[0, 0] == occ[0, 0] and up[1, 1] == occ[0, 0]
    assert up[7, 7] == occ[3, 3]


def test_yuv10_to_rgb8_reference_values():
    colors = np.array(
        [
            [512, 512, 512],  # mid grey: r=g=b=floor(512/1023*255)=127
            [0, 512, 512],
            [1023, 512, 512],
            [341, 512, 512],  # 341/1023*255: f64 rounding lands exactly on 85.0
            [500, 300, 700],
        ],
        dtype=np.uint16,
    )
    rgb = convert_yuv10_to_rgb8(colors)
    assert rgb[0].tolist() == [127, 127, 127]
    assert rgb[1].tolist() == [0, 0, 0]
    assert rgb[2].tolist() == [255, 255, 255]
    assert rgb[3].tolist() == [85, 85, 85]
    # explicit scalar recomputation of row 4
    y, u, v = 500.0, 300.0, 700.0
    r = np.floor((y + 1.57480 * (v - 512.0)) / 1023.0 * 255.0)
    g = np.floor((y - 0.18733 * (u - 512.0) - (0.46813 * (v - 512.0))) / 1023.0 * 255.0)
    b = np.floor((y + 1.85563 * (u - 512.0)) / 1023.0 * 255.0)
    assert rgb[4].tolist() == [int(np.clip(c, 0, 255)) for c in (r, g, b)]


def test_synthetic_frame_oracle_properties():
    rng = np.random.default_rng(42)
    sf = make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                              occupancy_precision=4, n_patches=3)
    params = GeneratePointCloudParams(
        occupancy_resolution=sf.occupancy_resolution,
        occupancy_precision=sf.occupancy_precision,
        map_count_minus1=sf.map_count - 1,
    )
    ps, partition, p2p = generate_point_cloud(
        sf.meta, params, sf.occ_plane, sf.geo_planes, [sf.attr_planes]
    )
    assert ps.point_count > 0
    assert len(partition) == ps.point_count == len(p2p)
    # every emitted point's pixel is occupied at video resolution
    for (x, y, _) in p2p:
        assert sf.occ_plane[y // 4, x // 4] != 0
    # colors sampled from the right map/frame
    for i, (x, y, z) in enumerate(p2p[:50]):
        planes = sf.attr_planes[z]
        assert ps.colors16bit[i, 0] == planes[0][y, x]
        assert ps.colors16bit[i, 1] == planes[1][y // 2, x // 2]
    # RGB conversion stays in range and matches the vectorized function
    ps.convert_yuv16_to_rgb8()
    assert ps.colors.shape == (ps.point_count, 3)
