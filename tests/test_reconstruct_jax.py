"""Bit-exactness diff tests: JAX device reconstruction vs the NumPy oracle.

Every configuration in the rec0 envelope: one/two maps, absolute and
differential D1, default/swap orientations, varying block sizes and
occupancy precisions.
"""

import numpy as np
import pytest

from tpu_vpcc.atlas.soa import build_patch_soa
from tpu_vpcc.ops.reconstruct import make_config, reconstruct_batch, reconstruct_frame
from tpu_vpcc.reconstruction.oracle import (
    GeneratePointCloudParams,
    generate_point_cloud,
)
from tpu_vpcc.utils.synthetic import make_synthetic_frame


def run_both(sf, absolute_d1=True):
    params = GeneratePointCloudParams(
        occupancy_resolution=sf.occupancy_resolution,
        occupancy_precision=sf.occupancy_precision,
        map_count_minus1=sf.map_count - 1,
        absolute_d1=absolute_d1,
    )
    ps, partition, p2p = generate_point_cloud(
        sf.meta, params, sf.occ_plane, sf.geo_planes, [sf.attr_planes]
    )

    soa = build_patch_soa(sf.meta)
    cfg = make_config(
        width=sf.meta.width,
        height=sf.meta.height,
        occupancy_resolution=sf.occupancy_resolution,
        occupancy_precision=sf.occupancy_precision,
        p_max=soa.p_max,
        map_count=sf.map_count,
        absolute_d1=absolute_d1,
    )
    assert soa.total_slots <= cfg.s_cap
    geo0 = sf.geo_planes[0]
    geo1 = sf.geo_planes[1] if sf.map_count > 1 else sf.geo_planes[0]
    attr_y = np.stack([p[0] for p in sf.attr_planes])
    attr_u = np.stack([p[1] for p in sf.attr_planes])
    attr_v = np.stack([p[2] for p in sf.attr_planes])
    positions, colors16, count = reconstruct_frame(
        soa.as_stack(),
        soa.slot_offset,
        np.int32(soa.total_slots),
        sf.occ_plane,
        geo0,
        geo1,
        attr_y,
        attr_u,
        attr_v,
        cfg,
    )
    count = int(count)
    return ps, np.asarray(positions)[:count], np.asarray(colors16)[:count], count


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_jax_matches_oracle_two_maps(seed):
    rng = np.random.default_rng(seed)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8, occupancy_precision=4,
        n_patches=4,
    )
    ps, positions, colors16, count = run_both(sf)
    assert count == ps.point_count
    np.testing.assert_array_equal(positions, ps.positions)
    np.testing.assert_array_equal(colors16, ps.colors16bit)


def test_jax_matches_oracle_single_map():
    rng = np.random.default_rng(10)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8, occupancy_precision=2,
        map_count=1, n_patches=3,
    )
    ps, positions, colors16, count = run_both(sf)
    assert count == ps.point_count
    np.testing.assert_array_equal(positions, ps.positions)
    np.testing.assert_array_equal(colors16, ps.colors16bit)


def test_jax_matches_oracle_differential_d1():
    rng = np.random.default_rng(11)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8, occupancy_precision=4,
        n_patches=4,
    )
    ps, positions, colors16, count = run_both(sf, absolute_d1=False)
    assert count == ps.point_count
    np.testing.assert_array_equal(positions, ps.positions)
    np.testing.assert_array_equal(colors16, ps.colors16bit)


def test_jax_matches_oracle_res16_prec4():
    rng = np.random.default_rng(12)
    sf = make_synthetic_frame(
        rng, width=128, height=128, occupancy_resolution=16, occupancy_precision=4,
        n_patches=5,
    )
    ps, positions, colors16, count = run_both(sf)
    assert count == ps.point_count
    np.testing.assert_array_equal(positions, ps.positions)
    np.testing.assert_array_equal(colors16, ps.colors16bit)


def test_jax_matches_oracle_sparse_occupancy():
    rng = np.random.default_rng(13)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8, occupancy_precision=4,
        n_patches=3, occupancy_fill=0.15,
    )
    ps, positions, colors16, count = run_both(sf)
    assert count == ps.point_count
    np.testing.assert_array_equal(positions, ps.positions)


def test_jax_empty_frame():
    rng = np.random.default_rng(14)
    sf = make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                              occupancy_precision=4, n_patches=3)
    sf.occ_plane[:] = 0
    ps, positions, colors16, count = run_both(sf)
    assert count == 0 == ps.point_count


def test_batched_reconstruction_matches_per_frame():
    rng = np.random.default_rng(15)
    frames = [
        make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                             occupancy_precision=4, n_patches=3, frame_index=0)
        for _ in range(3)
    ]
    soas = [build_patch_soa(f.meta, p_max=8) for f in frames]
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8, occupancy_precision=4,
        p_max=8, map_count=2,
    )
    fields = np.stack([s.as_stack() for s in soas])
    offsets = np.stack([s.slot_offset for s in soas])
    totals = np.array([s.total_slots for s in soas], dtype=np.int32)
    occ = np.stack([f.occ_plane for f in frames])
    geo0 = np.stack([f.geo_planes[0] for f in frames])
    geo1 = np.stack([f.geo_planes[1] for f in frames])
    ay = np.stack([np.stack([p[0] for p in f.attr_planes]) for f in frames])
    au = np.stack([np.stack([p[1] for p in f.attr_planes]) for f in frames])
    av = np.stack([np.stack([p[2] for p in f.attr_planes]) for f in frames])
    bpos, bcol, bcnt = reconstruct_batch(
        fields, offsets, totals, occ, geo0, geo1, ay, au, av, cfg
    )
    for k, sf in enumerate(frames):
        ps, positions, colors16, count = run_both(sf)
        assert int(bcnt[k]) == count
        np.testing.assert_array_equal(np.asarray(bpos[k])[:count], positions)
        np.testing.assert_array_equal(np.asarray(bcol[k])[:count], colors16)
