"""Bit-exactness diff tests: JAX device reconstruction vs the NumPy oracle.

Every configuration in the rec0 envelope: one/two maps, absolute and
differential D1, default/swap orientations, varying block sizes and
occupancy precisions.
"""

import numpy as np
import pytest

from tpu_vpcc.atlas.groups import build_group_table
from tpu_vpcc.ops.reconstruct import make_config, reconstruct_batch, reconstruct_frame
from tpu_vpcc.reconstruction.oracle import (
    GeneratePointCloudParams,
    generate_block_to_patch,
    generate_point_cloud,
)
from tpu_vpcc.utils.synthetic import make_synthetic_frame


def frame_inputs(sf):
    gt = build_group_table(sf.meta)
    geo0 = sf.geo_planes[0]
    geo1 = sf.geo_planes[1] if sf.map_count > 1 else sf.geo_planes[0]
    attr_y = np.stack([p[0] for p in sf.attr_planes])
    attr_u = np.stack([p[1] for p in sf.attr_planes])
    attr_v = np.stack([p[2] for p in sf.attr_planes])
    return gt, (gt.fields, sf.occ_plane, geo0, geo1, attr_y, attr_u, attr_v)


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
    gt, inputs = frame_inputs(sf)
    cfg = make_config(
        width=sf.meta.width,
        height=sf.meta.height,
        occupancy_resolution=sf.occupancy_resolution,
        occupancy_precision=sf.occupancy_precision,
        map_count=sf.map_count,
        absolute_d1=absolute_d1,
    )
    positions, colors16, count = reconstruct_frame(*inputs, cfg=cfg)
    count = int(count)
    return ps, np.asarray(positions)[:count], np.asarray(colors16)[:count], count


def test_host_owner_matches_oracle_on_emitting_blocks():
    """Host block-to-patch equals the reference map wherever points emit."""
    rng = np.random.default_rng(9)
    sf = make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                              occupancy_precision=4, n_patches=4)
    gt = build_group_table(sf.meta)
    oracle_btp = generate_block_to_patch(
        sf.meta, sf.occ_plane, sf.occupancy_resolution, sf.occupancy_precision
    ).reshape(gt.block_to_patch.shape)
    # oracle zeroes blocks without occupancy; host keeps the covering patch.
    emitting = oracle_btp > 0
    np.testing.assert_array_equal(
        gt.block_to_patch[emitting], oracle_btp[emitting]
    )


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
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8, occupancy_precision=4,
        map_count=2,
    )
    per_frame = [frame_inputs(f)[1] for f in frames]
    batch = tuple(np.stack([pf[i] for pf in per_frame]) for i in range(7))
    bpos, bcol, bcnt = reconstruct_batch(*batch, cfg=cfg)
    for k, sf in enumerate(frames):
        ps, positions, colors16, count = run_both(sf)
        assert int(bcnt[k]) == count
        np.testing.assert_array_equal(np.asarray(bpos[k])[:count], positions)
        np.testing.assert_array_equal(np.asarray(bcol[k])[:count], colors16)


def test_vmap_batch_crosscheck_matches_flat():
    """CPU cross-check: the vmapped batch (kept for validation only — its
    TPU lowering is pathological) equals the flat batch."""
    from tpu_vpcc.ops.reconstruct import reconstruct_batch_vmap

    rng = np.random.default_rng(16)
    frames = [
        make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                             occupancy_precision=4, n_patches=3, frame_index=0)
        for _ in range(2)
    ]
    cfg = make_config(width=64, height=64, occupancy_resolution=8,
                      occupancy_precision=4, map_count=2)
    per = [frame_inputs(f)[1] for f in frames]
    batch = tuple(np.stack([p[i] for p in per]) for i in range(7))
    fpos, fcol, fcnt = reconstruct_batch(*batch, cfg=cfg)
    vpos, vcol, vcnt = reconstruct_batch_vmap(*batch, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(fcnt), np.asarray(vcnt))
    for k in range(2):
        n = int(fcnt[k])
        np.testing.assert_array_equal(np.asarray(fpos)[k, :n], np.asarray(vpos)[k, :n])
        np.testing.assert_array_equal(np.asarray(fcol)[k, :n], np.asarray(vcol)[k, :n])
