"""Randomized differential sweep: production kernel vs the NumPy oracle.

A broad net over the configuration space the round-4 kernel rewrites
touch (bucketing, megarow gather, concat emission, pack30, orientation
mix, map count, precision): every sampled frame decodes bit-identically
through the device dispatch path and the scalar oracle. Complements the
targeted per-feature tests with volume.
"""

import numpy as np
import pytest

from tpu_vpcc.reconstruction.oracle import (
    GeneratePointCloudParams,
    generate_point_cloud,
)
from tpu_vpcc.utils.synthetic import make_synthetic_frame


def _oracle_points(sf):
    params = GeneratePointCloudParams(
        occupancy_resolution=sf.occupancy_resolution,
        occupancy_precision=sf.occupancy_precision,
        absolute_d1=True,
        map_count_minus1=sf.map_count - 1,
    )
    ps, _, _ = generate_point_cloud(
        sf.meta, params, sf.occ_plane, sf.geo_planes, [sf.attr_planes]
    )
    return ps


def _run_trial(seed):
    rng = np.random.default_rng(seed)
    res = int(rng.choice([8, 16]))
    prec = int(rng.choice([2, 4]))
    if res % prec:
        prec = 2
    mc = int(rng.choice([1, 2, 3]))  # 3: trailing-layer pass engaged
    width = int(rng.choice([64, 128]))
    n_patches = int(rng.integers(2, 7))
    sf = make_synthetic_frame(
        rng, width=width, height=width, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc, n_patches=n_patches,
        occupancy_fill=float(rng.uniform(0.3, 0.95)),
    )

    # device path through the REAL dispatch machinery (bucketing, cell/
    # pack30 gates, plane tiling) via a minimal GofData stand-in
    from tpu_vpcc.runtime.pipeline import GofData

    gof = GofData(
        metas=[sf.meta],
        occ_planes=sf.occ_plane[None],
        geo_planes=list(sf.geo_planes[: max(mc, 1)]),
        attr_planes=[[p[0], p[1], p[2]] for p in sf.attr_planes],
        map_count=mc,
        occupancy_precision=prec,
        occupancy_resolution=res,
        absolute_d1=True,
        geo_shift=2,  # 10-bit synthetic planes, reference /4 convention
        attribute_count=1,
        frame_count=1,
    )
    # through the full GOF driver (it owns chunking AND the >2-map
    # trailing-layer decomposition), not just one raw dispatch
    from tpu_vpcc.runtime.pipeline import _reconstruct_gof_device

    (ps_dev,) = list(_reconstruct_gof_device(gof))

    ps = _oracle_points(sf)
    assert len(ps) == len(ps_dev), (
        f"count mismatch: device {len(ps_dev)} oracle {len(ps)} "
        f"(res={res} prec={prec} mc={mc} n={n_patches})"
    )
    np.testing.assert_array_equal(ps_dev.positions, ps.positions)
    # the dispatch finalizes colors on device (exact integer BT.709 ->
    # u8 RGB); run the oracle's f64 reference conversion to compare
    ps.convert_yuv16_to_rgb8()
    np.testing.assert_array_equal(ps_dev.colors, ps.colors)


@pytest.mark.parametrize("trial", range(12))
def test_random_frames_device_equals_oracle(trial):
    _run_trial(1000 + trial)


@pytest.mark.parametrize("trial", range(6))
def test_random_frames_hostpack_equals_oracle(trial, monkeypatch):
    """The same randomized sweep through the HOST-PACKED, HOST-ORIENTED
    cat-mode dispatch (the TPU production default; opt-in on CPU)."""
    monkeypatch.setenv("TPU_VPCC_HOSTPACK", "1")
    monkeypatch.setenv("TPU_VPCC_HOSTORIENT", "1")
    _run_trial(2000 + trial)
