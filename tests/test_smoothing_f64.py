"""The f64 TMC2-faithful smoothing oracle vs the framework's int32 spec.

The reference panics before smoothing (``decoder.rs:291-293``), so there
is no bitstream-parity constraint; the framework defines smoothing in
pure int32 for device==oracle bit-exactness (see ops/smoothing.py). These
tests quantify the divergence from TMC2 v18's f64 arithmetic and pin the
measured bounds recorded in PERFORMANCE.md: disagreement is confined to
points whose f64 squared distance straddles the SEI threshold, and when
both specs move a point the outputs differ by at most half a grid cell.
"""

import numpy as np

from tpu_vpcc.ops.smoothing import (
    AttrSmoothingConfig,
    SmoothingConfig,
    smooth_colors_f64,
    smooth_colors_np,
    smooth_slots_f64,
    smooth_slots_np,
)

CFG = SmoothingConfig(grid_size=8, threshold=16, geometry_bitdepth_3d=10)


def clustered_points(seed, n=50_000, n_clusters=300, n_patches=8):
    rng = np.random.default_rng(seed)
    centers = rng.integers(32, 992, (n_clusters, 3))
    idx = rng.integers(0, n_clusters, n)
    pts = np.clip(
        centers[idx] + rng.normal(0, 3, (n, 3)).astype(int), 0, 1023
    ).astype(np.int32)
    pid = rng.integers(0, n_patches, n).astype(np.int32)
    return pts, pid, np.ones(n, np.int32)


def test_geo_specs_agree_away_from_threshold():
    pts, pid, valid = clustered_points(0)
    A = np.stack(
        smooth_slots_np(pts[:, 0], pts[:, 1], pts[:, 2], valid, pid, CFG), 1
    )
    B = np.stack(
        smooth_slots_f64(pts[:, 0], pts[:, 1], pts[:, 2], valid, pid, CFG), 1
    )
    moved_a = (A != pts).any(1)
    moved_b = (B != pts).any(1)
    # the move gates disagree only for threshold straddlers — a small
    # fraction even on adversarially clustered data (measured ~1.2%)
    assert (moved_a != moved_b).mean() < 0.025
    # when both specs move a point, the landing spots differ by at most
    # half a grid cell per axis (two int rounding stages vs f64)
    both = moved_a & moved_b
    assert both.sum() > 100  # the comparison is non-vacuous
    assert np.abs(A[both].astype(int) - B[both].astype(int)).max() <= CFG.grid_size // 2
    # untouched points are bit-identical in both specs
    neither = ~moved_a & ~moved_b
    np.testing.assert_array_equal(A[neither], pts[neither])
    np.testing.assert_array_equal(B[neither], pts[neither])


def test_geo_gate_mismatches_are_threshold_straddlers():
    """Every gate disagreement lies in a narrow f64-dist² window around
    the SEI threshold (the int32 dist² carries a small positive rounding
    bias, measured +0.33 mean)."""
    pts, pid, valid = clustered_points(1)
    A = np.stack(
        smooth_slots_np(pts[:, 0], pts[:, 1], pts[:, 2], valid, pid, CFG), 1
    )
    B = np.stack(
        smooth_slots_f64(pts[:, 0], pts[:, 1], pts[:, 2], valid, pid, CFG), 1
    )
    moved_a = (A != pts).any(1)
    moved_b = (B != pts).any(1)
    mism = moved_a != moved_b
    # f64-moved points land on their blended centroid: recover dist² for
    # the f64-only movers directly from the displacement
    f64_only = mism & moved_b
    d2 = ((B[f64_only].astype(float) - pts[f64_only]) ** 2).sum(1)
    # rounded landing spot -> up to ±0.5/axis from the true centroid,
    # i.e. the recovered dist² can exceed the true one by ~2·0.87·√d2
    assert d2.size and (d2 >= CFG.threshold - 4).all()
    assert (d2 <= CFG.threshold + 12).all()


def test_color_f64_blend_matches_hand_case():
    # same hand-derived neighborhood as test_smoothing.py: the f64 blend
    # (1575*500 + 2025*900) / 3600 = 725.0 exactly — both specs agree
    a = np.array([[100 + dx, 100 + dy, 100] for dx in range(4) for dy in range(4)])
    b = np.array([[100, 100, 104]])
    pts = np.concatenate([a, b]).astype(np.int32)
    pid = np.array([0] * len(a) + [1], np.int32)
    valid = np.ones(len(pts), np.int32)
    cols = np.full((len(pts), 3), 500, np.int32)
    cols[len(a)] = (900, 500, 500)
    cfg = AttrSmoothingConfig(
        grid_size=8, threshold_variation=400, threshold_difference=50,
        geometry_bitdepth_3d=10,
    )
    ci = smooth_colors_np(
        pts[:, 0], pts[:, 1], pts[:, 2],
        cols[:, 0], cols[:, 1], cols[:, 2], valid, pid, cfg,
    )
    cf = smooth_colors_f64(
        pts[:, 0], pts[:, 1], pts[:, 2],
        cols[:, 0], cols[:, 1], cols[:, 2], valid, pid, cfg,
    )
    assert ci[0][len(a)] == cf[0][len(a)] == 725
    np.testing.assert_array_equal(np.stack(ci, 1), np.stack(cf, 1))


def test_fixture_decode_divergence_negligible():
    """On a realistic reconstructed frame the two specs are near
    identical: <0.2% of positions differ, D1 PSNR ≥ 80 dB."""
    from tpu_vpcc.reconstruction.oracle import (
        GeneratePointCloudParams,
        generate_point_cloud,
    )
    from tpu_vpcc.reconstruction.pointset import PointSet3
    from tpu_vpcc.utils.metrics import d1_metric
    from tpu_vpcc.utils.synthetic import make_synthetic_frame

    rng = np.random.default_rng(5)
    diverged = 0
    for _ in range(3):
        sf = make_synthetic_frame(
            rng, width=128, height=128, occupancy_resolution=8,
            occupancy_precision=4, n_patches=6, frame_index=0,
        )
        params = GeneratePointCloudParams(
            occupancy_resolution=sf.occupancy_resolution,
            occupancy_precision=sf.occupancy_precision,
            map_count_minus1=sf.map_count - 1,
        )
        ps, partition, _ = generate_point_cloud(
            sf.meta, params, sf.occ_plane, sf.geo_planes, [sf.attr_planes]
        )
        pos = ps.positions.astype(np.int32)
        v = np.ones(len(ps), np.int32)
        pid = np.asarray(partition, np.int32)
        A = np.stack(smooth_slots_np(pos[:, 0], pos[:, 1], pos[:, 2], v, pid, CFG), 1)
        B = np.stack(smooth_slots_f64(pos[:, 0], pos[:, 1], pos[:, 2], v, pid, CFG), 1)
        frac = (A != B).any(1).mean()
        assert frac < 0.002
        diverged += (A != B).any(1).sum()
        pa = PointSet3(positions=A.astype(np.uint16))
        pb = PointSet3(positions=B.astype(np.uint16))
        m = d1_metric(pa, pb)
        assert m.psnr >= 80.0
    assert diverged > 0, "comparison must exercise at least one divergence"
