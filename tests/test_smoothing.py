"""Grid geometry smoothing: NumPy oracle vs JAX device pass, and the
SEI-driven end-to-end path (BASELINE config 4 capability; the reference
panics here, ``decoder.rs:291-293``)."""

import numpy as np
import pytest

from tpu_vpcc.ops.smoothing import SmoothingConfig, smooth_batch, smooth_slots_np

CFG = SmoothingConfig(grid_size=8, threshold=16, geometry_bitdepth_3d=10)


def random_points(rng, n, n_patches=3):
    pts = rng.integers(0, 1024, (n, 3)).astype(np.int32)
    pid = rng.integers(0, n_patches, n).astype(np.int32)
    valid = (rng.random(n) < 0.8).astype(np.int32)
    return pts, pid, valid


def test_device_matches_oracle_random():
    rng = np.random.default_rng(0)
    n = 4096
    pts, pid, valid = random_points(rng, n)
    ex, ey, ez = smooth_slots_np(pts[:, 0], pts[:, 1], pts[:, 2], valid, pid, CFG)
    gx, gy, gz = smooth_batch(
        pts[:, 0][None], pts[:, 1][None], pts[:, 2][None],
        valid[None], pid[None], CFG,
    )
    np.testing.assert_array_equal(np.asarray(gx)[0], ex)
    np.testing.assert_array_equal(np.asarray(gy)[0], ey)
    np.testing.assert_array_equal(np.asarray(gz)[0], ez)


def test_device_matches_oracle_batched_frames():
    """Frame folding: each frame gets its own grid."""
    rng = np.random.default_rng(1)
    F, n = 3, 2048
    xs = np.empty((F, n), np.int32)
    ys = np.empty((F, n), np.int32)
    zs = np.empty((F, n), np.int32)
    valid = np.empty((F, n), np.int32)
    pid = np.empty((F, n), np.int32)
    expected = []
    for f in range(F):
        pts, p, v = random_points(rng, n)
        xs[f], ys[f], zs[f] = pts[:, 0], pts[:, 1], pts[:, 2]
        valid[f], pid[f] = v, p
        expected.append(smooth_slots_np(pts[:, 0], pts[:, 1], pts[:, 2], v, p, CFG))
    gx, gy, gz = smooth_batch(xs, ys, zs, valid, pid, CFG)
    for f in range(F):
        np.testing.assert_array_equal(np.asarray(gx)[f], expected[f][0])
        np.testing.assert_array_equal(np.asarray(gy)[f], expected[f][1])
        np.testing.assert_array_equal(np.asarray(gz)[f], expected[f][2])


def test_smoothing_moves_cross_patch_boundary_points():
    """Two interleaved clusters from different patches: points far from
    the local centroid snap to it; same-patch-only neighborhoods stay."""
    # cluster A (patch 0): 16 points on z=100, cell (12,12,12), centroid
    # (102,102,100); outlier (patch 1) at (100,100,104) in cell
    # (12,12,13) — its trilinear 2x2x2 neighborhood includes A's cell.
    # Hand-derived: weights 1575 (A) / 2025 (own), blended centroid
    # (101,101,102), dist^2 = 6 >= threshold 5 -> moves there.
    a = np.array([[100 + dx, 100 + dy, 100] for dx in range(4) for dy in range(4)])
    b = np.array([[100, 100, 104]])
    pts = np.concatenate([a, b]).astype(np.int32)
    pid = np.array([0] * len(a) + [1], np.int32)
    valid = np.ones(len(pts), np.int32)
    cfg = SmoothingConfig(grid_size=8, threshold=5, geometry_bitdepth_3d=10)
    sx, sy, sz = smooth_slots_np(pts[:, 0], pts[:, 1], pts[:, 2], valid, pid, cfg)
    out = np.stack([sx, sy, sz], 1)
    assert tuple(out[len(a)]) == (101, 101, 102)
    moved = (out != pts).any(axis=1)
    # untouched points remain bit-identical (trivially, but asserts the
    # pass never perturbs non-candidates)
    assert (out[~moved] == pts[~moved]).all()


def test_smoothing_identity_when_single_patch():
    """No other-cluster neighborhood -> nothing moves."""
    rng = np.random.default_rng(2)
    pts = rng.integers(64, 512, (512, 3)).astype(np.int32)
    pid = np.zeros(512, np.int32)
    valid = np.ones(512, np.int32)
    sx, sy, sz = smooth_slots_np(pts[:, 0], pts[:, 1], pts[:, 2], valid, pid, CFG)
    np.testing.assert_array_equal(sx, pts[:, 0])
    np.testing.assert_array_equal(sy, pts[:, 1])
    np.testing.assert_array_equal(sz, pts[:, 2])


# ---------------------------------------------------------------------------
# attribute (color) smoothing
# ---------------------------------------------------------------------------

from tpu_vpcc.ops.smoothing import (  # noqa: E402
    AttrSmoothingConfig,
    smooth_colors_batch,
    smooth_colors_np,
)

ACFG = AttrSmoothingConfig(
    grid_size=8, threshold_variation=300, threshold_difference=1,
    geometry_bitdepth_3d=10,
)


def test_color_device_matches_oracle_random():
    rng = np.random.default_rng(3)
    n = 4096
    pts, pid, valid = random_points(rng, n)
    cols = rng.integers(0, 1024, (n, 3)).astype(np.int32)
    exp = smooth_colors_np(
        pts[:, 0], pts[:, 1], pts[:, 2],
        cols[:, 0], cols[:, 1], cols[:, 2], valid, pid, ACFG,
    )
    got = smooth_colors_batch(
        pts[:, 0][None], pts[:, 1][None], pts[:, 2][None],
        cols[:, 0][None], cols[:, 1][None], cols[:, 2][None],
        valid[None], pid[None], ACFG,
    )
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(np.asarray(g)[0], e)


def test_color_smoothing_replaces_outlier_in_homogeneous_region():
    # two patches interleaved in one neighborhood with near-equal luma;
    # one point's color deviates -> replaced by the blend
    rng = np.random.default_rng(4)
    a = np.array([[100 + dx, 100 + dy, 100] for dx in range(4) for dy in range(4)])
    b = np.array([[100, 100, 104]])
    pts = np.concatenate([a, b]).astype(np.int32)
    pid = np.array([0] * len(a) + [1], np.int32)
    valid = np.ones(len(pts), np.int32)
    cols = np.full((len(pts), 3), 500, np.int32)
    cols[len(a)] = (900, 500, 500)  # luma outlier
    # hand-derived: outlier hood cells have centroid lumas 500 (cluster,
    # weight 1575) and 900 (own, weight 2025) -> spread 400, blend
    # (1575*500 + 2025*900 + 1800)//3600 = 725, deviation 175
    cfg = AttrSmoothingConfig(
        grid_size=8, threshold_variation=400, threshold_difference=50,
        geometry_bitdepth_3d=10,
    )
    cy, cu, cv = smooth_colors_np(
        pts[:, 0], pts[:, 1], pts[:, 2],
        cols[:, 0], cols[:, 1], cols[:, 2], valid, pid, cfg,
    )
    assert cy[len(a)] == 725, "outlier luma should be replaced by the blend"
    # homogeneous points keep their color (deviation below the gate)
    assert (cy[: len(a)] == 500).all()
    assert (cu == 500).all() and (cv == 500).all()


# ---------------------------------------------------------------------------
# end to end through the SEI + Decoder
# ---------------------------------------------------------------------------

from tpu_vpcc.runtime.pipeline import Decoder, Params  # noqa: E402
from tpu_vpcc.utils.fixtures import build_fixture_stream  # noqa: E402
from tpu_vpcc.utils.ply import format_ply  # noqa: E402
from tpu_vpcc.utils.synthetic import make_synthetic_frame  # noqa: E402
from tpu_vpcc.video import encoder_supports  # noqa: E402

needs_encoder = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def make_sei_stream(seed=5, grid_size=8, threshold=16):
    rng = np.random.default_rng(seed)
    frames = [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, n_patches=4, frame_index=i,
        )
        for i in range(2)
    ]
    return build_fixture_stream(
        frames, geo_smoothing_sei=(grid_size, threshold)
    )


@needs_encoder
def test_e2e_geo_smoothing_device_matches_oracle():
    stream = make_sei_stream()
    d1 = Decoder(Params(stream, use_device=True, apply_geo_smoothing_type=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(stream, use_device=False, apply_geo_smoothing_type=True))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 2
    assert all(len(f) > 0 for f in dev)
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)


@needs_encoder
def test_e2e_attr_smoothing_device_matches_oracle():
    rng = np.random.default_rng(8)
    frames = [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, n_patches=4, frame_index=i,
        )
        for i in range(2)
    ]
    stream = build_fixture_stream(
        frames,
        geo_smoothing_sei=(8, 16),
        attr_smoothing_sei=(8, 255, 1),
    )
    kw = dict(apply_geo_smoothing_type=True, apply_attr_smoothing_type=True)
    d1 = Decoder(Params(stream, use_device=True, **kw))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(stream, use_device=False, **kw))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 2 and all(len(f) > 0 for f in dev)
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)
    # with maximal variation tolerance and minimal difference gate, at
    # least one color should differ from the unsmoothed decode
    d3 = Decoder(Params(stream, apply_geo_smoothing_type=True))
    d3.start()
    plain = list(d3)
    assert any(format_ply(a) != format_ply(b) for a, b in zip(dev, plain))


@needs_encoder
def test_e2e_smoothing_full_order_shift_compact(monkeypatch):
    """The wide (smoothing) path through the merge-free Pallas
    compaction (TPU_VPCC_SHIFT=1 routes tiled._compact_words to
    shift_compact_full_order; interpret mode on CPU) is byte-identical
    to the oracle decode."""
    import jax

    stream = make_sei_stream(seed=9)
    monkeypatch.setenv("TPU_VPCC_SHIFT", "1")
    jax.clear_caches()  # env knob is trace-time
    d1 = Decoder(Params(stream, use_device=True,
                        apply_geo_smoothing_type=True))
    d1.start()
    dev = list(d1)
    monkeypatch.delenv("TPU_VPCC_SHIFT")
    d2 = Decoder(Params(stream, use_device=False,
                        apply_geo_smoothing_type=True))
    d2.start()
    orc = list(d2)
    jax.clear_caches()  # do not leak knob-traced jits to other tests
    assert len(dev) == len(orc) == 2 and all(len(f) > 0 for f in dev)
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)


@needs_encoder
def test_e2e_geo_smoothing_changes_output_and_default_ignores_sei():
    stream = make_sei_stream(seed=6, threshold=1)
    on = Decoder(Params(stream, apply_geo_smoothing_type=True))
    on.start()
    smoothed = list(on)
    off = Decoder(Params(stream))  # rec0 default: SEI ignored
    off.start()
    plain = list(off)
    assert len(smoothed) == len(plain) == 2
    assert any(
        format_ply(a) != format_ply(b) for a, b in zip(smoothed, plain)
    ), "threshold=1 smoothing should move at least one point"
