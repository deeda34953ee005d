"""Occupancy synthesis / PBF (framework extension).

The reference can neither parse the SEI (``reader.rs:1402-1412``) nor
act on it (``decoder.rs:240-242`` unimplemented); the filter definition
lives in ``reconstruction/occupancy_synthesis.py``: border pixels whose
depth is farther than the threshold from EVERY occupied window-mate
are cleared, pass by pass.

E2E contract: a stream with one planted depth outlier at a patch
border, decoded with the toggle + SEI, must equal the decode of a twin
stream whose occupancy simply omits that pixel."""

import copy

import numpy as np
import pytest

from tpu_vpcc.reconstruction.occupancy_synthesis import (
    OccupancySynthesisConfig,
    synthesize_occupancy,
)
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def test_filter_clears_exactly_the_unsupported_border_outlier():
    occ = np.zeros((8, 8), np.uint8)
    occ[2:6, 2:6] = 1
    d0 = np.full((8, 8), 100 << 2, np.uint16)
    d0[2, 2] = (100 + 50) << 2  # corner outlier, 50 > threshold
    d0[4, 4] = (100 + 50) << 2  # INTERIOR outlier: borders only
    # (kept outside the corner's radius-1 window — a same-valued mate
    # would otherwise support it)
    cfg = OccupancySynthesisConfig(threshold=4, passes=1, radius=1)
    out = synthesize_occupancy(occ, 1, d0, 2, cfg)
    exp = occ.copy()
    exp[2, 2] = 0
    np.testing.assert_array_equal(out, exp)


def test_filter_passes_propagate_inward():
    """An interior outlier is protected in pass 1 (borders only) but
    becomes a border pixel once its outlier neighbour is cleared — the
    second pass reaches it."""
    occ = np.zeros((8, 8), np.uint8)
    occ[2:6, 2:6] = 1
    d0 = np.full((8, 8), 100 << 2, np.uint16)
    d0[2, 3] = 180 << 2  # border outlier (devs 80/80/70 > 64)
    d0[3, 3] = 250 << 2  # INTERIOR outlier, 70 from its north neighbour
    one = synthesize_occupancy(
        occ, 1, d0, 2, OccupancySynthesisConfig(64, 1, 1)
    )
    two = synthesize_occupancy(
        occ, 1, d0, 2, OccupancySynthesisConfig(64, 2, 1)
    )
    assert one[2, 3] == 0 and one[3, 3] == 1
    assert two[2, 3] == 0 and two[3, 3] == 0
    assert two[2:6, 2:6].sum() == 14  # nothing else cleared


def test_filter_keeps_isolated_pixels_and_upsamples_precision():
    occ = np.zeros((4, 4), np.uint8)
    occ[1, 1] = 1  # precision-2 cell -> 2x2 canvas pixels
    d0 = np.full((8, 8), 10 << 2, np.uint16)
    out = synthesize_occupancy(
        occ, 2, d0, 2, OccupancySynthesisConfig(2, 2, 1)
    )
    assert out.shape == (8, 8)
    assert out[2:4, 2:4].all() and out.sum() == 4


def make_smooth_frame(seed, d_base=100):
    """Precision-1 frame with CONSTANT patch depths (random depth would
    make every border pixel an outlier)."""
    rng = np.random.default_rng(seed)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=1, map_count=2, n_patches=2, frame_index=0,
        allow_swap=False,
    )
    occ = sf.occ_plane > 0
    sf.geo_planes[0] = np.where(
        occ, np.uint16(d_base << 2), sf.geo_planes[0]
    ).astype(np.uint16)
    sf.geo_planes[1] = np.where(
        occ, np.uint16((d_base + 1) << 2), sf.geo_planes[1]
    ).astype(np.uint16)
    return sf


def find_border_pixel(sf):
    occ = sf.occ_plane > 0
    H, W = occ.shape
    for y in range(H):
        for x in range(W):
            if not occ[y, x]:
                continue
            nbs = [
                occ[yy, xx]
                for yy, xx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1))
                if 0 <= yy < H and 0 <= xx < W
            ]
            if len(nbs) < 4 or not all(nbs):
                return y, x
    raise AssertionError("no border pixel")


@pytest.mark.parametrize("use_device", [True, False])
def test_e2e_outlier_border_point_dropped(tmp_path, use_device):
    from tpu_vpcc.utils.ply import format_ply

    sf = make_smooth_frame(seed=3)
    y, x = find_border_pixel(sf)
    sf.geo_planes[0][y, x] = np.uint16((100 + 40) << 2)  # 40 > thr 4

    twin = copy.deepcopy(sf)
    twin.occ_plane[y, x] = 0

    # SEI instance: log2_threshold_minus1=1 (thr 4), passes_minus1=0,
    # filter_size_minus1=0 (radius 1)
    stream = build_fixture_stream([sf], occ_synthesis_sei=(1, 0, 0))
    stream_twin = build_fixture_stream([twin])

    def run(data, synth):
        d = Decoder(Params(
            bytes(data), use_device=use_device,
            apply_occupancy_synthesis_type=synth,
        ))
        d.start()
        return list(d)

    (got,) = run(stream, True)
    (exp,) = run(stream_twin, False)
    assert len(got) == len(exp) > 0
    assert format_ply(got) == format_ply(exp)

    # toggle off: the SEI is advisory — the outlier point survives
    (plain,) = run(stream, False)
    assert len(plain) == len(got) + 2  # D0 + D1 points of the pixel


def test_e2e_device_matches_oracle_with_synthesis(tmp_path):
    from tpu_vpcc.utils.ply import format_ply

    sf = make_smooth_frame(seed=9)
    y, x = find_border_pixel(sf)
    sf.geo_planes[0][y, x] = np.uint16(200 << 2)
    stream = build_fixture_stream([sf], occ_synthesis_sei=(1, 0, 1))

    def run(use_device):
        d = Decoder(Params(
            bytes(stream), use_device=use_device,
            apply_occupancy_synthesis_type=True,
        ))
        d.start()
        return list(d)

    dev, orc = run(True), run(False)
    assert len(dev[0]) == len(orc[0]) > 0
    assert format_ply(dev[0]) == format_ply(orc[0])
