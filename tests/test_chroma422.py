"""4:2:2 attribute decode (framework extension).

The reference rejects any chroma format but 4:2:0/4:4:4; this framework
column-doubles the half-width 4:2:2 chroma to 4:4:4 on the host —
bit-exact with the ``x >> 1`` sampling the decode would otherwise do —
so everything downstream runs the existing 4:4:4 machinery.

Contract exploited by the tests: row-doubling a 4:2:0 scene's chroma
yields a 4:2:2 stream whose decode must be BYTE-IDENTICAL to the
4:2:0-coded stream's (both sample chroma at (y >> 1, x >> 1))."""

import numpy as np
import pytest

from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.video import encoder_supports
from tpu_vpcc.video.codec import VideoEncodeError, encode_yuv420


def _supports_422():
    try:
        encode_yuv420(
            [[np.zeros((64, 64), np.uint16), np.zeros((64, 32), np.uint16),
              np.zeros((64, 32), np.uint16)]],
            bit_depth=10, chroma422=True,
        )
        return True
    except (VideoEncodeError, OSError):
        return False


pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10) and _supports_422()),
    reason="libx265 lossless 8/10-bit + 4:2:2 required",
)


def decode_all(data, use_device):
    d = Decoder(Params(bytes(data), use_device=use_device))
    d.start()
    return list(d)


def make_frames(seed=9, n_frames=2):
    rng = np.random.default_rng(seed)
    return [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=3,
            frame_index=i,
        )
        for i in range(n_frames)
    ]


@pytest.mark.parametrize("use_device", [True, False])
def test_422_decode_equals_420_decode(tmp_path, use_device):
    from tpu_vpcc.utils.ply import format_ply

    frames = make_frames(seed=9)
    s420 = build_fixture_stream(frames)
    s422 = build_fixture_stream(frames, chroma422=True)
    assert s420 != s422
    got422 = decode_all(s422, use_device)
    got420 = decode_all(s420, use_device)
    assert len(got422) == len(got420) == 2
    for a, b in zip(got422, got420):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)


def test_422_device_matches_oracle(tmp_path):
    from tpu_vpcc.utils.ply import format_ply

    frames = make_frames(seed=21)
    s422 = build_fixture_stream(frames, chroma422=True)
    dev = decode_all(s422, True)
    orc = decode_all(s422, False)
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)


@pytest.mark.parametrize("use_device", [True, False])
def test_422_with_per_map_streams(tmp_path, use_device):
    """4:2:2 attributes in per-map video sub-streams: each map's
    stream column-doubles on the host and the decode equals the
    4:2:0-coded per-map twin's, byte for byte."""
    from tpu_vpcc.utils.ply import format_ply

    frames = make_frames(seed=27)
    s420 = build_fixture_stream(frames, multi_map_streams=True)
    s422 = build_fixture_stream(
        frames, multi_map_streams=True, chroma422=True
    )
    assert s420 != s422
    got422 = decode_all(s422, use_device)
    got420 = decode_all(s420, use_device)
    assert len(got422) == len(got420) == 2
    for a, b in zip(got422, got420):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)


def test_422_with_45_degree_views(tmp_path):
    """4:2:2 rides the gather path (raster planes) — combine with the
    45-degree extension to cover the rotated wide tail there too."""
    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.utils.ply import format_ply

    frames = make_frames(seed=33)
    for sf in frames:
        for p, plane in zip(sf.meta.patches, (1, 2, 3)):
            views = [
                v for v, r in Patch._VIEW_TABLE.items()
                if r[0] == plane and r[4] == p.projection_mode
            ]
            p.set_view_id(views[0])
    s422 = build_fixture_stream(frames, chroma422=True)
    dev = decode_all(s422, True)
    orc = decode_all(s422, False)
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)
