"""Native video codec bridge tests: lossless encode/decode roundtrips and
the sample-stream ↔ Annex-B framing conversions."""

import numpy as np
import pytest

from tpu_vpcc.v3c.writer import annexb_to_length_prefixed
from tpu_vpcc.video import (
    decode_annexb,
    decompress_video,
    encode_yuv420,
    encoder_supports,
    sample_stream_to_bytestream,
)


def _random_frames(rng, n, h, w, bit_depth):
    hi = 1 << bit_depth
    dtype = np.uint16 if bit_depth > 8 else np.uint8
    frames = []
    for _ in range(n):
        frames.append(
            [
                rng.integers(0, hi, (h, w)).astype(dtype),
                rng.integers(0, hi, (h // 2, w // 2)).astype(dtype),
                rng.integers(0, hi, (h // 2, w // 2)).astype(dtype),
            ]
        )
    return frames


@pytest.mark.parametrize("bit_depth", [8, 10])
def test_lossless_roundtrip(bit_depth):
    if not encoder_supports(bit_depth):
        pytest.skip(f"libx265 lacks {bit_depth}-bit support")
    rng = np.random.default_rng(bit_depth)
    frames = _random_frames(rng, 4, 64, 96, bit_depth)
    bs = encode_yuv420(frames, bit_depth=bit_depth, lossless=True)
    dec = decode_annexb(bs)
    assert len(dec) == 4
    assert dec[0].bit_depth == bit_depth
    for f_in, f_out in zip(frames, dec):
        for p_in, p_out in zip(f_in, f_out.planes):
            assert np.array_equal(p_in, p_out)


def test_sample_stream_bytestream_roundtrip():
    """Annex-B → length-prefixed → Annex-B recovers packet boundaries."""
    if not encoder_supports(8):
        pytest.skip("libx265 unavailable")
    rng = np.random.default_rng(7)
    frames = _random_frames(rng, 3, 64, 64, 8)
    annexb = encode_yuv420(frames, bit_depth=8, lossless=True)
    sample = annexb_to_length_prefixed(annexb)
    rebuilt = sample_stream_to_bytestream(sample, codec_id=1)
    # The converter may choose 3-byte start codes where the encoder used
    # 4-byte ones (and vice versa); the decoded frames must be identical.
    dec = decode_annexb(rebuilt)
    assert len(dec) == 3
    for f_in, f_out in zip(frames, dec):
        for p_in, p_out in zip(f_in, f_out.planes):
            assert np.array_equal(p_in, p_out)


def test_decompress_video_end_to_end():
    if not encoder_supports(10):
        pytest.skip("libx265 lacks 10-bit support")
    rng = np.random.default_rng(3)
    frames = _random_frames(rng, 2, 64, 64, 10)
    annexb = encode_yuv420(frames, bit_depth=10, lossless=True)
    payload = annexb_to_length_prefixed(annexb)
    dec = decompress_video(payload, codec_id=1)
    assert len(dec) == 2
    for f_in, f_out in zip(frames, dec):
        assert np.array_equal(f_in[0], f_out.planes[0])
