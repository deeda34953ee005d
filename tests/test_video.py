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


def test_decoder_threading_configuration():
    """The native bridge requests frame+slice threading with auto thread
    count; assert the configuration the decoder actually resolved. On a
    multi-core host libavcodec engages frame threading (active type bit
    1); this container has 1 core, where 1 thread / no threading is the
    correct resolution — the assert adapts so the test is meaningful on
    both."""
    import os

    from tpu_vpcc.video.codec import decoder_thread_info

    count, active = decoder_thread_info(1)
    assert count >= 1
    if (os.cpu_count() or 1) > 1:
        # FF_THREAD_FRAME = 1: frame threads scale across cores
        assert count > 1, "auto thread count should resolve to > 1 core"
        assert active & 1, "frame threading should be active for HEVC"
    else:
        assert count == 1
    # explicit request: asserts the FF_THREAD_FRAME configuration
    # regardless of host core count (the meaningful property on this
    # 1-core container)
    count4, active4 = decoder_thread_info(1, threads=4)
    assert count4 == 4
    assert active4 & 1, "frame threading must engage with 4 threads"


def test_concurrent_substream_decode_matches_serial():
    """The pipeline decodes the three sub-streams in parallel threads;
    concurrent decode must produce identical planes (and on multi-core
    hosts, lower wall time — recorded in PERFORMANCE.md)."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    if not encoder_supports(10):
        pytest.skip("libx265 10-bit required")
    rng = np.random.default_rng(9)
    streams = [
        encode_yuv420(_random_frames(rng, 4, 128, 128, 10), bit_depth=10)
        for _ in range(3)
    ]

    t0 = time.perf_counter()
    serial = [decode_annexb(s) for s in streams]
    dt_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=3) as pool:
        concurrent = list(pool.map(decode_annexb, streams))
    dt_concurrent = time.perf_counter() - t0

    for a, b in zip(serial, concurrent):
        assert len(a) == len(b)
        for fa, fb in zip(a, b):
            for pa, pb in zip(fa.planes, fb.planes):
                np.testing.assert_array_equal(pa, pb)
    # wall-time evidence, not asserted (flat on this 1-core container)
    print(f"substream decode serial={dt_serial:.3f}s "
          f"concurrent={dt_concurrent:.3f}s")


def test_write_yuv_dump(tmp_path):
    """Raw YUV dump parity with the reference's Image::write debug aid
    (planes appended y,u,v; native-endian u16 for 10-bit)."""
    if not encoder_supports(10):
        pytest.skip("libx265 10-bit required")
    rng = np.random.default_rng(11)
    frames = _random_frames(rng, 1, 32, 32, 10)
    dec = decode_annexb(encode_yuv420(frames, bit_depth=10, lossless=True))
    out = tmp_path / "f.yuv"
    dec[0].write_yuv(out)
    data = out.read_bytes()
    expected = b"".join(np.ascontiguousarray(p).tobytes() for p in dec[0].planes)
    assert data == expected
    assert len(data) == (32 * 32 + 2 * 16 * 16) * 2  # u16 planes
