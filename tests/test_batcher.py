"""Multi-stream batched decode vs per-stream sequential decode."""

import numpy as np
import pytest

from tpu_vpcc.parallel.batcher import decode_streams
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.ply import format_ply
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def test_multi_stream_matches_sequential(tmp_path):
    paths = []
    for s in range(3):
        rng = np.random.default_rng(100 + s)
        frames = [
            make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                                 occupancy_precision=4, n_patches=3, frame_index=i)
            for i in range(2)
        ]
        p = tmp_path / f"s{s}.bin"
        p.write_bytes(build_fixture_stream(frames))
        paths.append(p)

    batched = decode_streams(paths)

    for s, path in enumerate(paths):
        d = Decoder(Params(path))
        d.start()
        seq = list(d)
        assert len(batched[s]) == len(seq) > 0
        for a, b in zip(batched[s], seq):
            assert format_ply(a) == format_ply(b)
