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


def make_streams(tmp_path, n_streams=3, n_frames=2):
    paths = []
    for s in range(n_streams):
        rng = np.random.default_rng(100 + s)
        frames = [
            make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                                 occupancy_precision=4, n_patches=3, frame_index=i)
            for i in range(n_frames)
        ]
        p = tmp_path / f"s{s}.bin"
        p.write_bytes(build_fixture_stream(frames))
        paths.append(p)
    return paths


def test_multi_stream_matches_sequential(tmp_path):
    paths = make_streams(tmp_path)
    batched = decode_streams(paths)

    for s, path in enumerate(paths):
        d = Decoder(Params(path))
        d.start()
        seq = list(d)
        assert len(batched[s]) == len(seq) > 0
        for a, b in zip(batched[s], seq):
            assert format_ply(a) == format_ply(b)


def test_streams_share_device_batches(tmp_path, monkeypatch):
    """Frames from different streams really coalesce into one dispatch."""
    import tpu_vpcc.parallel.batcher as batcher_mod

    paths = make_streams(tmp_path, n_streams=2, n_frames=1)
    calls = []
    real = batcher_mod._dispatch_device

    def spy(di, mesh=None):
        calls.append(di.n_frames)
        return real(di, mesh=mesh)

    monkeypatch.setattr(batcher_mod, "_dispatch_device", spy)
    batched = decode_streams(paths)
    # initial wave: both streams' single-frame GOFs in ONE device call
    # (a DEVICE_BATCH-sized chunk of the concatenated frame axis)
    assert calls[0] == 2, calls
    assert all(len(b) == 1 for b in batched)


def test_multi_stream_applies_smoothing_params(tmp_path):
    """Params-level decode options reach the batcher: a smoothing-SEI
    stream decoded multi-stream with the toggle set produces exactly the
    single-stream smoothed output (and not the unsmoothed one)."""
    # same generator as test_smoothing.make_sei_stream(seed=6, threshold=1),
    # which demonstrably moves at least one point
    rng = np.random.default_rng(6)
    frames = [
        make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                             occupancy_precision=4, n_patches=4, frame_index=i)
        for i in range(2)
    ]
    stream = build_fixture_stream(frames, geo_smoothing_sei=(8, 1))
    p = tmp_path / "sm.bin"
    p.write_bytes(stream)

    params = Params(p, apply_geo_smoothing_type=True)
    batched = decode_streams([p, p], params=params)

    d = Decoder(Params(stream, apply_geo_smoothing_type=True))
    d.start()
    smoothed = list(d)
    d2 = Decoder(Params(stream))
    d2.start()
    plain = list(d2)

    assert any(
        format_ply(a) != format_ply(b) for a, b in zip(smoothed, plain)
    ), "fixture must actually smooth something"
    for s in range(2):
        assert len(batched[s]) == len(smoothed) == 2
        for a, b in zip(batched[s], smoothed):
            assert format_ply(a) == format_ply(b)


def test_multi_stream_on_mesh(tmp_path):
    """Batched decode with a ('data','space') mesh is bit-identical."""
    from tpu_vpcc.parallel.mesh import make_mesh

    paths = make_streams(tmp_path, n_streams=2, n_frames=2)
    mesh = make_mesh(data=4, space=2)
    batched = decode_streams(paths, mesh=mesh)
    plain = decode_streams(paths)
    for s in range(len(paths)):
        assert len(batched[s]) == len(plain[s]) > 0
        for a, b in zip(batched[s], plain[s]):
            assert format_ply(a) == format_ply(b)


def test_eight_concurrent_streams_on_device_mesh(tmp_path):
    """BASELINE config 5 shape: 8 concurrent bitstreams, frames from all
    of them coalesced into shared device batches sharded over the full
    8-device mesh; outputs bit-identical per stream."""
    from tpu_vpcc.parallel.mesh import make_mesh

    paths = make_streams(tmp_path, n_streams=8, n_frames=2)
    mesh = make_mesh(data=8, space=1)
    batched = decode_streams(paths, mesh=mesh)
    for s, path in enumerate(paths):
        d = Decoder(Params(path))
        d.start()
        seq = list(d)
        assert len(batched[s]) == len(seq) == 2
        for a, b in zip(batched[s], seq):
            assert format_ply(a) == format_ply(b)


def test_batched_streams_append_eom_and_plr_tails(tmp_path):
    """The batcher appends the SAME host tails as the single-stream GOF
    driver (PLR, then EOM, then raw) — it used to silently drop EOM/PLR
    points. One EOM stream + one PLR stream, batched == sequential."""
    import numpy as np

    from tests.test_eom import make_eom_frame
    from tests.test_plr import MODES, THICKNESS, make_plr_frames
    from tpu_vpcc.utils.fixtures import build_fixture_stream

    rng = np.random.default_rng(9)
    p_eom = tmp_path / "eom.bin"
    p_eom.write_bytes(build_fixture_stream(
        [make_eom_frame(rng, frame_index=i) for i in range(2)]
    ))
    p_plr = tmp_path / "plr.bin"
    p_plr.write_bytes(build_fixture_stream(
        make_plr_frames(seed=10), plr=(MODES, THICKNESS)
    ))
    batched = decode_streams([p_eom, p_plr])
    for s, path in enumerate([p_eom, p_plr]):
        d = Decoder(Params(path))
        d.start()
        seq = list(d)
        assert len(batched[s]) == len(seq) == 2
        for a, b in zip(batched[s], seq):
            assert format_ply(a) == format_ply(b)


def test_batched_mixed_map_counts_match_sequential(tmp_path):
    """A 3-map stream batched alongside a 2-map stream keeps its
    trailing-layer points (the batcher runs the same drop_map0 layer
    passes as the single-stream driver; an earlier version silently
    dropped them)."""
    rng_a = np.random.default_rng(60)
    rng_b = np.random.default_rng(61)
    pa = tmp_path / "a.bin"
    pb = tmp_path / "b.bin"
    pa.write_bytes(build_fixture_stream([
        make_synthetic_frame(
            rng_a, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=3, n_patches=2, frame_index=i,
        )
        for i in range(2)
    ]))
    pb.write_bytes(build_fixture_stream([
        make_synthetic_frame(
            rng_b, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=2, frame_index=i,
        )
        for i in range(2)
    ]))
    batched = decode_streams([pa, pb])
    for s, path in enumerate([pa, pb]):
        d = Decoder(Params(path))
        d.start()
        seq = list(d)
        assert len(batched[s]) == len(seq) == 2
        for a, b in zip(batched[s], seq):
            assert format_ply(a) == format_ply(b)
