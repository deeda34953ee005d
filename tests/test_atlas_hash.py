"""Decoded-atlas-information hash SEI (H.20.2.8) — emit, parse, verify.

The reference skips hash SEI (``lib.rs:100``); here the writer computes
hashes from the AUTHORED patch metadata and the decoder recomputes them
from its independently parsed + derived state (``atlas/atlas_hash.py``)
— the first internal integrity check that does not depend on the
self-authored oracle. A tampered hash must fail cleanly."""

import dataclasses

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream, BitstreamError
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.v3c.context import Context
from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
from tpu_vpcc.v3c.syntax import SeiDecodedAtlasInformationHash
from tpu_vpcc.v3c.writer import write_sei_daih
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def make_frames(n=2, seed=23):
    rng = np.random.default_rng(seed)
    return [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=3, frame_index=i,
        )
        for i in range(n)
    ]


def decode_all(data, use_device=False):
    d = Decoder(Params(bytes(data), use_device=use_device))
    d.start()
    return list(d)


def test_daih_payload_roundtrip():
    """Writer payload → suffix-SEI parse → identical dataclass, for
    every hash type."""
    for ht, n in ((0, 16), (1, 2), (2, 4)):
        sei = SeiDecodedAtlasInformationHash(
            hash_type=ht,
            high_level_present=True,
            atlas_present=True,
            b2p_present=True,
            tiles_present=True,
            tiles_b2p_present=True,
            high_level_hash=bytes(range(n)),
            atlas_hash=bytes(range(1, n + 1)),
            b2p_hash=bytes(range(2, n + 2)),
            tile_ids=[0, 3],
            tiles_hash=[bytes(n), bytes(range(n))],
            tiles_b2p_hash=[bytes(range(n)), bytes(n)],
        )
        payload = write_sei_daih(sei)
        bs = Bitstream(payload)
        # strip the type/size varint envelope the parser loop consumes
        ptype, psize = __import__(
            "tpu_vpcc.v3c.syntax", fromlist=["SeiMessage"]
        ).SeiMessage._read_payload_header(bs)
        assert ptype == 19
        got = SeiDecodedAtlasInformationHash.parse(bs)
        assert dataclasses.asdict(got) == dataclasses.asdict(sei)


def test_daih_cancel_roundtrip():
    sei = SeiDecodedAtlasInformationHash(cancel_flag=True)
    bs = Bitstream(write_sei_daih(sei))
    __import__(
        "tpu_vpcc.v3c.syntax", fromlist=["SeiMessage"]
    ).SeiMessage._read_payload_header(bs)
    got = SeiDecodedAtlasInformationHash.parse(bs)
    assert got.cancel_flag


@pytest.mark.parametrize("hash_type", [0, 1, 2])
def test_daih_stream_verifies(hash_type):
    """A hash-bearing stream decodes (verification passes) and yields
    the exact points of the hash-free stream."""
    frames = make_frames()
    import copy

    frames2 = copy.deepcopy(frames)
    s_hash = build_fixture_stream(frames, atlas_hash_sei=hash_type)
    s_plain = build_fixture_stream(frames2)
    got = decode_all(s_hash)
    plain = decode_all(s_plain)
    assert len(got) == len(plain) == len(frames)
    for a, b in zip(got, plain):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.colors, b.colors)


def test_daih_stream_verifies_on_device_with_tails():
    """Raw + EOM patch metadata rides the hash too; device path decodes
    a hash-bearing stream with tails."""
    from tpu_vpcc.utils.synthetic import plant_raw_patch
    from tests.test_raw_patches import free_block_rect

    frames = make_frames(n=1, seed=29)
    rng = np.random.default_rng(3)
    u0, v0 = free_block_rect(frames[0], 2, 1)
    plant_raw_patch(rng, frames[0], (u0, v0, 2, 1), n_points=9,
                    offsets=(1, 2, 3))
    s = build_fixture_stream(frames, atlas_hash_sei=True)
    got = decode_all(s, use_device=True)
    assert len(got) == 1 and len(got[0]) > 0


def test_daih_tamper_fails_cleanly():
    frames = make_frames()
    s = build_fixture_stream(frames, atlas_hash_sei=True,
                             atlas_hash_tamper=True)
    d = Decoder(Params(bytes(s), use_device=False))
    d.start()
    with pytest.raises(Exception, match="decoded-atlas-hash SEI mismatch"):
        list(d)


def test_daih_detects_atlas_divergence_not_just_bytes():
    """Mutating DECODED state (not the SEI) trips verification: the
    check covers the derivation, not merely byte transport. Simulated
    by re-hashing a modified meta through the decoder-side functions."""
    from tpu_vpcc.atlas import atlas_hash as ah

    frames = make_frames(n=1)
    s = build_fixture_stream(frames, atlas_hash_sei=True)
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(s))
    ctx = Context()
    ssvu.decode_gof(ctx)
    by_frame = ah.collect_daih_by_frame(ctx)
    assert 0 in by_frame
    (sei,) = by_frame[0]
    # decoded meta hashes must MATCH the SEI...
    from tpu_vpcc.atlas.patches import create_patch_frames

    metas = [m for m in create_patch_frames(ctx) if m.frame_index == 0]
    assert ah.hash_bytes(
        ah.frame_atlas_byte_string(metas), sei.hash_type
    ) == sei.atlas_hash
    # ...and a single-field divergence must not
    metas[0].patches[0].d1 += 1
    assert ah.hash_bytes(
        ah.frame_atlas_byte_string(metas), sei.hash_type
    ) != sei.atlas_hash


def test_every_daih_payload_verifies_not_just_the_last():
    """A frame carrying TWO hash SEIs (multi-tile streams attach one per
    tile layer) must verify ALL of them — an earlier version kept only
    the last, silently skipping the first's assertions."""
    import copy

    from tpu_vpcc.atlas import atlas_hash as ah
    from tpu_vpcc.runtime.pipeline import prepare_gof

    frames = make_frames(n=1)
    s = build_fixture_stream(frames, atlas_hash_sei=True)
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(s))
    ctx = Context()
    ssvu.decode_gof(ctx)
    atl = ctx.get_atlas_tile_layer(0)
    good = atl.sei.sei_suffix[-1]
    bad = copy.deepcopy(good)
    bad.atlas_hash = bytes(b ^ 0xFF for b in bad.atlas_hash)
    # tampered FIRST, valid second: the old last-wins collection passed
    atl.sei.sei_suffix = [bad, good]
    assert len(ah.collect_daih_by_frame(ctx)[0]) == 2
    with pytest.raises(BitstreamError, match="decoded-atlas-hash SEI mismatch"):
        prepare_gof(ctx)


def test_truncated_daih_payload_raises():
    """A suffix SEI whose declared payload size overruns the buffer is
    corruption (the former byte-wise skip raised too) — it must not
    seek past the end and decode silently."""
    from tpu_vpcc.bitio import BitWriter
    from tpu_vpcc.v3c.syntax import NalUnitType, SeiMessage

    w = BitWriter()
    w.write(19, 8)   # DECODED_ATLAS_INFORMATION_HASH
    w.write(100, 8)  # declared size far past the buffer
    w.write(0x80, 8)  # cancel bit set; nothing else follows
    data = w.getvalue()
    with pytest.raises(BitstreamError, match="overruns"):
        SeiMessage.parse(
            Bitstream(data), NalUnitType.SUFFIX_NSEI, end_byte=len(data)
        )
