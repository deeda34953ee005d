"""SEI parse path, error propagation, and API robustness tests."""

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.v3c import writer as w3c
from tpu_vpcc.v3c.context import Context
from tpu_vpcc.v3c.stream import parse_nal_sample_stream
from tpu_vpcc.v3c.syntax import (
    NalUnitType,
    SeiMessage,
    SeiPayloadType,
    UnsupportedFeature,
)


def test_sei_geometry_smoothing_roundtrip():
    payload = w3c.write_sei_geometry_smoothing(
        instances=((0, 1, 3, 64),), persistence_flag=True
    )
    sei = SeiMessage.parse(Bitstream(payload), NalUnitType.PREFIX_ESEI)
    gs = sei.sei_prefix[0]
    assert gs.persistence_flag is True
    assert gs.instances_updated == 1
    assert gs.method_type[0] == 1
    assert gs.grid_size_minus_2[0] == 3
    assert gs.threshold[0] == 64
    assert sei.is_sei_present(
        NalUnitType.PREFIX_ESEI, SeiPayloadType.GEOMETRY_SMOOTHING
    )
    assert not sei.is_sei_present(
        NalUnitType.PREFIX_ESEI, SeiPayloadType.ATTRIBUTE_SMOOTHING
    )


def test_sei_attached_to_following_tile_layer():
    from tests.test_v3c_roundtrip import make_afps, make_asps, make_atl, make_intra_pdu

    asps = make_asps()
    afps = make_afps()
    atl = make_atl(patches=[make_intra_pdu()])
    nalus = [
        w3c.wrap_nal_unit(NalUnitType.ASPS, w3c.write_asps(asps)),
        w3c.wrap_nal_unit(NalUnitType.AFPS, w3c.write_afps(afps, asps)),
        w3c.wrap_nal_unit(
            NalUnitType.PREFIX_ESEI, w3c.write_sei_geometry_smoothing()
        ),
        w3c.wrap_nal_unit(
            NalUnitType.IDR_N_LP,
            w3c.write_atlas_tile_layer(atl, asps, afps, NalUnitType.IDR_N_LP),
        ),
    ]
    ctx = Context()
    parse_nal_sample_stream(ctx, Bitstream(w3c.build_nal_sample_stream(nalus)))
    assert ctx.get_atlas_tile_layer(0).sei is not None
    assert ctx.is_sei_present(
        NalUnitType.PREFIX_ESEI, SeiPayloadType.GEOMETRY_SMOOTHING, 0
    )


def test_unknown_sei_payload_skipped_and_recorded():
    """Unknown prefix SEI payloads are skipped by their coded size and
    recorded for presence queries (the reference panics here — a
    framework robustness extension)."""
    from tpu_vpcc.bitio import BitWriter

    w = BitWriter()
    w.write(int(SeiPayloadType.TIME_CODE), 8)
    w.write(3, 8)  # payload size
    w.write(0xABCDEF, 24)  # opaque payload bytes
    sei = SeiMessage.parse(Bitstream(w.getvalue()), NalUnitType.PREFIX_ESEI)
    assert sei.is_sei_present(NalUnitType.PREFIX_ESEI, SeiPayloadType.TIME_CODE)
    assert sei.sei_prefix[0].payload_size == 3


def test_suffix_sei_recorded_and_skipped():
    """Unknown suffix SEI payloads are recorded by coded size — never
    fatal (the reference panics on every suffix SEI,
    ``reader.rs:813-815``). Decoded-atlas-hash payloads PARSE now
    (H.20.2.8 — see test_atlas_hash.py); 0xDE opens with a set cancel
    bit, so this payload decodes as a cancelled hash SEI."""
    from tpu_vpcc.bitio import BitWriter
    from tpu_vpcc.v3c.syntax import SeiDecodedAtlasInformationHash

    w = BitWriter()
    w.write(int(SeiPayloadType.DECODED_ATLAS_INFORMATION_HASH), 8)
    w.write(4, 8)  # payload size
    w.write(0xDEADBEEF, 32)  # cancel bit set; remainder skipped by size
    w.write(int(SeiPayloadType.TIME_CODE), 8)  # stays opaque
    w.write(3, 8)
    w.write(0xABCDEF, 24)
    w.write(0x80, 8)  # rbsp_trailing_bits
    data = w.getvalue()
    sei = SeiMessage.parse(
        Bitstream(data), NalUnitType.SUFFIX_ESEI, end_byte=len(data)
    )
    assert sei.is_sei_present(
        NalUnitType.SUFFIX_ESEI, SeiPayloadType.DECODED_ATLAS_INFORMATION_HASH
    )
    assert not sei.sei_prefix
    assert isinstance(sei.sei_suffix[0], SeiDecodedAtlasInformationHash)
    assert sei.sei_suffix[0].cancel_flag
    assert sei.sei_suffix[1].payload_size == 3


def test_suffix_sei_attaches_to_preceding_tile_layer():
    """A suffix SEI NAL after a tile layer decodes cleanly and lands on
    that layer's SEI record (demux-level robustness; reference panics)."""
    from tests.test_v3c_roundtrip import make_afps, make_asps, make_atl, make_intra_pdu
    from tpu_vpcc.bitio import BitWriter

    from tpu_vpcc.v3c.syntax import SeiDecodedAtlasInformationHash

    suffix_payload = w3c.write_sei_daih(
        SeiDecodedAtlasInformationHash(cancel_flag=True)
    )

    asps = make_asps()
    afps = make_afps()
    atl = make_atl(patches=[make_intra_pdu()])
    nalus = [
        w3c.wrap_nal_unit(NalUnitType.ASPS, w3c.write_asps(asps)),
        w3c.wrap_nal_unit(NalUnitType.AFPS, w3c.write_afps(afps, asps)),
        w3c.wrap_nal_unit(
            NalUnitType.IDR_N_LP,
            w3c.write_atlas_tile_layer(atl, asps, afps, NalUnitType.IDR_N_LP),
        ),
        w3c.wrap_nal_unit(NalUnitType.SUFFIX_ESEI, suffix_payload),
    ]
    ctx = Context()
    parse_nal_sample_stream(ctx, Bitstream(w3c.build_nal_sample_stream(nalus)))
    sei = ctx.get_atlas_tile_layer(0).sei
    assert sei is not None
    assert sei.is_sei_present(
        NalUnitType.SUFFIX_ESEI, SeiPayloadType.DECODED_ATLAS_INFORMATION_HASH
    )


def test_suffix_sei_multiple_payloads_in_one_nal():
    """An SEI RBSP may carry several sei_message() payloads; the suffix
    record-and-skip loop must record ALL of them (an earlier version
    stopped after the first, so presence queries missed trailing
    payloads)."""
    from tests.test_v3c_roundtrip import make_afps, make_asps, make_atl, make_intra_pdu
    from tpu_vpcc.bitio import BitWriter

    from tpu_vpcc.v3c.syntax import SeiDecodedAtlasInformationHash

    w = BitWriter()
    w.write(int(SeiPayloadType.TIME_CODE), 8)  # second sei_message()
    w.write(3, 8)
    w.write(0xABCDEF, 24)
    w.write(0x80, 8)  # rbsp_trailing_bits
    suffix_payload = w3c.write_sei_daih(
        SeiDecodedAtlasInformationHash(cancel_flag=True)
    ) + w.getvalue()

    asps = make_asps()
    afps = make_afps()
    atl = make_atl(patches=[make_intra_pdu()])
    nalus = [
        w3c.wrap_nal_unit(NalUnitType.ASPS, w3c.write_asps(asps)),
        w3c.wrap_nal_unit(NalUnitType.AFPS, w3c.write_afps(afps, asps)),
        w3c.wrap_nal_unit(
            NalUnitType.IDR_N_LP,
            w3c.write_atlas_tile_layer(atl, asps, afps, NalUnitType.IDR_N_LP),
        ),
        w3c.wrap_nal_unit(NalUnitType.SUFFIX_ESEI, suffix_payload),
    ]
    ctx = Context()
    parse_nal_sample_stream(ctx, Bitstream(w3c.build_nal_sample_stream(nalus)))
    sei = ctx.get_atlas_tile_layer(0).sei
    assert sei is not None
    assert len(sei.sei_suffix) == 2
    assert sei.is_sei_present(
        NalUnitType.SUFFIX_ESEI, SeiPayloadType.DECODED_ATLAS_INFORMATION_HASH
    )
    assert sei.is_sei_present(NalUnitType.SUFFIX_ESEI, SeiPayloadType.TIME_CODE)
    assert sei.sei_suffix[1].payload_size == 3


def test_sei_occupancy_synthesis_roundtrip():
    payload = w3c.write_sei_occupancy_synthesis(
        instances=((0, 1, 2, 1, 5),), persistence_flag=True
    )
    sei = SeiMessage.parse(Bitstream(payload), NalUnitType.PREFIX_ESEI)
    osm = sei.sei_prefix[0]
    assert osm.persistence_flag is True
    assert osm.method_type[0] == 1
    assert osm.pbf_log2_threshold_minus1[0] == 2
    assert osm.pbf_passes_count_minus1[0] == 1
    assert osm.pbf_filter_size_minus1[0] == 5
    assert sei.is_sei_present(
        NalUnitType.PREFIX_ESEI, SeiPayloadType.OCCUPANCY_SYNTHESIS
    )


def test_sei_attribute_smoothing_roundtrip():
    payload = w3c.write_sei_attribute_smoothing(
        instances=((0, 0, 1, 6, 0, 20, 10),), persistence_flag=True
    )
    sei = SeiMessage.parse(Bitstream(payload), NalUnitType.PREFIX_ESEI)
    asm = sei.sei_prefix[0]
    assert asm.persistence_flag is True
    assert asm.num_attributes_updated == 1
    assert asm.attribute_idx == [0]
    assert asm.method_type[0][0] == 1
    assert asm.grid_size_minus_2[0][0] == 6
    assert asm.threshold_variation[0][0] == 20
    assert asm.threshold_difference[0][0] == 10
    assert sei.is_sei_present(
        NalUnitType.PREFIX_ESEI, SeiPayloadType.ATTRIBUTE_SMOOTHING
    )


def test_suffix_sei_does_not_leak_to_other_layers_sharing_prefix():
    """A pending prefix SeiMessage is shared by every following tile layer
    (Rc-clone parity); attaching a suffix must not mutate the shared
    object — only the preceding layer sees the suffix."""
    from tests.test_v3c_roundtrip import make_afps, make_asps, make_atl, make_intra_pdu
    from tpu_vpcc.bitio import BitWriter

    w = BitWriter()
    w.write(int(SeiPayloadType.DECODED_ATLAS_INFORMATION_HASH), 8)
    w.write(1, 8)
    w.write(0xAB, 8)
    suffix_payload = w.getvalue()

    asps = make_asps()
    afps = make_afps()
    tile = lambda: w3c.wrap_nal_unit(  # noqa: E731
        NalUnitType.IDR_N_LP,
        w3c.write_atlas_tile_layer(
            make_atl(patches=[make_intra_pdu()]), asps, afps,
            NalUnitType.IDR_N_LP,
        ),
    )
    nalus = [
        w3c.wrap_nal_unit(NalUnitType.ASPS, w3c.write_asps(asps)),
        w3c.wrap_nal_unit(NalUnitType.AFPS, w3c.write_afps(afps, asps)),
        w3c.wrap_nal_unit(
            NalUnitType.PREFIX_ESEI, w3c.write_sei_geometry_smoothing()
        ),
        tile(),  # layer 0
        tile(),  # layer 1 — shares the prefix SeiMessage with layer 0
        w3c.wrap_nal_unit(NalUnitType.SUFFIX_ESEI, suffix_payload),
    ]
    ctx = Context()
    parse_nal_sample_stream(ctx, Bitstream(w3c.build_nal_sample_stream(nalus)))
    sei0 = ctx.get_atlas_tile_layer(0).sei
    sei1 = ctx.get_atlas_tile_layer(1).sei
    assert not sei0.sei_suffix, "suffix leaked onto an earlier tile layer"
    assert sei1.sei_suffix and sei1.sei_suffix[0].payload_type == int(
        SeiPayloadType.DECODED_ATLAS_INFORMATION_HASH
    )
    # both layers keep the shared prefix payload
    for sei in (sei0, sei1):
        assert sei.is_sei_present(
            NalUnitType.PREFIX_ESEI, SeiPayloadType.GEOMETRY_SMOOTHING
        )


def test_e2e_stream_with_suffix_sei_decodes_normally(tmp_path):
    """A full fixture stream carrying a suffix SEI NAL decodes to exactly
    the same output as the identical stream without it (the reference
    panics on the NAL, ``reader.rs:813-815``)."""
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.ply import format_ply
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(11)
    frames = [
        make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                             occupancy_precision=4, n_patches=3, frame_index=i)
        for i in range(2)
    ]
    plain = build_fixture_stream(frames)
    rng2 = np.random.default_rng(11)
    frames2 = [
        make_synthetic_frame(rng2, width=64, height=64, occupancy_resolution=8,
                             occupancy_precision=4, n_patches=3, frame_index=i)
        for i in range(2)
    ]
    with_suffix = build_fixture_stream(
        frames2,
        suffix_sei=(int(SeiPayloadType.TIME_CODE), b"\x01\x02\x03\x04"),
    )
    assert with_suffix != plain  # the NAL is really in the stream
    d1 = Decoder(Params(with_suffix))
    d1.start()
    a = list(d1)
    d2 = Decoder(Params(plain))
    d2.start()
    b = list(d2)
    assert len(a) == len(b) == 2 and all(len(f) > 0 for f in a)
    for fa, fb in zip(a, b):
        assert format_ply(fa) == format_ply(fb)


def test_decoder_error_propagates_to_consumer(tmp_path):
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"\x00" * 64)  # valid sample-stream header, garbage units
    d = Decoder(Params(bad))
    with pytest.raises(Exception):
        # malformed streams fail either at start() (parse on the calling
        # thread) or on the first recv (decode-thread errors re-raised)
        d.start()
        while d.recv_frame() is not None:
            pass


def test_params_rejects_unknown_kwargs():
    with pytest.raises(TypeError):
        Params("x.bin", not_a_real_option=True)


def test_decoder_stats_populated(tmp_path):
    pytest.importorskip("numpy")
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(1)
    frames = [
        make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                             occupancy_precision=4, n_patches=3, frame_index=i)
        for i in range(2)
    ]
    path = tmp_path / "s.bin"
    path.write_bytes(build_fixture_stream(frames))
    d = Decoder(Params(path))
    d.start()
    decoded = list(d)
    assert d.stats.total_frames == len(decoded) == 2
    assert d.stats.total_points == sum(len(f) for f in decoded)
    gof = d.stats.gofs[0]
    assert {"parse", "host_prepare", "reconstruct"} <= set(gof.stage_seconds)
    assert gof.video_bytes.get("geo", 0) > 0
    assert "points" in gof.summary()


def test_occupancy_synthesis_sei_ignored_by_default(tmp_path):
    """A stream carrying the occupancy-synthesis SEI decodes normally by
    default (SEI advisory, rec0); with the toggle the PBF filter acts
    (tests/test_occupancy_synthesis.py pins the behavior — here only
    the default-off contract)."""
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(2)
    frames = [
        make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                             occupancy_precision=4, n_patches=2, frame_index=i)
        for i in range(2)
    ]
    stream = build_fixture_stream(frames, occ_synthesis_sei=(1, 0, 2))

    d = Decoder(Params(stream))
    d.start()
    assert len(list(d)) == 2  # default: SEI present but ignored
