"""Parser robustness: malformed inputs must raise cleanly (never hang or
corrupt state) — mirroring the reference's panic-fast failure model."""

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream, BitstreamError
from tpu_vpcc.v3c.context import Context
from tpu_vpcc.v3c.stream import SampleStreamV3CUnit


@pytest.mark.parametrize("seed", range(20))
def test_random_bytes_fail_cleanly(seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, rng.integers(1, 2048)).astype(np.uint8).tobytes()
    import time

    t0 = time.monotonic()
    try:
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ssvu.decode_gof(Context())
    except Exception:
        pass  # any *exception* is fine; hangs/crashes are not
    # enforce the "no hang" property the docstring promises
    assert time.monotonic() - t0 < 30


@pytest.mark.parametrize("cut", [1, 7, 50, 200, 999])
def test_truncated_valid_stream_fails_cleanly(cut):
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(0)
    frames = [make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                                   occupancy_precision=4, n_patches=2)]
    stream = build_fixture_stream(frames)
    data = stream[: len(stream) - cut]
    with pytest.raises(Exception):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ssvu.decode_gof(Context())


def _decodes(data: bytes) -> bool:
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
    while ssvu.get_v3c_unit_count() > 0:
        ssvu.decode_gof(Context())
    return True


def test_bit_flips_fail_cleanly_or_parse():
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(1)
    frames = [make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                                   occupancy_precision=4, n_patches=2)]
    stream = bytearray(build_fixture_stream(frames))
    # baseline: the unmutated fixture must decode, so the loop below is
    # demonstrably exercising a real parse path
    assert _decodes(bytes(stream))
    # flip bits in the header region (first 200 bytes: VPS/ASPS/AFPS/ATL)
    outcomes = {"ok": 0, "raised": 0}
    for i in range(0, 200, 7):
        mutated = bytearray(stream)
        mutated[i] ^= 0xFF
        try:
            _decodes(bytes(mutated))
            outcomes["ok"] += 1
        except Exception:
            outcomes["raised"] += 1  # clean failure is acceptable
    # every mutation was processed one way or the other, and at least
    # one header flip must actually be rejected (a suite where every
    # corruption "parses" means the loop is not hitting the parsers)
    assert sum(outcomes.values()) == len(range(0, 200, 7))
    assert outcomes["raised"] > 0


def _p_sei_stream():
    from dataclasses import replace

    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame

    rng = np.random.default_rng(3)
    f0 = make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                              occupancy_precision=4, n_patches=2, frame_index=0)
    p1 = [replace(p) for p in f0.meta.patches]
    f1 = make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                              occupancy_precision=4, frame_index=1, patches=p1)
    return build_fixture_stream(
        [f0, f1], p_modes={1: ["skip", "skip"]}, geo_smoothing_sei=(8, 16)
    )


def test_bit_flips_in_rotated_patch_stream_fail_cleanly():
    """Corruption over a stream with non-DEFAULT orientations (3-bit
    orientation coding, the dual-assert gate, suffix SEI): parse + patch
    derivation either succeeds or raises cleanly — corrupted orientation
    or size fields must surface as UnsupportedFeature/Bitstream errors,
    never an uncaught AssertionError from the canvas-transform helpers."""
    from dataclasses import replace as _replace

    from tpu_vpcc.atlas.patches import Patch, create_patch_frames
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.v3c.syntax import PatchOrientation
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    p0 = Patch(uv0=(3, 1), size_uv0=(1, 1), uv1=(40, 80),
               occupancy_resolution=16,
               patch_orientation=PatchOrientation.DEFAULT)
    p0.set_view_id(0)
    p0.d1 = 100
    p0.size_d = 255
    p1 = Patch(uv0=(2, 1), size_uv0=(2, 2), uv1=(10, 20),
               occupancy_resolution=16,
               patch_orientation=PatchOrientation.ROT90)
    p1.set_view_id(1)
    p1.d1 = 100
    p1.size_d = 255
    rng = np.random.default_rng(17)
    sf = make_synthetic_frame(rng, width=64, height=64,
                              occupancy_resolution=16, occupancy_precision=4,
                              patches=[_replace(p0), _replace(p1)])
    stream = bytearray(build_fixture_stream(
        [sf], suffix_sei=(7, b"\x01\x02")
    ))

    def run(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    run(bytes(stream))  # the unmutated stream must derive
    raised = 0
    bad = []
    for i in range(0, min(400, len(stream)), 3):
        mutated = bytearray(stream)
        mutated[i] ^= 0xFF
        try:
            run(bytes(mutated))
        except AssertionError as e:
            bad.append((i, repr(e)))
        except Exception:
            raised += 1
    assert not bad, f"uncaught AssertionError at offsets {bad[:5]}"
    assert raised > 0, "no corruption was rejected: loop not effective"


def test_bit_flips_in_p_tile_and_sei_regions_fail_cleanly():
    """Round-2 parse paths (P-tile PDUs, SEIs, ref lists) under
    corruption: parse either succeeds or raises a clean exception; the
    patch derivation must never crash the interpreter or hang."""
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    stream = bytearray(_p_sei_stream())

    def run(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    run(bytes(stream))  # baseline: the unmutated stream must derive
    raised = 0
    for i in range(0, min(400, len(stream)), 5):
        mutated = bytearray(stream)
        mutated[i] ^= 0xFF
        try:
            run(bytes(mutated))
        except Exception:
            raised += 1  # clean failure (or a still-decodable stream) is fine
    assert raised > 0, "no header corruption was rejected: loop not effective"


def test_bit_flips_in_extension_feature_streams_fail_cleanly():
    """Corruption over streams exercising this round's extensions —
    45-degree views (wide projection-id field), aux-video raw/EOM
    units, pixel-interleaved geometry, single-map EOM fix-bit-count:
    parse + patch derivation either succeeds or raises cleanly, never
    an uncaught AssertionError."""
    import time

    from tests.test_aux_video import make_aux_frames
    from tests.test_eom import make_eom_frame_1map
    from tests.test_pixel_interleave import make_pix_il_stream

    from tpu_vpcc.atlas.patches import Patch, create_patch_frames
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")

    rng = np.random.default_rng(57)
    sf45 = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, n_patches=3, frame_index=0,
    )
    for p, plane in zip(sf45.meta.patches, (1, 2, 3)):
        views = [
            v for v, r in Patch._VIEW_TABLE.items()
            if r[0] == plane and r[4] == p.projection_mode
        ]
        p.set_view_id(views[0])
    streams = [
        build_fixture_stream([sf45]),
        build_fixture_stream(
            make_aux_frames(seed=5, n_frames=1, with_main_raw=True)
        ),
        make_pix_il_stream(seed=7, n_frames=1)[1],
        build_fixture_stream(
            [make_eom_frame_1map(np.random.default_rng(71))]
        ),
    ]

    def run(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    t0 = time.monotonic()
    raised = 0
    bad = []
    for stream in streams:
        run(bytes(stream))  # the unmutated stream must derive
        for i in range(0, min(360, len(stream)), 4):
            mutated = bytearray(stream)
            mutated[i] ^= 0xFF
            try:
                run(bytes(mutated))
            except AssertionError as e:
                bad.append((i, repr(e)))
            except Exception:
                raised += 1
    assert not bad, f"uncaught AssertionError at offsets {bad[:5]}"
    assert raised > 0
    assert time.monotonic() - t0 < 120


def test_bit_flips_in_multitile_aux_and_422_multimap_fail_cleanly():
    """Corruption over the round-9 extension streams — multi-tile
    frames with per-tile aux bands, and 4:2:2 attributes in per-map
    video sub-streams: parse + patch derivation either succeeds or
    raises cleanly, never an uncaught AssertionError."""
    import time

    from tests.test_aux_multitile import (
        make_two_tile_frame,
        plant_banded_aux_raws,
    )
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")

    rng = np.random.default_rng(61)
    sf = make_two_tile_frame(rng)
    plant_banded_aux_raws(rng, sf)
    sf422 = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=2, frame_index=0,
    )
    streams = [
        build_fixture_stream(
            [sf], tiles=(2, 1), aux_tile_row_heights=[1, 1]
        ),
        build_fixture_stream(
            [sf422], multi_map_streams=True, chroma422=True
        ),
    ]

    def run(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    t0 = time.monotonic()
    raised = 0
    bad = []
    for stream in streams:
        run(bytes(stream))  # the unmutated stream must derive
        for i in range(0, min(360, len(stream)), 4):
            mutated = bytearray(stream)
            mutated[i] ^= 0xFF
            try:
                run(bytes(mutated))
            except AssertionError as e:
                bad.append((i, repr(e)))
            except Exception:
                raised += 1
    assert not bad, f"uncaught AssertionError at offsets {bad[:5]}"
    assert raised > 0
    assert time.monotonic() - t0 < 120


def test_bit_flips_in_multi_attribute_stream_fail_cleanly():
    """Corruption over a multi-attribute stream (two secondary AVD
    families): parse + patch derivation either succeeds or raises
    cleanly, never an uncaught AssertionError."""
    import time

    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")

    rng = np.random.default_rng(71)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=2, frame_index=0,
    )
    stream = build_fixture_stream(
        [sf], secondary_attrs=[(3, 1, None), (0, 3, None)]
    )

    def run(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    t0 = time.monotonic()
    raised = 0
    bad = []
    run(bytes(stream))  # the unmutated stream must derive
    for i in range(0, min(360, len(stream)), 4):
        mutated = bytearray(stream)
        mutated[i] ^= 0xFF
        try:
            run(bytes(mutated))
        except AssertionError as e:
            bad.append((i, repr(e)))
        except Exception:
            raised += 1
    assert not bad, f"uncaught AssertionError at offsets {bad[:5]}"
    assert raised > 0
    assert time.monotonic() - t0 < 120


def test_bit_flips_in_geometry_only_stream_fail_cleanly():
    """Corruption over a geometry-only stream (no AVD units): parse +
    patch derivation either succeeds or raises cleanly."""
    import time

    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")

    rng = np.random.default_rng(81)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=2, frame_index=0,
    )
    stream = build_fixture_stream([sf], no_attributes=True)

    def run(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    t0 = time.monotonic()
    raised = 0
    bad = []
    run(bytes(stream))
    for i in range(0, min(360, len(stream)), 4):
        mutated = bytearray(stream)
        mutated[i] ^= 0xFF
        try:
            run(bytes(mutated))
        except AssertionError as e:
            bad.append((i, repr(e)))
        except Exception:
            raised += 1
    assert not bad, f"uncaught AssertionError at offsets {bad[:5]}"
    assert raised > 0
    assert time.monotonic() - t0 < 120


def test_bit_flips_in_three_map_stream_fail_cleanly():
    """Round-5 multi-map parse paths (per-map GVD/AVD demux up to the
    declared map count, layer gating) under corruption: full decode
    either succeeds or raises cleanly — never an uncaught assertion,
    crash, or hang."""
    import time

    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(23)
    frames = [make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=3, n_patches=2, frame_index=0,
    )]
    stream = bytearray(build_fixture_stream(frames, multi_map_streams=True))

    def run(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    run(bytes(stream))
    t0 = time.monotonic()
    raised = 0
    bad = []
    for i in range(0, min(400, len(stream)), 3):
        mutated = bytearray(stream)
        mutated[i] ^= 0xFF
        try:
            run(bytes(mutated))
        except AssertionError as e:
            bad.append((i, repr(e)))
        except Exception:
            raised += 1
    assert not bad, f"uncaught AssertionError at offsets {bad[:5]}"
    assert raised > 0
    assert time.monotonic() - t0 < 60


def test_bit_flips_in_hash_sei_stream_fail_cleanly():
    """Corruption over a decoded-atlas-hash stream: the FULL pipeline
    (hash verification included) either decodes, fails the hash with
    the clean mismatch error, or raises another clean parse error."""
    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(29)
    frames = [make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=2, frame_index=0,
    )]
    stream = bytearray(build_fixture_stream(frames, atlas_hash_sei=True))

    def run(data):
        d = Decoder(Params(bytes(data), use_device=False))
        d.start()
        return list(d)

    assert len(run(bytes(stream))) == 1
    outcomes = {"ok": 0, "raised": 0, "hash_mismatch": 0}
    bad = []
    for i in range(0, min(400, len(stream)), 3):
        mutated = bytearray(stream)
        mutated[i] ^= 0xFF
        try:
            run(bytes(mutated))
            outcomes["ok"] += 1
        except AssertionError as e:
            bad.append((i, repr(e)))
        except Exception as e:
            if "decoded-atlas-hash SEI mismatch" in str(e):
                outcomes["hash_mismatch"] += 1
            else:
                outcomes["raised"] += 1
    assert not bad, f"uncaught AssertionError at offsets {bad[:5]}"
    assert outcomes["raised"] > 0
