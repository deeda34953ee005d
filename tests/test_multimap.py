"""Multiple-map video sub-streams (framework extension — the reference
rejects vps_multiple_map_streams_present_flag, ``reader.rs:278-283``).

Each map's geometry/attribute rides its OWN video sub-stream (GVD/AVD
units carrying map_index); optionally the D1 geometry codes deltas
against D0 (``map_absolute_coding_enable_flag[1] = 0`` — the
``absolute_d1=False`` path that was unreachable from single-stream
bitstreams). The strongest pin: the SAME synthetic scene coded three
ways (interleaved single-stream, per-map absolute, per-map delta)
decodes to byte-identical PLYs on both the device and oracle paths."""

import numpy as np
import pytest

from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.utils.ply import format_ply
from tpu_vpcc.v3c.syntax import UnsupportedFeature
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def make_frames(seed=201, n_frames=2, **kw):
    rng = np.random.default_rng(seed)
    return [
        make_synthetic_frame(
            rng, width=kw.get("width", 64), height=kw.get("height", 64),
            occupancy_resolution=kw.get("res", 8),
            occupancy_precision=kw.get("prec", 4),
            map_count=2, n_patches=kw.get("n_patches", 3), frame_index=i,
        )
        for i in range(n_frames)
    ]


def decode_all(path, use_device):
    d = Decoder(Params(path, use_device=use_device))
    d.start()
    return list(d)


def test_multimap_equals_interleaved_all_codings(tmp_path):
    """One scene, three bitstream codings, four decode paths — all PLYs
    byte-identical (delta-vs-absolute equality holds because synthetic
    depths never exceed the mode-1 d1 shift, so the max() never binds)."""
    frames = make_frames()
    variants = {
        "single": dict(),
        "mm_abs": dict(multi_map_streams=True),
        "mm_delta": dict(multi_map_streams=True, map1_absolute=False),
    }
    plys = {}
    for name, kw in variants.items():
        path = tmp_path / f"{name}.bin"
        path.write_bytes(build_fixture_stream(frames, **kw))
        for dev in (True, False):
            out = decode_all(path, dev)
            assert len(out) == len(frames)
            assert all(len(ps) > 0 for ps in out)
            plys[(name, dev)] = [format_ply(ps) for ps in out]
    ref = plys[("single", False)]
    for key, got in plys.items():
        assert got == ref, f"{key} diverged from single-stream oracle"


def test_multimap_missing_map_stream_fails_cleanly(tmp_path):
    """Dropping the D1 sub-stream raises a clean envelope error."""
    from tpu_vpcc.bitio import Bitstream
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
    from tpu_vpcc.v3c import writer as w3c
    from tpu_vpcc.v3c.syntax import V3CUnitType

    frames = make_frames(seed=211, n_frames=1)
    stream = build_fixture_stream(frames, multi_map_streams=True)
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    # rebuild without the second GVD unit (unit order: VPS AD OVD GVD GVD AVD AVD)
    sw = w3c.V3CSampleStreamWriter()
    seen_gvd = 0
    for unit in ssvu.units:
        if unit.unit_type == V3CUnitType.GVD:
            seen_gvd += 1
            if seen_gvd == 2:
                continue
        sw.units.append(unit.data)
    path = tmp_path / "mm_missing.bin"
    path.write_bytes(sw.getvalue())
    decoder = Decoder(Params(path, use_device=False))
    decoder.start()
    with pytest.raises(UnsupportedFeature, match="missing occupancy"):
        list(decoder)


def test_multimap_with_smoothing_and_ptiles(tmp_path):
    """Multi-map staging composes with the other decode machinery:
    P-tiles (inter/merge/skip) and grid geometry smoothing, device ==
    oracle."""
    rng = np.random.default_rng(221)
    f0 = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=3, frame_index=0,
    )
    f1 = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=0, frame_index=1,
        patches=f0.meta.patches,
    )
    path = tmp_path / "mm_mix.bin"
    path.write_bytes(
        build_fixture_stream(
            [f0, f1],
            multi_map_streams=True,
            p_modes={1: [("inter", 0), "merge3d", "skip"]},
            geo_smoothing_sei=(8, 16),
        )
    )
    outs = []
    for dev in (True, False):
        d = Decoder(
            Params(path, use_device=dev, apply_geo_smoothing_type=True)
        )
        d.start()
        outs.append(list(d))
    dev, orc = outs
    assert len(dev) == len(orc) == 2
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)
