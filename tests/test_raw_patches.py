"""Raw-patch decode (framework extension — the reference panics on the
ASPS flag, ``reader.rs:1068``, and comments the data path out).

A raw patch stores verbatim point coordinates in the geometry video
(three runs over the region raster: x, then y, then z) and one
attribute pixel per point; raw points append after the frame's regular
points. The expectation here is computed by an independent scalar loop
over the authored planes, so the writer, parser, and both
reconstruction paths are all checked against a third implementation."""

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.reconstruction.pointset import convert_yuv10_to_rgb8
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame, plant_raw_patch
from tpu_vpcc.v3c.syntax import (
    AtlasSequenceParameterSet,
    UnsupportedFeature,
)
from tpu_vpcc.v3c import writer as w3c
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def free_block_rect(sf, need_w, need_h):
    """A (u0, v0) whose need_w x need_h block rect no regular patch
    footprint touches."""
    res = sf.occupancy_resolution
    bw, bh = sf.meta.width // res, sf.meta.height // res
    occupied = np.zeros((bh, bw), dtype=bool)
    for p in sf.meta.patches:
        su, sv = p.size_uv0
        fw, fh = (sv, su) if int(p.patch_orientation) == 1 else (su, sv)
        occupied[p.uv0[1] : p.uv0[1] + fh, p.uv0[0] : p.uv0[0] + fw] = True
    for v0 in range(bh - need_h + 1):
        for u0 in range(bw - need_w + 1):
            if not occupied[v0 : v0 + need_h, u0 : u0 + need_w].any():
                return u0, v0
    raise AssertionError("no free region on the synthetic atlas")


def make_raw_fixture(tmp_path, seed=7, n_frames=2, raw_per_frame=(1, 2),
                     n_points=37, **kw):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n_frames):
        sf = make_synthetic_frame(
            rng, width=kw.get("width", 64), height=kw.get("height", 64),
            occupancy_resolution=kw.get("res", 8),
            occupancy_precision=kw.get("prec", 4),
            map_count=2, n_patches=kw.get("n_patches", 2), frame_index=i,
        )
        for k in range(raw_per_frame[i % len(raw_per_frame)]):
            u0, v0 = free_block_rect(sf, 2, 1)
            plant_raw_patch(
                rng, sf, (u0, v0, 2, 1), n_points + 3 * k,
                offsets=(int(rng.integers(0, 200)),
                         int(rng.integers(0, 200)),
                         int(rng.integers(0, 200))),
            )
        frames.append(sf)
    stream = build_fixture_stream(frames)
    path = tmp_path / "raw_fixture.bin"
    path.write_bytes(stream)
    return frames, path


def expected_raw_points(sf, rp, geo_shift=2):
    """Independent scalar read-back of one raw patch from the planes."""
    res = sf.occupancy_resolution
    x0, y0 = rp.u0 * res, rp.v0 * res
    w = rp.size_u0 * res
    n = rp.n_points
    geo = sf.geo_planes[0]
    vals = [
        int(geo[y0 + i // w, x0 + i % w]) >> geo_shift for i in range(3 * n)
    ]
    pos = np.array(
        [
            (vals[i] + rp.u1, vals[n + i] + rp.v1, vals[2 * n + i] + rp.d1)
            for i in range(n)
        ],
        dtype=np.uint16,
    )
    ay, au, av = sf.attr_planes[0]
    csh = 0 if au.shape == ay.shape else 1
    col16 = np.array(
        [
            (
                int(ay[y0 + i // w, x0 + i % w]),
                int(au[(y0 + i // w) >> csh, (x0 + i % w) >> csh]),
                int(av[(y0 + i // w) >> csh, (x0 + i % w) >> csh]),
            )
            for i in range(n)
        ],
        dtype=np.uint16,
    )
    return pos, col16


def expected_raw_tail(sf):
    pos_parts, col_parts = [], []
    for rp in sf.meta.raw_patches:
        pos, col16 = expected_raw_points(sf, rp)
        pos_parts.append(pos)
        col_parts.append(convert_yuv10_to_rgb8(col16))
    return np.concatenate(pos_parts), np.concatenate(col_parts)


def test_raw_patch_metadata_roundtrip(tmp_path):
    """Writer → parser → create_patch_frames reproduces the raw records."""
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    frames, path = make_raw_fixture(tmp_path)
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(path.read_bytes()))
    context = Context()
    ssvu.decode_gof(context)
    metas = create_patch_frames(context)
    assert len(metas) == len(frames)
    for meta, sf in zip(metas, frames):
        assert len(meta.patches) == len(sf.meta.patches)
        assert [
            (rp.u0, rp.v0, rp.size_u0, rp.size_v0, rp.u1, rp.v1, rp.d1,
             rp.n_points)
            for rp in meta.raw_patches
        ] == [
            (rp.u0, rp.v0, rp.size_u0, rp.size_v0, rp.u1, rp.v1, rp.d1,
             rp.n_points)
            for rp in sf.meta.raw_patches
        ]


@pytest.mark.parametrize("use_device", [True, False])
def test_raw_points_append_after_regular(tmp_path, use_device):
    """Decoded frames end with exactly the independently computed raw
    tail, after the regular points both paths already pin elsewhere."""
    frames, path = make_raw_fixture(tmp_path)
    decoder = Decoder(Params(path, use_device=use_device))
    decoder.start()
    decoded = list(decoder)
    assert len(decoded) == len(frames)
    for ps, sf in zip(decoded, frames):
        pos_r, col_r = expected_raw_tail(sf)
        n_raw = pos_r.shape[0]
        assert n_raw > 0
        np.testing.assert_array_equal(ps.positions[-n_raw:], pos_r)
        np.testing.assert_array_equal(ps.colors[-n_raw:], col_r)
        # the regular prefix is bigger than the raw tail in this fixture
        assert ps.positions.shape[0] > n_raw


def test_raw_device_path_matches_oracle_path(tmp_path):
    from tpu_vpcc.utils.ply import format_ply

    _, path = make_raw_fixture(tmp_path, seed=11)
    d1 = Decoder(Params(path, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(path, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) > 0
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)


def test_raw_patches_in_p_tile(tmp_path):
    """P-tiles carry raw patches via P_RAW=4; the merge/skip same-index
    rule counts only regular patches."""
    rng = np.random.default_rng(5)
    sf0 = make_synthetic_frame(rng, width=64, height=64,
                               occupancy_resolution=8, occupancy_precision=4,
                               map_count=2, n_patches=2, frame_index=0)
    sf1 = make_synthetic_frame(rng, width=64, height=64,
                               occupancy_resolution=8, occupancy_precision=4,
                               map_count=2, n_patches=0, frame_index=1,
                               patches=sf0.meta.patches)
    for sf in (sf0, sf1):
        u0, v0 = free_block_rect(sf, 2, 1)
        plant_raw_patch(rng, sf, (u0, v0, 2, 1), 25, offsets=(3, 5, 7))
    stream = build_fixture_stream(
        [sf0, sf1], p_modes={1: ["skip", "skip"]}
    )
    path = tmp_path / "raw_p.bin"
    path.write_bytes(stream)
    for use_device in (True, False):
        decoder = Decoder(Params(path, use_device=use_device))
        decoder.start()
        decoded = list(decoder)
        assert len(decoded) == 2
        for ps, sf in zip(decoded, (sf0, sf1)):
            pos_r, col_r = expected_raw_tail(sf)
            np.testing.assert_array_equal(
                ps.positions[-pos_r.shape[0]:], pos_r
            )
            np.testing.assert_array_equal(
                ps.colors[-pos_r.shape[0]:], col_r
            )


def test_raw_only_frame(tmp_path):
    """A frame whose only content is raw patches decodes to exactly the
    raw tail on both paths."""
    rng = np.random.default_rng(9)
    sf = make_synthetic_frame(rng, width=64, height=64,
                              occupancy_resolution=8, occupancy_precision=4,
                              map_count=2, n_patches=0, frame_index=0,
                              patches=[])
    plant_raw_patch(rng, sf, (1, 1, 2, 2), 60, offsets=(10, 20, 30))
    stream = build_fixture_stream([sf])
    path = tmp_path / "raw_only.bin"
    path.write_bytes(stream)
    for use_device in (True, False):
        decoder = Decoder(Params(path, use_device=use_device))
        decoder.start()
        decoded = list(decoder)
        assert len(decoded) == 1
        pos_r, col_r = expected_raw_tail(sf)
        np.testing.assert_array_equal(decoded[0].positions, pos_r)
        np.testing.assert_array_equal(decoded[0].colors, col_r)


def test_raw_capacity_violation_fails_cleanly(tmp_path):
    """A raw patch claiming more points than its region holds raises
    UnsupportedFeature at patch-frame construction, not a crash."""
    from tpu_vpcc.atlas.patches import RawPatch

    rng = np.random.default_rng(13)
    sf = make_synthetic_frame(rng, width=64, height=64,
                              occupancy_resolution=8, occupancy_precision=4,
                              map_count=2, n_patches=1, frame_index=0)
    # 2x1 blocks of 8px = 128 samples < 3 * 100
    sf.meta.raw_patches.append(
        RawPatch(u0=0, v0=0, size_u0=2, size_v0=1, n_points=100,
                 occupancy_resolution=8)
    )
    stream = build_fixture_stream([sf])
    path = tmp_path / "raw_bad.bin"
    path.write_bytes(stream)
    decoder = Decoder(Params(path, use_device=False))
    decoder.start()
    with pytest.raises(UnsupportedFeature, match="raw patch carries"):
        list(decoder)


def test_raw_lod_bit_flips_fail_cleanly(tmp_path):
    """Bit flips across the header/atlas region of a raw+LoD stream
    either reparse or raise cleanly (no hang, no crash) through patch-
    frame construction — the raw capacity/canvas checks run there."""
    import time

    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    rng = np.random.default_rng(3)
    frames = []
    for i in range(2):
        sf = make_synthetic_frame(rng, width=64, height=64,
                                  occupancy_resolution=8,
                                  occupancy_precision=4, map_count=2,
                                  n_patches=2, frame_index=i)
        sf.meta.patches[0].level_of_detail = (2, 2)
        u0, v0 = free_block_rect(sf, 2, 1)
        plant_raw_patch(rng, sf, (u0, v0, 2, 1), 20, offsets=(1, 2, 3))
        frames.append(sf)
    stream = bytearray(build_fixture_stream(frames))

    def full_decode(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(bytes(data)))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    full_decode(stream)  # baseline must decode
    t0 = time.monotonic()
    outcomes = {"ok": 0, "raised": 0}
    for i in range(0, 300, 5):
        mutated = bytearray(stream)
        mutated[i] ^= 0xFF
        try:
            full_decode(mutated)
            outcomes["ok"] += 1
        except Exception:
            outcomes["raised"] += 1
    assert outcomes["raised"] > 0
    assert time.monotonic() - t0 < 60


def test_eom_asps_roundtrip_both_map_counts():
    """Both EOM forms parse: two-map (tests/test_eom.py) and single-map
    with the fixed codeword bit count (framework extension)."""
    asps = AtlasSequenceParameterSet()
    asps.eom_patch_enabled_flag = True
    asps.map_count_minus1 = 0
    asps.eom_fix_bit_count_minus1 = 3
    parsed = AtlasSequenceParameterSet.parse(Bitstream(w3c.write_asps(asps)))
    assert parsed.eom_patch_enabled_flag
    assert parsed.eom_fix_bit_count_minus1 == 3

    asps.map_count_minus1 = 1
    parsed = AtlasSequenceParameterSet.parse(Bitstream(w3c.write_asps(asps)))
    assert parsed.eom_patch_enabled_flag


def test_auxiliary_video_asps_roundtrip():
    """The aux-video flag parses (framework extension — the reference
    panics, ``reader.rs:74``); tests/test_aux_video.py drives the
    decode."""
    asps = AtlasSequenceParameterSet()
    asps.raw_patch_enabled_flag = True
    asps.auxiliary_video_enabled_flag = True
    parsed = AtlasSequenceParameterSet.parse(Bitstream(w3c.write_asps(asps)))
    assert parsed.auxiliary_video_enabled_flag
