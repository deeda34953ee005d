"""EOM-patch decode (framework extension — the reference panics on the
ASPS flag, ``reader.rs:1069``, and on the patch mode,
``decoder.rs:499-501``).

EOM codes the in-between points of thick surfaces in the occupancy
video (codeword = occupancy value − 1, bit j → a point at depth
d0 + j + 1); their colors live in the EOM patch's 2D region of the
attribute video, raster order. These tests pin: metadata roundtrip, an
independent scalar recomputation of the EOM tail (positions AND
colors), device-vs-oracle byte equality, the occupancy-precision and
count-consistency gates, and SKIP-tile inheritance. The regular points
must be bit-identical to the same scene WITHOUT the planted codewords —
the >0 binarization shields the D0/D1 path."""

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.reconstruction.pointset import convert_yuv10_to_rgb8
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame, plant_eom_patch
from tpu_vpcc.v3c.syntax import UnsupportedFeature
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def free_block_rect(sf, need_w, need_h):
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


def make_eom_frame(rng, n_patches=2, frame_index=0, **kw):
    """A synthetic frame at occupancy precision 1 (EOM needs per-pixel
    codewords) with an EOM patch over all regular patches."""
    sf = make_synthetic_frame(
        rng, width=kw.get("width", 64), height=kw.get("height", 64),
        occupancy_resolution=kw.get("res", 8), occupancy_precision=1,
        map_count=2, n_patches=n_patches, frame_index=frame_index,
        allow_swap=kw.get("allow_swap", True),
    )
    u0, v0 = free_block_rect(sf, 2, 2)
    plant_eom_patch(rng, sf, (u0, v0, 2, 2), list(range(len(sf.meta.patches))))
    return sf


def expected_eom_tail(sf, geo_shift=2):
    """Independent scalar recomputation of the EOM tail from the
    authored planes (blocks in patch raster order, pixels raster,
    codeword bits ascending; colors raster over the EOM region)."""
    res = sf.occupancy_resolution
    W, H = sf.meta.width, sf.meta.height
    geo0 = sf.geo_planes[0]
    ay, au, av = sf.attr_planes[0]
    csh = 0 if au.shape == ay.shape else 1
    pos, col = [], []
    for ep in sf.meta.eom_patches:
        k0 = len(pos)
        for pi in ep.member_patches:
            patch = sf.meta.patches[pi]
            for v0 in range(patch.size_uv0[1]):
                for u0 in range(patch.size_uv0[0]):
                    for v1 in range(res):
                        for u1 in range(res):
                            u, v = u0 * res + u1, v0 * res + v1
                            x, y = patch.patch_to_canvas(u, v, W, H)
                            code = int(sf.occ_plane[y, x])
                            if code <= 1:
                                continue
                            code -= 1
                            d0 = int(geo0[y, x]) >> geo_shift
                            j = 0
                            while code:
                                if code & 1:
                                    depth = d0 + j + 1
                                    pt = [0, 0, 0]
                                    if patch.projection_mode == 0:
                                        nrm = depth + patch.d1
                                    else:
                                        nrm = max(patch.d1, depth) - depth
                                    pt[patch.axes[0]] = nrm & 0xFFFF
                                    pt[patch.axes[1]] = (u + patch.uv1[0]) & 0xFFFF
                                    pt[patch.axes[2]] = (v + patch.uv1[1]) & 0xFFFF
                                    pos.append(pt)
                                code >>= 1
                                j += 1
        if ep.in_aux_video:
            # colors live in the AUX attribute video — callers check
            # them against the aux planes themselves (test_aux_video,
            # test_aux_multitile); only positions are recomputed here
            col.extend([(0, 0, 0)] * (len(pos) - k0))
            continue
        w_pix = ep.size_u0 * res
        x0, y0 = ep.u0 * res, ep.v0 * res
        for k in range(len(pos) - k0):
            px, py = x0 + k % w_pix, y0 + k // w_pix
            col.append(
                (int(ay[py, px]), int(au[py >> csh, px >> csh]),
                 int(av[py >> csh, px >> csh]))
            )
    return (
        np.array(pos, dtype=np.uint16).reshape(-1, 3),
        np.array(col, dtype=np.uint16).reshape(-1, 3),
    )


def decode_all(path, use_device):
    d = Decoder(Params(path, use_device=use_device))
    d.start()
    return list(d)


def test_eom_metadata_roundtrip(tmp_path):
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    rng = np.random.default_rng(51)
    frames = [make_eom_frame(rng, frame_index=i) for i in range(2)]
    stream = build_fixture_stream(frames)
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    context = Context()
    ssvu.decode_gof(context)
    metas = create_patch_frames(context)
    for meta, sf in zip(metas, frames):
        assert len(meta.eom_patches) == len(sf.meta.eom_patches) == 1
        got, exp = meta.eom_patches[0], sf.meta.eom_patches[0]
        assert (got.u0, got.v0, got.size_u0, got.size_v0) == (
            exp.u0, exp.v0, exp.size_u0, exp.size_v0
        )
        assert got.member_patches == exp.member_patches
        assert got.member_points == exp.member_points


@pytest.mark.parametrize("use_device", [True, False])
def test_eom_tail_expectation(tmp_path, use_device):
    """The decoded EOM tail (positions and converted colors) equals an
    independent scalar recomputation; the regular prefix is bit-equal
    to the same scene decoded without the planted codewords."""
    rng = np.random.default_rng(61)
    sf = make_eom_frame(rng, n_patches=2, allow_swap=False)
    # the codeword-free twin: values clamped back to 0/1 (same scene,
    # EOM patch dropped)
    import copy

    sf_plain = copy.deepcopy(sf)
    sf_plain.occ_plane = (sf_plain.occ_plane > 0).astype(np.uint8)
    sf_plain.meta.eom_patches = []

    path = tmp_path / "eom.bin"
    path.write_bytes(build_fixture_stream([sf]))
    path_plain = tmp_path / "plain.bin"
    path_plain.write_bytes(build_fixture_stream([sf_plain]))

    (ps,) = decode_all(path, use_device)
    (ps_plain,) = decode_all(path_plain, use_device)

    exp_pos, exp_col16 = expected_eom_tail(sf)
    n_reg = len(ps_plain)
    assert len(ps) == n_reg + exp_pos.shape[0]
    assert exp_pos.shape[0] > 0
    np.testing.assert_array_equal(
        ps.positions[:n_reg], ps_plain.positions
    )
    np.testing.assert_array_equal(ps.colors[:n_reg], ps_plain.colors)
    np.testing.assert_array_equal(ps.positions[n_reg:], exp_pos)
    np.testing.assert_array_equal(
        ps.colors[n_reg:], convert_yuv10_to_rgb8(exp_col16)
    )


def test_eom_device_path_matches_oracle_path(tmp_path):
    from tpu_vpcc.utils.ply import format_ply

    rng = np.random.default_rng(71)
    frames = [make_eom_frame(rng, n_patches=3, frame_index=i) for i in range(2)]
    path = tmp_path / "eom2.bin"
    path.write_bytes(build_fixture_stream(frames))
    dev = decode_all(path, True)
    orc = decode_all(path, False)
    assert len(dev) == len(orc) == 2
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)


def test_eom_skip_tile_inherits(tmp_path):
    """A SKIP tile replicates the reference frame's EOM patch list; the
    replicated counts must match frame 1's own occupancy codewords, so
    frame 1 reuses frame 0's planes."""
    from tpu_vpcc.utils.ply import format_ply
    import copy

    rng = np.random.default_rng(81)
    sf0 = make_eom_frame(rng, n_patches=2)
    sf1 = copy.deepcopy(sf0)
    sf1.meta.frame_index = 1
    path = tmp_path / "eom_skip.bin"
    path.write_bytes(
        build_fixture_stream([sf0, sf1], p_modes={1: "skip_tile"})
    )
    dev = decode_all(path, True)
    orc = decode_all(path, False)
    assert len(dev) == len(orc) == 2
    assert format_ply(dev[0]) == format_ply(dev[1])
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)


def test_eom_count_mismatch_fails_cleanly(tmp_path):
    rng = np.random.default_rng(91)
    sf = make_eom_frame(rng)
    sf.meta.eom_patches[0].member_points[0] += 1
    path = tmp_path / "eom_bad.bin"
    path.write_bytes(build_fixture_stream([sf]))
    decoder = Decoder(Params(path, use_device=False))
    decoder.start()
    with pytest.raises(UnsupportedFeature, match="codewords decode"):
        list(decoder)


def test_eom_precision_gate(tmp_path):
    """EOM with a downscaled occupancy video (precision > 1) cannot
    carry per-pixel codewords — clean UnsupportedFeature, not garbage."""
    from tpu_vpcc.atlas.patches import EomPatch

    rng = np.random.default_rng(101)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=1, frame_index=0,
    )
    sf.meta.eom_patches.append(
        EomPatch(u0=0, v0=0, size_u0=1, size_v0=1,
                 member_patches=[0], member_points=[0],
                 occupancy_resolution=8)
    )
    path = tmp_path / "eom_prec.bin"
    path.write_bytes(build_fixture_stream([sf]))
    decoder = Decoder(Params(path, use_device=False))
    decoder.start()
    with pytest.raises(UnsupportedFeature, match="occupancy precision"):
        list(decoder)


def test_eom_region_capacity_violation_fails_cleanly(tmp_path):
    """An EOM patch declaring more points than its region holds raises
    at patch-frame construction."""
    from tpu_vpcc.atlas.patches import EomPatch

    rng = np.random.default_rng(111)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=1, map_count=2, n_patches=1, frame_index=0,
    )
    sf.meta.eom_patches.append(
        EomPatch(u0=0, v0=0, size_u0=1, size_v0=1,
                 member_patches=[0], member_points=[100],
                 occupancy_resolution=8)
    )
    path = tmp_path / "eom_cap.bin"
    path.write_bytes(build_fixture_stream([sf]))
    decoder = Decoder(Params(path, use_device=False))
    decoder.start()
    with pytest.raises(UnsupportedFeature, match="EOM patch declares"):
        list(decoder)


def test_eom_bit_flips_fail_cleanly(tmp_path):
    """Bit flips across an EOM stream either reparse or raise cleanly
    (no hang, no crash) through patch-frame construction."""
    import time

    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    rng = np.random.default_rng(121)
    frames = [make_eom_frame(rng, frame_index=i) for i in range(2)]
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

def make_eom_frame_1map(rng, n_patches=2, frame_index=0, max_bits=3, **kw):
    """Single-map twin of make_eom_frame (framework extension: the ASPS
    codes asps_eom_fix_bit_count_minus1; no D1 bounds the codewords)."""
    sf = make_synthetic_frame(
        rng, width=kw.get("width", 64), height=kw.get("height", 64),
        occupancy_resolution=kw.get("res", 8), occupancy_precision=1,
        map_count=1, n_patches=n_patches, frame_index=frame_index,
        allow_swap=kw.get("allow_swap", True),
    )
    u0, v0 = free_block_rect(sf, 2, 2)
    plant_eom_patch(
        rng, sf, (u0, v0, 2, 2), list(range(len(sf.meta.patches))),
        max_bits=max_bits,
    )
    return sf


def test_single_map_eom_asps_roundtrip():
    """The fixed codeword bit count survives write -> parse."""
    from tpu_vpcc.v3c import writer as w3c
    from tpu_vpcc.v3c.syntax import AtlasSequenceParameterSet

    asps = AtlasSequenceParameterSet()
    asps.map_count_minus1 = 0
    asps.eom_patch_enabled_flag = True
    asps.eom_fix_bit_count_minus1 = 4
    parsed = AtlasSequenceParameterSet.parse(
        Bitstream(w3c.write_asps(asps))
    )
    assert parsed.eom_patch_enabled_flag
    assert parsed.eom_fix_bit_count_minus1 == 4


@pytest.mark.parametrize("use_device", [True, False])
def test_single_map_eom_tail_expectation(tmp_path, use_device):
    """Single-map EOM: the decoded tail equals the scalar recomputation
    and the regular prefix equals a codeword-free decode."""
    import copy

    rng = np.random.default_rng(71)
    sf = make_eom_frame_1map(rng, n_patches=2, allow_swap=False)
    sf_plain = copy.deepcopy(sf)
    sf_plain.occ_plane = (sf_plain.occ_plane > 0).astype(np.uint8)
    sf_plain.meta.eom_patches = []

    path = tmp_path / "eom1.bin"
    path.write_bytes(build_fixture_stream([sf]))
    path_plain = tmp_path / "plain1.bin"
    path_plain.write_bytes(build_fixture_stream([sf_plain]))

    (ps,) = decode_all(path, use_device)
    (ps_plain,) = decode_all(path_plain, use_device)
    exp_pos, exp_col16 = expected_eom_tail(sf)
    n_reg = len(ps_plain)
    assert exp_pos.shape[0] > 0
    assert len(ps) == n_reg + exp_pos.shape[0]
    np.testing.assert_array_equal(ps.positions[:n_reg], ps_plain.positions)
    np.testing.assert_array_equal(ps.positions[n_reg:], exp_pos)
    np.testing.assert_array_equal(
        ps.colors[n_reg:], convert_yuv10_to_rgb8(exp_col16)
    )


def test_single_map_eom_device_matches_oracle(tmp_path):
    from tpu_vpcc.utils.ply import format_ply

    rng = np.random.default_rng(83)
    frames = [
        make_eom_frame_1map(rng, frame_index=i, max_bits=4)
        for i in range(2)
    ]
    path = tmp_path / "eom1b.bin"
    path.write_bytes(build_fixture_stream(frames))
    dev = decode_all(path, True)
    orc = decode_all(path, False)
    assert len(dev) == len(orc) == 2
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)


def test_single_map_eom_codeword_wider_than_fixed_count_fails():
    """A codeword needing more bits than the ASPS fixed count is not
    decodable content: clean UnsupportedFeature, no output."""
    from tpu_vpcc.reconstruction.eom_points import eom_points_for_frame
    from tpu_vpcc.v3c.syntax import UnsupportedFeature

    rng = np.random.default_rng(91)
    sf = make_eom_frame_1map(rng, n_patches=1, max_bits=4,
                             allow_swap=False)
    with pytest.raises(UnsupportedFeature, match="single-map EOM"):
        eom_points_for_frame(
            sf.meta, sf.occ_plane, sf.geo_planes[0], None,
            2, 1, sf.meta.width, 1, fix_bit_count=1,
        )
