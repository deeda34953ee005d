"""Auxiliary-video raw/EOM patches (framework extension).

The reference asserts the unit-header aux flag false (``reader.rs:74``)
and never demuxes an auxiliary video. Here aux-flagged GVD/AVD units
decode to separate raster videos; raw patches whose
``rpdu_patch_in_auxiliary_video_flag`` is set read their coordinate
runs and colors from those planes (coordinates relative to the aux
video origin — single-tile band), and aux-flagged EOM patches take
their colors from the aux attribute video while their codewords stay
in the occupancy video."""

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.reconstruction.pointset import convert_yuv10_to_rgb8
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame, plant_raw_patch
from tpu_vpcc.v3c.syntax import UnsupportedFeature
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def decode_all(data, use_device):
    d = Decoder(Params(bytes(data), use_device=use_device))
    d.start()
    return list(d)


def expected_aux_raw_points(sf, rp, geo_shift=2):
    """Independent scalar read-back of one AUX raw patch."""
    res = rp.occupancy_resolution
    x0, y0 = rp.u0 * res, rp.v0 * res
    w = rp.size_u0 * res
    n = rp.n_points
    geo = sf.aux_geo_plane
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
    ay, au, av = sf.aux_attr_planes
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


def make_aux_frames(seed=5, n_frames=2, with_main_raw=False):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n_frames):
        sf = make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=2,
            frame_index=i,
        )
        if with_main_raw:
            from tests.test_raw_patches import free_block_rect

            u0, v0 = free_block_rect(sf, 2, 1)
            plant_raw_patch(rng, sf, (u0, v0, 2, 1), n_points=11,
                            offsets=(3, 1, 2))
        # aux raw patch: region in the 64x64 aux video, offsets exercise
        # the 3D shift
        plant_raw_patch(rng, sf, (1, 2, 3, 2), n_points=29 + i,
                        offsets=(5, 7, 9), aux=True)
        frames.append(sf)
    return frames


@pytest.mark.parametrize("use_device", [True, False])
def test_aux_raw_tail_expectation(tmp_path, use_device):
    """Aux raw points append after the regular points with the exact
    values/colors read back from the aux planes."""
    import copy

    frames = make_aux_frames(seed=5)
    frames_plain = copy.deepcopy(frames)
    for sf in frames_plain:
        sf.meta.raw_patches = []
        sf.aux_geo_plane = None
        sf.aux_attr_planes = None
    got = decode_all(build_fixture_stream(frames), use_device)
    plain = decode_all(build_fixture_stream(frames_plain), use_device)
    assert len(got) == len(plain) == len(frames)
    for ps, ps0, sf in zip(got, plain, frames):
        (rp,) = sf.meta.raw_patches
        exp_pos, exp_col16 = expected_aux_raw_points(sf, rp)
        n_reg = len(ps0)
        assert len(ps) == n_reg + exp_pos.shape[0]
        np.testing.assert_array_equal(ps.positions[:n_reg], ps0.positions)
        np.testing.assert_array_equal(ps.positions[n_reg:], exp_pos)
        np.testing.assert_array_equal(
            ps.colors[n_reg:], convert_yuv10_to_rgb8(exp_col16)
        )


@pytest.mark.parametrize("use_device", [True, False])
def test_mixed_main_and_aux_raw(tmp_path, use_device):
    """Main-video and aux-video raw patches coexist in one frame; the
    tail keeps bitstream order."""
    from tests.test_raw_patches import expected_raw_points

    frames = make_aux_frames(seed=11, n_frames=1, with_main_raw=True)
    (sf,) = frames
    got = decode_all(build_fixture_stream(frames), use_device)
    (ps,) = got
    main_rp, aux_rp = sf.meta.raw_patches
    assert not main_rp.in_aux_video and aux_rp.in_aux_video
    exp_main, col_main = expected_raw_points(sf, main_rp)
    exp_aux, col_aux = expected_aux_raw_points(sf, aux_rp)
    n_tail = exp_main.shape[0] + exp_aux.shape[0]
    tail = ps.positions[len(ps) - n_tail:]
    np.testing.assert_array_equal(tail[: exp_main.shape[0]], exp_main)
    np.testing.assert_array_equal(tail[exp_main.shape[0]:], exp_aux)
    ctail = ps.colors[len(ps) - n_tail:]
    np.testing.assert_array_equal(
        ctail[exp_main.shape[0]:], convert_yuv10_to_rgb8(col_aux)
    )


def test_aux_eom_colors_from_aux_video(tmp_path):
    """Aux-flagged EOM patch: codewords stay in the occupancy video,
    colors come from the AUX attribute region; device == oracle and the
    tail matches the scalar recomputation against the aux planes."""
    from tests.test_eom import expected_eom_tail, free_block_rect  # noqa: F401
    from tpu_vpcc.utils.synthetic import plant_eom_patch
    from tpu_vpcc.utils.ply import format_ply

    rng = np.random.default_rng(17)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=1, map_count=2, n_patches=2,
        frame_index=0, allow_swap=False,
    )
    plant_eom_patch(rng, sf, (0, 0, 2, 2),
                    list(range(len(sf.meta.patches))), aux=True)
    (ep,) = sf.meta.eom_patches
    assert ep.in_aux_video
    stream = build_fixture_stream([sf])
    dev = decode_all(stream, True)
    orc = decode_all(stream, False)
    assert format_ply(dev[0]) == format_ply(orc[0])

    # scalar color expectation against the aux attr region
    (ps,) = orc
    # positions: reuse the main expected_eom_tail position logic (the
    # codewords are in the occupancy plane regardless of aux)
    exp_pos, _ = expected_eom_tail(sf)
    n = exp_pos.shape[0]
    assert n > 0
    np.testing.assert_array_equal(ps.positions[len(ps) - n:], exp_pos)
    res = ep.occupancy_resolution
    w_pix = ep.size_u0 * res
    ay, au, av = sf.aux_attr_planes
    csh = 0 if au.shape == ay.shape else 1
    x0, y0 = ep.u0 * res, ep.v0 * res
    col16 = np.array(
        [
            (
                int(ay[y0 + k // w_pix, x0 + k % w_pix]),
                int(au[(y0 + k // w_pix) >> csh, (x0 + k % w_pix) >> csh]),
                int(av[(y0 + k // w_pix) >> csh, (x0 + k % w_pix) >> csh]),
            )
            for k in range(n)
        ],
        dtype=np.uint16,
    )
    np.testing.assert_array_equal(
        ps.colors[len(ps) - n:], convert_yuv10_to_rgb8(col16)
    )


def test_aux_patch_without_aux_video_fails_cleanly():
    from tpu_vpcc.atlas.patches import RawPatch
    from tpu_vpcc.reconstruction.raw_points import raw_points_for_frame

    rp = RawPatch(u0=0, v0=0, size_u0=2, size_v0=1, n_points=4,
                  occupancy_resolution=8, in_aux_video=True)
    geo = np.zeros((64, 64), np.uint16)
    with pytest.raises(UnsupportedFeature, match="no auxiliary video"):
        raw_points_for_frame([rp], geo, None, 2, 1, 64)


def test_aux_region_leaving_aux_video_fails_cleanly(tmp_path):
    """An aux raw region past the decoded aux video dims is not
    decodable content (the derivation cannot bound-check it)."""
    frames = make_aux_frames(seed=23, n_frames=1)
    (sf,) = frames
    # move the region out of the 64x64 aux video
    sf.meta.raw_patches[0].v0 = 7  # 7*8 + 16 > 64
    stream = build_fixture_stream(frames)
    d = Decoder(Params(bytes(stream), use_device=False))
    d.start()
    with pytest.raises(UnsupportedFeature, match="leaves the"):
        list(d)


def test_aux_attr_format_mismatch_fails_cleanly():
    """The tails apply the REGULAR attribute video's bit depth / RGB-ness
    to aux-sourced color samples, so an aux attribute video coded at a
    different depth is not decodable content — it must gate cleanly
    instead of silently mangling values."""
    frames = make_aux_frames(seed=31, n_frames=1)
    for sf in frames:
        # 8-bit-encodable content (the mismatch is the DEPTH, not range)
        sf.aux_attr_planes = [
            np.minimum(p, 255).astype(np.uint16) for p in sf.aux_attr_planes
        ]
    stream = build_fixture_stream(frames, aux_attr_bit_depth=8)
    d = Decoder(Params(bytes(stream), use_device=False))
    d.start()
    with pytest.raises(UnsupportedFeature, match="auxiliary video format"):
        list(d)


def test_undersized_aux_attr_plane_fails_cleanly():
    """Per-family aux videos are sized independently; a region that fits
    the aux GEOMETRY plane but leaves the aux ATTRIBUTE plane gates
    cleanly instead of crashing on a numpy broadcast error."""
    from tpu_vpcc.atlas.patches import RawPatch
    from tpu_vpcc.reconstruction.raw_points import raw_points_for_frame

    rp = RawPatch(u0=0, v0=5, size_u0=2, size_v0=1, n_points=16,
                  occupancy_resolution=8, in_aux_video=True)
    geo = np.zeros((64, 64), np.uint16)
    attr = [np.zeros((64, 64), np.uint16)] * 3
    aux_geo = np.zeros((64, 64), np.uint16)  # region fits (rows 40..48)
    aux_attr = [np.zeros((32, 32), np.uint16),
                np.zeros((16, 16), np.uint16),
                np.zeros((16, 16), np.uint16)]  # region does not
    with pytest.raises(UnsupportedFeature, match="attribute plane"):
        raw_points_for_frame(
            [rp], geo, attr, 2, 1, 64,
            aux_geo_plane=aux_geo, aux_attr_planes=aux_attr,
        )


def test_unconsumed_aux_videos_never_reach_gofdata():
    """Aux videos present but NO aux-flagged patch: the per-family
    validation loop is skipped, so the unvalidated frames (and their
    default chroma shift) must not be populated into GofData — and the
    decode must equal the decode of the same scene without aux videos."""
    import copy

    from tpu_vpcc.bitio import Bitstream
    from tpu_vpcc.runtime.pipeline import prepare_gof
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    rng = np.random.default_rng(41)
    frames = [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=2, frame_index=i,
        )
        for i in range(2)
    ]
    frames_plain = copy.deepcopy(frames)
    stream = build_fixture_stream(frames, force_aux_videos=True)

    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    gof = prepare_gof(ctx)
    assert gof.aux_attr_planes is None
    assert gof.aux_geo_planes is None
    assert gof.aux_chroma_shift == 1

    got = decode_all(stream, use_device=False)
    plain = decode_all(build_fixture_stream(frames_plain), use_device=False)
    assert len(got) == len(plain) == 2
    for a, b in zip(got, plain):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.colors, b.colors)
