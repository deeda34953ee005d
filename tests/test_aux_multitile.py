"""Auxiliary-video raw/EOM patches in MULTI-TILE frames.

FRAMEWORK EXTENSION on two axes the reference rejects (aux unit-header
flag asserted false, ``reader.rs:74``; single-tile asserted,
``reader.rs:1266-1270``): the AFTI declares one aux-video band per tile
(``afti_auxiliary_video_tile_row_height``, units of 64 samples, bands
stacked vertically), each tile's aux-flagged raw/EOM regions are coded
band-relative, and the decoder reads them at ``v0*res + aux_band_y``
where ``aux_band_y`` is the accumulated height of the preceding tiles'
bands.

The test geometry exploits the fold's twin structure: the SAME authored
scene coded single-tile (one band covering the aux video, absolute
coordinates) and multi-tile (per-tile bands, band-relative coordinates)
must decode to byte-identical PLY — plus independent scalar read-backs
of the planted aux planes so a mirrored encode/decode band error cannot
cancel out.
"""

from dataclasses import replace

import numpy as np
import pytest

from tests.test_aux_video import expected_aux_raw_points
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.reconstruction.pointset import convert_yuv10_to_rgb8
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.ply import format_ply
from tpu_vpcc.utils.synthetic import (
    make_synthetic_frame,
    plant_eom_patch,
    plant_raw_patch,
)
from tpu_vpcc.v3c.syntax import PatchOrientation
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)

RES = 8


def decode_all(data, use_device):
    d = Decoder(Params(bytes(data), use_device=use_device))
    d.start()
    return list(d)


def make_two_tile_frame(rng, occupancy_precision=4):
    """128x64 canvas, two 64-px tile columns, one patch per tile,
    listed tile-major (so the single-tile twin reconstructs in the
    same order)."""
    f = make_synthetic_frame(
        rng, width=128, height=64, occupancy_resolution=RES,
        occupancy_precision=occupancy_precision, map_count=2,
        n_patches=2, frame_index=0, allow_swap=False,
    )
    p0 = replace(
        f.meta.patches[0], uv0=(1, 1), size_uv0=(3, 3),
        patch_orientation=PatchOrientation.DEFAULT,
    )
    p1 = replace(
        f.meta.patches[1], uv0=(9, 2), size_uv0=(4, 3),
        patch_orientation=PatchOrientation.DEFAULT,
    )
    return make_synthetic_frame(
        rng, width=128, height=64, occupancy_resolution=RES,
        occupancy_precision=occupancy_precision, frame_index=0,
        patches=[p0, p1],
    )


def plant_banded_aux_raws(rng, sf):
    """One aux raw patch per tile band: tile 0's in aux rows [0,64),
    tile 1's in [64,128) — authored at ABSOLUTE aux coordinates over a
    64x128 aux video (heights [1, 1] in units of 64)."""
    rp0 = plant_raw_patch(
        rng, sf, (0, 0, 2, 1), 5, offsets=(3, 1, 2), aux=True,
        aux_size=(128, 64),
    )
    rp1 = plant_raw_patch(
        rng, sf, (1, 64 // RES, 2, 1), 4, offsets=(7, 0, 5), aux=True,
        aux_size=(128, 64),
    )
    return rp0, rp1


@pytest.mark.parametrize("use_device", [False, True])
def test_multitile_aux_raw_bands(use_device):
    """Aux raw patches in both tiles' bands decode to the planted
    values (independent scalar read-back at absolute aux coords)."""
    rng = np.random.default_rng(41)
    sf = make_two_tile_frame(rng)
    rp0, rp1 = plant_banded_aux_raws(rng, sf)
    stream = build_fixture_stream(
        [sf], tiles=(2, 1), aux_tile_row_heights=[1, 1]
    )
    (ps,) = decode_all(stream, use_device)
    exp0, col0 = expected_aux_raw_points(sf, rp0)
    exp1, col1 = expected_aux_raw_points(sf, rp1)
    n_tail = exp0.shape[0] + exp1.shape[0]
    tail = ps.positions[len(ps) - n_tail:]
    np.testing.assert_array_equal(tail[: exp0.shape[0]], exp0)
    np.testing.assert_array_equal(tail[exp0.shape[0]:], exp1)
    ctail = ps.colors[len(ps) - n_tail:]
    np.testing.assert_array_equal(
        ctail, convert_yuv10_to_rgb8(np.concatenate([col0, col1]))
    )


def test_multitile_aux_twin_of_single_tile():
    """The same scene coded multi-tile (band-relative aux coords) and
    single-tile (one whole-video band) decodes byte-identically."""
    rng = np.random.default_rng(43)
    sf = make_two_tile_frame(rng)
    plant_banded_aux_raws(rng, sf)
    multi = build_fixture_stream(
        [sf], tiles=(2, 1), aux_tile_row_heights=[1, 1]
    )
    single = build_fixture_stream([sf])
    (pm,) = decode_all(multi, False)
    (psg,) = decode_all(single, False)
    assert len(pm) > 0
    assert format_ply(pm) == format_ply(psg)


def test_multitile_aux_band_relative_coding():
    """The multi-tile bitstream really codes tile 1's aux region
    band-RELATIVE: the decoded RawPatch carries the band origin
    separately, and dropping it would read the wrong rows."""
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.bitio import Bitstream
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    rng = np.random.default_rng(47)
    sf = make_two_tile_frame(rng)
    plant_banded_aux_raws(rng, sf)
    stream = build_fixture_stream(
        [sf], tiles=(2, 1), aux_tile_row_heights=[1, 1]
    )
    ctx = Context()
    SampleStreamV3CUnit.from_bitstream(Bitstream(stream)).decode_gof(ctx)
    afti = ctx.get_afps(0).atlas_frame_tile_information
    assert afti.auxiliary_video_tile_row_height == [1, 1]
    (meta,) = create_patch_frames(ctx)
    r0, r1 = meta.raw_patches
    assert (r0.aux_band_y, r1.aux_band_y) == (0, 64)
    # authored absolute v0 = coded band-relative v0 + band origin
    assert r0.v0 * RES == 0
    assert r1.v0 * RES + r1.aux_band_y == 64


def test_aux_region_leaving_declared_band_fails_cleanly():
    """An aux region taller than its tile's declared band would read
    another tile's rows — the patch derivation rejects it."""
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.bitio import Bitstream
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
    from tpu_vpcc.v3c.syntax import UnsupportedFeature

    rng = np.random.default_rng(67)
    sf = make_two_tile_frame(rng)
    plant_banded_aux_raws(rng, sf)
    stream = build_fixture_stream(
        [sf], tiles=(2, 1), aux_tile_row_heights=[1, 1]
    )
    ctx = Context()
    SampleStreamV3CUnit.from_bitstream(Bitstream(stream)).decode_gof(ctx)
    # a corrupt uvlc height can shrink a band under its regions
    afti = ctx.get_afps(0).atlas_frame_tile_information
    afti.auxiliary_video_tile_row_height = [0, 1]
    with pytest.raises(UnsupportedFeature, match="aux band"):
        create_patch_frames(ctx)


def test_multitile_aux_eom_colors_from_band(tmp_path):
    """Aux EOM patch owned by tile 1: codewords stay in the (folded)
    occupancy canvas, colors read from tile 1's aux band; scalar
    read-back plus device == oracle."""
    from tests.test_eom import expected_eom_tail

    rng = np.random.default_rng(53)
    sf = make_two_tile_frame(rng, occupancy_precision=1)
    # one EOM patch per tile, members tile-local; regions at absolute
    # aux rows inside each tile's band
    ep0 = plant_eom_patch(
        rng, sf, (0, 0, 2, 2), [0], aux=True, aux_size=(128, 64)
    )
    ep1 = plant_eom_patch(
        rng, sf, (0, 64 // RES, 2, 2), [1], aux=True, aux_size=(128, 64)
    )
    stream = build_fixture_stream(
        [sf], tiles=(2, 1), aux_tile_row_heights=[1, 1]
    )
    dev = decode_all(stream, True)
    orc = decode_all(stream, False)
    assert format_ply(dev[0]) == format_ply(orc[0])

    (ps,) = orc
    exp_pos, _ = expected_eom_tail(sf)
    n = exp_pos.shape[0]
    assert n > 0
    np.testing.assert_array_equal(ps.positions[len(ps) - n:], exp_pos)
    # colors: region raster in each band, member-patch point order
    ay, au, av = sf.aux_attr_planes
    csh = 0 if au.shape == ay.shape else 1
    cols = []
    for ep in (ep0, ep1):
        w_pix = ep.size_u0 * ep.occupancy_resolution
        x0 = ep.u0 * ep.occupancy_resolution
        y0 = ep.v0 * ep.occupancy_resolution  # authored absolute
        for k in range(sum(ep.member_points)):
            x, y = x0 + k % w_pix, y0 + k // w_pix
            cols.append((int(ay[y, x]), int(au[y >> csh, x >> csh]),
                         int(av[y >> csh, x >> csh])))
    col16 = np.array(cols, dtype=np.uint16)
    assert col16.shape[0] == n
    np.testing.assert_array_equal(
        ps.colors[len(ps) - n:], convert_yuv10_to_rgb8(col16)
    )


def test_multitile_main_eom_member_remap(tmp_path):
    """Non-aux EOM patches in a multi-tile frame: member indices are
    coded tile-local and fold back to the canvas list; the multi-tile
    stream is a byte-identical twin of the single-tile coding."""
    rng = np.random.default_rng(59)
    sf = make_two_tile_frame(rng, occupancy_precision=1)
    # EOM regions on the main canvas inside each member's tile
    plant_eom_patch(rng, sf, (5, 1, 2, 2), [0])
    plant_eom_patch(rng, sf, (14, 1, 2, 2), [1])
    multi = build_fixture_stream([sf], tiles=(2, 1))
    single = build_fixture_stream([sf])
    (pm,) = decode_all(multi, False)
    (psg,) = decode_all(single, False)
    assert len(pm) > 0
    assert format_ply(pm) == format_ply(psg)
    # and the device path agrees on the multi-tile stream
    (pd,) = decode_all(multi, True)
    assert format_ply(pd) == format_ply(pm)
