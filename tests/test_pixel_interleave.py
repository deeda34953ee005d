"""Single-map pixel-interleaved geometry (framework extension).

The reference asserts ``asps_pixel_deinterleaving_flag`` false
(``reader.rs:1066``); this framework defines the derivation
(``reconstruction/pixel_interleave.py``): the sample at (x, y) is D0
when (x + y) is even, D1 when odd, and the missing map derives from
the occupied 4-neighborhood (which always has the opposite parity):
D1 = max(v, neighbors), D0 = min(v, neighbors).

The fixture REPLACES the authored geometry with the planes the defined
derivation reconstructs (interleave∘deinterleave is the identity on
already-derived planes), so the oracle expectation machinery states
the decode contract exactly."""

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.reconstruction.pixel_interleave import deinterleave_geometry
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.v3c import writer as w3c
from tpu_vpcc.v3c.syntax import AtlasSequenceParameterSet, UnsupportedFeature
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def local_deinterleave(v, occ):
    """Independent scalar reimplementation of the documented derivation."""
    H, W = v.shape
    d0 = np.zeros((H, W), np.int64)
    d1 = np.zeros((H, W), np.int64)
    vv = v.astype(np.int64)
    for y in range(H):
        for x in range(W):
            nb = [
                int(vv[yy, xx])
                for yy, xx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1))
                if 0 <= yy < H and 0 <= xx < W and occ[yy, xx]
            ]
            val = int(vv[y, x])
            if not occ[y, x]:
                d0[y, x] = d1[y, x] = val
            elif (x + y) % 2 == 0:
                d0[y, x] = val
                d1[y, x] = max([val] + nb)
            else:
                d1[y, x] = val
                d0[y, x] = min([val] + nb)
    return d0.astype(np.uint16), d1.astype(np.uint16)


def test_deinterleave_matches_scalar_reference():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1024, (24, 20)).astype(np.uint16)
    occ = rng.random((24, 20)) < 0.7
    got0, got1 = deinterleave_geometry(v, occ.astype(np.uint8))
    exp0, exp1 = local_deinterleave(v, occ)
    np.testing.assert_array_equal(got0, exp0)
    np.testing.assert_array_equal(got1, exp1)
    assert (got0.astype(int) <= got1.astype(int))[occ].all()


def test_interleave_of_derived_planes_is_identity():
    """interleave(deinterleave(v)) == v — the property the fixture
    relies on to state the decode contract."""
    rng = np.random.default_rng(5)
    v = rng.integers(0, 1024, (16, 16)).astype(np.uint16)
    occ = (rng.random((16, 16)) < 0.8).astype(np.uint8)
    d0, d1 = deinterleave_geometry(v, occ)
    par = (np.arange(16)[:, None] + np.arange(16)[None, :]) & 1
    back = np.where(par == 0, d0, d1).astype(np.uint16)
    np.testing.assert_array_equal(back, v)


def test_asps_flag_roundtrip_and_map_gate():
    asps = AtlasSequenceParameterSet()
    asps.map_count_minus1 = 0
    asps.pixel_deinterleaving_flag = True
    parsed = AtlasSequenceParameterSet.parse(Bitstream(w3c.write_asps(asps)))
    assert parsed.pixel_deinterleaving_flag

    asps.map_count_minus1 = 1
    with pytest.raises(UnsupportedFeature, match="more than one map"):
        AtlasSequenceParameterSet.parse(Bitstream(w3c.write_asps(asps)))


def make_pix_il_stream(seed=7, n_frames=2, **kw):
    rng = np.random.default_rng(seed)
    frames = [
        make_synthetic_frame(
            rng, width=kw.get("width", 64), height=kw.get("height", 64),
            occupancy_resolution=kw.get("res", 8),
            occupancy_precision=kw.get("prec", 4), map_count=2,
            n_patches=kw.get("n_patches", 3), frame_index=i,
            allow_swap=kw.get("allow_swap", True),
        )
        for i in range(n_frames)
    ]
    stream = build_fixture_stream(frames, pixel_interleave=True)
    return frames, stream


def decode_all(data, use_device):
    d = Decoder(Params(bytes(data), use_device=use_device))
    d.start()
    return list(d)


def test_pix_il_device_matches_oracle(tmp_path):
    from tpu_vpcc.utils.ply import format_ply

    _, stream = make_pix_il_stream(seed=7)
    dev = decode_all(stream, True)
    orc = decode_all(stream, False)
    assert len(dev) == len(orc) == 2
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)


@pytest.mark.parametrize("use_device", [True, False])
def test_pix_il_matches_expectation_oracle(tmp_path, use_device):
    """The decode equals the NumPy oracle run on the fixture's derived
    two-map planes (the fixture wrote them back into the frames)."""
    from tpu_vpcc.reconstruction.oracle import (
        GeneratePointCloudParams,
        generate_point_cloud,
    )

    frames, stream = make_pix_il_stream(seed=11, n_frames=1,
                                        allow_swap=False)
    (sf,) = frames
    got = decode_all(stream, use_device)
    (ps,) = got
    params = GeneratePointCloudParams(
        occupancy_resolution=sf.occupancy_resolution,
        occupancy_precision=sf.occupancy_precision,
        map_count_minus1=1,
    )
    exp, _, _ = generate_point_cloud(
        sf.meta, params, sf.occ_plane, sf.geo_planes,
        [[
            [sf.attr_planes[0][0], sf.attr_planes[0][1], sf.attr_planes[0][2]],
            [sf.attr_planes[0][0], sf.attr_planes[0][1], sf.attr_planes[0][2]],
        ]],
    )
    assert len(ps) == exp.point_count > 0
    np.testing.assert_array_equal(ps.positions, exp.positions)


def test_pix_il_with_raw_patches_fails_cleanly(tmp_path):
    """The envelope excludes raw/EOM/PLR combos — clean error, not a
    silent wrong decode (the raw region would read derived planes)."""
    from tpu_vpcc.utils.fixtures import build_fixture_stream as bfs
    from tpu_vpcc.utils.synthetic import plant_raw_patch
    from tests.test_raw_patches import free_block_rect

    rng = np.random.default_rng(13)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=2, frame_index=0,
    )
    u0, v0 = free_block_rect(sf, 2, 1)
    plant_raw_patch(rng, sf, (u0, v0, 2, 1), n_points=5)
    with pytest.raises(AssertionError, match="excludes raw"):
        bfs([sf], pixel_interleave=True)
