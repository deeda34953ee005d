"""LoD-scaled patch decode (framework extension — the reference
`unimplemented!`s on afps_lod_mode_enabled_flag, ``reader.rs:1915``).

The reconstruction stack always carried level_of_detail (the oracle's
generate_point, the group tables' G_LODX/G_LODY, the device kernels'
tangent math); these tests pin the newly enabled bitstream path:
parse/write round-trip, scaled-coordinate expectation, and
device-vs-oracle equality."""

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def make_lod_fixture(tmp_path, seed=17, lods=((2, 3), (1, 2), (3, 1))):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(2):
        sf = make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=3, frame_index=i,
        )
        for p, lod in zip(sf.meta.patches, lods):
            p.level_of_detail = lod
        frames.append(sf)
    stream = build_fixture_stream(frames)
    path = tmp_path / "lod_fixture.bin"
    path.write_bytes(stream)
    return frames, path


def test_lod_metadata_roundtrip(tmp_path):
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    frames, path = make_lod_fixture(tmp_path)
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(path.read_bytes()))
    context = Context()
    ssvu.decode_gof(context)
    metas = create_patch_frames(context)
    for meta, sf in zip(metas, frames):
        assert [p.level_of_detail for p in meta.patches] == [
            p.level_of_detail for p in sf.meta.patches
        ]


@pytest.mark.parametrize("use_device", [True, False])
def test_lod_scales_tangent_coordinates(tmp_path, use_device):
    """A DEFAULT-orientation LoD patch emits points whose tangent/
    bitangent coordinates are uv1 + lod * patch-pixel — checked against
    a direct recomputation from the planes."""
    rng = np.random.default_rng(23)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=1, n_patches=1, frame_index=0,
        allow_swap=False,
    )
    patch = sf.meta.patches[0]
    patch.level_of_detail = (3, 2)
    stream = build_fixture_stream([sf])
    path = tmp_path / "lod_one.bin"
    path.write_bytes(stream)
    decoder = Decoder(Params(path, use_device=use_device))
    decoder.start()
    (ps,) = list(decoder)

    # expected: every occupied pixel of the patch (canvas == patch order
    # for DEFAULT orientation) at lod-scaled tangent coords
    res = sf.occupancy_resolution
    prec = sf.occupancy_precision
    n_t, n_b = patch.axes[1], patch.axes[2]
    expected = []
    # emission is block-major then within-block raster (the oracle's
    # per-block loops); map_count=1 → one point per pixel
    for v0 in range(patch.size_uv0[1]):
        for u0 in range(patch.size_uv0[0]):
            for v1 in range(res):
                for u1 in range(res):
                    u, v = u0 * res + u1, v0 * res + v1
                    x = patch.uv0[0] * res + u
                    y = patch.uv0[1] * res + v
                    if sf.occ_plane[y // prec, x // prec] == 0:
                        continue
                    pt = [0, 0, 0]
                    pt[patch.axes[0]] = (
                        int(sf.geo_planes[0][y, x]) >> 2
                    ) + patch.d1
                    pt[n_t] = u * 3 + patch.uv1[0]
                    pt[n_b] = v * 2 + patch.uv1[1]
                    expected.append(pt)
    np.testing.assert_array_equal(
        ps.positions, np.array(expected, dtype=np.uint16)
    )


def test_lod_device_path_matches_oracle_path(tmp_path):
    from tpu_vpcc.utils.ply import format_ply

    _, path = make_lod_fixture(tmp_path, seed=31)
    d1 = Decoder(Params(path, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(path, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) > 0
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)


def test_lod_p_tiles_inherit(tmp_path):
    """Inter/merge/skip patches inherit the reference patch's LoD."""
    from tpu_vpcc.utils.ply import format_ply

    rng = np.random.default_rng(41)
    sf0 = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=3, frame_index=0,
    )
    for p, lod in zip(sf0.meta.patches, ((2, 2), (1, 3), (4, 1))):
        p.level_of_detail = lod
    sf1 = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=0, frame_index=1,
        patches=sf0.meta.patches,
    )
    stream = build_fixture_stream(
        [sf0, sf1],
        p_modes={1: [("inter", 0), "merge3d", "skip"]},
    )
    path = tmp_path / "lod_p.bin"
    path.write_bytes(stream)
    d1 = Decoder(Params(path, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(path, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 2
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)