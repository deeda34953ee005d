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


# ---------------------------------------------------------------------------
# >2 maps (round-5 framework extension): maps beyond the first pair
# reconstruct as trailing surface layers — map m's point is suppressed
# iff equal to map m-1's point (codec.rs:421-427 applied pairwise),
# appended per frame after the map-0/1 points, before any tails. The
# device runs one drop_map0 pass per trailing map over the SAME kernels.
# ---------------------------------------------------------------------------


def make_mc_frames(mc, seed=301, n_frames=2, **kw):
    rng = np.random.default_rng(seed)
    return [
        make_synthetic_frame(
            rng, width=kw.get("width", 64), height=kw.get("height", 64),
            occupancy_resolution=kw.get("res", 8),
            occupancy_precision=kw.get("prec", 4),
            map_count=mc, n_patches=kw.get("n_patches", 3), frame_index=i,
        )
        for i in range(n_frames)
    ]


@pytest.mark.parametrize("mc", [3, 4])
@pytest.mark.parametrize("multi_streams", [True, False])
def test_many_maps_device_matches_oracle(mc, multi_streams):
    frames = make_mc_frames(mc, seed=300 + mc)
    s = build_fixture_stream(frames, multi_map_streams=multi_streams)
    orc = decode_all(bytes(s), use_device=False)
    dev = decode_all(bytes(s), use_device=True)
    assert len(orc) == len(dev) == len(frames)
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)


def test_three_maps_layer_points_present_and_dedup():
    """A frame whose map-2 plane duplicates map 1 adds ZERO layer
    points; bumping every map-2 depth by one adds one point per
    occupied pixel (every comparand differs)."""
    import copy

    (sf,) = make_mc_frames(3, seed=310, n_frames=1)
    sf_dup = copy.deepcopy(sf)
    sf_dup.geo_planes[2] = sf_dup.geo_planes[1].copy()
    sf_two = copy.deepcopy(sf)
    sf_two.geo_planes = sf_two.geo_planes[:2]
    sf_two.map_count = 2
    sf_two.attr_planes = sf_two.attr_planes[:2]
    sf_bump = copy.deepcopy(sf)
    sf_bump.geo_planes[2] = np.minimum(
        sf_bump.geo_planes[1] + 4, 1020
    ).astype(np.uint16)  # +1 depth (planes carry depth*4)

    n_two = len(decode_all(build_fixture_stream([sf_two]), False)[0])
    ps_dup = decode_all(build_fixture_stream([sf_dup]), False)[0]
    ps_bump = decode_all(build_fixture_stream([sf_bump]), False)[0]
    assert len(ps_dup) == n_two  # all layer points suppressed as dups
    assert len(ps_bump) > n_two
    # device agrees on both
    assert format_ply(decode_all(build_fixture_stream([sf_dup]), True)[0]) \
        == format_ply(ps_dup)
    assert format_ply(decode_all(build_fixture_stream([sf_bump]), True)[0]) \
        == format_ply(ps_bump)


def test_three_maps_with_raw_and_45deg():
    """Trailing layers compose with 45-degree views and raw-patch tails
    (layer points append BEFORE the tails)."""
    from tests.test_raw_patches import free_block_rect
    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.utils.synthetic import plant_raw_patch

    rng = np.random.default_rng(320)
    (sf,) = make_mc_frames(3, seed=320, n_frames=1)
    p = sf.meta.patches[0]
    views = [
        v for v, r in Patch._VIEW_TABLE.items()
        if r[0] == 1 and r[4] == p.projection_mode
    ]
    p.set_view_id(views[0])
    u0, v0 = free_block_rect(sf, 2, 1)
    plant_raw_patch(rng, sf, (u0, v0, 2, 1), n_points=9, offsets=(1, 2, 3))
    s = build_fixture_stream([sf])
    orc = decode_all(bytes(s), False)
    dev = decode_all(bytes(s), True)
    assert len(orc[0]) > 0
    assert format_ply(dev[0]) == format_ply(orc[0])


def test_three_maps_on_mesh():
    from tpu_vpcc.parallel.mesh import make_mesh

    frames = make_mc_frames(3, seed=330)
    s = build_fixture_stream(frames)
    dm = Decoder(Params(bytes(s), mesh=make_mesh(data=4, space=2)))
    dm.start()
    msh = list(dm)
    orc = decode_all(bytes(s), False)
    assert len(msh) == len(orc)
    for a, b in zip(msh, orc):
        assert format_ply(a) == format_ply(b)


def test_many_maps_gates_pinned():
    """Combinations whose semantics couple the map streams gate cleanly
    (and the writer refuses to author the delta form)."""
    from tpu_vpcc.utils.synthetic import plant_eom_patch

    # EOM + 3 maps
    from tests.test_raw_patches import free_block_rect

    (sf,) = make_mc_frames(3, seed=340, n_frames=1, prec=1)
    u0, v0 = free_block_rect(sf, 2, 1)
    plant_eom_patch(np.random.default_rng(1), sf, (u0, v0, 2, 1), [0])
    with pytest.raises(UnsupportedFeature, match="more than two maps"):
        decode_all(build_fixture_stream([sf]), False)
    # smoothing + 3 maps
    frames = make_mc_frames(3, seed=342, n_frames=1)
    s = build_fixture_stream(frames, geo_smoothing_sei=(8, 16))
    d = Decoder(Params(bytes(s), use_device=False,
                       apply_geo_smoothing_type=True))
    d.start()
    with pytest.raises(UnsupportedFeature, match="more than two maps"):
        list(d)
    # delta-coded map 1 with 3 maps: the writer itself refuses
    frames = make_mc_frames(3, seed=343, n_frames=1)
    with pytest.raises(AssertionError):
        build_fixture_stream(
            frames, multi_map_streams=True, map1_absolute=False
        )


def test_oracle_intermediate_color_transfer_raise_pinned():
    """point_to_pixel z >= map_count (TMC2's in-between color-transfer
    sentinel) has no reconstruction here — EOM tails own those colors —
    so the oracle raise is pinned as the documented boundary."""
    from tpu_vpcc.reconstruction.oracle import (
        GeneratePointCloudParams,
        color_point_cloud,
    )
    from tpu_vpcc.reconstruction.pointset import PointSet3
    from tpu_vpcc.atlas.patches import FrameMeta

    ps = PointSet3(
        positions=np.zeros((1, 3), np.uint16), with_colors=True
    )
    ps.colors16bit = np.zeros((1, 3), np.uint16)
    params = GeneratePointCloudParams(
        occupancy_resolution=8, occupancy_precision=4,
        absolute_d1=True, map_count_minus1=1, attribute_count=1,
    )
    meta = FrameMeta(frame_index=0, width=8, height=8)
    planes = [[np.zeros((8, 8), np.uint16)] * 3] * 2
    with pytest.raises(NotImplementedError, match="intermediate layer"):
        color_point_cloud(ps, meta, params, planes, [(0, 0, 2)])


def test_three_maps_with_secondary_attrs():
    """Secondary families ride the layer passes too: per-view twin
    dispatches (primary + one per trailing map) keep the extra
    channels row-aligned with the appended layer points."""
    frames = make_mc_frames(3, seed=341)
    for multi_streams in (False, True):
        s = build_fixture_stream(
            frames, multi_map_streams=multi_streams,
            secondary_attrs=[(3, 1, None), (0, 3, None)],
        )
        orc = decode_all(bytes(s), False)
        dev = decode_all(bytes(s), True)
        for a, b in zip(dev, orc):
            assert len(a.extra_attrs) == 2
            assert format_ply(a) == format_ply(b)


def test_batched_three_map_secondary_matches_sequential(tmp_path):
    from tpu_vpcc.parallel.batcher import decode_streams

    p = tmp_path / "s.bin"
    p.write_bytes(build_fixture_stream(
        make_mc_frames(3, seed=342),
        secondary_attrs=[(3, 1, None)],
    ))
    batched = decode_streams([p, p])
    d = Decoder(Params(p))
    d.start()
    seq = list(d)
    for stream_frames in batched:
        assert len(stream_frames) == len(seq) == 2
        for a, b in zip(stream_frames, seq):
            assert format_ply(a) == format_ply(b)
