"""Secondary attributes (vuh_attribute_index >= 1) — FRAMEWORK EXTENSION.

The reference only ever reads attribute 0 (every ``ai_*`` array in
``reader.rs:412-482`` is indexed ``[0]`` downstream); here each extra
attribute demuxes to its own AVD sub-stream family and decodes through
the IDENTICAL reconstruction graph with the attribute planes swapped
(``pipeline._secondary_chunk_values``). The load-bearing invariant: the
emission order is a function of occupancy/geometry/fields only, so row
i of every pass is the same point — pinned here by decoding the SAME
planes as primary and as secondary texture and comparing channels.
"""

import numpy as np
import pytest

from tpu_vpcc.parallel.batcher import decode_streams
from tpu_vpcc.reconstruction.pointset import PointSet3
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.ply import FORMAT_BINARY, format_ply, read_ply
from tpu_vpcc.utils.synthetic import make_synthetic_frame, plant_raw_patch
from tpu_vpcc.v3c.syntax import UnsupportedFeature
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def make_frames(seed=41, n_frames=2, map_count=2, **kw):
    rng = np.random.default_rng(seed)
    return [
        make_synthetic_frame(
            rng, width=kw.get("width", 64), height=kw.get("height", 64),
            occupancy_resolution=kw.get("res", 8),
            occupancy_precision=kw.get("prec", 4),
            map_count=map_count, n_patches=kw.get("n_patches", 3),
            frame_index=i,
        )
        for i in range(n_frames)
    ]


def decode_all(path, use_device):
    d = Decoder(Params(path, use_device=use_device))
    d.start()
    return list(d)


def constant_reflectance_planes(n_frames, map_count, value0, h=64, w=64):
    """Per-frame constant luma (value0 + frame index), flat chroma."""
    return [
        [
            [np.full((h, w), value0 + fi, np.uint16),
             np.full((h // 2, w // 2), 512, np.uint16),
             np.full((h // 2, w // 2), 512, np.uint16)]
            for _m in range(map_count)
        ]
        for fi in range(n_frames)
    ]


def test_mixed_secondaries_device_equals_oracle(tmp_path):
    """Reflectance (dim 1, u16) + a secondary texture triple decode
    byte-identically on the device and oracle paths, in both PLY
    formats, with the expected property schema."""
    frames = make_frames()
    path = tmp_path / "ma.bin"
    path.write_bytes(build_fixture_stream(
        frames, secondary_attrs=[(3, 1, None), (0, 3, None)]
    ))
    outs = {dev: decode_all(path, dev) for dev in (False, True)}
    for dev, out in outs.items():
        assert len(out) == 2
        for ps in out:
            names = [n for n, _v in ps.extra_attrs]
            assert names == [("reflectance",), ("red2", "green2", "blue2")]
            assert ps.extra_attrs[0][1].dtype == np.uint16
            assert ps.extra_attrs[0][1].shape == (len(ps), 1)
            assert ps.extra_attrs[1][1].dtype == np.uint8
            assert ps.extra_attrs[1][1].shape == (len(ps), 3)
    for fmt in (None, FORMAT_BINARY):
        kw = {} if fmt is None else {"fmt": fmt}
        a = [format_ply(p, **kw) for p in outs[False]]
        b = [format_ply(p, **kw) for p in outs[True]]
        assert a == b
    # header declares the extra properties after rgb
    assert b"property ushort reflectance" in format_ply(outs[True][0])
    assert b"property uchar red2" in format_ply(outs[True][0])


def test_multimap_constant_reflectance_values(tmp_path):
    """Per-map sub-streams: every point of frame f carries the constant
    coded into frame f's reflectance planes (both maps) — pins video
    frame selection and the map-interleave of the secondary family."""
    frames = make_frames(seed=42)
    planes = constant_reflectance_planes(2, 2, 300)
    path = tmp_path / "ma_mm.bin"
    path.write_bytes(build_fixture_stream(
        frames, multi_map_streams=True, secondary_attrs=[(3, 1, planes)]
    ))
    for dev in (False, True):
        out = decode_all(path, dev)
        for fi, ps in enumerate(out):
            assert (ps.extra_attrs[0][1] == 300 + fi).all()


def test_secondary_texture_twin_of_primary(tmp_path):
    """The SAME video coded as primary and as a secondary texture: the
    extra RGB triple equals the colors on every point — the emission
    order of the twin pass is the primary pass's order."""
    frames = make_frames(seed=43)
    planes = [
        [[p.copy() for p in sf.attr_planes[m]] for m in range(2)]
        for sf in frames
    ]
    path = tmp_path / "ma_twin.bin"
    path.write_bytes(build_fixture_stream(
        frames, secondary_attrs=[(0, 3, planes)]
    ))
    for dev in (False, True):
        for ps in decode_all(path, dev):
            names, vals = ps.extra_attrs[0]
            assert names == ("red1", "green1", "blue1")
            np.testing.assert_array_equal(vals, ps.colors)


def test_secondary_survives_geo_smoothing(tmp_path):
    """Geometry smoothing displaces pass-1 positions but never reorders
    emission, so the smoothing-free twin pass stays aligned: the
    secondary-texture-equals-primary invariant holds under smoothing,
    and device == oracle."""
    frames = make_frames(seed=44)
    planes = [
        [[p.copy() for p in sf.attr_planes[m]] for m in range(2)]
        for sf in frames
    ]
    path = tmp_path / "ma_smooth.bin"
    path.write_bytes(build_fixture_stream(
        frames, geo_smoothing_sei=(8, 64),
        secondary_attrs=[(0, 3, planes)],
    ))
    plys = {}
    for dev in (False, True):
        d = Decoder(Params(path, use_device=dev,
                           apply_geo_smoothing_type=True))
        d.start()
        out = list(d)
        for ps in out:
            np.testing.assert_array_equal(ps.extra_attrs[0][1], ps.colors)
        plys[dev] = [format_ply(p) for p in out]
    assert plys[False] == plys[True]


def test_secondary_422_coding_matches_420(tmp_path):
    """A secondary coded 4:2:2 (row-doubled chroma of the same 4:2:0
    scene) decodes byte-identically to the 4:2:0-coded twin — the host
    column-doubling contract, applied to a secondary family."""
    frames = make_frames(seed=45)
    rng = np.random.default_rng(99)
    base = [
        [
            [rng.integers(0, 1024, (64, 64)).astype(np.uint16),
             rng.integers(0, 1024, (32, 32)).astype(np.uint16),
             rng.integers(0, 1024, (32, 32)).astype(np.uint16)]
            for _m in range(2)
        ]
        for _fi in range(2)
    ]
    p420 = tmp_path / "ma_420.bin"
    p420.write_bytes(build_fixture_stream(
        frames, secondary_attrs=[(3, 3, base)]
    ))
    doubled = [
        [[y, np.repeat(u, 2, axis=0), np.repeat(v, 2, axis=0)]
         for (y, u, v) in per_map]
        for per_map in base
    ]
    p422 = tmp_path / "ma_422.bin"
    p422.write_bytes(build_fixture_stream(
        frames, secondary_attrs=[(3, 3, doubled)]
    ))
    for dev in (False, True):
        a = [format_ply(p) for p in decode_all(p420, dev)]
        b = [format_ply(p) for p in decode_all(p422, dev)]
        assert a == b


def test_batched_streams_carry_secondary(tmp_path):
    """The multi-stream batcher attaches the extra channels; frames
    equal the single-stream decode."""
    frames = make_frames(seed=46)
    ma = tmp_path / "ma.bin"
    ma.write_bytes(build_fixture_stream(
        frames, secondary_attrs=[(3, 1, None)]
    ))
    plain = tmp_path / "plain.bin"
    plain.write_bytes(build_fixture_stream(make_frames(seed=47)))
    single = [format_ply(p) for p in decode_all(ma, True)]
    batched = decode_streams([ma, plain], max_host_workers=2)
    assert [format_ply(p) for p in batched[0]] == single
    assert all(not p.extra_attrs for p in batched[1])


def test_secondary_with_raw_patches(tmp_path):
    """Raw-patch tail points take the secondary twin call: every point
    (regular + tail) carries the constant coded into the reflectance
    planes, and device == oracle byte-identically."""
    rng = np.random.default_rng(48)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=1, frame_index=0,
    )
    plant_raw_patch(rng, sf, (6, 6, 2, 1), 17)
    planes = constant_reflectance_planes(1, 2, 700)
    path = tmp_path / "ma_raw.bin"
    path.write_bytes(build_fixture_stream(
        [sf], secondary_attrs=[(3, 1, planes)]
    ))
    plys = {}
    for dev in (False, True):
        out = decode_all(path, dev)
        (ps,) = out
        assert len(ps) > 17  # tail appended
        vals = ps.extra_attrs[0][1]
        assert vals.shape == (len(ps), 1)
        assert (vals == 700).all()
        plys[dev] = format_ply(ps)
    assert plys[False] == plys[True]


def test_secondary_with_plr_and_eom(tmp_path):
    """PLR and EOM tails take the secondary twin calls too: channel
    length tracks the tail-extended point count, values match the
    constant planes, device == oracle."""
    from tests.test_eom import make_eom_frame
    from tests.test_plr import MODES, THICKNESS, make_plr_frames

    plr_frames = make_plr_frames(seed=49)
    plr_planes = constant_reflectance_planes(2, 1, 400)
    p_plr = tmp_path / "ma_plr.bin"
    p_plr.write_bytes(build_fixture_stream(
        plr_frames, plr=(MODES, THICKNESS),
        secondary_attrs=[(3, 1, plr_planes)],
    ))
    rng = np.random.default_rng(50)
    eom_frames = [make_eom_frame(rng, frame_index=i) for i in range(2)]
    eom_planes = constant_reflectance_planes(2, 2, 500)
    p_eom = tmp_path / "ma_eom.bin"
    p_eom.write_bytes(build_fixture_stream(
        eom_frames, secondary_attrs=[(3, 1, eom_planes)],
    ))
    for path, v0 in ((p_plr, 400), (p_eom, 500)):
        plys = {}
        for dev in (False, True):
            out = decode_all(path, dev)
            for fi, ps in enumerate(out):
                vals = ps.extra_attrs[0][1]
                assert vals.shape == (len(ps), 1)
                assert (vals == v0 + fi).all()
            plys[dev] = [format_ply(p) for p in out]
        assert plys[False] == plys[True]


def _const_planes(value, h=64, w=64):
    return [np.full((h, w), value, np.uint16),
            np.full((h // 2, w // 2), 512, np.uint16),
            np.full((h // 2, w // 2), 512, np.uint16)]


def test_secondary_with_aux_raw_patch(tmp_path):
    """Every attribute family carries its OWN auxiliary video: aux raw
    tail points sample the secondary's aux planes, regular points its
    regular planes (distinct constants prove the source), and
    device == oracle byte-identically."""
    rng = np.random.default_rng(51)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=1, frame_index=0,
    )
    plant_raw_patch(rng, sf, (6, 6, 2, 1), 17, aux=True)
    n_tail = 17
    path = tmp_path / "ma_aux.bin"
    path.write_bytes(build_fixture_stream(
        [sf],
        secondary_attrs=[(3, 1, [[_const_planes(700)] * 2],
                          [_const_planes(750)])],
    ))
    plys = {}
    for dev in (False, True):
        (ps,) = decode_all(path, dev)
        vals = ps.extra_attrs[0][1]
        assert vals.shape == (len(ps), 1)
        assert (vals[: len(ps) - n_tail] == 700).all()
        assert (vals[len(ps) - n_tail:] == 750).all()
        plys[dev] = format_ply(ps)
    assert plys[False] == plys[True]


def test_secondary_with_aux_eom_patch(tmp_path):
    """Aux-flagged EOM colors for a secondary come from ITS aux video."""
    from tpu_vpcc.utils.synthetic import plant_eom_patch

    rng = np.random.default_rng(57)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=1, map_count=2, n_patches=2,
        frame_index=0, allow_swap=False,
    )
    plant_eom_patch(rng, sf, (0, 0, 2, 2),
                    list(range(len(sf.meta.patches))), aux=True)
    path = tmp_path / "ma_aux_eom.bin"
    path.write_bytes(build_fixture_stream(
        [sf],
        secondary_attrs=[(3, 1, [[_const_planes(800)] * 2],
                          [_const_planes(850)])],
    ))
    plys = {}
    for dev in (False, True):
        (ps,) = decode_all(path, dev)
        vals = ps.extra_attrs[0][1].ravel()
        assert set(np.unique(vals)) == {800, 850}
        # the EOM tail is appended last and sampled the aux constant
        assert vals[-1] == 850 and vals[0] == 800
        plys[dev] = format_ply(ps)
    assert plys[False] == plys[True]


def test_gate_secondary_missing_aux_video(tmp_path):
    """Aux patches + a secondary whose aux sub-stream is absent fail
    cleanly (each family needs its own auxiliary video)."""
    from tpu_vpcc.bitio import Bitstream
    from tpu_vpcc.runtime.pipeline import prepare_gof
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
    from tpu_vpcc.v3c.syntax import VideoType

    rng = np.random.default_rng(58)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=1, frame_index=0,
    )
    plant_raw_patch(rng, sf, (6, 6, 2, 1), 17, aux=True)
    stream = build_fixture_stream([sf], secondary_attrs=[(3, 1, None)])
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    ctx.atlas_hls.video_bitstreams = [
        v for v in ctx.atlas_hls.video_bitstreams
        if not (v.video_type == VideoType.ATTRIBUTE_RAW
                and v.attr_index == 1)
    ]
    with pytest.raises(
        UnsupportedFeature, match="no.*auxiliary video sub-stream"
    ):
        prepare_gof(ctx)


def test_concatenate_extra_attr_schemas():
    a = PointSet3(
        positions=np.zeros((2, 3), np.uint16),
        colors=np.zeros((2, 3), np.uint8),
        colors16bit=np.zeros((2, 3), np.uint16),
        with_colors=True,
        extra_attrs=[(("reflectance",), np.ones((2, 1), np.uint16))],
    )
    b = PointSet3(
        positions=np.zeros((1, 3), np.uint16),
        colors=np.zeros((1, 3), np.uint8),
        colors16bit=np.zeros((1, 3), np.uint16),
        with_colors=True,
        extra_attrs=[(("reflectance",), np.full((1, 1), 7, np.uint16))],
    )
    cat = PointSet3.concatenate([a, b])
    np.testing.assert_array_equal(
        cat.extra_attrs[0][1].ravel(), [1, 1, 7]
    )
    b.extra_attrs = [(("transparency",), np.ones((1, 1), np.uint8))]
    with pytest.raises(ValueError, match="extra-attribute schemas"):
        PointSet3.concatenate([a, b])


def test_read_ply_roundtrip_extras():
    ps = PointSet3(
        positions=np.arange(9, dtype=np.uint16).reshape(3, 3),
        colors=np.arange(9, dtype=np.uint8).reshape(3, 3),
        colors16bit=np.zeros((3, 3), np.uint16),
        with_colors=True,
        extra_attrs=[
            (("reflectance",), np.array([[5], [900], [77]], np.uint16)),
            (("red1", "green1", "blue1"),
             np.arange(9, dtype=np.uint8).reshape(3, 3) + 1),
        ],
    )
    for fmt in ("ascii", FORMAT_BINARY):
        back = read_ply(format_ply(ps, fmt))
        np.testing.assert_array_equal(back.positions, ps.positions)
        np.testing.assert_array_equal(back.colors, ps.colors)
        # the reader returns one entry per property
        flat = np.concatenate([v for _n, v in back.extra_attrs], axis=1)
        want = np.concatenate([v for _n, v in ps.extra_attrs], axis=1)
        np.testing.assert_array_equal(flat, want)
        assert [n for n, _v in back.extra_attrs] == [
            ("reflectance",), ("red1",), ("green1",), ("blue1",)
        ]


def test_secondary_attr_smoothing_instance(tmp_path):
    """An attribute-smoothing SEI instance targeting attribute 1 smooths
    the SECONDARY channels through the twin pass (primary untouched):
    with identical planes and identical smoothing on both attributes,
    the twin-of-primary invariant holds under smoothing; with the
    instance on attribute 1 only, the primary colors stay unsmoothed
    while the extras change. Device == oracle throughout. (The effect is
    content-dependent: seed 8 with 4 patches measurably smooths; most
    seeds leave every cell outside the variation gate.)"""
    frames = make_frames(seed=8, n_patches=4)
    planes = [
        [[p.copy() for p in sf.attr_planes[m]] for m in range(2)]
        for sf in frames
    ]
    both = tmp_path / "sm_both.bin"
    both.write_bytes(build_fixture_stream(
        frames, attr_smoothing_sei=[(0, 8, 255, 1), (1, 8, 255, 1)],
        secondary_attrs=[(0, 3, planes)],
    ))
    only1 = tmp_path / "sm_only1.bin"
    only1.write_bytes(build_fixture_stream(
        frames, attr_smoothing_sei=[(1, 8, 255, 1)],
        secondary_attrs=[(0, 3, planes)],
    ))
    none = tmp_path / "sm_none.bin"
    none.write_bytes(build_fixture_stream(
        frames, secondary_attrs=[(0, 3, planes)],
    ))

    def run(path, dev):
        d = Decoder(Params(path, use_device=dev,
                           apply_attr_smoothing_type=True))
        d.start()
        return list(d)

    for dev in (False, True):
        for ps in run(both, dev):
            # same planes + same smoothing instance on both indices ->
            # the channels still match exactly
            np.testing.assert_array_equal(ps.extra_attrs[0][1], ps.colors)
    out_none = run(none, True)
    plys = {}
    for dev in (False, True):
        out = run(only1, dev)
        changed = False
        for ps, ps_n in zip(out, out_none):
            np.testing.assert_array_equal(ps.colors, ps_n.colors)
            changed |= not np.array_equal(
                ps.extra_attrs[0][1], ps_n.extra_attrs[0][1]
            )
        assert changed, "attr-1 smoothing instance had no effect"
        plys[dev] = [format_ply(p) for p in out]
    assert plys[False] == plys[True]


def test_geometry_only_stream(tmp_path):
    """Zero attributes (vps_attribute_video_present_flag = 0 — the
    reference asserts exactly one attribute, ``decoder.rs:133``):
    colorless PLYs, byte-identical device vs oracle in both formats,
    and positions identical to the SAME scene coded WITH its attribute
    (the zero color planes never perturb geometry/emission)."""
    frames = make_frames(seed=53)
    ga = tmp_path / "ga.bin"
    ga.write_bytes(build_fixture_stream(frames, no_attributes=True))
    withattr = tmp_path / "wa.bin"
    withattr.write_bytes(build_fixture_stream(frames))
    plys = {}
    for dev in (False, True):
        out = decode_all(ga, dev)
        assert [p.with_colors for p in out] == [False, False]
        plys[dev] = [
            format_ply(p, fmt) for p in out
            for fmt in ("ascii", FORMAT_BINARY)
        ]
    assert plys[False] == plys[True]
    assert b"property uchar red" not in plys[True][0]
    ref = decode_all(withattr, True)
    for ps, ps_ref in zip(decode_all(ga, True), ref):
        np.testing.assert_array_equal(ps.positions, ps_ref.positions)


def test_geometry_only_with_raw_patch(tmp_path):
    """Raw-patch tails on an attribute-less stream: verbatim points
    append with no color source (attr=None path), device == oracle."""
    rng = np.random.default_rng(54)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=1, frame_index=0,
    )
    plant_raw_patch(rng, sf, (6, 6, 2, 1), 19)
    path = tmp_path / "ga_raw.bin"
    path.write_bytes(build_fixture_stream([sf], no_attributes=True))
    plys = {}
    for dev in (False, True):
        (ps,) = decode_all(path, dev)
        assert len(ps) > 19 and not ps.with_colors
        plys[dev] = format_ply(ps)
    assert plys[False] == plys[True]


def test_secondary_on_pixel_interleaved_stream(tmp_path):
    """A secondary on a pixel-interleaved stream: both derived maps
    alias the single secondary frame (like the primary), constants
    come back per frame, device == oracle."""
    rng = np.random.default_rng(55)
    frames = [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=3,
            frame_index=i,
        )
        for i in range(2)
    ]
    planes = constant_reflectance_planes(2, 2, 600)
    path = tmp_path / "pix_ma.bin"
    path.write_bytes(build_fixture_stream(
        frames, pixel_interleave=True,
        secondary_attrs=[(3, 1, planes)],
    ))
    plys = {}
    for dev in (False, True):
        out = decode_all(path, dev)
        for fi, ps in enumerate(out):
            vals = ps.extra_attrs[0][1]
            assert vals.shape == (len(ps), 1)
            assert (vals == 600 + fi).all()
        plys[dev] = [format_ply(p) for p in out]
    assert plys[False] == plys[True]


def test_geometry_only_pixel_interleaved(tmp_path):
    """Zero attributes x pixel interleave: no decoded plane carries the
    tiled signal, so the requested layout stands (review finding: the
    attr-based probe used to silently force the untiled gather path).
    Device == oracle."""
    rng = np.random.default_rng(56)
    frames = [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=3,
            frame_index=i,
        )
        for i in range(2)
    ]
    path = tmp_path / "ga_pix.bin"
    path.write_bytes(build_fixture_stream(
        frames, pixel_interleave=True, no_attributes=True
    ))
    plys = {}
    for dev in (False, True):
        out = decode_all(path, dev)
        assert all(len(p) > 0 and not p.with_colors for p in out)
        plys[dev] = [format_ply(p) for p in out]
    assert plys[False] == plys[True]
