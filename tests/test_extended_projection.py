"""45-degree (additional-plane) projection decode — FRAMEWORK EXTENSION.

The reference parses the full 18-view table (``decoder.rs:788-814``) but
asserts the enabling ASPS flag false (``reader.rs:1043``) and its
reconstruction is ``unimplemented!`` for any additional plane
(``codec.rs:429-440``) — there is no reference behavior to mirror, so
this framework DEFINES the integer rotation convention (documented in
``atlas.patches``) and these tests pin it on every path.

Key structural fact exploited here: every 45-degree view (6..17) shares
its (axes, projection_mode) pair with one of the six plane-0 views, so
a 45-degree decode must equal the plane-0 decode of the SAME planes
followed by the per-point inverse rotation — recomputed locally with an
independent implementation of the documented formula.
"""

import copy

import numpy as np
import pytest

from tpu_vpcc.atlas.patches import Patch, inverse_rotate_45
from tpu_vpcc.bitio import Bitstream
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

BITDEPTH = 10

# plane -> (sum axis, difference axis): independent restatement of the
# documented convention (do NOT import _ROT45_PAIRS — the point is to
# catch a drifted implementation)
PAIRS = {1: (0, 2), 2: (2, 1), 3: (1, 0)}


def local_inverse(plane, pos):
    """Test-local inverse rotation on an (N, 3) array."""
    s_ax, d_ax = PAIRS[plane]
    shift = (1 << (BITDEPTH - 1)) - 1
    p = pos.astype(np.int64)
    rs, rd = p[:, s_ax].copy(), p[:, d_ax].copy()
    p[:, s_ax] = (rs - rd + shift) >> 1
    p[:, d_ax] = (rs + rd - shift) >> 1
    return (p & 0xFFFF).astype(np.uint16)


def local_forward(plane, pos):
    """Test-local forward rotation (encoder side of the convention)."""
    s_ax, d_ax = PAIRS[plane]
    shift = (1 << (BITDEPTH - 1)) - 1
    p = pos.astype(np.int64)
    s, d = p[:, s_ax].copy(), p[:, d_ax].copy()
    p[:, s_ax] = s + d
    p[:, d_ax] = d - s + shift
    return p


def test_scalar_rotation_inverts_forward():
    rng = np.random.default_rng(5)
    pts = rng.integers(0, 1 << (BITDEPTH - 1), size=(200, 3))
    for plane in (1, 2, 3):
        rot = local_forward(plane, pts)
        assert rot.min() >= 0 and rot.max() < (1 << BITDEPTH)
        back = np.stack(
            [inverse_rotate_45(plane, BITDEPTH, r) for r in rot]
        )
        np.testing.assert_array_equal(back, pts)


def test_asps_extended_projection_roundtrip():
    asps = AtlasSequenceParameterSet()
    asps.extended_projection_enabled_flag = True
    asps.max_number_projections_minus1 = 17
    parsed = AtlasSequenceParameterSet.parse(Bitstream(w3c.write_asps(asps)))
    assert parsed.extended_projection_enabled_flag
    assert parsed.max_number_projections_minus1 == 17

    asps.max_number_projections_minus1 = 18
    with pytest.raises(UnsupportedFeature, match="18-view table"):
        AtlasSequenceParameterSet.parse(Bitstream(w3c.write_asps(asps)))


# plane-0 twin of each 45-degree view (same axes + projection mode)
PLANE0_TWIN = {}
for vid, (plane, n, t, b, mode) in Patch._VIEW_TABLE.items():
    if plane == 0:
        continue
    for vid0, (p0, n0, t0, b0, m0) in Patch._VIEW_TABLE.items():
        if p0 == 0 and (n0, t0, b0) == (n, t, b) and m0 == mode:
            PLANE0_TWIN[vid] = vid0


def test_every_45_view_has_a_plane0_twin():
    assert sorted(PLANE0_TWIN) == list(range(6, 18))


def make_45_frames(seed, views, n_frames=1, **kw):
    """Frames whose patches are reassigned to the given 45-degree views
    (mode-matched so the authored d1 stays consistent), plus the
    plane-0 twin frames over the SAME planes."""
    rng = np.random.default_rng(seed)
    frames, twins = [], []
    for i in range(n_frames):
        sf = make_synthetic_frame(
            rng, width=kw.get("width", 64), height=kw.get("height", 64),
            occupancy_resolution=kw.get("res", 8),
            occupancy_precision=kw.get("prec", 4),
            map_count=kw.get("map_count", 2),
            n_patches=len(views), frame_index=i,
            allow_swap=kw.get("allow_swap", True),
        )
        twin = copy.deepcopy(sf)
        for p, pt, v in zip(sf.meta.patches, twin.meta.patches, views):
            # keep the authored d1 semantics: the views list must be
            # mode-compatible with the generated patches (mode_views)
            assert Patch._VIEW_TABLE[v][4] == p.projection_mode
            p.set_view_id(v)
            pt.set_view_id(PLANE0_TWIN[v])
        frames.append(sf)
        twins.append(twin)
    return frames, twins


def decode_all(data, use_device):
    d = Decoder(Params(bytes(data), use_device=use_device))
    d.start()
    return list(d)


def mode_views(plane, rng, n, modes_needed):
    """n views on the given plane matching the generated patches'
    projection modes."""
    by_mode = {
        0: [v for v, r in Patch._VIEW_TABLE.items() if r[0] == plane and r[4] == 0],
        1: [v for v, r in Patch._VIEW_TABLE.items() if r[0] == plane and r[4] == 1],
    }
    return [int(rng.choice(by_mode[m])) for m in modes_needed]


@pytest.mark.parametrize("plane", [1, 2, 3])
@pytest.mark.parametrize("use_device", [True, False])
def test_single_plane_equals_rotated_plane0_twin(tmp_path, plane, use_device):
    """All patches on ONE additional plane: the decode must equal the
    plane-0 twin decode with the test-local inverse rotation applied to
    every position (colors and emission order identical)."""
    rng = np.random.default_rng(31 + plane)
    # generate once to learn the patches' modes, then assign views
    probe = make_synthetic_frame(
        np.random.default_rng(31 + plane), width=64, height=64,
        occupancy_resolution=8, occupancy_precision=4, n_patches=3,
        frame_index=0,
    )
    modes = [p.projection_mode for p in probe.meta.patches]
    views = mode_views(plane, rng, 3, modes)
    frames, twins = make_45_frames(31 + plane, views)
    got = decode_all(build_fixture_stream(frames), use_device)
    twin = decode_all(build_fixture_stream(twins), use_device)
    assert len(got) == len(twin) == 1
    ps, ps0 = got[0], twin[0]
    assert len(ps) == len(ps0) > 0
    np.testing.assert_array_equal(
        ps.positions, local_inverse(plane, ps0.positions)
    )
    np.testing.assert_array_equal(ps.colors, ps0.colors)


def test_mixed_planes_device_matches_oracle(tmp_path):
    """Patches on planes 1/2/3 AND plane 0 in one frame, two frames,
    SWAP orientations allowed: device output must be byte-identical to
    the oracle (the wide tiled path carries the per-group plane)."""
    from tpu_vpcc.utils.ply import format_ply

    rng = np.random.default_rng(47)
    probe = make_synthetic_frame(
        np.random.default_rng(47), width=96, height=96,
        occupancy_resolution=8, occupancy_precision=4, n_patches=4,
        frame_index=0,
    )
    modes = [p.projection_mode for p in probe.meta.patches]
    views = [
        mode_views(1, rng, 1, [modes[0]])[0],
        mode_views(2, rng, 1, [modes[1]])[0],
        mode_views(3, rng, 1, [modes[2]])[0],
        # patch 3 keeps its plane-0 view
    ]
    frames = []
    for i in range(2):
        sf = make_synthetic_frame(
            rng, width=96, height=96, occupancy_resolution=8,
            occupancy_precision=4, n_patches=4, frame_index=i,
        )
        for p, v in zip(sf.meta.patches[:3], views):
            if Patch._VIEW_TABLE[v][4] == p.projection_mode:
                p.set_view_id(v)
        frames.append(sf)
    assert any(
        p.axis_of_additional_plane != 0
        for sf in frames for p in sf.meta.patches
    )
    stream = build_fixture_stream(frames)
    dev = decode_all(stream, True)
    orc = decode_all(stream, False)
    assert len(dev) == len(orc) == 2
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)


def test_metadata_roundtrip_views_6_to_17(tmp_path):
    """Each 45-degree view id survives write->parse->derivation with the
    right (plane, axes, mode)."""
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    rng = np.random.default_rng(61)
    for vids in ([6, 8, 10], [12, 14, 16], [7, 9, 11], [13, 15, 17]):
        sf = make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, n_patches=3, frame_index=0,
        )
        for p, v in zip(sf.meta.patches, vids):
            # force the mode to the view's mode; d1 semantics only
            # matter for plane authoring, which is already done
            p.set_view_id(v)
        stream = build_fixture_stream([sf])
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
        ctx = Context()
        ssvu.decode_gof(ctx)
        (meta,) = create_patch_frames(ctx)
        for got, v in zip(meta.patches, vids):
            plane, n, t, b, mode = Patch._VIEW_TABLE[v]
            assert got.axis_of_additional_plane == plane
            assert got.axes == (n, t, b)
            assert got.projection_mode == mode

@pytest.mark.parametrize("view_id", range(6, 18))
@pytest.mark.parametrize("orientation", ["DEFAULT", "SWAP"])
def test_45_views_kernel_level_all_paths(view_id, orientation):
    """Every 45-degree view, DEFAULT and SWAP orientations: oracle ==
    gather kernel == tiled kernel == pretiled kernel (the wide tail —
    narrow emission is ineligible under additional planes)."""
    from tpu_vpcc.atlas.groups import build_group_table
    from tpu_vpcc.atlas.patches import FrameMeta
    from tpu_vpcc.ops.reconstruct import make_config, reconstruct_frame
    from tpu_vpcc.ops.tiled import (
        narrow_emit_ok,
        reconstruct_batch_pretiled,
        reconstruct_frame_tiled,
        tile_plane,
    )
    from tpu_vpcc.reconstruction.oracle import (
        GeneratePointCloudParams,
        generate_point_cloud,
    )
    from tpu_vpcc.v3c.syntax import PatchOrientation

    res = 8
    patch = Patch(
        uv0=(1, 2), size_uv0=(3, 2), uv1=(40, 80),
        occupancy_resolution=res,
        patch_orientation=PatchOrientation[orientation],
    )
    patch.set_view_id(view_id)
    patch.d1 = 100 if patch.projection_mode == 0 else 900
    meta = FrameMeta(width=64, height=64, patches=[patch])
    rng = np.random.default_rng(view_id * 10)
    occ = (rng.random((16, 16)) < 0.7).astype(np.uint8)
    d0 = rng.integers(0, 256, (64, 64)).astype(np.uint16) * 4
    d1 = np.minimum(
        d0 // 4 + rng.integers(0, 3, (64, 64)), 255
    ).astype(np.uint16) * 4
    ay = rng.integers(0, 1024, (2, 64, 64)).astype(np.uint16)
    au = rng.integers(0, 1024, (2, 32, 32)).astype(np.uint16)
    av = rng.integers(0, 1024, (2, 32, 32)).astype(np.uint16)

    params = GeneratePointCloudParams(
        occupancy_resolution=8, occupancy_precision=4, map_count_minus1=1,
        geometry_bitdepth_3d=BITDEPTH,
    )
    ps, _, _ = generate_point_cloud(
        meta, params, occ, [d0, d1],
        [[[ay[0], au[0], av[0]], [ay[1], au[1], av[1]]]],
    )
    assert ps.point_count > 0
    gt = build_group_table(meta)
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
        additional_planes=True, geometry_bitdepth_3d=BITDEPTH,
    )
    assert not narrow_emit_ok(cfg, 1, cfg.s_cap)
    from tpu_vpcc.ops.reconstruct import reconstruct_batch

    raw = (gt.fields, occ, d0, d1, ay, au, av)
    bp, bc_, bn = reconstruct_batch(
        *(a[None] for a in raw), cfg=cfg
    )
    for name, (pos, col, cnt) in {
        "baseline": reconstruct_frame(*raw, cfg=cfg),
        "tiled": reconstruct_frame_tiled(*raw, cfg=cfg),
        "flat_batch": (bp[0], bc_[0], bn[0]),
    }.items():
        n = int(cnt)
        assert n == ps.point_count, (name, n, ps.point_count)
        np.testing.assert_array_equal(
            np.asarray(pos)[:n], ps.positions, err_msg=name
        )
        np.testing.assert_array_equal(
            np.asarray(col)[:n], ps.colors16bit, err_msg=name
        )
    tp, tc, tn = reconstruct_batch_pretiled(
        gt.fields[None],
        tile_plane(occ, 2)[None],
        tile_plane(d0, 8)[None],
        tile_plane(d1, 8)[None],
        tile_plane(ay, 8)[None],
        tile_plane(au, 4)[None],
        tile_plane(av, 4)[None],
        cfg,
    )
    n = int(tn[0])
    assert n == ps.point_count
    np.testing.assert_array_equal(np.asarray(tp)[0][:n], ps.positions)
    np.testing.assert_array_equal(np.asarray(tc)[0][:n], ps.colors16bit)

@pytest.mark.parametrize("use_device", [True, False])
def test_plr_tail_rotates_with_the_patch(tmp_path, use_device):
    """PLR far-surface points on a 45-degree patch rotate like the
    regular points: single-plane stream == rotated plane-0 twin,
    including the appended PLR tail (same emission order/colors)."""
    MODES = ((True, False, False, 0), (True, True, False, 1),
             (True, True, True, 0), (False, False, True, 0))
    plane = 2
    rng = np.random.default_rng(71)
    probe = make_synthetic_frame(
        np.random.default_rng(71), width=64, height=64,
        occupancy_resolution=8, occupancy_precision=4, map_count=1,
        n_patches=2, frame_index=0, allow_swap=False,
    )
    modes = [p.projection_mode for p in probe.meta.patches]
    views = mode_views(plane, rng, 2, modes)
    frames, twins = make_45_frames(
        71, views, map_count=1, allow_swap=False
    )
    for fr in (frames, twins):
        for p in fr[0].meta.patches:
            bc = p.size_uv0[0] * p.size_uv0[1]
            # same rng draw for both streams: seed per patch footprint
            p.plr_modes = [
                int(np.random.default_rng(bc + i).integers(-1, 4))
                for i in range(bc)
            ]
    got = decode_all(
        build_fixture_stream(frames, plr=(MODES, 3)), use_device
    )
    twin = decode_all(
        build_fixture_stream(twins, plr=(MODES, 3)), use_device
    )
    ps, ps0 = got[0], twin[0]
    assert len(ps) == len(ps0) > 0
    np.testing.assert_array_equal(
        ps.positions, local_inverse(plane, ps0.positions)
    )
    np.testing.assert_array_equal(ps.colors, ps0.colors)


def test_eom_tail_rotates_with_the_patch(tmp_path):
    """EOM in-between points on 45-degree patches rotate like the
    regular points (single-plane stream vs rotated plane-0 twin), on
    both the device and oracle paths."""
    from tests.test_eom import make_eom_frame

    plane = 1
    rng = np.random.default_rng(83)
    sf = make_eom_frame(np.random.default_rng(83), allow_swap=False)
    twin_sf = copy.deepcopy(sf)
    modes = [p.projection_mode for p in sf.meta.patches]
    views = mode_views(plane, rng, len(modes), modes)
    for p, pt, v in zip(sf.meta.patches, twin_sf.meta.patches, views):
        p.set_view_id(v)
        pt.set_view_id(PLANE0_TWIN[v])
    for use_device in (True, False):
        got = decode_all(build_fixture_stream([sf]), use_device)
        twin = decode_all(build_fixture_stream([twin_sf]), use_device)
        ps, ps0 = got[0], twin[0]
        assert len(ps) == len(ps0) > 0
        np.testing.assert_array_equal(
            ps.positions, local_inverse(plane, ps0.positions)
        )
        np.testing.assert_array_equal(ps.colors, ps0.colors)


def test_smoothing_on_45_stream_device_matches_oracle(tmp_path):
    """Geometry smoothing operates on TRUE coordinates (post-rotation):
    the twin equivalence breaks by design, but device == oracle must
    hold — the flat kernel rotates before smooth_flat."""
    from tpu_vpcc.utils.ply import format_ply

    rng = np.random.default_rng(97)
    probe = make_synthetic_frame(
        np.random.default_rng(97), width=64, height=64,
        occupancy_resolution=8, occupancy_precision=4, n_patches=3,
        frame_index=0,
    )
    modes = [p.projection_mode for p in probe.meta.patches]
    views = [
        mode_views(pl, rng, 1, [m])[0]
        for pl, m in zip((1, 2, 3), modes)
    ]
    frames, _ = make_45_frames(97, views)
    stream = build_fixture_stream(frames, geo_smoothing_sei=(8, 16))

    def run(use_device):
        d = Decoder(Params(
            bytes(stream), use_device=use_device,
            apply_geo_smoothing_type=True,
        ))
        d.start()
        return list(d)

    dev, orc = run(True), run(False)
    assert len(dev) == len(orc) == 1
    assert len(dev[0]) > 0
    assert format_ply(dev[0]) == format_ply(orc[0])
