"""PLR decode (framework extension — the reference panics on the ASPS
flag, ``reader.rs:1082``, and at every reconstruction site).

Single-map streams: each patch/block selects an (interpolate, filling,
minimum_depth, neighbour) mode from the ASPS table; the decoder derives
far-surface points from the D0 neighborhood (clamped by the VPCC-
extension surface thickness) and appends them after the regular points.
The expectation here is an independent scalar recomputation over the
authored planes."""

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.reconstruction.pointset import convert_yuv10_to_rgb8
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.v3c.syntax import UnsupportedFeature
from tpu_vpcc.v3c import writer as w3c
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)

# one mode per flag combination worth distinguishing
MODES = (
    (True, False, False, 0),   # interpolate, single point, r=1
    (True, True, False, 1),    # interpolate + filling, r=2
    (True, True, True, 0),     # + minimum depth
    (False, False, True, 0),   # minimum depth only (deltaD = 1)
)
THICKNESS = 3


def make_plr_frames(seed, n_frames=2, n_patches=3, assign="mixed", **kw):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n_frames):
        sf = make_synthetic_frame(
            rng, width=kw.get("width", 64), height=kw.get("height", 64),
            occupancy_resolution=kw.get("res", 8),
            occupancy_precision=kw.get("prec", 4), map_count=1,
            n_patches=n_patches, frame_index=i,
            allow_swap=kw.get("allow_swap", True),
        )
        for p in sf.meta.patches:
            bc = p.size_uv0[0] * p.size_uv0[1]
            if assign == "uniform":
                p.plr_modes = [int(rng.integers(0, len(MODES)))] * bc
            else:  # mixed block-level incl. absent blocks
                p.plr_modes = [
                    int(rng.integers(-1, len(MODES))) for _ in range(bc)
                ]
        frames.append(sf)
    return frames


def decode_all(path, use_device):
    d = Decoder(Params(path, use_device=use_device))
    d.start()
    return list(d)


def expected_plr_tail(sf, geo_shift=2):
    """Independent scalar recomputation of the PLR tail."""
    prec = sf.occupancy_precision
    res = sf.occupancy_resolution
    W, H = sf.meta.width, sf.meta.height
    occ = np.asarray(
        [[sf.occ_plane[y // prec, x // prec] > 0 for x in range(W)]
         for y in range(H)]
    )
    d0m = (sf.geo_planes[0].astype(np.int64) >> geo_shift)
    pos, col = [], []
    ay, au, av = sf.attr_planes[0]
    csh = 0 if au.shape == ay.shape else 1

    def delta(x, y, r, sign):
        best = 0
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                xx, yy = x + dx, y + dy
                if 0 <= xx < W and 0 <= yy < H and occ[yy, xx]:
                    best = max(best, sign * (int(d0m[yy, xx]) - int(d0m[y, x])))
        return min(best, THICKNESS)

    for patch in sf.meta.patches:
        if patch.plr_modes is None:
            continue
        sign = 1 if patch.projection_mode == 0 else -1
        for v0 in range(patch.size_uv0[1]):
            for u0 in range(patch.size_uv0[0]):
                mode = patch.plr_modes[v0 * patch.size_uv0[0] + u0]
                if mode < 0:
                    continue
                interp, filling, min_depth, nb_m1 = MODES[mode]
                # block occupancy gate (non-overlapping patches: owner
                # == this patch iff the block has occupancy)
                block_pix = [
                    patch.patch_to_canvas(u0 * res + uu, v0 * res + vv, W, H)
                    for vv in range(res) for uu in range(res)
                ]
                if not any(occ[y, x] for x, y in block_pix):
                    continue
                for v1 in range(res):
                    for u1 in range(res):
                        u, v = u0 * res + u1, v0 * res + v1
                        x, y = patch.patch_to_canvas(u, v, W, H)
                        if not occ[y, x]:
                            continue
                        dd = delta(x, y, nb_m1 + 1, sign) if interp else 0
                        if min_depth:
                            dd = max(dd, 1)
                        depths = (
                            range(1, dd + 1) if filling
                            else ([dd] if dd > 0 else [])
                        )
                        d0 = int(d0m[y, x])
                        for k in depths:
                            depth = d0 + k
                            if patch.projection_mode == 0:
                                nrm = depth + patch.d1
                            else:
                                nrm = max(patch.d1, depth) - depth
                            pt = [0, 0, 0]
                            pt[patch.axes[0]] = nrm & 0xFFFF
                            pt[patch.axes[1]] = (u + patch.uv1[0]) & 0xFFFF
                            pt[patch.axes[2]] = (v + patch.uv1[1]) & 0xFFFF
                            pos.append(pt)
                            col.append(
                                (int(ay[y, x]), int(au[y >> csh, x >> csh]),
                                 int(av[y >> csh, x >> csh]))
                            )
    return (
        np.array(pos, dtype=np.uint16).reshape(-1, 3),
        np.array(col, dtype=np.uint16).reshape(-1, 3),
    )


def test_plr_metadata_roundtrip(tmp_path):
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    for assign in ("uniform", "mixed"):
        frames = make_plr_frames(seed=131, n_frames=2, assign=assign)
        stream = build_fixture_stream(frames, plr=(MODES, THICKNESS))
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
        context = Context()
        ssvu.decode_gof(context)
        metas = create_patch_frames(context)
        for meta, sf in zip(metas, frames):
            for got, exp in zip(meta.patches, sf.meta.patches):
                assert got.plr_modes == exp.plr_modes, assign


@pytest.mark.parametrize("use_device", [True, False])
def test_plr_tail_expectation(tmp_path, use_device):
    """Decoded PLR tail (positions + converted colors) equals the
    scalar recomputation; the regular prefix equals a PLR-free decode
    of the same scene."""
    frames = make_plr_frames(seed=141, n_frames=1, n_patches=2,
                             allow_swap=False)
    (sf,) = frames
    path = tmp_path / "plr.bin"
    path.write_bytes(build_fixture_stream([sf], plr=(MODES, THICKNESS)))
    import copy

    sf_plain = copy.deepcopy(sf)
    for p in sf_plain.meta.patches:
        p.plr_modes = None
    path_plain = tmp_path / "plain.bin"
    path_plain.write_bytes(build_fixture_stream([sf_plain]))

    (ps,) = decode_all(path, use_device)
    (ps_plain,) = decode_all(path_plain, use_device)
    exp_pos, exp_col16 = expected_plr_tail(sf)
    n_reg = len(ps_plain)
    assert exp_pos.shape[0] > 0
    assert len(ps) == n_reg + exp_pos.shape[0]
    np.testing.assert_array_equal(ps.positions[:n_reg], ps_plain.positions)
    np.testing.assert_array_equal(ps.positions[n_reg:], exp_pos)
    np.testing.assert_array_equal(
        ps.colors[n_reg:], convert_yuv10_to_rgb8(exp_col16)
    )


def test_plr_device_path_matches_oracle_path(tmp_path):
    from tpu_vpcc.utils.ply import format_ply

    frames = make_plr_frames(seed=151, n_frames=2, n_patches=3)
    path = tmp_path / "plr2.bin"
    path.write_bytes(build_fixture_stream(frames, plr=(MODES, THICKNESS)))
    dev = decode_all(path, True)
    orc = decode_all(path, False)
    assert len(dev) == len(orc) == 2
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)


def test_plr_two_map_rejected():
    from tpu_vpcc.v3c.syntax import AtlasSequenceParameterSet

    asps = AtlasSequenceParameterSet()
    asps.map_count_minus1 = 1
    asps.plr_enabled_flag = True
    payload = w3c.write_asps(asps)
    with pytest.raises(UnsupportedFeature, match="PLR with more than one"):
        AtlasSequenceParameterSet.parse(Bitstream(payload))


def test_plr_bit_flips_fail_cleanly(tmp_path):
    import time

    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    frames = make_plr_frames(seed=161, n_frames=2)
    stream = bytearray(build_fixture_stream(frames, plr=(MODES, THICKNESS)))

    def full_decode(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(bytes(data)))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    full_decode(stream)
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

def make_plr_p_sequence(seed=17):
    """frame0: IDR I-tile, every patch block-level PLR. frame1: P-tile
    covering every patch mode's PLR interplay (framework extension —
    the reference panics on P-tiles AND on the PLR flag):
    intra (fresh block-level plrd), inter (fresh level-mode plrd —
    TMC2's parse-time size accumulator sizes the block list), merge2d
    with mpdu_override_plr_flag (fresh level-mode), merge3d and skip
    (per-block modes inherited from the reference patch)."""
    from dataclasses import replace

    rng = np.random.default_rng(seed)
    f0 = make_synthetic_frame(
        rng, width=96, height=96, occupancy_resolution=8,
        occupancy_precision=4, map_count=1, n_patches=5, frame_index=0,
        allow_swap=False,
    )
    p0 = f0.meta.patches
    assert len(p0) == 5
    for p in p0:
        bc = p.size_uv0[0] * p.size_uv0[1]
        p.plr_modes = [int(rng.integers(-1, len(MODES))) for _ in range(bc)]

    def bc(p):
        return p.size_uv0[0] * p.size_uv0[1]

    p1 = [
        replace(p0[0]),                       # intra: recoded from scratch
        replace(p0[1], d1=p0[1].d1 + 2),      # inter: 3d motion
        replace(p0[2]),                       # merge2d, PLR overridden
        replace(p0[3], d1=max(p0[3].d1 - 1, 0)),  # merge3d: inherit PLR
        replace(p0[4]),                       # skip: inherit everything
    ]
    p1[0].plr_modes = [int(rng.integers(-1, len(MODES))) for _ in range(bc(p1[0]))]
    p1[1].plr_modes = [2] * bc(p1[1])         # inter PDUs code level mode
    p1[2].plr_modes = [0] * bc(p1[2])         # differs from ref -> override
    p1[3].plr_modes = list(p0[3].plr_modes)   # inherited via merge3d
    p1[4].plr_modes = list(p0[4].plr_modes)   # inherited via skip
    modes1 = ["intra", ("inter", 1), "merge2d", "merge3d", "skip"]
    f1 = make_synthetic_frame(
        rng, width=96, height=96, occupancy_resolution=8,
        occupancy_precision=4, map_count=1, frame_index=1, patches=p1,
        allow_swap=False,
    )
    frames = [f0, f1]
    stream = build_fixture_stream(
        frames, p_modes={1: modes1}, plr=(MODES, THICKNESS)
    )
    return frames, stream


def test_plr_p_tile_metadata_roundtrip():
    from tpu_vpcc.atlas.patches import create_patch_frames
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit

    frames, stream = make_plr_p_sequence()
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    context = Context()
    ssvu.decode_gof(context)
    metas = create_patch_frames(context)
    assert len(metas) == 2
    for meta, sf in zip(metas, frames):
        assert len(meta.patches) == len(sf.meta.patches)
        for got, exp in zip(meta.patches, sf.meta.patches):
            assert got.plr_modes == exp.plr_modes


@pytest.mark.parametrize("use_device", [True, False])
def test_plr_p_tile_tail_expectation(tmp_path, use_device):
    """Both frames' PLR tails equal the scalar recomputation over the
    authored planes; the regular prefix equals a PLR-free decode."""
    import copy

    frames, stream = make_plr_p_sequence(seed=23)
    path = tmp_path / "plr_p.bin"
    path.write_bytes(stream)
    frames_plain = copy.deepcopy(frames)
    for sf in frames_plain:
        for p in sf.meta.patches:
            p.plr_modes = None
    path_plain = tmp_path / "plr_p_plain.bin"
    path_plain.write_bytes(build_fixture_stream(
        frames_plain,
        p_modes={1: ["intra", ("inter", 1), "merge2d", "merge3d", "skip"]},
    ))

    got = decode_all(path, use_device)
    got_plain = decode_all(path_plain, use_device)
    assert len(got) == len(got_plain) == 2
    for ps, ps_plain, sf in zip(got, got_plain, frames):
        exp_pos, exp_col16 = expected_plr_tail(sf)
        n_reg = len(ps_plain)
        assert exp_pos.shape[0] > 0
        assert len(ps) == n_reg + exp_pos.shape[0]
        np.testing.assert_array_equal(ps.positions[:n_reg], ps_plain.positions)
        np.testing.assert_array_equal(ps.positions[n_reg:], exp_pos)
        np.testing.assert_array_equal(
            ps.colors[n_reg:], convert_yuv10_to_rgb8(exp_col16)
        )


def test_plr_p_tile_device_matches_oracle(tmp_path):
    from tpu_vpcc.utils.ply import format_ply

    frames, stream = make_plr_p_sequence(seed=29)
    path = tmp_path / "plr_p2.bin"
    path.write_bytes(stream)
    dev = decode_all(path, True)
    orc = decode_all(path, False)
    assert len(dev) == len(orc) == 2
    for a, b in zip(dev, orc):
        assert len(a) > 0
        assert format_ply(a) == format_ply(b)
