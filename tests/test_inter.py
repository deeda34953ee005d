"""Inter/merge/skip patch reconstruction (random-access P-tiles).

The reference panics on non-I tiles (``decoder.rs:403-407,487-501``);
this framework implements the TMC2 v18 derivation. Fixtures code frame 0
as an IDR I-tile and subsequent frames as P-tiles referencing the
previous frame; the synthetic patch metadata is the ground truth the
derivation must reproduce, and the NumPy oracle on the lossless planes
defines the exact point output.
"""

from dataclasses import replace

import numpy as np
import pytest

from tpu_vpcc.atlas.patches import create_patch_frames
from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.ply import format_ply
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.v3c.context import Context
from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)

W = H = 64
RES = 8
PREC = 4


def shift_d1(patch, delta):
    """d1 += delta along the patch's projection direction (mode-aware)."""
    return replace(patch, d1=patch.d1 + delta)


def make_p_sequence(seed=7):
    """frame0: I. frame1: P with [inter, merge3d, merge2d, skip].
    frame2: SKIP tile (replicates frame1's patch list)."""
    rng = np.random.default_rng(seed)
    f0 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=4, frame_index=0,
    )
    p0 = f0.meta.patches
    assert len(p0) == 4
    # footprints unchanged (uv0/size kept) so the canvas stays valid;
    # 3D params move, which is what inter/merge3d actually code
    p1 = [
        replace(shift_d1(p0[0], +3), uv1=(p0[0].uv1[0] + 5, p0[0].uv1[1] - 2)),
        replace(shift_d1(p0[1], -1), uv1=(p0[1].uv1[0] + 1, p0[1].uv1[1] + 1)),
        replace(p0[2]),  # merge2d with zero deltas (2d group coded, 3d copied)
        replace(p0[3]),  # skip: identity
    ]
    modes1 = [("inter", 0), "merge3d", "merge2d", "skip"]
    f1 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=1, patches=p1,
    )
    f2 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=2, patches=[replace(p) for p in p1],
    )
    frames = [f0, f1, f2]
    stream = build_fixture_stream(frames, p_modes={1: modes1, 2: "skip_tile"})
    return frames, stream


GEOM_FIELDS = (
    "uv0", "size_uv0", "uv1", "d1", "level_of_detail", "projection_mode",
    "axes", "axis_of_additional_plane", "patch_orientation",
    "occupancy_resolution",
)


def test_p_tile_patch_derivation_matches_source():
    frames, stream = make_p_sequence()
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    metas = create_patch_frames(ctx)
    assert len(metas) == 3
    for meta, sf in zip(metas, frames):
        assert len(meta.patches) == len(sf.meta.patches)
        for got, want in zip(meta.patches, sf.meta.patches):
            for f in GEOM_FIELDS:
                assert getattr(got, f) == getattr(want, f), (
                    f"frame {meta.frame_index}: field {f}: "
                    f"{getattr(got, f)} != {getattr(want, f)}"
                )


def test_p_tile_e2e_device_matches_oracle():
    _, stream = make_p_sequence(seed=11)
    d1 = Decoder(Params(stream, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(stream, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 3
    assert all(len(f) > 0 for f in dev)
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)


def test_p_tile_inter_with_2d_motion():
    """An inter patch that also moves on the canvas (2d deltas != 0)."""
    rng = np.random.default_rng(3)
    # one patch with guaranteed slack to move one block right/down
    f0 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=1, frame_index=0,
        allow_swap=False,
    )
    p = f0.meta.patches[0]
    bw, bh = W // RES, H // RES
    if p.uv0[0] + p.size_uv0[0] >= bw or p.uv0[1] + p.size_uv0[1] >= bh:
        p = replace(p, uv0=(0, 0), size_uv0=(1, 1))
        f0 = make_synthetic_frame(
            rng, width=W, height=H, occupancy_resolution=RES,
            occupancy_precision=PREC, frame_index=0, patches=[p],
        )
    moved = replace(p, uv0=(p.uv0[0] + 1, p.uv0[1] + 1))
    f1 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=1, patches=[moved],
    )
    stream = build_fixture_stream([f0, f1], p_modes={1: [("inter", 0)]})
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    metas = create_patch_frames(ctx)
    got = metas[1].patches[0]
    assert got.uv0 == moved.uv0
    assert got.size_uv0 == moved.size_uv0
    d = Decoder(Params(stream))
    d.start()
    out = list(d)
    assert len(out) == 2 and all(len(f) > 0 for f in out)


def test_skip_tile_replicates_previous_frame_patches():
    frames, stream = make_p_sequence(seed=19)
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    metas = create_patch_frames(ctx)
    for got, want in zip(metas[2].patches, metas[1].patches):
        assert got == want


def test_p_tile_ref_index_two_entry_list():
    """A two-entry ref list: the inter patch of frame 2 references frame
    0 via ref_index=1 (delta 2); ref_index is actually coded because
    num_ref_idx_active = 2."""
    rng = np.random.default_rng(23)
    f0 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=2, frame_index=0,
    )
    p0 = f0.meta.patches
    # frame1: unrelated I frame (different patches)
    f1 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=2, frame_index=1,
    )
    # frame2: P, patches derived from FRAME 0 (two frames back)
    p2 = [
        replace(shift_d1(p0[0], +2), uv1=(p0[0].uv1[0] + 1, p0[0].uv1[1])),
        replace(p0[1]),
    ]
    f2 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=2, patches=p2,
    )
    stream = build_fixture_stream(
        [f0, f1, f2],
        p_modes={2: [("inter", 0, 1), ("inter", 1, 1)]},
        ref_deltas=(1, 2),
    )
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    metas = create_patch_frames(ctx)
    for got, want in zip(metas[2].patches, p2):
        for f in GEOM_FIELDS:
            assert getattr(got, f) == getattr(want, f), f
    d = Decoder(Params(stream))
    d.start()
    out = list(d)
    assert len(out) == 3 and all(len(fr) > 0 for fr in out)


def test_p_tiles_across_multiple_gofs():
    """Two GOFs each with their own IDR + P chain decode independently
    (fresh Context per GOF; refs cannot cross the boundary)."""
    from tpu_vpcc.utils.fixtures import concat_streams

    streams = []
    for seed in (31, 37):
        frames, stream = make_p_sequence(seed=seed)
        streams.append(stream)
    multi = concat_streams(streams)
    d1 = Decoder(Params(multi, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(multi, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 6
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)


def test_p_tile_long_term_reference():
    """A long-term reference entry: frame 2's inter patch references
    frame 0 by absolute AFOC through a long-term ref-list entry
    (st_ref_atlas_frame_flag = 0; the ATH additional-afoc loop runs)."""
    rng = np.random.default_rng(41)
    f0 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=2, frame_index=0,
    )
    p0 = f0.meta.patches
    f1 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=2, frame_index=1,
    )
    p2 = [replace(shift_d1(p0[0], +1)), replace(p0[1])]
    f2 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=2, patches=p2,
    )
    stream = build_fixture_stream(
        [f0, f1, f2],
        p_modes={2: [("inter", 0, 1), ("inter", 1, 1)]},
        ref_deltas=(1, ("lt", 0)),
    )
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    metas = create_patch_frames(ctx)
    for got, want in zip(metas[2].patches, p2):
        for f in GEOM_FIELDS:
            assert getattr(got, f) == getattr(want, f), f
    d = Decoder(Params(stream))
    d.start()
    out = list(d)
    assert len(out) == 3 and all(len(fr) > 0 for fr in out)


def test_ref_afoc_list_additional_lsb_extension():
    """Long-term entries extend their AFOC lsb with the tile header's
    additional value: full = (additional << lsb_bits) + lsb."""
    from tpu_vpcc.atlas.patches import ref_afoc_list
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.syntax import (
        AtlasFrameParameterSet,
        AtlasSequenceParameterSet,
        AtlasTileHeader,
        RefListStruct,
    )

    ctx = Context()
    asps = AtlasSequenceParameterSet()
    asps.log2_max_atlas_frame_order_cnt_lsb_minus_4 = 0  # lsb_bits = 4
    asps.num_ref_atlas_frame_lists_in_asps = 1
    asps.ref_list_struct = [
        RefListStruct(
            num_ref_entries=2,
            abs_delta_afoc_st=[1],
            afoc_lsb_lt=[3],
            st_ref_atlas_frame_flag=[True, False],
            strpf_entry_sign_flag=[True],
        )
    ]
    ctx.add_asps(asps)
    ctx.add_afps(AtlasFrameParameterSet(additional_lt_afoc_lsb_len=4))
    ath = AtlasTileHeader(
        atlas_frame_parameter_set_id=0,
        ref_atlas_frame_list_sps_flag=True,
        additional_afoc_lsb_present_flag=[True],
        additional_afoc_lsb_val=[2],
    )
    # entry 0: short-term, cur - 1; entry 1: long-term lsb 3 with
    # additional 2 -> (2 << 4) + 3 = 35
    assert ref_afoc_list(ctx, ath, 40) == [39, 35]
    # without the additional flag the lsb stands alone
    ath2 = AtlasTileHeader(
        atlas_frame_parameter_set_id=0,
        ref_atlas_frame_list_sps_flag=True,
        additional_afoc_lsb_present_flag=[False],
    )
    assert ref_afoc_list(ctx, ath2, 40) == [39, 3]


def test_pos_min_d_quantizer_roundtrip():
    """min_level > 1 (pos_min_d_quantizer=2): intra d1 codes in units of
    4 and inter offsets divide by min_level (decoder.rs:410,437-441 and
    the TMC2 inter d1 reconstruction)."""
    rng = np.random.default_rng(55)
    min_level = 4
    f0 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=3, frame_index=0,
    )
    # snap d1 to min_level multiples (mode 1 stores max3d - offset*min,
    # and max3d is a multiple of 4, so snapping d1 works for both modes)
    p0 = [replace(p, d1=(p.d1 // min_level) * min_level) for p in f0.meta.patches]
    f0 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=0, patches=p0,
    )
    p1 = [replace(shift_d1(p0[0], +2 * min_level)), replace(p0[1]), replace(p0[2])]
    f1 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=1, patches=p1,
    )
    stream = build_fixture_stream(
        [f0, f1],
        p_modes={1: [("inter", 0), "merge3d", "skip"]},
        pos_min_d_quantizer=2,
    )
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    metas = create_patch_frames(ctx)
    for meta, want_patches in zip(metas, (p0, p1)):
        for got, want in zip(meta.patches, want_patches):
            for f in GEOM_FIELDS:
                assert getattr(got, f) == getattr(want, f), (meta.frame_index, f)
    d1 = Decoder(Params(stream, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(stream, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 2 and all(len(fr) > 0 for fr in dev)
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)


def test_orientation_gate_matches_reference_panics():
    """The gate raises exactly where the reference's quirked transform
    leaves the canvas (its release-build assert) and accepts everything
    it decodes: block-aligned orientations at any resolution, ALL
    orientations at resolution 1, and even quirk-in-range rotated
    patches at resolution > 1."""
    from tpu_vpcc.atlas.patches import Patch, _check_orientation_in_range
    from tpu_vpcc.v3c.syntax import PatchOrientation, UnsupportedFeature

    W = H = 64
    rotated = (PatchOrientation.ROT90, PatchOrientation.ROT180,
               PatchOrientation.ROT270, PatchOrientation.MIRROR,
               PatchOrientation.MROT90, PatchOrientation.MROT180)
    # res > 1: multi-block patch at the origin drives the unscaled-size
    # transform negative -> the reference panics -> raise
    for o in rotated:
        with pytest.raises(UnsupportedFeature):
            _check_orientation_in_range(
                Patch(uv0=(0, 0), size_uv0=(3, 2), occupancy_resolution=16,
                      patch_orientation=o), W, H,
            )
    # block-aligned orientations are always in-range when packed in-bounds
    for o in (PatchOrientation.DEFAULT, PatchOrientation.SWAP,
              PatchOrientation.MROT270):
        _check_orientation_in_range(
            Patch(uv0=(0, 0), size_uv0=(2, 2), occupancy_resolution=16,
                  patch_orientation=o), W, H,
        )
    # res == 1: pixel units == block units, every orientation in-range
    for o in list(PatchOrientation):
        _check_orientation_in_range(
            Patch(uv0=(10, 10), size_uv0=(3, 2), occupancy_resolution=1,
                  patch_orientation=o), W, H,
        )
    # res > 1 quirk-in-range: ROT90 with a big-enough u0 offset keeps the
    # (block-unit) size subtraction non-negative -> the reference release
    # build succeeds -> accept
    _check_orientation_in_range(
        Patch(uv0=(2, 0), size_uv0=(2, 2), occupancy_resolution=4,
              patch_orientation=PatchOrientation.ROT90), W, H,
    )


def test_p_tile_normal_axis_max_delta_size_d_derivation():
    """ipdu/mpdu_3d_range_d (framework extension — the reference panics
    when NAMD meets a P-tile, ``reader.rs:1963,2025``): the quantized
    range delta reproduces each patch's size_d through the inter AND
    merge-3d derivations, including shrink, growth, and the 255 clamp."""
    rng = np.random.default_rng(31)
    f0 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=3, frame_index=0,
    )
    p0 = [replace(p, size_d=sd) for p, sd in zip(f0.meta.patches, (40, 64, 255))]
    f0 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=0, patches=p0,
    )
    # frame 1: inter shrinks 40 -> 24, merge3d grows 64 -> 100,
    # inter keeps the 255 clamp
    p1 = [
        replace(shift_d1(p0[0], +1), size_d=24),
        replace(p0[1], size_d=100, d1=p0[1].d1),
        replace(p0[2]),
    ]
    f1 = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=1, patches=p1,
    )
    stream = build_fixture_stream(
        [f0, f1], p_modes={1: [("inter", 0), "merge3d", ("inter", 2)]}
    )
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    assert ctx.get_asps(0).normal_axis_max_delta_value_enabled_flag
    metas = create_patch_frames(ctx)
    for got, want in zip(metas[0].patches, p0):
        assert got.size_d == want.size_d
    for got, want in zip(metas[1].patches, p1):
        assert got.size_d == want.size_d
        for f in GEOM_FIELDS:
            assert getattr(got, f) == getattr(want, f), f
    # the decode itself stays byte-identical device-vs-oracle
    d1_ = Decoder(Params(stream, use_device=True))
    d1_.start()
    d2_ = Decoder(Params(stream, use_device=False))
    d2_.start()
    for a, b in zip(list(d1_), list(d2_)):
        assert format_ply(a) == format_ply(b)
