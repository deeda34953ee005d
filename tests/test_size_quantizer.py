"""Patch size quantizer (asps_patch_size_quantizer_present_flag).

FRAMEWORK EXTENSION: the reference asserts the ASPS flag false
(``reader.rs:1052``) and its reconstruction panics on the parameter
(``codec.rs:303-305``); its dead derivation sketch (``decoder.rs:442-460``)
shows the ceil block-footprint form. Here quantized patch sizes decode on
I-tiles: the PDU codes the size in 2^quantizer pixel units, the block
footprint rounds up, and occupied pixels past the exact pixel extent emit
no point (TMC2 v18 enableSizeQuantization semantics). The device path
expresses the trim as a packed-occupancy-bit mask in the host-pack cat
(``ops.tiled.trim_extent_bits``), so the kernels are untouched.
"""

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
from tpu_vpcc.v3c.syntax import UnsupportedFeature
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)

W = H = 64
RES = 8
PREC = 4


def make_quantized_frame(rng, extents, q=(2, 2), occupancy_fill=1.0):
    """A frame whose patches carry exact pixel extents (multiples of
    2^q per axis); size_uv0 is the ceil block footprint. Patches are
    placed side-by-side on the block grid (DEFAULT orientation, patch
    coords == canvas coords up to the block origin)."""
    from dataclasses import replace

    f = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=len(extents), frame_index=0,
        allow_swap=False, occupancy_fill=occupancy_fill,
    )
    patches, xoff = [], 0
    from tpu_vpcc.v3c.syntax import PatchOrientation

    for p, (px, py) in zip(f.meta.patches, extents):
        su0, sv0 = -(-px // RES), -(-py // RES)
        assert xoff + su0 <= W // RES and sv0 <= H // RES, (extents,)
        patches.append(replace(
            p, uv0=(xoff, 0), size_uv0=(su0, sv0),
            size_2d_in_pixel=(px, py),
            patch_orientation=PatchOrientation.DEFAULT,
        ))
        xoff += su0
    # rebuild planes for the adjusted footprints
    return make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=0, patches=patches,
        occupancy_fill=occupancy_fill,
    ), (1 << q[0], 1 << q[1])


def test_quantized_metadata_roundtrip():
    """size_2d_minus1 coded in quantized units; the derivation restores
    the ceil block footprint AND the exact pixel extent."""
    rng = np.random.default_rng(41)
    # extents chosen non-block-aligned: 20x12 -> 3x2 blocks, 8x28 -> 1x4
    sf, _ = make_quantized_frame(rng, [(20, 12), (8, 28)], q=(2, 2))
    stream = build_fixture_stream([sf], size_quantizer=(2, 2))
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    asps = ctx.get_asps(0)
    assert asps.patch_size_quantizer_present_flag is True
    atl = ctx.get_atlas_tile_layer(0)
    assert atl.header.patch_size_info_quantizer == (2, 2)
    metas = create_patch_frames(ctx)
    got = metas[0].patches
    assert [p.size_2d_in_pixel for p in got] == [(20, 12), (8, 28)]
    assert [p.size_uv0 for p in got] == [(3, 2), (1, 4)]


def test_quantized_trim_point_count_exact():
    """With full occupancy, ONE quantized patch emits exactly
    extent_x * extent_y * 2 - dup points — the block-rounded footprint's
    extra occupied pixels are trimmed (scalar recomputation from the
    synthetic planes, independent of the oracle)."""
    rng = np.random.default_rng(43)
    px, py = 20, 12  # 3x2 blocks = 24x16 pixels; 144 pixels trimmed
    sf, _ = make_quantized_frame(rng, [(px, py)], q=(2, 2))
    stream = build_fixture_stream([sf], size_quantizer=(2, 2))
    d = Decoder(Params(stream, use_device=False))
    d.start()
    frames = list(d)
    assert len(frames) == 1
    # patch at uv0=(0,0), DEFAULT orientation: patch coords == canvas
    d0 = (sf.geo_planes[0][:py, :px].astype(np.int64)) >> 2
    d1 = (sf.geo_planes[1][:py, :px].astype(np.int64)) >> 2
    occ = sf.occ_plane.repeat(PREC, 0).repeat(PREC, 1)[:py, :px] > 0
    expected = int(occ.sum()) * 2 - int((occ & (d0 == d1)).sum())
    assert len(frames[0]) == expected
    # and the untrimmed twin (block-exact sizes, no quantizer) emits
    # strictly more: the footprint's occupied pixels past the extent
    stream_full = build_fixture_stream([sf])
    d2 = Decoder(Params(stream_full, use_device=False))
    d2.start()
    full = list(d2)[0]
    assert len(full) > len(frames[0])


@pytest.mark.parametrize("q", [(2, 2), (1, 3), (0, 2)])
def test_quantized_device_matches_oracle(q):
    """The cat-staged device path (trim as an occupancy-bit mask) is
    byte-identical to the oracle, including asymmetric quantizers."""
    rng = np.random.default_rng(47)
    qx, qy = 1 << q[0], 1 << q[1]
    ext = [
        (qx * 5, qy * 3),
        (qx * 2, qy * 7),
        (qx * 4, qy * 4),
    ]
    sf, _ = make_quantized_frame(rng, ext, q=q, occupancy_fill=0.8)
    stream = build_fixture_stream([sf], size_quantizer=q)
    d1 = Decoder(Params(stream, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(stream, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 1
    assert len(dev[0]) > 0
    assert format_ply(dev[0]) == format_ply(orc[0])


def test_quantizer_combo_gates():
    """Quantizer + PLR/EOM raises at the ASPS parse; quantizer + inter
    patches raises at the PDU parse — clean envelope failures."""
    from tests.test_golden_bits import make_p_context_and_ath

    ctx, ath = make_p_context_and_ath()
    ctx.get_asps(0).patch_size_quantizer_present_flag = True
    from tpu_vpcc.v3c.syntax import InterPatchDataUnit, MergePatchDataUnit

    with pytest.raises(UnsupportedFeature):
        InterPatchDataUnit.parse(Bitstream(b"\x00" * 8), ctx, ath)
    with pytest.raises(UnsupportedFeature):
        MergePatchDataUnit.parse(Bitstream(b"\x00" * 8), ctx, ath)


def test_quantized_bitflip_fuzz():
    """Bit flips across the quantized stream parse cleanly or decode."""
    rng = np.random.default_rng(53)
    sf, _ = make_quantized_frame(rng, [(20, 12)], q=(2, 2))
    stream = bytearray(build_fixture_stream([sf], size_quantizer=(2, 2)))

    def run(data):
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        while ssvu.get_v3c_unit_count() > 0:
            ctx = Context()
            ssvu.decode_gof(ctx)
            create_patch_frames(ctx)

    run(bytes(stream))
    raised = 0
    for i in range(0, min(300, len(stream)), 7):
        mutated = bytearray(stream)
        mutated[i] ^= 0xFF
        try:
            run(bytes(mutated))
        except Exception:
            raised += 1
    assert raised > 0
