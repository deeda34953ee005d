"""Decoding-order patch precedence (asps_patch_precedence_order_flag).

FRAMEWORK EXTENSION: the reference asserts the flag false
(``codec.rs:340-347``). 23090-5 semantics: flag off = precedence is the
REVERSE of decoding order (later patches win contested blocks — the
reference's only mode); flag on = precedence is the decoding order, so
earlier patches win. Ownership passes (oracle block-to-patch, group
tables, the EOM/PLR owner map) iterate patches reversed under the flag;
point-emission order is unchanged (patches ascending).
"""

from dataclasses import replace

import numpy as np
import pytest

from tpu_vpcc.atlas.groups import build_group_table
from tpu_vpcc.atlas.patches import create_patch_frames
from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.reconstruction.oracle import generate_block_to_patch
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.ply import format_ply
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.v3c.context import Context
from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
from tpu_vpcc.v3c.syntax import PatchOrientation
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)

W = H = 64
RES = 8
PREC = 4


def make_overlap_frame(rng):
    """Two DEFAULT-orientation patches whose footprints share the blocks
    at x-block 2, rows 0-1 (patch 0 spans x-blocks 0-2, patch 1 spans
    2-4); full occupancy so ownership is decided purely by precedence."""
    f = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=2, frame_index=0,
        allow_swap=False, occupancy_fill=1.0,
    )
    p0 = replace(
        f.meta.patches[0], uv0=(0, 0), size_uv0=(3, 2),
        patch_orientation=PatchOrientation.DEFAULT,
    )
    p1 = replace(
        f.meta.patches[1], uv0=(2, 0), size_uv0=(3, 2),
        patch_orientation=PatchOrientation.DEFAULT,
    )
    return make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=0, patches=[p0, p1],
        occupancy_fill=1.0,
    )


def _decode_meta(stream):
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    return ctx, create_patch_frames(ctx)[0]


def test_precedence_flips_contested_ownership():
    rng = np.random.default_rng(61)
    sf = make_overlap_frame(rng)
    s_off = build_fixture_stream([sf])
    s_on = build_fixture_stream([sf], patch_precedence=True)

    ctx_on, meta_on = _decode_meta(s_on)
    assert ctx_on.get_asps(0).patch_precedence_order_flag is True
    assert meta_on.patch_precedence is True
    ctx_off, meta_off = _decode_meta(s_off)
    assert meta_off.patch_precedence is False

    bw = W // RES
    contested = [0 * bw + 2, 1 * bw + 2]
    for meta, want in ((meta_off, 2), (meta_on, 1)):
        # oracle ownership
        b2p = generate_block_to_patch(meta, sf.occ_plane, RES, PREC)
        assert all(b2p[b] == want for b in contested), (want, b2p[contested])
        # device group-table ownership agrees
        bt = build_group_table(meta)
        assert all(
            bt.block_to_patch.ravel()[b] == want for b in contested
        )
        # uncontested blocks unchanged: patch 0's x-blocks 0-1 rows 0-1
        assert b2p[0] == 1 and b2p[3] == 2


def test_precedence_device_matches_oracle_and_differs_from_off():
    rng = np.random.default_rng(67)
    sf = make_overlap_frame(rng)
    s_off = build_fixture_stream([sf])
    s_on = build_fixture_stream([sf], patch_precedence=True)

    def decode(stream, device):
        d = Decoder(Params(stream, use_device=device))
        d.start()
        out = list(d)
        assert len(out) == 1
        return out[0]

    on_dev = decode(s_on, True)
    on_orc = decode(s_on, False)
    assert len(on_dev) > 0
    assert format_ply(on_dev) == format_ply(on_orc)

    off_orc = decode(s_off, False)
    # same pixels read either way (full occupancy, unique block owner):
    # equal counts, but the contested blocks decode under different
    # projections, so the point sets differ
    assert len(off_orc) == len(on_orc)
    assert format_ply(off_orc) != format_ply(on_orc)
