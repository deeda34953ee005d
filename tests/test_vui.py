"""VUI parameters (ASPS F.2.1 — framework extension).

The reference panics on ``asps_vui_parameters_present_flag``
(``reader.rs:1089``): VUI was the last piece of V3C syntax neither
decoder could even skip, because it sits mid-ASPS (before the extension
flags), so it cannot be bypassed by sized framing. Here it parses,
roundtrips through the writer, and — being display/timing metadata —
leaves reconstruction untouched.
"""

import dataclasses

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream, BitWriter
from tpu_vpcc.v3c.context import Context
from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
from tpu_vpcc.v3c.syntax import (
    CoordinateSystemParameters,
    HrdParameters,
    HrdSubLayerParameters,
    VuiParameters,
)
from tpu_vpcc.v3c.writer import write_vui


def rich_vui() -> VuiParameters:
    """Every optional branch on, including HRD with NAL+ACL sub-layer
    parameter lists (2 CABs)."""
    hrd = HrdParameters(
        nal_parameters_present_flag=True,
        acl_parameters_present_flag=True,
        bit_rate_scale=3,
        cab_size_scale=5,
        initial_cab_removal_delay_length_minus1=23,
        au_cab_removal_delay_length_minus1=15,
        dab_output_delay_length_minus1=9,
        fixed_atlas_rate_general_flag=[False],
        fixed_atlas_rate_within_cas_flag=[False],
        elemental_duration_in_tc_minus1=[0],
        low_delay_flag=[False],
        cab_cnt_minus1=[1],
        sub_layer_parameters=[
            [HrdSubLayerParameters([100, 200], [50, 60], [True, False])],
            [HrdSubLayerParameters([1, 2], [3, 4], [False, True])],
        ],
    )
    return VuiParameters(
        timing_info_present_flag=True,
        num_units_in_tick=1001,
        time_scale=30000,
        poc_proportional_to_timing_flag=True,
        num_ticks_poc_diff_one_minus1=4,
        hrd_parameters_present_flag=True,
        hrd_parameters=hrd,
        tile_restrictions_present_flag=True,
        fixed_atlas_tile_structure_flag=True,
        fixed_video_tile_structure_flag=False,
        constrained_tiles_across_v3c_components_idc=2,
        max_num_tiles_per_atlas_minus1=7,
        max_coded_video_resolution_present_flag=True,
        coded_max_video_width=1280,
        coded_max_video_height=1280,
        coordinate_system_parameters_present_flag=True,
        coordinate_system_parameters=CoordinateSystemParameters(
            forward_axis=2, delta_left_axis=1,
            forward_sign=False, left_sign=True, up_sign=False,
        ),
        unit_in_metres_flag=True,
        display_box_info_present_flag=True,
        display_box_origin=[1, 2, 3],
        display_box_size=[100, 200, 300],
        anchor_point_present_flag=True,
        anchor_point=[10, 20, 30],
    )


@pytest.mark.parametrize("vui", [
    VuiParameters(),  # all branches off: 6 flag bits
    rich_vui(),
    VuiParameters(timing_info_present_flag=True,
                  hrd_parameters_present_flag=True,
                  hrd_parameters=HrdParameters(
                      fixed_atlas_rate_general_flag=[True],
                      fixed_atlas_rate_within_cas_flag=[False],
                      elemental_duration_in_tc_minus1=[29],
                      low_delay_flag=[False],
                      cab_cnt_minus1=[0],
                      sub_layer_parameters=[[None], [None]],
                  )),  # fixed-rate-general branch: within flag INFERRED
    VuiParameters(timing_info_present_flag=True,
                  hrd_parameters_present_flag=True,
                  hrd_parameters=HrdParameters(
                      fixed_atlas_rate_general_flag=[False],
                      fixed_atlas_rate_within_cas_flag=[False],
                      elemental_duration_in_tc_minus1=[0],
                      low_delay_flag=[True],
                      cab_cnt_minus1=[0],
                      sub_layer_parameters=[[None], [None]],
                  )),  # low-delay branch: cab_cnt not coded
])
def test_vui_roundtrip(vui):
    w = BitWriter()
    write_vui(w, vui)
    w.byte_align()
    data = w.getvalue()
    bs = Bitstream(data)
    got = VuiParameters.parse(bs)
    assert dataclasses.asdict(got) == dataclasses.asdict(vui)


def _make_streams(with_vui):
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame

    rng = np.random.default_rng(17)
    frames = [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, map_count=2, n_patches=2, frame_index=i,
        )
        for i in range(2)
    ]
    return build_fixture_stream(
        frames, vui=rich_vui() if with_vui else None
    )


def test_vui_stream_decodes_and_is_stored():
    """A VUI-bearing fixture decodes; the parsed ASPS retains the VUI
    verbatim; the point output is unchanged (display metadata only)."""
    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    s_vui = _make_streams(True)
    s_plain = _make_streams(False)
    assert s_vui != s_plain

    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(s_vui))
    ctx = Context()
    ssvu.decode_gof(ctx)
    asps = ctx.get_asps(0)
    assert asps.vui_parameters_present_flag
    assert dataclasses.asdict(asps.vui_parameters) == dataclasses.asdict(
        rich_vui()
    )

    d1 = Decoder(Params(bytes(s_vui), use_device=False)); d1.start()
    d2 = Decoder(Params(bytes(s_plain), use_device=False)); d2.start()
    got, plain = list(d1), list(d2)
    assert len(got) == len(plain) == 2
    for a, b in zip(got, plain):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.colors, b.colors)


def test_vui_region_bit_flips_fail_cleanly():
    """Bit flips across the VUI-bearing ASPS region either still parse
    or raise cleanly — never hang or crash the process."""
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    stream = bytearray(_make_streams(True))
    outcomes = {"ok": 0, "raised": 0}
    # the ASPS (and its embedded VUI) lives in the first ~200 bytes
    for byte in range(min(200, len(stream))):
        for bit in range(8):
            mutated = bytearray(stream)
            mutated[byte] ^= 1 << bit
            try:
                ssvu = SampleStreamV3CUnit.from_bitstream(
                    Bitstream(bytes(mutated))
                )
                while ssvu.get_v3c_unit_count() > 0:
                    ssvu.decode_gof(Context())
                outcomes["ok"] += 1
            except Exception:
                outcomes["raised"] += 1
    assert outcomes["ok"] + outcomes["raised"] == 1600
