"""Asymmetric golden-bit parity tests.

Every byte sequence here is hand-assembled from the REFERENCE parser's
documented field order (``/root/reference/src/bitstream/reader.rs``),
NOT via :class:`tpu_vpcc.bitio.BitWriter` — so a field-order mistake
present symmetrically in this repo's writer and parser cannot hide here.
The quirks are covered explicitly: the byte_align read-1-bit-then-align
quirk, the SEI trailing-byte hack, and the u8-wrap
``raw_3d_offset_axis_bitcount_minus1`` derivation.
"""

import numpy as np
import pytest

from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.v3c.context import Context
from tpu_vpcc.v3c.syntax import (
    AtlasFrameParameterSet,
    AtlasFrameTileInformation,
    AtlasSequenceParameterSet,
    AtlasTileHeader,
    IntraPatchDataUnit,
    NalUnitType,
    PatchOrientation,
    RefListStruct,
    SeiMessage,
    SeiPayloadType,
    TileType,
    V3CParameterSet,
    ceil_log2,
)


class Bits:
    """Minimal MSB-first bit assembler — deliberately independent of
    tpu_vpcc.bitio.BitWriter (see module docstring)."""

    def __init__(self):
        self.s = ""

    def u(self, value: int, n: int) -> "Bits":
        assert 0 <= value < (1 << n), (value, n)
        self.s += format(value, f"0{n}b")
        return self

    def uvlc(self, v: int) -> "Bits":
        code = v + 1
        n = code.bit_length()
        self.s += "0" * (n - 1) + format(code, f"0{n}b")
        return self

    def svlc(self, v: int) -> "Bits":
        return self.uvlc(2 * v - 1 if v > 0 else -2 * v)

    def stop_align(self) -> "Bits":
        # the parser's byte_align consumes 1 bit then skips to the byte
        # boundary (src/bitstream.rs:112-119); emit a 1 stop bit + zero pad
        self.u(1, 1)
        self.s += "0" * (-len(self.s) % 8)
        return self

    def raw_byte(self, b: int) -> "Bits":
        return self.u(b, 8)

    def data(self) -> bytes:
        assert len(self.s) % 8 == 0, "not byte aligned"
        n = len(self.s) // 8
        return int(self.s, 2).to_bytes(n, "big") if n else b""


# ---------------------------------------------------------------------------
# VPS (reader.rs:178-341 + PTL :525-569 + Occ/Geo/Attr info :364-482)
# ---------------------------------------------------------------------------


def golden_vps_bits() -> Bits:
    b = Bits()
    # profile_tier_level (reader.rs:525-569)
    b.u(0, 1)        # ptl_tier_flag
    b.u(1, 7)        # ptl_profile_codec_group_idc = HEVC Main10
    b.u(0, 8)        # ptl_profile_toolset_idc
    b.u(0, 8)        # ptl_profile_reconstruction_idc = rec0
    b.u(0, 32)       # 32 reserved zero bits (4x move_to_next_byte)
    b.u(30, 8)       # ptl_level_idc
    b.u(0, 6)        # num_sub_profiles (asserted 0)
    b.u(0, 1)        # extended_sub_profile_flag
    b.u(0, 1)        # tool_constraints_present_flag (asserted 0)
    # vps body (reader.rs:263-338)
    b.u(5, 4)        # v3c_parameter_set_id
    b.u(0, 8)        # reserved
    b.u(0, 6)        # atlas_count_minus1 (asserted 0)
    b.u(3, 6)        # atlas_id
    b.uvlc(1280)     # frame_width
    b.uvlc(1344)     # frame_height
    b.u(1, 4)        # map_count_minus1
    b.u(0, 1)        # multiple_map_streams_present_flag (asserted 0)
    # (no per-map flags read when multiple_map_streams is false)
    b.u(0, 1)        # auxiliary_video_present_flag
    b.u(1, 1)        # occupancy_video_present_flag
    b.u(1, 1)        # geometry_video_present_flag
    b.u(1, 1)        # attribute_video_present_flag
    # occupancy_information (reader.rs:364-372)
    b.u(1, 8)        # occupancy_codec_id
    b.u(7, 8)        # lossy_compression_threshold
    b.u(7, 5)        # occupancy_2d_bitdepth_minus1
    b.u(0, 1)        # occupancy_msb_align_flag
    # geometry_information (reader.rs:397-410) — note the 2d/msb/3d order
    b.u(1, 8)        # geometry_codec_id
    b.u(9, 5)        # geometry_2d_bitdepth_minus1
    b.u(0, 1)        # geometry_msb_align_flag
    b.u(9, 5)        # geometry_3d_coordinates_bitdepth_minus1
    # attribute_information (reader.rs:444-482)
    b.u(1, 7)        # attribute_count
    b.u(0, 4)        # attribute_type_id (texture)
    b.u(1, 8)        # attribute_codec_id
    b.u(1, 1)        # map_absolute_coding_persistence (map_count_m1 > 0)
    b.u(2, 6)        # attribute_dimension_minus1
    b.u(0, 6)        # attribute_dimension_partitions_minus1 (dim > 0)
    b.u(9, 5)        # attribute_2d_bitdepth_minus1
    b.u(0, 1)        # attribute_msb_align_flag
    b.u(0, 1)        # extension_present_flag
    b.stop_align()
    return b


def test_golden_vps():
    data = golden_vps_bits().data()
    bs = Bitstream(data)
    vps = V3CParameterSet.parse(bs)
    ptl = vps.profile_tier_level
    assert ptl.tier_flag is False
    assert ptl.profile_codec_group_idc == 1
    assert ptl.profile_toolset_idc == 0
    assert ptl.profile_reconstruction_idc == 0
    assert ptl.level_idc == 30
    assert vps.v3c_parameter_set_id == 5
    assert vps.atlas_count_minus1 == 0
    assert vps.atlas_id == 3
    assert vps.frame_width == 1280
    assert vps.frame_height == 1344
    assert vps.map_count_minus1 == 1
    assert vps.multiple_map_streams_present_flag is False
    assert vps.map_absolute_coding_enable_flag == [True, True]
    assert vps.auxiliary_video_present_flag is False
    assert vps.occupancy_video_present_flag is True
    oi = vps.occupancy_information
    assert oi.occupancy_codec_id == 1
    assert oi.occupancy_lossy_compression_threshold == 7
    assert oi.occupancy_2d_bitdepth_minus1 == 7
    assert oi.occupancy_msb_align_flag is False
    gi = vps.geometry_information
    assert gi.geometry_codec_id == 1
    assert gi.geometry_2d_bitdepth_minus1 == 9
    assert gi.geometry_msb_align_flag is False
    assert gi.geometry_3d_coordinates_bitdepth_minus1 == 9
    ai = vps.attribute_information
    assert ai.attribute_count == 1
    assert ai.attribute_type_id == [0]
    assert ai.attribute_codec_id == [1]
    assert ai.attribute_map_absolute_coding_persistence_flag == [True]
    assert ai.attribute_dimension_minus1 == [2]
    assert ai.attribute_dimension_partitions_minus1 == [0]
    assert ai.attribute_partition_channels_minus1 == [[2]]
    assert ai.attribute_2d_bitdepth_minus1 == [9]
    assert ai.attribute_msb_align_flag == [False]
    # parse must land exactly at the end (byte_align quirk included)
    assert bs.byte_pos == len(data)


# ---------------------------------------------------------------------------
# ASPS (reader.rs:1022-1117) incl. RefListStruct (:1129-1167) and the
# vpcc extension (:1100-1110)
# ---------------------------------------------------------------------------


def golden_asps_bits() -> Bits:
    b = Bits()
    b.uvlc(0)        # atlas_sequence_parameter_set_id
    b.uvlc(256)      # frame_width
    b.uvlc(256)      # frame_height
    b.u(9, 5)        # geometry_3d_bitdepth_minus1 (3d FIRST, reader.rs:1027)
    b.u(8, 5)        # geometry_2d_bitdepth_minus1
    b.uvlc(6)        # log2_max_atlas_frame_order_cnt_lsb_minus_4
    b.uvlc(0)        # max_dec_atlas_frame_buffering_minus1
    b.u(0, 1)        # long_term_ref_atlas_frames_flag
    b.uvlc(1)        # num_ref_atlas_frame_lists_in_asps
    # ref_list_struct (reader.rs:1129-1167), long_term=false
    b.uvlc(2)        # num_ref_entries
    b.uvlc(1)        # abs_delta_afoc_st[0]  (st flag not read: !long_term)
    b.u(1, 1)        # strpf_entry_sign_flag[0] (delta > 0)
    b.uvlc(0)        # abs_delta_afoc_st[1]  (delta == 0: no sign bit)
    # back in asps
    b.u(1, 1)        # use_eight_orientations_flag
    b.u(0, 1)        # extended_projection_enabled_flag (asserted 0)
    b.u(1, 1)        # normal_axis_limits_quantization_enabled_flag
    b.u(1, 1)        # normal_axis_max_delta_value_enabled_flag
    b.u(0, 1)        # patch_precedence_order_flag
    b.u(4, 3)        # log2_patch_packing_block_size
    b.u(0, 1)        # patch_size_quantizer_present_flag (asserted 0)
    b.u(1, 4)        # map_count_minus1
    b.u(0, 1)        # pixel_deinterleaving_flag (asserted 0)
    b.u(0, 1)        # raw_patch_enabled_flag (asserted 0)
    b.u(0, 1)        # eom_patch_enabled_flag (asserted 0)
    b.u(0, 1)        # plr_enabled_flag (asserted 0)
    b.u(0, 1)        # vui_parameters_present_flag (asserted 0)
    b.u(1, 1)        # extension_flag
    b.u(1, 1)        # vpcc_extension_flag
    b.u(0, 7)        # extension_7bits
    b.u(1, 1)        # vpcc: remove_duplicate_point_enabled_flag
    # (surface_thickness read only under pixel_deinterleaving/plr)
    b.stop_align()
    return b


def test_golden_asps():
    data = golden_asps_bits().data()
    bs = Bitstream(data)
    asps = AtlasSequenceParameterSet.parse(bs)
    assert asps.atlas_sequence_parameter_set_id == 0
    assert asps.frame_width == 256
    assert asps.frame_height == 256
    assert asps.geometry_3d_bitdepth_minus1 == 9
    assert asps.geometry_2d_bitdepth_minus1 == 8
    assert asps.log2_max_atlas_frame_order_cnt_lsb_minus_4 == 6
    assert asps.long_term_ref_atlas_frames_flag is False
    assert asps.num_ref_atlas_frame_lists_in_asps == 1
    rls = asps.ref_list_struct[0]
    assert rls.num_ref_entries == 2
    assert rls.st_ref_atlas_frame_flag == [True, True]
    assert rls.abs_delta_afoc_st == [1, 0]
    # zero delta records an implicit positive sign (reader.rs:1157-1160)
    assert rls.strpf_entry_sign_flag == [True, True]
    assert asps.use_eight_orientations_flag is True
    assert asps.normal_axis_limits_quantization_enabled_flag is True
    assert asps.normal_axis_max_delta_value_enabled_flag is True
    assert asps.patch_precedence_order_flag is False
    assert asps.log2_patch_packing_block_size == 4
    assert asps.map_count_minus1 == 1
    assert asps.extension_flag is True
    assert asps.vpcc_extension_flag is True
    assert asps.extension_7bits == 0
    assert asps.vpcc_extension.remove_duplicate_point_enabled_flag is True
    assert asps.vpcc_extension.surface_thickness_minus1 == 0
    assert bs.byte_pos == len(data)


# ---------------------------------------------------------------------------
# ATH (reader.rs:1571-1690) + Intra PDU (:1852-1923)
# ---------------------------------------------------------------------------


def make_context() -> Context:
    """Context carrying the golden ASPS and a matching AFPS."""
    ctx = Context()
    asps = AtlasSequenceParameterSet.parse(Bitstream(golden_asps_bits().data()))
    ctx.add_asps(asps)
    afps = AtlasFrameParameterSet(
        atlas_frame_parameter_set_id=0,
        atlas_sequence_parameter_set_id=0,
        atlas_frame_tile_information=AtlasFrameTileInformation(),
        output_flag_present_flag=False,
        num_ref_idx_default_active_minus1=0,
        additional_lt_afoc_lsb_len=0,
        lod_mode_enable_flag=False,
        raw_3d_offset_bitcount_explicit_mode_flag=False,
    )
    ctx.add_afps(afps)
    return ctx


def golden_ath_bits() -> Bits:
    b = Bits()
    # nal TRAIL_R (=1): not in BLA_W_LP..=GCRA, so NO no_output flag read
    b.uvlc(0)        # atlas_frame_parameter_set_id
    b.uvlc(0)        # atlas_adaptation_parameter_set_id
    # single tile, unsignalled ids: no ath.id bits read
    b.uvlc(1)        # tile_type = I (TileType enum: P=0, I=1, SKIP=2)
    # no atlas_output_flag (afps.output_flag_present = false)
    b.u(42, 10)      # atlas_frame_order_count_lsb (log2_max_afoc_m4=6 -> 10b)
    b.u(1, 1)        # ref_atlas_frame_list_sps_flag (asps has 1 list)
    # sps_flag set and num_ref_lists == 1: no list-idx bits, no RLS inline
    # asps ref list has no long-term entries: no additional afoc loop
    # tile_type != SKIP and normal_axis_limits_quantization_enabled:
    b.u(7, 5)        # pos_min_d_quantizer
    b.u(3, 5)        # pos_delta_max_d_quantizer
    # patch_size_quantizer_present = false: skip
    # raw_3d_offset explicit mode = false: NO bits — the u8-wrap quirk:
    #   max(0, g3d_m1 - g2d_m1) - 1 = max(0, 9 - 8) - 1 = 0 (no wrap here)
    # tile_type == I: no num_ref_idx override
    b.stop_align()
    return b


def test_golden_ath():
    ctx = make_context()
    data = golden_ath_bits().data()
    bs = Bitstream(data)
    ath = AtlasTileHeader.parse(bs, ctx, NalUnitType.TRAIL_R)
    assert ath.tile_nalu_type_info == 1
    assert ath.atlas_frame_parameter_set_id == 0
    assert ath.id == 0
    assert ath.tile_type == TileType.I
    assert ath.atlas_frame_order_count_lsb == 42
    assert ath.ref_atlas_frame_list_sps_flag is True
    assert ath.pos_min_d_quantizer == 7
    assert ath.pos_delta_max_d_quantizer == 3
    assert ath.raw_3d_offset_axis_bitcount_minus1 == 0  # max(0,9-8)-1
    assert bs.byte_pos == len(data)


def test_ath_raw_3d_offset_u8_wrap():
    """Equal 2d/3d bitdepths wrap the implicit bitcount to 255 in the
    reference's u8 arithmetic (reader.rs:1675-1678)."""
    ctx = make_context()
    ctx.get_asps(0).geometry_2d_bitdepth_minus1 = 9  # == 3d bitdepth
    bs = Bitstream(golden_ath_bits().data())
    ath = AtlasTileHeader.parse(bs, ctx, NalUnitType.TRAIL_R)
    assert ath.raw_3d_offset_axis_bitcount_minus1 == 255


def golden_intra_pdu_bits(b: Bits) -> Bits:
    # bitcount_uv = g3d_m1 + 1 = 10; bitcount_d = g3d_m1 - min_d_quant + 1
    # = 9 - 7 + 1 = 3; range_d bits = min(g2d_m1, g3d_m1) + 1 -
    # delta_max_d_quant = min(8, 9) + 1 - 3 = 6; projection =
    # ceil_log2(5+1) = 3; orientation = 3 (use_eight_orientations)
    b.uvlc(3)        # pdu_2d_pos_x
    b.uvlc(5)        # pdu_2d_pos_y
    b.uvlc(7)        # pdu_2d_size_x_minus1
    b.uvlc(2)        # pdu_2d_size_y_minus1
    b.u(600, 10)     # pdu_3d_offset_u
    b.u(1000, 10)    # pdu_3d_offset_v
    b.u(5, 3)        # pdu_3d_offset_d
    b.u(57, 6)       # pdu_3d_range_d (normal_axis_max_delta enabled)
    b.u(4, 3)        # pdu_projection_id
    b.u(6, 3)        # pdu_orientation_index = MROT90
    return b


def test_golden_intra_pdu():
    ctx = make_context()
    ath = AtlasTileHeader.parse(
        Bitstream(golden_ath_bits().data()), ctx, NalUnitType.TRAIL_R
    )
    b = golden_intra_pdu_bits(Bits())
    b.s += "0" * (-len(b.s) % 8)  # pad (no byte_align inside a PDU)
    bs = Bitstream(b.data())
    pdu = IntraPatchDataUnit.parse(bs, ctx, ath)
    assert pdu.pos_2d == (3, 5)
    assert pdu.size_2d_minus1 == (7, 2)
    assert pdu.pos_3d_offset == (600, 1000)
    assert pdu.pos_3d_offset_d == 5
    assert pdu.pos_3d_range_d == 57
    assert pdu.projection_id == 4
    assert pdu.orientation_index == PatchOrientation.MROT90


# ---------------------------------------------------------------------------
# SEI (reader.rs:1371-1418 + geometry smoothing :1452-1505)
# ---------------------------------------------------------------------------


def test_golden_sei_geometry_smoothing():
    b = Bits()
    b.raw_byte(66)   # payload_type = GEOMETRY_SMOOTHING (single byte)
    b.raw_byte(0xFF) # payload_size varint: 0xFF accumulates...
    b.raw_byte(3)    # ...+ 3 = 258 (size itself is unused by the parser)
    # sei_geometry_smoothing (reader.rs:1452-1505)
    b.u(1, 1)        # persistence_flag
    b.u(0, 1)        # reset_flag
    b.u(1, 8)        # instances_updated
    b.u(0, 8)        # instance_index[0]
    b.u(0, 1)        # instance_cancel_flag
    b.uvlc(1)        # method_type = 1 (grid smoothing)
    b.u(1, 1)        # filter_eom_points_flag
    b.u(6, 7)        # grid_size_minus_2
    b.u(64, 8)       # threshold
    b.stop_align()   # byte_align quirk
    b.raw_byte(0xAB) # the TMC2 trailing-byte hack (reader.rs:1414-1417)
    data = b.data()
    bs = Bitstream(data)
    msg = SeiMessage.parse(bs, NalUnitType.PREFIX_ESEI)
    sei = msg.sei_prefix[0]
    assert sei.payload_type == SeiPayloadType.GEOMETRY_SMOOTHING
    assert sei.persistence_flag is True
    assert sei.reset_flag is False
    assert sei.instances_updated == 1
    assert sei.instance_cancel_flag[0] is False
    assert sei.method_type[0] == 1
    assert sei.filter_eom_points_flag[0] is True
    assert sei.grid_size_minus_2[0] == 6
    assert sei.threshold[0] == 64
    # the trailing byte was consumed: parse landed exactly at the end
    assert bs.byte_pos == len(data)


def test_byte_align_quirk_consumes_a_byte_when_aligned():
    """The TMC2 quirk: byte_align on an already-aligned cursor consumes a
    whole byte (1 stop bit + 7 skipped), src/bitstream.rs:112-119."""
    bs = Bitstream(bytes([0x80, 0x55]))
    assert bs.is_byte_aligned()
    bs.byte_align()
    assert bs.byte_pos == 1
    assert bs.read(8) == 0x55


# ---------------------------------------------------------------------------
# ceil_log2 vs the reference's fast_math::log2_raw(..).ceil()
# ---------------------------------------------------------------------------


def fastmath_ceil_log2(n: int) -> int:
    """Bit-exact emulation of the reference's bit-count derivation:
    ``fast_math::log2_raw(n as f32).ceil() as u8`` (reader.rs:1597,1632,
    1905). fast-math 0.1 implements Paul Mineiro's fastlog2 polynomial in
    f32; reproduced here operation-for-operation in np.float32."""
    vx = np.float32(n).view(np.uint32)
    mx = np.uint32((vx & np.uint32(0x007FFFFF)) | np.uint32(0x3F000000)).view(
        np.float32
    )
    y = np.float32(vx) * np.float32(1.1920928955078125e-7)
    r = np.float32(
        y
        - np.float32(124.22551499)
        - np.float32(1.498030302) * mx
        - np.float32(1.72587999) / (np.float32(0.3520887068) + mx)
    )
    return int(np.ceil(r))


def test_ceil_log2_matches_fast_math_reference():
    """The exact integer ceil_log2 equals the reference's approximate
    f32 derivation for EVERY argument up to 2^16 — far beyond the
    reachable range (projection count 6; ref-list counts < 2^8; tile
    counts bounded by the atlas partition grid)."""
    for n in range(1, 1 << 16):
        assert ceil_log2(n) == fastmath_ceil_log2(n), n


# ---------------------------------------------------------------------------
# AFOC derivation wraparound (context.rs:142-172 / spec 8.4.3.1)
# ---------------------------------------------------------------------------


def test_afoc_lsb_wraparound():
    """lsb sequence 14,15,0,1 under max_lsb=16 wraps msb to 16; a
    backwards jump >half range steps msb down again."""
    from tpu_vpcc.v3c.syntax import AtlasTileLayer

    ctx = make_context()
    ctx.get_asps(0).log2_max_atlas_frame_order_cnt_lsb_minus_4 = 0  # max 16
    expected_vals = [14, 15, 16, 17]
    for lsb in (14, 15, 0, 1):
        atl = AtlasTileLayer()
        atl.header.atlas_frame_parameter_set_id = 0
        atl.header.atlas_frame_order_count_lsb = lsb
        ctx.add_atlas_tile_layer(atl)
    for i, want in enumerate(expected_vals):
        msb, val = ctx.derive_afoc_val(i)
        atl = ctx.get_atlas_tile_layer(i)
        atl.atlas_frame_order_count_msb = msb
        atl.atlas_frame_order_count_val = val
        assert val == want, (i, val, want)
    # a jump from lsb 1 back to lsb 15 (> half range backwards) keeps
    # the msb at 0 per the derivation's second branch: 15-1=14 > 8
    atl = AtlasTileLayer()
    atl.header.atlas_frame_parameter_set_id = 0
    atl.header.atlas_frame_order_count_lsb = 15
    ctx.add_atlas_tile_layer(atl)
    msb, val = ctx.derive_afoc_val(4)
    assert (msb, val) == (0, 15)


def test_golden_ath_p_tile_num_ref_override():
    """P-tile header with num_ref_idx_active override (read only when the
    active ref list has more than one entry, reader.rs:1684-1689)."""
    ctx = make_context()  # golden ASPS: one rls with TWO short-term entries
    b = Bits()
    b.uvlc(0)        # atlas_frame_parameter_set_id
    b.uvlc(0)        # atlas_adaptation_parameter_set_id
    b.uvlc(0)        # tile_type = P
    b.u(7, 10)       # atlas_frame_order_count_lsb
    b.u(1, 1)        # ref_atlas_frame_list_sps_flag
    b.u(2, 5)        # pos_min_d_quantizer
    b.u(0, 5)        # pos_delta_max_d_quantizer
    b.u(1, 1)        # num_ref_idx_active_override_flag
    b.uvlc(1)        # num_ref_idx_active_minus1
    b.stop_align()
    data = b.data()
    bs = Bitstream(data)
    ath = AtlasTileHeader.parse(bs, ctx, NalUnitType.TRAIL_R)
    assert ath.tile_type == TileType.P
    assert ath.num_ref_idx_active_override_flag is True
    assert ath.num_ref_idx_active_minus1 == 1
    assert ctx.get_num_ref_idx_active(ath) == 2
    assert bs.byte_pos == len(data)


# ---------------------------------------------------------------------------
# AFPS (reader.rs:1175-1329)
# ---------------------------------------------------------------------------


def test_golden_afps():
    ctx = Context()
    ctx.add_asps(AtlasSequenceParameterSet.parse(Bitstream(golden_asps_bits().data())))
    b = Bits()
    b.uvlc(0)        # atlas_frame_parameter_set_id
    b.uvlc(0)        # atlas_sequence_parameter_set_id
    # atlas_frame_tile_information (single tile, unsignalled ids)
    b.u(1, 1)        # single_tile_in_atlas_frame_flag (asserted 1)
    b.u(0, 1)        # signalled_tile_id_flag (asserted 0)
    # back in afps
    b.u(1, 1)        # output_flag_present_flag
    b.uvlc(1)        # num_ref_idx_default_active_minus1
    b.uvlc(4)        # additional_lt_afoc_lsb_len
    b.u(0, 1)        # lod_mode_enable_flag
    b.u(1, 1)        # raw_3d_offset_bitcount_explicit_mode_flag
    b.u(0, 1)        # extension_flag
    b.stop_align()
    data = b.data()
    bs = Bitstream(data)
    afps = AtlasFrameParameterSet.parse(bs, ctx)
    assert afps.atlas_frame_parameter_set_id == 0
    assert afps.atlas_sequence_parameter_set_id == 0
    assert afps.atlas_frame_tile_information.single_tile_in_atlas_frame_flag
    assert afps.output_flag_present_flag is True
    assert afps.num_ref_idx_default_active_minus1 == 1
    assert afps.additional_lt_afoc_lsb_len == 4
    assert afps.lod_mode_enable_flag is False
    assert afps.raw_3d_offset_bitcount_explicit_mode_flag is True
    assert bs.byte_pos == len(data)


# ---------------------------------------------------------------------------
# Inter / Merge patch data units (reader.rs:1925-2037)
# ---------------------------------------------------------------------------


def make_p_context_and_ath(namd=False):
    """Context + P-tile header with num_ref_idx_active = 2.
    ``namd`` toggles normal_axis_max_delta: off matches the reference's
    envelope (it `unimplemented!`s on the flag for inter/merge); on
    exercises the framework's ipdu/mpdu_3d_range_d extension."""
    from tpu_vpcc.v3c.syntax import InterPatchDataUnit, MergePatchDataUnit

    ctx = make_context()
    ctx.get_asps(0).normal_axis_max_delta_value_enabled_flag = namd
    b = Bits()
    b.uvlc(0)        # afps id
    b.uvlc(0)        # aaps id
    b.uvlc(0)        # tile_type = P
    b.u(3, 10)       # afoc lsb
    b.u(1, 1)        # ref list sps flag
    b.u(0, 5)        # pos_min_d_quantizer
    b.u(0, 5)        # pos_delta_max_d_quantizer
    b.u(1, 1)        # num_ref_idx_active_override_flag
    b.uvlc(1)        # num_ref_idx_active_minus1 -> active = 2
    b.stop_align()
    ath = AtlasTileHeader.parse(Bitstream(b.data()), ctx, NalUnitType.TRAIL_R)
    assert ctx.get_num_ref_idx_active(ath) == 2
    return ctx, ath


def test_golden_inter_pdu():
    from tpu_vpcc.v3c.syntax import InterPatchDataUnit

    ctx, ath = make_p_context_and_ath()
    b = Bits()
    b.uvlc(1)        # ipdu_ref_index (coded: num_ref_idx_active > 1)
    b.svlc(-1)       # ipdu_ref_patch_index
    b.svlc(2)        # ipdu_2d_pos_x delta
    b.svlc(-3)       # ipdu_2d_pos_y delta
    b.svlc(0)        # ipdu_2d_delta_size_x
    b.svlc(1)        # ipdu_2d_delta_size_y
    b.svlc(-4)       # ipdu_3d_offset_u
    b.svlc(5)        # ipdu_3d_offset_v
    b.svlc(-2)       # ipdu_3d_offset_d
    b.s += "0" * (-len(b.s) % 8)
    pdu = InterPatchDataUnit.parse(Bitstream(b.data()), ctx, ath)
    assert pdu.ref_index == 1
    assert pdu.ref_patch_index == -1
    assert pdu.pos_2d == (2, -3)
    assert pdu.delta_2d_size == (0, 1)
    assert pdu.pos_3d_offset == (-4, 5)
    assert pdu.pos_3d_offset_d == -2


def test_golden_inter_pdu_with_normal_axis_max_delta():
    """ipdu_3d_range_d (svlc) trails the offsets when the ASPS enables
    normal_axis_max_delta — framework extension; the reference panics
    on the flag (reader.rs:1963-1965)."""
    from tpu_vpcc.v3c.syntax import InterPatchDataUnit

    ctx, ath = make_p_context_and_ath(namd=True)
    b = Bits()
    b.uvlc(0)        # ipdu_ref_index
    b.svlc(0)        # ipdu_ref_patch_index
    b.svlc(0); b.svlc(0)   # 2d pos deltas
    b.svlc(0); b.svlc(0)   # 2d size deltas
    b.svlc(0); b.svlc(0)   # 3d offsets u/v
    b.svlc(7)        # ipdu_3d_offset_d
    b.svlc(-6)       # ipdu_3d_range_d
    b.s += "0" * (-len(b.s) % 8)
    pdu = InterPatchDataUnit.parse(Bitstream(b.data()), ctx, ath)
    assert pdu.pos_3d_offset_d == 7
    assert pdu.pos_3d_range_d == -6


def test_golden_merge_pdu_3d_branch_with_normal_axis_max_delta():
    """mpdu_3d_range_d (svlc) trails offset_d in the 3d branch — the
    placement the reference's commented-out line shows
    (reader.rs:2025-2027)."""
    from tpu_vpcc.v3c.syntax import MergePatchDataUnit

    ctx, ath = make_p_context_and_ath(namd=True)
    b = Bits()
    b.uvlc(0)        # mpdu_ref_index
    b.u(0, 1)        # override_2d_params_flag
    b.u(1, 1)        # override_3d_params_flag
    b.svlc(1); b.svlc(-1)  # 3d offsets u/v
    b.svlc(2)        # mpdu_3d_offset_d
    b.svlc(3)        # mpdu_3d_range_d
    b.s += "0" * (-len(b.s) % 8)
    pdu = MergePatchDataUnit.parse(Bitstream(b.data()), ctx, ath)
    assert pdu.override_3d_params_flag is True
    assert pdu.pos_3d_offset_d == 2
    assert pdu.pos_3d_range_d == 3
    # NAMD off: the field is absent and parse records None
    ctx0, ath0 = make_p_context_and_ath(namd=False)
    b = Bits()
    b.uvlc(0); b.u(0, 1); b.u(1, 1)
    b.svlc(1); b.svlc(-1); b.svlc(2)
    b.s += "0" * (-len(b.s) % 8)
    pdu0 = MergePatchDataUnit.parse(Bitstream(b.data()), ctx0, ath0)
    assert pdu0.pos_3d_range_d is None


def test_golden_merge_pdu_2d_and_3d_branches():
    from tpu_vpcc.v3c.syntax import MergePatchDataUnit

    ctx, ath = make_p_context_and_ath()
    # override_2d branch
    b = Bits()
    b.uvlc(0)        # mpdu_ref_index
    b.u(1, 1)        # override_2d_params_flag
    b.svlc(3)
    b.svlc(-1)
    b.svlc(2)
    b.svlc(0)
    b.s += "0" * (-len(b.s) % 8)
    pdu = MergePatchDataUnit.parse(Bitstream(b.data()), ctx, ath)
    assert pdu.override_2d_params_flag is True
    assert pdu.pos_2d == (3, -1)
    assert pdu.delta_2d_size == (2, 0)
    # 3d branch: flag read, then the 3d fields are carried REGARDLESS of
    # the flag value (mirroring the reference parser, reader.rs:2019-2024)
    b = Bits()
    b.uvlc(1)        # mpdu_ref_index
    b.u(0, 1)        # override_2d_params_flag
    b.u(1, 1)        # override_3d_params_flag
    b.svlc(-2)
    b.svlc(4)
    b.svlc(1)
    b.s += "0" * (-len(b.s) % 8)
    pdu = MergePatchDataUnit.parse(Bitstream(b.data()), ctx, ath)
    assert pdu.ref_index == 1
    assert pdu.override_2d_params_flag is False
    assert pdu.override_3d_params_flag is True
    assert pdu.pos_3d_offset == (-2, 4)
    assert pdu.pos_3d_offset_d == 1


# ---------------------------------------------------------------------------
# Occupancy-synthesis / attribute-smoothing SEIs (framework extensions;
# golden bits per the 23090-5 syntax shape they implement)
# ---------------------------------------------------------------------------


def test_golden_sei_occupancy_synthesis():
    b = Bits()
    b.raw_byte(65)   # payload_type = OCCUPANCY_SYNTHESIS
    b.raw_byte(4)    # payload size (unused by the parser)
    b.u(1, 1)        # persistence_flag
    b.u(0, 1)        # reset_flag
    b.u(1, 8)        # instances_updated
    b.u(0, 8)        # instance_index
    b.u(0, 1)        # instance_cancel_flag
    b.uvlc(1)        # method_type = 1 (PBF)
    b.u(2, 2)        # pbf_log2_threshold_minus1
    b.u(1, 2)        # pbf_passes_count_minus1
    b.u(5, 3)        # pbf_filter_size_minus1
    b.stop_align()
    b.raw_byte(0)    # trailing byte
    data = b.data()
    bs = Bitstream(data)
    msg = SeiMessage.parse(bs, NalUnitType.PREFIX_ESEI)
    sei = msg.sei_prefix[0]
    assert sei.payload_type == SeiPayloadType.OCCUPANCY_SYNTHESIS
    assert sei.persistence_flag is True
    assert sei.method_type[0] == 1
    assert sei.pbf_log2_threshold_minus1[0] == 2
    assert sei.pbf_passes_count_minus1[0] == 1
    assert sei.pbf_filter_size_minus1[0] == 5
    assert bs.byte_pos == len(data)


def test_golden_sei_attribute_smoothing():
    b = Bits()
    b.raw_byte(67)   # payload_type = ATTRIBUTE_SMOOTHING
    b.raw_byte(8)    # payload size (unused)
    b.u(0, 1)        # persistence_flag
    b.u(1, 1)        # reset_flag
    b.uvlc(1)        # num_attributes_updated
    b.u(0, 7)        # attribute_idx
    b.u(0, 1)        # attribute_smoothing_cancel_flag
    b.u(1, 8)        # instances_updated
    b.u(0, 8)        # instance_index
    b.u(0, 1)        # instance_cancel_flag
    b.uvlc(1)        # method_type = 1
    b.u(6, 8)        # grid_size_minus_2
    b.u(12, 8)       # threshold
    b.u(20, 8)       # threshold_variation
    b.u(10, 8)       # threshold_difference
    b.stop_align()
    b.raw_byte(0)    # trailing byte
    data = b.data()
    bs = Bitstream(data)
    msg = SeiMessage.parse(bs, NalUnitType.PREFIX_ESEI)
    sei = msg.sei_prefix[0]
    assert sei.payload_type == SeiPayloadType.ATTRIBUTE_SMOOTHING
    assert sei.reset_flag is True
    assert sei.attribute_idx == [0]
    assert sei.method_type[0][0] == 1
    assert sei.grid_size_minus_2[0][0] == 6
    assert sei.threshold[0][0] == 12
    assert sei.threshold_variation[0][0] == 20
    assert sei.threshold_difference[0][0] == 10
    assert bs.byte_pos == len(data)


# ---------------------------------------------------------------------------
# Golden PLY snapshot (the formatter is otherwise only compared to itself)
# ---------------------------------------------------------------------------


def test_golden_ply_snapshot():
    """Hand-written expected bytes per the reference writer's layout
    (src/writer.rs:32-74): header lines, one 'x y z r g b\\n' line per
    point, 'element face 0' stanza."""
    from tpu_vpcc.reconstruction.pointset import PointSet3
    from tpu_vpcc.utils.ply import format_ply

    ps = PointSet3(
        positions=np.array([[1, 2, 3], [1023, 0, 512]], np.uint16),
        colors=np.array([[255, 0, 7], [1, 2, 3]], np.uint8),
        with_colors=True,
    )
    expected = (
        b"ply\n"
        b"format ascii 1.0\n"
        b"element vertex 2\n"
        b"property uint x\n"
        b"property uint y\n"
        b"property uint z\n"
        b"property uchar red\n"
        b"property uchar green\n"
        b"property uchar blue\n"
        b"element face 0\n"
        b"property list uint8 int32 vertex_index\n"
        b"end_header\n"
        b"1 2 3 255 0 7\n"
        b"1023 0 512 1 2 3\n"
    )
    assert format_ply(ps) == expected

    ps2 = PointSet3(positions=np.array([[4, 5, 6]], np.uint16))
    expected2 = (
        b"ply\n"
        b"format ascii 1.0\n"
        b"element vertex 1\n"
        b"property uint x\n"
        b"property uint y\n"
        b"property uint z\n"
        b"element face 0\n"
        b"property list uint8 int32 vertex_index\n"
        b"end_header\n"
        b"4 5 6\n"
    )
    assert format_ply(ps2) == expected2


def test_golden_vui_parameters():
    """Hand-assembled F.2.1 VUI bits (independent of the repo's
    BitWriter) parse to the expected fields — a symmetric field-order
    mistake in writer+parser cannot hide here."""
    from tpu_vpcc.v3c.syntax import VuiParameters

    b = (
        Bits()
        .u(1, 1)          # vui_timing_info_present_flag
        .u(1001, 32)      # vui_num_units_in_tick
        .u(60000, 32)     # vui_time_scale
        .u(1, 1)          # vui_poc_proportional_to_timing_flag
        .uvlc(3)          # vui_num_ticks_poc_diff_one_minus1
        .u(0, 1)          # vui_hrd_parameters_present_flag
        .u(1, 1)          # vui_tile_restrictions_present_flag
        .u(1, 1)          # fixed_atlas_tile_structure
        .u(0, 1)          # fixed_video_tile_structure
        .uvlc(2)          # constrained_tiles_across_v3c_components_idc
        .uvlc(5)          # max_num_tiles_per_atlas_minus1
        .u(0, 1)          # vui_max_coded_video_resolution_present_flag
        .u(1, 1)          # vui_coordinate_system_parameters_present_flag
        .u(2, 2)          # csp_forward_axis
        .u(1, 1)          # csp_delta_left_axis
        .u(0, 1)          # csp_forward_sign
        .u(1, 1)          # csp_left_sign
        .u(0, 1)          # csp_up_sign
        .u(1, 1)          # vui_unit_in_metres_flag
        .u(1, 1)          # vui_display_box_info_present_flag
        .uvlc(1).uvlc(10) # origin[0], size[0]
        .uvlc(2).uvlc(20) # origin[1], size[1]
        .uvlc(3).uvlc(30) # origin[2], size[2]
        .u(0, 1)          # vui_anchor_point_present_flag
    )
    b.s += "0" * (-len(b.s) % 8)
    vui = VuiParameters.parse(Bitstream(b.data()))
    assert vui.timing_info_present_flag
    assert vui.num_units_in_tick == 1001 and vui.time_scale == 60000
    assert vui.poc_proportional_to_timing_flag
    assert vui.num_ticks_poc_diff_one_minus1 == 3
    assert not vui.hrd_parameters_present_flag
    assert vui.tile_restrictions_present_flag
    assert vui.fixed_atlas_tile_structure_flag
    assert not vui.fixed_video_tile_structure_flag
    assert vui.constrained_tiles_across_v3c_components_idc == 2
    assert vui.max_num_tiles_per_atlas_minus1 == 5
    assert not vui.max_coded_video_resolution_present_flag
    csp = vui.coordinate_system_parameters
    assert (csp.forward_axis, csp.delta_left_axis) == (2, 1)
    assert (csp.forward_sign, csp.left_sign, csp.up_sign) == (False, True, False)
    assert vui.unit_in_metres_flag
    assert vui.display_box_origin == [1, 2, 3]
    assert vui.display_box_size == [10, 20, 30]
    assert not vui.anchor_point_present_flag


def test_golden_decoded_atlas_hash_sei():
    """Hand-assembled H.20.2.8 daih payload (MD5 type, atlas + b2p
    hashes, no tile section) parses to the expected fields."""
    from tpu_vpcc.v3c.syntax import SeiDecodedAtlasInformationHash

    atlas_md5 = bytes(range(16))
    b2p_md5 = bytes(range(16, 32))
    b = (
        Bits()
        .u(0, 1)   # daih_cancel_flag
        .u(1, 1)   # daih_persistence_flag
        .u(0, 8)   # daih_hash_type = MD5
        .u(0, 1)   # high_level_present
        .u(1, 1)   # atlas_present
        .u(1, 1)   # b2p_present
        .u(0, 1)   # tiles_present
        .u(0, 1)   # tiles_b2p_present
        .stop_align()
    )
    for byte in atlas_md5 + b2p_md5:
        b.u(byte, 8)
    sei = SeiDecodedAtlasInformationHash.parse(Bitstream(b.data()))
    assert not sei.cancel_flag and sei.persistence_flag
    assert sei.hash_type == 0
    assert not sei.high_level_present
    assert sei.atlas_present and sei.b2p_present
    assert not sei.tiles_present and not sei.tiles_b2p_present
    assert sei.atlas_hash == atlas_md5
    assert sei.b2p_hash == b2p_md5
