"""Writer → parser field-equality roundtrips for the V3C syntax layer."""

import dataclasses

import pytest

from tpu_vpcc.bitio import Bitstream
from tpu_vpcc.v3c import (
    AtlasFrameParameterSet,
    AtlasSequenceParameterSet,
    AtlasTileHeader,
    AtlasTileLayer,
    Context,
    IntraPatchDataUnit,
    NalUnitType,
    PatchInformationData,
    PatchOrientation,
    RefListStruct,
    TileType,
    V3CParameterSet,
    V3CUnitType,
    ceil_log2,
)
from tpu_vpcc.v3c.context import VideoBitstream
from tpu_vpcc.v3c.stream import SampleStreamV3CUnit, parse_nal_sample_stream
from tpu_vpcc.v3c.syntax import (
    AttributeInformation,
    GeometryInformation,
    OccupancyInformation,
    PatchModeITile,
)
from tpu_vpcc.v3c import writer as w3c


def make_vps(width=256, height=256, map_count_minus1=1):
    vps = V3CParameterSet()
    vps.frame_width = width
    vps.frame_height = height
    vps.map_count_minus1 = map_count_minus1
    vps.map_absolute_coding_enable_flag = [True] * (map_count_minus1 + 1)
    vps.map_predictor_index_diff = [False] * (map_count_minus1 + 1)
    vps.occupancy_video_present_flag = True
    vps.geometry_video_present_flag = True
    vps.attribute_video_present_flag = True
    vps.occupancy_information = OccupancyInformation(
        occupancy_codec_id=1, occupancy_2d_bitdepth_minus1=7
    )
    vps.geometry_information = GeometryInformation(
        geometry_codec_id=1,
        geometry_2d_bitdepth_minus1=9,
        geometry_3d_coordinates_bitdepth_minus1=9,
    )
    vps.attribute_information = AttributeInformation(
        attribute_count=1,
        attribute_type_id=[0],
        attribute_codec_id=[1],
        auxiliary_attribute_codec_id=[0],
        attribute_map_absolute_coding_persistence_flag=[True],
        attribute_dimension_minus1=[2],
        attribute_dimension_partitions_minus1=[0],
        attribute_partition_channels_minus1=[[2]],
        attribute_2d_bitdepth_minus1=[9],
        attribute_msb_align_flag=[False],
    )
    return vps


def make_asps(width=256, height=256, log2_block=2, map_count_minus1=1):
    asps = AtlasSequenceParameterSet()
    asps.frame_width = width
    asps.frame_height = height
    asps.geometry_3d_bitdepth_minus1 = 9
    asps.geometry_2d_bitdepth_minus1 = 9
    asps.log2_patch_packing_block_size = log2_block
    asps.map_count_minus1 = map_count_minus1
    asps.use_eight_orientations_flag = True
    asps.normal_axis_limits_quantization_enabled_flag = True
    asps.normal_axis_max_delta_value_enabled_flag = True
    return asps


def make_afps():
    return AtlasFrameParameterSet()


def make_atl(frame_lsb=0, patches=(), pos_min_d_quantizer=0):
    ath = AtlasTileHeader()
    ath.tile_type = TileType.I
    ath.atlas_frame_order_count_lsb = frame_lsb
    ath.pos_min_d_quantizer = pos_min_d_quantizer
    atl = AtlasTileLayer(header=ath)
    for pdu in patches:
        atl.patch_information_data.append(
            PatchInformationData(
                patch_mode=int(PatchModeITile.INTRA), patch_data_unit=pdu
            )
        )
    return atl


def make_intra_pdu(**kw):
    defaults = dict(
        projection_id=0,
        orientation_index=PatchOrientation.DEFAULT,
        pos_2d=(0, 0),
        size_2d_minus1=(15, 15),
        pos_3d_offset=(10, 20),
        pos_3d_offset_d=5,
        pos_3d_range_d=100,
    )
    defaults.update(kw)
    return IntraPatchDataUnit(**defaults)


def test_ceil_log2():
    assert ceil_log2(1) == 0
    assert ceil_log2(2) == 1
    assert ceil_log2(3) == 2
    assert ceil_log2(4) == 2
    assert ceil_log2(5) == 3
    assert ceil_log2(6) == 3
    assert ceil_log2(8) == 3
    assert ceil_log2(9) == 4


def test_vps_roundtrip():
    vps = make_vps()
    data = w3c.write_vps(vps)
    parsed = V3CParameterSet.parse(Bitstream(data))
    assert dataclasses.asdict(parsed) == dataclasses.asdict(vps)


def test_asps_roundtrip():
    asps = make_asps()
    data = w3c.write_asps(asps)
    parsed = AtlasSequenceParameterSet.parse(Bitstream(data))
    assert dataclasses.asdict(parsed) == dataclasses.asdict(asps)


def test_asps_with_ref_lists_roundtrip():
    asps = make_asps()
    asps.num_ref_atlas_frame_lists_in_asps = 2
    asps.ref_list_struct = [
        RefListStruct(
            num_ref_entries=2,
            abs_delta_afoc_st=[1, 2],
            st_ref_atlas_frame_flag=[True, True],
            strpf_entry_sign_flag=[True, False],
        ),
        RefListStruct(
            num_ref_entries=1,
            abs_delta_afoc_st=[0],
            st_ref_atlas_frame_flag=[True],
            strpf_entry_sign_flag=[True],
        ),
    ]
    data = w3c.write_asps(asps)
    parsed = AtlasSequenceParameterSet.parse(Bitstream(data))
    assert dataclasses.asdict(parsed) == dataclasses.asdict(asps)


def test_afps_roundtrip():
    asps = make_asps()
    afps = make_afps()
    ctx = Context()
    ctx.add_asps(asps)
    data = w3c.write_afps(afps, asps)
    parsed = AtlasFrameParameterSet.parse(Bitstream(data), ctx)
    assert dataclasses.asdict(parsed) == dataclasses.asdict(afps)


def test_atl_roundtrip_with_patches():
    asps = make_asps()
    afps = make_afps()
    ctx = Context()
    ctx.add_asps(asps)
    ctx.add_afps(afps)
    patches = [
        make_intra_pdu(),
        make_intra_pdu(
            projection_id=3,
            orientation_index=PatchOrientation.MROT90,
            pos_2d=(4, 8),
            size_2d_minus1=(31, 7),
            pos_3d_offset=(100, 200),
            pos_3d_offset_d=50,
            pos_3d_range_d=255,
        ),
    ]
    atl = make_atl(frame_lsb=3, patches=patches, pos_min_d_quantizer=2)
    data = w3c.write_atlas_tile_layer(atl, asps, afps, NalUnitType.IDR_N_LP)
    parsed = AtlasTileLayer.parse(Bitstream(data), ctx, NalUnitType.IDR_N_LP)
    assert parsed.header.tile_type == TileType.I
    assert parsed.header.atlas_frame_order_count_lsb == 3
    assert parsed.header.pos_min_d_quantizer == 2
    assert len(parsed.patch_information_data) == 2
    for got, want in zip(parsed.patch_information_data, patches):
        assert dataclasses.asdict(got.patch_data_unit) == dataclasses.asdict(want)


def test_nal_sample_stream_roundtrip():
    asps = make_asps()
    afps = make_afps()
    atl = make_atl(patches=[make_intra_pdu()])
    nalus = [
        w3c.wrap_nal_unit(NalUnitType.ASPS, w3c.write_asps(asps)),
        w3c.wrap_nal_unit(NalUnitType.AFPS, w3c.write_afps(afps, asps)),
        w3c.wrap_nal_unit(
            NalUnitType.IDR_N_LP,
            w3c.write_atlas_tile_layer(atl, asps, afps, NalUnitType.IDR_N_LP),
        ),
    ]
    payload = w3c.build_nal_sample_stream(nalus)
    ctx = Context()
    parse_nal_sample_stream(ctx, Bitstream(payload))
    assert len(ctx.atlas_hls.atlas_sequence_parameter_set) == 1
    assert len(ctx.atlas_hls.atlas_frame_parameter_set) == 1
    assert ctx.atlas_tile_layer_len() == 1
    assert len(ctx.get_atlas_tile_layer(0).patch_information_data) == 1


def test_full_sample_stream_roundtrip():
    vps = make_vps()
    asps = make_asps()
    afps = make_afps()
    atl = make_atl(patches=[make_intra_pdu()])
    nalus = [
        w3c.wrap_nal_unit(NalUnitType.ASPS, w3c.write_asps(asps)),
        w3c.wrap_nal_unit(NalUnitType.AFPS, w3c.write_afps(afps, asps)),
        w3c.wrap_nal_unit(
            NalUnitType.IDR_N_LP,
            w3c.write_atlas_tile_layer(atl, asps, afps, NalUnitType.IDR_N_LP),
        ),
    ]
    sw = w3c.V3CSampleStreamWriter()
    sw.add_unit(w3c.v3c_unit_header(V3CUnitType.VPS), w3c.write_vps(vps))
    sw.add_unit(
        w3c.v3c_unit_header(V3CUnitType.AD), w3c.build_nal_sample_stream(nalus)
    )
    fake_video = b"\x00\x00\x00\x05HELLO"
    sw.add_unit(w3c.v3c_unit_header(V3CUnitType.OVD), fake_video)
    sw.add_unit(w3c.v3c_unit_header(V3CUnitType.GVD), fake_video)
    sw.add_unit(w3c.v3c_unit_header(V3CUnitType.AVD), fake_video)
    stream = sw.getvalue()

    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    assert ssvu.get_v3c_unit_count() == 5
    ctx = Context()
    ssvu.decode_gof(ctx)
    assert ssvu.get_v3c_unit_count() == 0
    assert ctx.get_vps().frame_width == 256
    assert ctx.atlas_tile_layer_len() == 1
    from tpu_vpcc.v3c.syntax import VideoType

    for vt in (VideoType.OCCUPANCY, VideoType.GEOMETRY, VideoType.ATTRIBUTE):
        assert ctx.get_video_bitstream(vt).data == fake_video


def test_two_gofs_split_on_second_vps():
    vps = make_vps()
    sw = w3c.V3CSampleStreamWriter()
    for _ in range(2):
        sw.add_unit(w3c.v3c_unit_header(V3CUnitType.VPS), w3c.write_vps(vps))
        sw.add_unit(w3c.v3c_unit_header(V3CUnitType.OVD), b"xx")
    stream = sw.getvalue()
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx1 = Context()
    ssvu.decode_gof(ctx1)
    assert ssvu.get_v3c_unit_count() == 2
    ctx2 = Context()
    ssvu.decode_gof(ctx2)
    assert ssvu.get_v3c_unit_count() == 0
    assert ctx1.get_vps() is not None and ctx2.get_vps() is not None


def test_annexb_to_length_prefixed():
    annexb = b"\x00\x00\x00\x01ABC\x00\x00\x01DE"
    out = w3c.annexb_to_length_prefixed(annexb)
    assert out == b"\x00\x00\x00\x03ABC\x00\x00\x00\x02DE"


def test_afoc_derivation_wraparound():
    ctx = Context()
    asps = make_asps()
    asps.log2_max_atlas_frame_order_cnt_lsb_minus_4 = 0  # max_lsb = 16
    ctx.add_asps(asps)
    ctx.add_afps(make_afps())
    lsbs = [0, 5, 10, 15, 2, 7]  # wraps after 15 -> 2
    for lsb in lsbs:
        atl = make_atl(frame_lsb=lsb)
        ctx.add_atlas_tile_layer(atl)
    vals = []
    for i in range(len(lsbs)):
        msb, val = ctx.derive_afoc_val(i)
        ctx.get_atlas_tile_layer(i).atlas_frame_order_count_msb = msb
        ctx.get_atlas_tile_layer(i).atlas_frame_order_count_val = val
        vals.append(val)
    assert vals == [0, 5, 10, 15, 18, 23]
