"""Atlas frame partitioning (multi-tile frames).

FRAMEWORK EXTENSION: the reference asserts single-tile
(``reader.rs:1266-1270``; every AFTI partition field is commented out).
Here the AFTI decodes fully (uniform/explicit 64-px partitions,
multi-partition tiles, signalled tile ids), each tile layer derives its
patches tile-locally, and ``atlas.patches._merge_tile_frames`` folds a
frame's tiles onto the atlas canvas — so the oracle, group tables, and
device kernels see ONE frame-sized patch list and need no tile
awareness. Reconstruction order is tiles ascending, patches in tile
order (TMC2's tile iteration).
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
from tpu_vpcc.v3c.syntax import (
    AtlasFrameTileInformation,
    PatchOrientation,
    UnsupportedFeature,
)
from tpu_vpcc.video import encoder_supports

pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)

RES = 8
PREC = 4


def make_tile_major_frame(rng, width=128, height=64, swap_second=False):
    """Two patches, one per 64-px-wide tile column, listed tile-major
    (so the single-tile twin stream reconstructs in the same order)."""
    f = make_synthetic_frame(
        rng, width=width, height=height, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=2, frame_index=0,
        allow_swap=False, occupancy_fill=0.9,
    )
    p0 = replace(
        f.meta.patches[0], uv0=(1, 1), size_uv0=(4, 3),
        patch_orientation=PatchOrientation.DEFAULT,
    )
    if swap_second:
        # SWAP footprint is (sv0, su0) blocks at uv0
        p1 = replace(
            f.meta.patches[1], uv0=(9, 2), size_uv0=(3, 5),
            patch_orientation=PatchOrientation.SWAP,
        )
    else:
        p1 = replace(
            f.meta.patches[1], uv0=(9, 2), size_uv0=(5, 3),
            patch_orientation=PatchOrientation.DEFAULT,
        )
    return make_synthetic_frame(
        rng, width=width, height=height, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=0, patches=[p0, p1],
        occupancy_fill=0.9,
    )


def _oracle_decode(stream):
    d = Decoder(Params(stream, use_device=False))
    d.start()
    out = list(d)
    assert len(out) == 1
    return out[0]


def test_tiled_metadata_merges_onto_canvas():
    rng = np.random.default_rng(73)
    sf = make_tile_major_frame(rng)
    stream = build_fixture_stream([sf], tiles=(2, 1))
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    afti = ctx.get_afps(0).atlas_frame_tile_information
    assert not afti.single_tile_in_atlas_frame_flag
    assert afti.tile_count() == 2
    assert afti.tile_rect(0, 128, 64) == (0, 0, 64, 64)
    assert afti.tile_rect(1, 128, 64) == (64, 0, 64, 64)
    # two tile layers, ONE merged frame meta on the canvas
    assert ctx.atlas_tile_layer_len() == 2
    metas = create_patch_frames(ctx)
    assert len(metas) == 1
    meta = metas[0]
    assert (meta.width, meta.height) == (128, 64)
    assert [p.uv0 for p in meta.patches] == [(1, 1), (9, 2)]


def test_tiled_stream_decodes_identically_to_single_tile():
    rng = np.random.default_rng(79)
    sf = make_tile_major_frame(rng)
    tiled = _oracle_decode(build_fixture_stream([sf], tiles=(2, 1)))
    single = _oracle_decode(build_fixture_stream([sf]))
    assert len(tiled) > 0
    assert format_ply(tiled) == format_ply(single)


def test_tiled_device_matches_oracle():
    rng = np.random.default_rng(83)
    sf = make_tile_major_frame(rng, swap_second=True)
    stream = build_fixture_stream([sf], tiles=(2, 1))
    d = Decoder(Params(stream, use_device=True))
    d.start()
    dev = list(d)[0]
    orc = _oracle_decode(stream)
    assert len(dev) > 0
    assert format_ply(dev) == format_ply(orc)


def test_signalled_tile_ids():
    rng = np.random.default_rng(89)
    sf = make_tile_major_frame(rng)
    plain = build_fixture_stream([sf], tiles=(2, 1))
    signalled = build_fixture_stream([sf], tiles=(2, 1), tile_ids=[7, 3])
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(signalled))
    ctx = Context()
    ssvu.decode_gof(ctx)
    afti = ctx.get_afps(0).atlas_frame_tile_information
    assert afti.signalled_tile_id_flag and afti.tile_id == [7, 3]
    assert afti.tile_index_of(3) == 1
    with pytest.raises(UnsupportedFeature):
        afti.tile_index_of(5)
    assert format_ply(_oracle_decode(signalled)) == format_ply(
        _oracle_decode(plain)
    )


def test_multi_partition_tiles_and_explicit_afti():
    """128x128 canvas, 2x2 partition grid, TWO tiles: the left column
    (one partition wide, two tall) and the right column."""
    rng = np.random.default_rng(97)
    sf = make_tile_major_frame(rng, width=128, height=128)
    afti = AtlasFrameTileInformation(
        single_tile_in_atlas_frame_flag=False,
        uniform_partition_spacing_flag=True,
        partition_cols_width_minus1=0,   # 64-px columns
        partition_rows_height_minus1=0,  # 64-px rows
        single_partition_per_tile_flag=False,
        num_tiles_in_atlas_frame_minus1=1,
        top_left_partition_idx=[0, 1],
        bottom_right_partition_column_offset=[0, 0],
        bottom_right_partition_row_offset=[1, 1],
    )
    assert afti.tile_rect(0, 128, 128) == (0, 0, 64, 128)
    assert afti.tile_rect(1, 128, 128) == (64, 0, 64, 128)
    tiled = _oracle_decode(build_fixture_stream([sf], tiles=afti))
    single = _oracle_decode(build_fixture_stream([sf]))
    assert len(tiled) > 0
    assert format_ply(tiled) == format_ply(single)


def test_nonuniform_partitions():
    """192-px-wide canvas split 64 + 128 (explicit column widths, last
    column takes the remainder); the second patch sits in the wide
    tile at a non-64-multiple offset."""
    rng = np.random.default_rng(101)
    f = make_synthetic_frame(
        rng, width=192, height=64, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=2, frame_index=0,
        allow_swap=False, occupancy_fill=0.9,
    )
    p0 = replace(
        f.meta.patches[0], uv0=(0, 0), size_uv0=(4, 3),
        patch_orientation=PatchOrientation.DEFAULT,
    )
    p1 = replace(
        f.meta.patches[1], uv0=(10, 1), size_uv0=(6, 4),
        patch_orientation=PatchOrientation.DEFAULT,
    )
    sf = make_synthetic_frame(
        rng, width=192, height=64, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=0, patches=[p0, p1],
        occupancy_fill=0.9,
    )
    afti = AtlasFrameTileInformation(
        single_tile_in_atlas_frame_flag=False,
        uniform_partition_spacing_flag=False,
        num_partition_columns_minus1=1,
        num_partition_rows_minus1=0,
        partition_column_width_minus1=[0],  # col 0 = 64 px; col 1 = rest
        partition_row_height_minus1=[],
        single_partition_per_tile_flag=True,
        num_tiles_in_atlas_frame_minus1=1,
    )
    assert afti.tile_rect(0, 192, 64) == (0, 0, 64, 64)
    assert afti.tile_rect(1, 192, 64) == (64, 0, 128, 64)
    tiled = _oracle_decode(build_fixture_stream([sf], tiles=afti))
    single = _oracle_decode(build_fixture_stream([sf]))
    assert len(tiled) > 0
    assert format_ply(tiled) == format_ply(single)


def test_multi_frame_tiled_stream():
    """Three frames, two tile layers each: AFOC repeats across a
    frame's layers and each frame merges independently."""
    rng = np.random.default_rng(107)
    frames = []
    for i in range(3):
        sf = make_tile_major_frame(rng)
        sf.meta.frame_index = i
        frames.append(sf)
    def decode_all(stream):
        d = Decoder(Params(stream, use_device=False))
        d.start()
        return list(d)

    tiled = decode_all(build_fixture_stream(frames, tiles=(2, 1)))
    singles = decode_all(build_fixture_stream(frames))
    assert len(tiled) == len(singles) == 3
    for t, s in zip(tiled, singles):
        assert len(t) > 0
        assert format_ply(t) == format_ply(s)


def test_empty_tile_layer():
    """A tile with no patches still codes a (legal, empty) tile layer."""
    rng = np.random.default_rng(103)
    f = make_synthetic_frame(
        rng, width=128, height=64, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=1, frame_index=0,
        allow_swap=False, occupancy_fill=0.9,
    )
    p0 = replace(
        f.meta.patches[0], uv0=(1, 1), size_uv0=(4, 3),
        patch_orientation=PatchOrientation.DEFAULT,
    )
    sf = make_synthetic_frame(
        rng, width=128, height=64, occupancy_resolution=RES,
        occupancy_precision=PREC, frame_index=0, patches=[p0],
        occupancy_fill=0.9,
    )
    tiled = _oracle_decode(build_fixture_stream([sf], tiles=(2, 1)))
    single = _oracle_decode(build_fixture_stream([sf]))
    assert format_ply(tiled) == format_ply(single)
