"""4:4:4 attribute content: full-resolution chroma indexing
(chroma_shift=0) across the oracle and both device kernels, and the
RGB444 emission branch (``src/decoder.rs:300-305``)."""

import numpy as np
import pytest

from tpu_vpcc.atlas.groups import build_group_table
from tpu_vpcc.ops.reconstruct import make_config, reconstruct_batch
from tpu_vpcc.ops.tiled import reconstruct_batch_pretiled, tile_plane
from tpu_vpcc.reconstruction.oracle import (
    GeneratePointCloudParams,
    generate_point_cloud,
)
from tpu_vpcc.reconstruction.pointset import PointSet3
from tpu_vpcc.utils.synthetic import make_synthetic_frame

W = H = 64
RES = 8
PREC = 4


def make_444_frame(seed=0):
    """Synthetic frame with FULL-resolution chroma planes (4:4:4)."""
    rng = np.random.default_rng(seed)
    sf = make_synthetic_frame(
        rng, width=W, height=H, occupancy_resolution=RES,
        occupancy_precision=PREC, n_patches=3,
    )
    # replace the 4:2:0 chroma with full-res planes
    for planes in sf.attr_planes:
        planes[1] = rng.integers(0, 1024, (H, W)).astype(np.uint16)
        planes[2] = rng.integers(0, 1024, (H, W)).astype(np.uint16)
    return sf


def oracle_points(sf):
    params = GeneratePointCloudParams(
        occupancy_resolution=RES, occupancy_precision=PREC,
        absolute_d1=True, map_count_minus1=1, attribute_count=1,
    )
    ps, _, _ = generate_point_cloud(
        sf.meta, params, sf.occ_plane, sf.geo_planes, [[p for p in sf.attr_planes]]
    )
    return ps


def device_inputs(sf):
    gt = build_group_table(sf.meta)
    return (
        gt.fields[None],
        sf.occ_plane[None],
        sf.geo_planes[0][None],
        sf.geo_planes[1][None],
        np.stack([p[0] for p in sf.attr_planes])[None],
        np.stack([p[1] for p in sf.attr_planes])[None],
        np.stack([p[2] for p in sf.attr_planes])[None],
    )


def test_gather_kernel_full_res_chroma_matches_oracle():
    sf = make_444_frame(seed=1)
    ps = oracle_points(sf)
    cfg = make_config(width=W, height=H, occupancy_resolution=RES,
                      occupancy_precision=PREC, map_count=2, chroma_shift=0)
    pos, col, cnt = reconstruct_batch(*device_inputs(sf), cfg)
    n = int(np.asarray(cnt)[0])
    assert n == len(ps) > 0
    np.testing.assert_array_equal(np.asarray(pos)[0, :n], ps.positions)
    np.testing.assert_array_equal(np.asarray(col)[0, :n], ps.colors16bit)


def test_pretiled_kernel_full_res_chroma_matches_oracle():
    sf = make_444_frame(seed=2)
    ps = oracle_points(sf)
    cfg = make_config(width=W, height=H, occupancy_resolution=RES,
                      occupancy_precision=PREC, map_count=2, chroma_shift=0)
    raw = device_inputs(sf)
    ctile = RES >> cfg.chroma_shift  # == RES for 4:4:4
    tiled = (
        raw[0],
        tile_plane(raw[1], RES // PREC),
        tile_plane(raw[2], RES),
        tile_plane(raw[3], RES),
        tile_plane(raw[4], RES),
        tile_plane(raw[5], ctile),
        tile_plane(raw[6], ctile),
    )
    pos, col, cnt = reconstruct_batch_pretiled(*tiled, cfg)
    n = int(np.asarray(cnt)[0])
    assert n == len(ps) > 0
    np.testing.assert_array_equal(np.asarray(pos)[0, :n], ps.positions)
    np.testing.assert_array_equal(np.asarray(col)[0, :n], ps.colors16bit)


def test_copy_rgb16_to_rgb8():
    """``src/codec.rs:96-106`` u8 truncation semantics."""
    ps = PointSet3(
        positions=np.zeros((3, 3), np.uint16),
        colors16bit=np.array(
            [[255, 0, 128], [256, 511, 1023], [1, 2, 3]], np.uint16
        ),
        with_colors=True,
    )
    ps.copy_rgb16_to_rgb8()
    np.testing.assert_array_equal(
        ps.colors,
        np.array([[255, 0, 128], [0, 255, 255], [1, 2, 3]], np.uint8),
    )


def test_emit_pointset_rgb444_branch():
    """GBR content takes the copy path, not the BT.709 matrix
    (``src/decoder.rs:300-305``)."""
    from tpu_vpcc.runtime.pipeline import GofData, _emit_pointset

    gof = GofData(
        metas=[], occ_planes=np.zeros((1, 1, 1), np.uint8), geo_planes=[],
        attr_planes=[], map_count=2, occupancy_precision=4,
        occupancy_resolution=8, absolute_d1=True, geo_shift=2,
        attribute_count=1, frame_count=1, attr_is_rgb444=True,
    )
    pos = np.zeros((2, 3), np.uint16)
    col = np.array([[100, 200, 300], [10, 20, 30]], np.uint16)
    ps = _emit_pointset(pos, col, gof)
    np.testing.assert_array_equal(
        ps.colors, np.array([[100, 200, 44], [10, 20, 30]], np.uint8)
    )
    # YUV path gives a different result for the same samples
    gof2 = GofData(
        metas=[], occ_planes=np.zeros((1, 1, 1), np.uint8), geo_planes=[],
        attr_planes=[], map_count=2, occupancy_precision=4,
        occupancy_resolution=8, absolute_d1=True, geo_shift=2,
        attribute_count=1, frame_count=1, attr_is_rgb444=False,
    )
    ps2 = _emit_pointset(pos, col, gof2)
    assert not np.array_equal(ps.colors, ps2.colors)


def test_unsupported_chroma_subsampling_rejected_cleanly(monkeypatch, tmp_path):
    """Subsamplings outside 4:2:0 / 4:2:2 / 4:4:4 (e.g. 4:1:1) raise
    UnsupportedFeature (4:2:2 itself decodes since the host
    column-doubling extension — tests/test_chroma422.py)."""
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.v3c.syntax import UnsupportedFeature
    from tpu_vpcc.video import encoder_supports
    import tpu_vpcc.runtime.pipeline as pl

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(4)
    frames = [make_synthetic_frame(rng, width=W, height=H,
                                   occupancy_resolution=RES,
                                   occupancy_precision=PREC, n_patches=2)]
    stream = build_fixture_stream(frames)

    real = pl.decompress_video

    def fake(data, codec_id, *a, **kw):
        out = real(data, codec_id, *a, **kw)
        for f in out:
            f.chroma_w_shift, f.chroma_h_shift = 2, 0  # pretend 4:1:1
        return out

    monkeypatch.setattr(pl, "decompress_video", fake)
    d = Decoder(Params(stream))
    d.start()
    with pytest.raises(UnsupportedFeature):
        while d.recv_frame() is not None:
            pass


def test_e2e_444_stream_device_matches_oracle():
    """A real 4:4:4-coded attribute sub-stream through the full pipeline:
    libx265 i444 encode -> V3C mux -> Decoder, device vs oracle PLYs."""
    import ctypes

    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.ply import format_ply
    from tpu_vpcc.video import encoder_supports
    from tpu_vpcc.video.codec import _load

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    # probe 10-bit 4:4:4 support
    lib = _load()
    h = lib.venc_open(64, 64, 10, 1, 32, 20, 1)
    if not h:
        pytest.skip("libx265 lacks 4:4:4 10-bit")
    lib.venc_close(ctypes.c_void_p(h))

    rng = np.random.default_rng(9)
    frames = []
    for i in range(2):
        sf = make_synthetic_frame(
            rng, width=W, height=H, occupancy_resolution=RES,
            occupancy_precision=PREC, n_patches=3, frame_index=i,
        )
        for planes in sf.attr_planes:  # full-res chroma => 4:4:4 coding
            planes[1] = rng.integers(0, 1024, (H, W)).astype(np.uint16)
            planes[2] = rng.integers(0, 1024, (H, W)).astype(np.uint16)
        frames.append(sf)
    stream = build_fixture_stream(frames)

    d1 = Decoder(Params(stream, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(stream, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 2 and all(len(f) > 0 for f in dev)
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)
