"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from tpu_vpcc.atlas.groups import build_group_table
from tpu_vpcc.ops.reconstruct import make_config, reconstruct_frame
from tpu_vpcc.parallel.mesh import make_mesh, reconstruct_batch_data_parallel
from tpu_vpcc.parallel.spatial import reconstruct_gof_spatial, stitch_spatial
from tpu_vpcc.utils.synthetic import make_synthetic_frame


def make_batch(n_frames, seed=0, width=64, height=64, res=8, prec=4):
    rng = np.random.default_rng(seed)
    frames = [
        make_synthetic_frame(
            rng, width=width, height=height, occupancy_resolution=res,
            occupancy_precision=prec, n_patches=3, frame_index=0,
        )
        for _ in range(n_frames)
    ]
    cfg = make_config(
        width=width, height=height, occupancy_resolution=res,
        occupancy_precision=prec, map_count=2,
    )
    batch = dict(
        fields=np.stack([build_group_table(f.meta).fields for f in frames]),
        occ=np.stack([f.occ_plane for f in frames]),
        geo0=np.stack([f.geo_planes[0] for f in frames]),
        geo1=np.stack([f.geo_planes[1] for f in frames]),
        attr_y=np.stack([np.stack([p[0] for p in f.attr_planes]) for f in frames]),
        attr_u=np.stack([np.stack([p[1] for p in f.attr_planes]) for f in frames]),
        attr_v=np.stack([np.stack([p[2] for p in f.attr_planes]) for f in frames]),
    )
    return frames, cfg, batch


ARGS = ("fields", "occ", "geo0", "geo1", "attr_y", "attr_u", "attr_v")


def reference_outputs(frames, cfg, batch):
    outs = []
    for k in range(len(frames)):
        pos, col, cnt = reconstruct_frame(
            *(batch[a][k] for a in ARGS), cfg=cfg
        )
        n = int(cnt)
        outs.append((np.asarray(pos)[:n], np.asarray(col)[:n]))
    return outs


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_data_parallel_matches_single_device():
    frames, cfg, batch = make_batch(8, seed=1)
    mesh = make_mesh(data=8, space=1)
    pos, col, cnt = reconstruct_batch_data_parallel(
        mesh, *(batch[a] for a in ARGS), cfg
    )
    pos, col, cnt = np.asarray(pos), np.asarray(col), np.asarray(cnt)
    expected = reference_outputs(frames, cfg, batch)
    for k, (epos, ecol) in enumerate(expected):
        n = int(cnt[k])
        assert n == epos.shape[0]
        np.testing.assert_array_equal(pos[k, :n], epos)
        np.testing.assert_array_equal(col[k, :n], ecol)


def tile_batch(cfg, batch):
    from tpu_vpcc.ops.tiled import tile_plane

    res = cfg.occupancy_resolution
    return (
        batch["fields"],
        tile_plane(batch["occ"], res // cfg.occupancy_precision),
        tile_plane(batch["geo0"], res),
        tile_plane(batch["geo1"], res),
        tile_plane(batch["attr_y"], res),
        tile_plane(batch["attr_u"], res // 2),
        tile_plane(batch["attr_v"], res // 2),
    )


def test_pretiled_spatial_sharding_matches_single_device():
    """The production fast path, 2D-sharded (frames x groups), is
    bit-exact vs the single-device per-frame kernel."""
    from tpu_vpcc.parallel.spatial import reconstruct_gof_spatial_pretiled

    frames, cfg, batch = make_batch(4, seed=3)
    mesh = make_mesh(data=4, space=2)
    pos, col, cnt, totals = reconstruct_gof_spatial_pretiled(
        mesh, *tile_batch(cfg, batch), cfg
    )
    pos, col, cnt, totals = map(np.asarray, (pos, col, cnt, totals))
    s_loc = cfg.s_cap // mesh.shape["space"]
    expected = reference_outputs(frames, cfg, batch)
    for k, (epos, ecol) in enumerate(expected):
        gpos, gcol = stitch_spatial(pos[k], col[k], cnt[k], s_loc)
        np.testing.assert_array_equal(gpos, epos)
        np.testing.assert_array_equal(gcol, ecol)
        assert int(totals[k, 0]) == epos.shape[0]


def test_pretiled_spatial_sharding_space_four():
    from tpu_vpcc.parallel.spatial import reconstruct_gof_spatial_pretiled

    frames, cfg, batch = make_batch(2, seed=4)
    mesh = make_mesh(data=2, space=4)
    pos, col, cnt, _ = reconstruct_gof_spatial_pretiled(
        mesh, *tile_batch(cfg, batch), cfg
    )
    pos, col, cnt = map(np.asarray, (pos, col, cnt))
    s_loc = cfg.s_cap // 4
    expected = reference_outputs(frames, cfg, batch)
    for k, (epos, ecol) in enumerate(expected):
        gpos, gcol = stitch_spatial(pos[k], col[k], cnt[k], s_loc)
        np.testing.assert_array_equal(gpos, epos)
        np.testing.assert_array_equal(gcol, ecol)


def test_spatial_sharding_matches_single_device():
    frames, cfg, batch = make_batch(4, seed=2)
    mesh = make_mesh(data=4, space=2)
    pos, col, cnt, totals = reconstruct_gof_spatial(
        mesh, *(batch[a] for a in ARGS), cfg
    )
    pos, col, cnt, totals = map(np.asarray, (pos, col, cnt, totals))
    s_loc = cfg.s_cap // mesh.shape["space"]
    expected = reference_outputs(frames, cfg, batch)
    for k, (epos, ecol) in enumerate(expected):
        gpos, gcol = stitch_spatial(pos[k], col[k], cnt[k], s_loc)
        np.testing.assert_array_equal(gpos, epos)
        np.testing.assert_array_equal(gcol, ecol)
        assert int(totals[k, 0]) == epos.shape[0]


def test_pretiled_sharded_smoothing_matches_single_device():
    """Smoothing grids psum across 'space' shards: sharded output is
    bit-identical to the single-device smoothed kernel."""
    from dataclasses import replace

    from tpu_vpcc.ops.smoothing import AttrSmoothingConfig, SmoothingConfig
    from tpu_vpcc.ops.tiled import reconstruct_batch_pretiled
    from tpu_vpcc.parallel.spatial import (
        reconstruct_gof_spatial_pretiled,
        stitch_spatial,
    )

    frames, cfg, batch = make_batch(4, seed=7)
    cfg = replace(
        cfg,
        smoothing=SmoothingConfig(8, 4, 10),
        attr_smoothing=AttrSmoothingConfig(8, 255, 1, 10),
    )
    tiled = tile_batch(cfg, batch)
    # single-device reference on the same tiled inputs
    rpos, rcol, rcnt = reconstruct_batch_pretiled(*tiled, cfg)
    rpos, rcol, rcnt = map(np.asarray, (rpos, rcol, rcnt))

    mesh = make_mesh(data=4, space=2)
    pos, col, cnt, _ = reconstruct_gof_spatial_pretiled(mesh, *tiled, cfg)
    pos, col, cnt = map(np.asarray, (pos, col, cnt))
    s_loc = cfg.s_cap // 2
    for k in range(4):
        gpos, gcol = stitch_spatial(pos[k], col[k], cnt[k], s_loc)
        n = int(rcnt[k])
        assert gpos.shape[0] == n
        np.testing.assert_array_equal(gpos, rpos[k, :n])
        np.testing.assert_array_equal(gcol, rcol[k, :n])


@pytest.mark.parametrize("pack30", [False, True])
def test_pretiled_spatial_packed_matches_single_device(pack30):
    """The PACKED sharded dispatch (per-shard compacted sorted operands
    + the per-shard prefix unpack in _fetch_sharded_packed) stitches to
    the identical global point list as the single-device kernel."""
    from dataclasses import replace

    from tpu_vpcc.parallel.spatial import (
        reconstruct_gof_spatial_pretiled_packed,
    )
    from tpu_vpcc.runtime.pipeline import _fetch_sharded_packed

    frames, cfg, batch = make_batch(4, seed=7)
    cfg = replace(cfg, pack30=pack30)
    mesh = make_mesh(data=4, space=2)
    ops, cnt, totals = reconstruct_gof_spatial_pretiled_packed(
        mesh, *tile_batch(cfg, batch), cfg
    )
    assert len(ops) == (2 if pack30 else 3)
    n_space = mesh.shape["space"]
    s_loc = cfg.s_cap // n_space
    per_frame = _fetch_sharded_packed(ops, cnt, n_space, s_loc)
    expected = reference_outputs(frames, cfg, batch)
    for k, (epos, ecol) in enumerate(expected):
        gpos, gcol = per_frame[k]
        np.testing.assert_array_equal(gpos, epos)
        np.testing.assert_array_equal(gcol, ecol)
        assert int(np.asarray(totals)[k, 0]) == epos.shape[0]


def test_mesh_decoder_roundtrip_uses_packed_path():
    """A mesh-configured Decoder over a real fixture stream matches the
    meshless decode byte-for-byte (the dispatch now routes the sharded
    narrow path through the packed fetch)."""
    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 unavailable")
    rng = np.random.default_rng(11)
    frames = [
        make_synthetic_frame(
            rng, width=128, height=128, occupancy_resolution=16,
            occupancy_precision=4, n_patches=4, frame_index=i,
        )
        for i in range(2)
    ]
    stream = build_fixture_stream(frames)
    mesh = make_mesh(data=4, space=2)
    dec = Decoder(Params(stream, mesh=mesh))
    dec.start()
    sharded = list(dec)
    ref = Decoder(Params(stream))
    ref.start()
    plain = list(ref)
    assert len(sharded) == len(plain) == 2
    # the sharded dispatch really ran on the mesh (no silent fallback),
    # i.e. the packed sharded branch was exercised
    assert not dec.stats.counter_totals().get("mesh_fallback_dispatches")
    for a, b in zip(sharded, plain):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.colors, b.colors)


def test_pretiled_spatial_shift_compact_matches_sort():
    """The shift-compact kernel inside shard_map (per-shard compaction,
    shard-local destinations) stitches to the same output as the
    per-shard sort."""
    from dataclasses import replace

    from tpu_vpcc.parallel.spatial import (
        reconstruct_gof_spatial_pretiled_packed,
    )
    from tpu_vpcc.runtime.pipeline import _fetch_sharded_packed

    frames, cfg, batch = make_batch(4, seed=5, width=128, height=128, res=16)
    mesh = make_mesh(data=4, space=2)
    n_space = 2
    s_loc = cfg.s_cap // n_space
    assert s_loc == 16384  # shard-local extent supports the 8192 chunk
    outs = []
    for c in (cfg, replace(cfg, shift_compact=8192)):
        ops, cnt, _ = reconstruct_gof_spatial_pretiled_packed(
            mesh, *tile_batch(cfg, batch), c
        )
        outs.append(_fetch_sharded_packed(ops, cnt, n_space, s_loc))
    for (p0, c0), (p1, c1) in zip(*outs):
        assert p0.shape[0] > 0
        np.testing.assert_array_equal(p0, p1)
        np.testing.assert_array_equal(c0, c1)


def test_mesh_decoder_45_degree_stream_matches_meshless():
    """A 45-degree stream through a mesh-configured Decoder equals the
    meshless decode byte-for-byte — and actually SHARDS: the
    additional-planes rotation is narrow-ineligible, so the dispatch
    takes the WIDE spatial path (reconstruct_gof_spatial_pretiled,
    G_PLANE riding the sharded group tables), not the single-device
    fallback."""
    from tests.test_extended_projection import mode_views

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 unavailable")
    rng = np.random.default_rng(13)
    frames = []
    for i in range(2):
        sf = make_synthetic_frame(
            rng, width=128, height=128, occupancy_resolution=16,
            occupancy_precision=4, n_patches=4, frame_index=i,
        )
        for p, plane in zip(sf.meta.patches[:3], (1, 2, 3)):
            v = mode_views(plane, rng, 1, [p.projection_mode])[0]
            p.set_view_id(v)
        frames.append(sf)
    stream = build_fixture_stream(frames)
    mesh = make_mesh(data=4, space=2)
    dec = Decoder(Params(stream, mesh=mesh))
    dec.start()
    sharded = list(dec)
    ref = Decoder(Params(stream))
    ref.start()
    plain = list(ref)
    assert len(sharded) == len(plain) == 2
    # no fallback: the wide spatial path carried the 45-degree GOF
    assert not dec.stats.counter_totals().get("mesh_fallback_dispatches")
    for a, b in zip(sharded, plain):
        assert len(a) > 0
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.colors, b.colors)
