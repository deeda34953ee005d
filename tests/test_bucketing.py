"""Group-axis bucketing: live-sized device dispatches, bit-identical output.

Round-4 structural optimization (VERDICT item 1): the device kernels
size their slot extent from ``fields.shape[1]``, so slicing the padded
group table down to a quarter-pow2 bucket of the live group count cuts
the words stage and the O(n log^2 n) compaction sort to ~the live slot
set. Live groups sit at the front of every table in emission order
(``build_group_table``), so the slice drops only G_VALID=0 padding and
the compacted output is bit-identical. The reference analog: only owned
blocks are ever visited (``src/codec.rs:352-480``).
"""

import numpy as np
import pytest

from tpu_vpcc.atlas.groups import G_VALID, bucket_group_count, build_group_table
from tpu_vpcc.ops.reconstruct import make_config, reconstruct_batch
from tpu_vpcc.ops.tiled import reconstruct_batch_pretiled
from tpu_vpcc.utils.synthetic import make_synthetic_frame

from tests.test_pretiled import tiled_inputs


def test_bucket_group_count_grid():
    # quarter-pow2 grid: m * 2^e, m in {4..7}; >= n_live; <= g_cap
    for n in range(1, 5000, 7):
        b = bucket_group_count(n, 6400, min_bucket=1)
        assert b >= n
        assert b <= 6400
        if 4 <= b < 6400:
            m = b >> max(b.bit_length() - 3, 0)
            assert 4 <= m <= 8
            # waste bound: < 25% above the live count (plus the floor)
            assert b <= max(n + (n >> 2) + 4, 1)


def test_bucket_group_count_exact_powers_and_bounds():
    assert bucket_group_count(2048, 6400, min_bucket=1) == 2048
    assert bucket_group_count(2049, 6400, min_bucket=1) == 2560
    assert bucket_group_count(2700, 6400, min_bucket=1) == 3072
    assert bucket_group_count(6399, 6400) == 6400  # clamp to capacity
    assert bucket_group_count(0, 6400) == 256  # min bucket floor
    assert bucket_group_count(100, 6400, min_bucket=1) == 112
    # multiple_of applies after rounding, still clamped
    assert bucket_group_count(2700, 6400, multiple_of=8, min_bucket=1) == 3072
    assert bucket_group_count(300, 6400, multiple_of=7, min_bucket=1) % 7 == 0


@pytest.mark.parametrize("seed,res,prec,mc", [(0, 8, 4, 2), (2, 8, 2, 1)])
def test_bucketed_pretiled_bit_identical(seed, res, prec, mc):
    """Sliced-to-bucket fields produce the identical compacted prefix on
    the production pre-tiled kernel."""
    rng = np.random.default_rng(seed)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc, n_patches=3,
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=res,
        occupancy_precision=prec, map_count=mc,
    )
    _, tiled = tiled_inputs(sf, res)
    gt = build_group_table(sf.meta)
    bucket = bucket_group_count(gt.n_groups, cfg.g_cap, min_bucket=1)
    assert bucket < cfg.g_cap, "fixture too dense to exercise bucketing"
    sliced = (np.ascontiguousarray(tiled[0][:, :bucket]),) + tiled[1:]

    p1, c1, n1 = reconstruct_batch_pretiled(*tiled, cfg=cfg)
    p2, c2, n2 = reconstruct_batch_pretiled(*sliced, cfg=cfg)
    n1, n2 = int(n1[0]), int(n2[0])
    assert n1 == n2 and n1 > 0
    np.testing.assert_array_equal(np.asarray(p1)[0][:n1], np.asarray(p2)[0][:n1])
    np.testing.assert_array_equal(np.asarray(c1)[0][:n1], np.asarray(c2)[0][:n1])


def test_bucketed_gather_bit_identical():
    """Same property on the gather fallback kernel (shape-derived slot
    extent after the round-4 generalization)."""
    rng = np.random.default_rng(1)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=3,
    )
    cfg = make_config(
        width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2,
    )
    raw, _ = tiled_inputs(sf, 8)
    batch = tuple(a[None] for a in raw)
    gt = build_group_table(sf.meta)
    bucket = bucket_group_count(gt.n_groups, cfg.g_cap, min_bucket=1)
    assert bucket < cfg.g_cap
    sliced = (np.ascontiguousarray(batch[0][:, :bucket]),) + batch[1:]

    p1, c1, n1 = reconstruct_batch(*batch, cfg=cfg)
    p2, c2, n2 = reconstruct_batch(*sliced, cfg=cfg)
    n1, n2 = int(n1[0]), int(n2[0])
    assert n1 == n2 and n1 > 0
    np.testing.assert_array_equal(np.asarray(p1)[0][:n1], np.asarray(p2)[0][:n1])
    np.testing.assert_array_equal(np.asarray(c1)[0][:n1], np.asarray(c2)[0][:n1])


def test_pipeline_dispatch_buckets_and_matches_oracle():
    """The production dispatch path buckets the group axis (group_cap <
    g_cap on a sparse frame) and still matches the oracle decode
    byte-for-byte end to end."""
    from tpu_vpcc.runtime.pipeline import Decoder, Params, _gof_device_inputs, prepare_gof
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
    from tpu_vpcc.bitio import Bitstream
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(7)
    # 512^2 -> g_cap = 1024; a few sparse patches leave n_live well
    # under the min bucket so the slice engages (small frames clamp to
    # g_cap and are unaffected)
    frames = [
        make_synthetic_frame(
            rng, width=512, height=512, occupancy_resolution=16,
            occupancy_precision=4, n_patches=4, frame_index=i,
        )
        for i in range(2)
    ]
    stream = build_fixture_stream(frames)

    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    gof = prepare_gof(ctx)
    from tpu_vpcc.runtime.pipeline import _group_capacity

    di = _gof_device_inputs(gof)
    assert di.group_cap < _group_capacity(di.cfg), "bucketing did not engage"
    assert di.group_cap * di.cfg.slots_per_group == di.slot_cap

    dev = Decoder(Params(stream))
    dev.start()
    dev_frames = list(dev)
    orc = Decoder(Params(stream, use_device=False))
    orc.start()
    orc_frames = list(orc)
    assert len(dev_frames) == len(orc_frames) == 2
    for a, b in zip(dev_frames, orc_frames):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.colors, b.colors)


def test_bucketed_mesh_decode_matches_meshless():
    """Bucketing composes with the spatial mesh: the bucket is rounded to
    a multiple of the 'space' axis and the sharded decode equals the
    single-device decode."""
    import jax

    from tpu_vpcc.parallel.mesh import make_mesh
    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU setup")
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

    plain = Decoder(Params(stream))
    plain.start()
    plain_frames = list(plain)
    sharded = Decoder(Params(stream, mesh=mesh))
    sharded.start()
    sharded_frames = list(sharded)
    assert len(plain_frames) == len(sharded_frames) == 2
    for a, b in zip(plain_frames, sharded_frames):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.colors, b.colors)
    # no fallback should have been counted: the bucket divides by 'space'
    assert sharded.stats.counter_totals().get("mesh_fallback_dispatches", 0) == 0


def test_mesh_fallback_is_surfaced():
    """VERDICT item 8: a mesh-configured decode that cannot shard (here:
    a space axis that cannot divide any bucket of this frame's table)
    logs and counts the single-device fallback instead of silently
    degrading."""
    import jax

    from tpu_vpcc.parallel.mesh import make_mesh
    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU setup")
    from dataclasses import replace as _replace

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.v3c.syntax import PatchOrientation

    # a ROT90 patch at resolution 16 is not block-aligned -> tiled_ok
    # False -> the gather kernel, which never shards: the mesh must
    # degrade loudly (log + counter), not silently.
    p = Patch(uv0=(2, 1), size_uv0=(2, 2), uv1=(10, 20),
              occupancy_resolution=16,
              patch_orientation=PatchOrientation.ROT90)
    p.set_view_id(1)
    p.d1 = 100
    p.size_d = 255
    rng = np.random.default_rng(13)
    sf = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=16,
        occupancy_precision=4, patches=[_replace(p)], frame_index=0,
    )
    stream = build_fixture_stream([sf])
    mesh = make_mesh(data=4, space=2)
    dec = Decoder(Params(stream, mesh=mesh))
    dec.start()
    frames_out = list(dec)
    assert len(frames_out) == 1
    assert dec.stats.counter_totals().get("mesh_fallback_dispatches", 0) >= 1
    # and the fallback decode is still correct vs the oracle
    orc = Decoder(Params(stream, use_device=False))
    orc.start()
    orc_frames = list(orc)
    np.testing.assert_array_equal(frames_out[0].positions, orc_frames[0].positions)
    np.testing.assert_array_equal(frames_out[0].colors, orc_frames[0].colors)


def test_cell_gate_respects_use_tiled_preconditions():
    """A cell-flagged GOF whose content fails the tiled preconditions
    (>10-bit samples) must keep BLOCK tables — cell tables only ever
    feed the narrow pretiled kernel (review round-4 finding)."""
    from dataclasses import replace

    from tpu_vpcc.runtime.pipeline import _gof_frame_tables, prepare_gof
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.v3c.context import Context
    from tpu_vpcc.v3c.stream import SampleStreamV3CUnit
    from tpu_vpcc.bitio import Bitstream
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(23)
    frames = [
        make_synthetic_frame(
            rng, width=128, height=128, occupancy_resolution=16,
            occupancy_precision=4, n_patches=4, frame_index=0,
        )
    ]
    stream = build_fixture_stream(frames)
    ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(stream))
    ctx = Context()
    ssvu.decode_gof(ctx)
    gof = prepare_gof(ctx)
    gof = replace(gof, cell=True, packed10_ok=False)
    cfg, tables = _gof_frame_tables(gof, gof.metas)
    assert not cfg.cell_groups
    assert not cfg.pack30  # packed10_ok gates pack30 too
    # with the preconditions satisfied the cell gate engages
    gof2 = replace(gof, packed10_ok=True)
    cfg2, _ = _gof_frame_tables(gof2, gof2.metas)
    assert cfg2.cell_groups
