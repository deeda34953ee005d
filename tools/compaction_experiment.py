"""Round-3 lead experiment: in-kernel compaction via sequential-grid
overlap writes — can a Pallas pass beat the XLA stable-sort compaction?

Two e2e variant measurements (K-vs-1 differential, same methodology as
bench.py — stage-isolated microbenchmarks mislead on XLA:TPU):

A. **Sort-cost ceiling.** The full pre-tiled pipeline vs an identical
   pipeline whose compaction sort is replaced by a same-shape direct
   unpack (no sort). The difference is the true e2e marginal cost of the
   sort — the MAXIMUM any in-kernel compaction scheme could save.

B. **Cursor-DMA mechanism floor.** The no-sort pipeline plus a Pallas
   kernel that walks the payload words chunk-by-chunk over the
   sequential TPU grid, keeps a running valid-count cursor in SMEM, and
   DMAs each (uncompacted) chunk to ``out[cursor : cursor+CH]`` — the
   "overlap writes" idea with ZERO within-chunk packing work. Any
   *correct* in-kernel compaction must additionally pack each chunk
   (TPU has no vector scatter; packing needs O(log) roll/select passes
   or worse), so this kernel's marginal cost is a FLOOR for the
   approach. NOTE: its data output is deliberately garbage (overlapping
   uncompacted chunks); only the cursor arithmetic and DMA traffic are
   real. The final count output is checked against the XLA count.

Decision rule: if floor(B) > ceiling(A), in-kernel compaction cannot
win; record the negative result in PERFORMANCE.md and keep the XLA sort.

Usage (real chip, one TPU job at a time):
    python tools/compaction_experiment.py [batch] [loop_n] [variants]
where ``variants`` is a comma list over the keys of ``all_fns`` in
``main`` (full/nosort/stage probes, payload/narrow/packed/key-iota/
scatter compactions, segsort probes, pallas_cursor; default
full_sort,nosort,pallas_cursor). Remote compiles dominate wall time
(~400 s each on a congested tunnel; one compile per variant), so sweep
only the variants you need.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from tpu_vpcc.atlas import groups as G  # noqa: E402
from tpu_vpcc.models.flagship import FlagshipConfig, example_batch_inputs  # noqa: E402
from tpu_vpcc.ops.tiled import (  # noqa: E402
    _compact_words_key_iota,
    _compact_words_payload_sort,
    _compact_words_narrow_stable,
    _compact_words_narrow_unique,
    _compact_words_packed_sort,
    _compact_words_scatter,
    _flat_pretiled_impl,
    _pretiled_gather_tiles,
    _tiles_to_words,
    tile_plane,
)

CH = 8192  # payload elements per grid step (32 KB/u32 array)


def _words(fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg, **probe):
    """Shared XLA prefix: everything up to the payload words. ``probe``
    forwards the cost-probe switches of ``_tiles_to_words``."""
    F = fields.shape[0]
    FG = F * fields.shape[1]
    S = fields.shape[1] * cfg.slots_per_block
    t_a, t_b, t_c = _pretiled_gather_tiles(
        fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t, cfg
    )
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    return (
        _tiles_to_words(fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg, **probe),
        F, S,
    )


def run_full(*args, cfg):
    return _flat_pretiled_impl(*args, cfg)


def run_raw_gather(*args, cfg):
    """The raw-tile-gather narrow path (round 4): 9 raw row gathers, no
    canvas-sized pack/upsample. Bit-exact production candidate."""
    from dataclasses import replace

    return _flat_pretiled_impl(*args, replace(cfg, raw_gather=True))


def run_megarow(*args, cfg):
    """Packed planes concatenated into ONE tiled row layout: a single
    n_groups-row gather fetches all three tiles (bit-exact)."""
    from tpu_vpcc.ops.tiled import (
        _pretiled_gather_megarow,
        _tiles_to_points,
    )

    fields = args[0]
    F = fields.shape[0]
    FG = F * fields.shape[1]
    S = fields.shape[1] * cfg.slots_per_block
    t_a, t_b, t_c = _pretiled_gather_megarow(*args, cfg)
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    return _tiles_to_points(fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg)


def run_sort_primitive(*args, cfg):
    """COST PROBE: a bare 3-operand u32 lax.sort at the production slot
    extent (key + 8 B payload), fed from the input planes so the timing
    loop's perturbation reaches the key. Measures the sort PRIMITIVE's
    own cost — if it matches full-minus-words, the pipeline is at the
    primitive's floor."""
    fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t = args
    S = fields.shape[1] * cfg.slots_per_block
    F = fields.shape[0]
    N = F * S  # the full flattened batch extent, like the real sort
    # N = 2 maps x pixels, so only the map-carrying attr plane is big
    # enough to source all N elements; key diversity + the timing
    # loop's ay perturbation both ride it (payload VALUES are
    # irrelevant to bitonic cost — only operand bytes move)
    base = ay_t.reshape(-1)[:N].astype(jnp.uint32)
    c = base * jnp.uint32(2654435761)
    a = base ^ (base << 7)
    b = base ^ (base << 13)
    k, s1, s2 = jax.lax.sort((c, b, a), num_keys=1, is_stable=False)
    u16 = lambda w: (w & 0xFFFF).astype(jnp.uint16)  # noqa: E731
    pos = jnp.stack(
        [u16(s1), u16(s1 >> 16), u16(s2)], -1
    ).reshape(F, S, 3)
    col = jnp.stack([u16(k), u16(k >> 16), u16(s2 >> 4)], -1).reshape(F, S, 3)
    counts = jnp.broadcast_to((k[0] & 0xFF).astype(jnp.int32), (F,))
    return pos, col, counts


def _make_split_variant(K):
    def run(*args, cfg):
        from dataclasses import replace

        return _flat_pretiled_impl(*args, replace(cfg, sort_split=K))
    return run


run_split2 = _make_split_variant(2)
run_split4 = _make_split_variant(4)
run_split8 = _make_split_variant(8)
run_split16 = _make_split_variant(16)
run_split32 = _make_split_variant(32)
run_split64 = _make_split_variant(64)


def _make_batched_split_variant(K):
    def run(*args, cfg):
        """Batched split-sort: ONE minor-axis lax.sort over (F*K, Sk)
        rows instead of K separate flat sorts; the key narrows to u16
        when Sk <= 2^15 (K >= 48 at the 1280² bucketed extent).
        Bit-exact production candidate."""
        from dataclasses import replace

        return _flat_pretiled_impl(
            *args, replace(cfg, sort_split=K, sort_split_batched=True)
        )
    return run


run_splitb8 = _make_batched_split_variant(8)
run_splitb16 = _make_batched_split_variant(16)
run_splitb48 = _make_batched_split_variant(48)
run_splitb64 = _make_batched_split_variant(64)
run_splitb96 = _make_batched_split_variant(96)
run_splitb192 = _make_batched_split_variant(192)
run_splitb384 = _make_batched_split_variant(384)


def _merge_tree(seg_ops, counts_seg, F):
    """Pairwise-tree merge of the K compacted segment prefixes:
    ceil(log2 K) dependency depth instead of the K-1 sequential
    dynamic row updates. MEASURED NEGATIVE (K=96: 2.78 vs 2.02
    sequential; K=48: 2.66): the per-level buffer materializations
    (concat + stacked per-frame updates) cost more than the sequential
    chain's small in-place row copies — the chain is bandwidth-cheap,
    not latency-bound. Kept here for reproducibility."""
    items = [
        (list(ops), counts_seg[:, k]) for k, ops in enumerate(seg_ops)
    ]
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items) - 1, 2):
            a_ops, a_cnt = items[i]
            b_ops, b_cnt = items[i + 1]
            lb = b_ops[0].shape[1]
            m_ops = []
            for j in range(len(a_ops)):
                buf = jnp.concatenate(
                    [a_ops[j], jnp.zeros((F, lb), a_ops[j].dtype)],
                    axis=1,
                )
                rows = [
                    jax.lax.dynamic_update_slice(
                        buf[f], b_ops[j][f], (a_cnt[f],)
                    )
                    for f in range(F)
                ]
                m_ops.append(jnp.stack(rows))
            nxt.append((m_ops, a_cnt + b_cnt))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0][0]


def _make_tree_merge_variant(K):
    def run(*args, cfg):
        """Batched split-sort + pairwise TREE merge (see _merge_tree:
        measured negative; the sequential merge stays production)."""
        from tpu_vpcc.atlas import groups as GG
        from tpu_vpcc.ops.tiled import (
            _batched_split_sort,
            _narrow_pipeline_words,
            _unpack_narrow_ops,
        )

        fields = args[0]
        F = fields.shape[0]
        Gk = fields.shape[1] // K
        Sk = Gk * cfg.slots_per_group
        words = _narrow_pipeline_words(fields, *args[1:], cfg, F)
        seg_bases = fields[:, ::Gk, GG.G_EMITBASE].astype(jnp.uint32)
        payload, counts_seg = _batched_split_sort(
            words, seg_bases, F, K, Sk
        )
        seg_ops = [[p[:, k] for p in payload] for k in range(K)]
        merged = _merge_tree(seg_ops, counts_seg, F)
        return _unpack_narrow_ops(
            merged, counts_seg.sum(axis=1), F, K * Sk
        )
    return run


run_splitb96tree = _make_tree_merge_variant(96)
run_splitb48tree = _make_tree_merge_variant(48)


def run_halfsplit(*args, cfg):
    """Two half-group-extent narrow pipelines in one kernel (the
    spatial-shard layout on a single device): each half compacts its own
    emission-contiguous group range, outputs concatenated. The bitonic
    sort is O(n log^2 n), so two half sorts SHOULD cost ~11% less than
    one — this measures whether that holds on this backend."""
    fields = args[0]
    Gc = fields.shape[1]
    h = Gc // 2
    p1, c1, n1 = _flat_pretiled_impl(
        fields[:, :h], *args[1:], cfg
    )
    p2, c2, n2 = _flat_pretiled_impl(
        fields[:, h:], *args[1:], cfg
    )
    pos = jnp.concatenate([p1, p2], axis=1)
    col = jnp.concatenate([c1, c2], axis=1)
    return pos, col, n1 + n2


def run_megaraw(*args, cfg):
    """Raw u16 planes concatenated into mega-rows: one gather, unpack
    and upsample AFTER the gather (bit-exact)."""
    from tpu_vpcc.ops.tiled import (
        _compact_narrow_triple,
        _grids_to_words,
        _pretiled_gather_megaraw,
    )

    fields = args[0]
    F = fields.shape[0]
    FG = F * fields.shape[1]
    S = fields.shape[1] * cfg.slots_per_block
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    grids = _pretiled_gather_megaraw(fields_f, fid, *args[1:], cfg, F)
    w0, zs, wc, valid, emi = _grids_to_words(
        fields_f, fid, grids, F, FG, S, cfg, _narrow_emit=True
    )
    return _compact_narrow_triple(w0, zs, wc, valid, emi, F, S)


def run_mega_nosort(*args, cfg):
    """Megarow words stage without the sort (DCE-hazy cost bound)."""
    from tpu_vpcc.ops.tiled import _pretiled_gather_megarow, _tiles_to_words

    fields = args[0]
    F = fields.shape[0]
    FG = F * fields.shape[1]
    S = fields.shape[1] * cfg.slots_per_block
    t_a, t_b, t_c = _pretiled_gather_megarow(*args, cfg)
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    w0, zs, wc, valid, emi = _tiles_to_words(
        fields_f, fid, t_a, t_b, t_c, F, FG, S, cfg, _narrow_emit=True
    )
    pos, col, counts = _probe_unpack(w0, zs, wc, valid, F, S)
    counts = counts + (emi[0, 0] & 1).astype(jnp.int32)
    return pos, col, counts


def run_raw_noup(*args, cfg):
    """COST PROBE: the raw path with the occupancy/chroma UPSAMPLES
    removed — occ_bit and chroma grids are gathered from the full-res
    luma plane instead (same gather count and shapes, WRONG output,
    everything downstream live incl. the sort). full - this = the cost
    of the _upsample2d broadcasts on gathered tiles."""
    from dataclasses import replace as _rp

    import tpu_vpcc.ops.tiled as T

    rcfg = _rp(cfg, raw_gather=True)
    fields, occ_t, geo0_t, geo1_t, ay_t, au_t, av_t = args
    F = fields.shape[0]
    FG = F * fields.shape[1]
    S = fields.shape[1] * cfg.slots_per_block
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    res = cfg.occupancy_resolution
    nb = cfg.block_h * cfg.block_w
    mc = cfg.map_count
    i32 = lambda a: a.astype(jnp.int32)  # noqa: E731
    f_of_g = jax.lax.broadcasted_iota(jnp.int32, (F, FG // F), 0).reshape(FG)
    row_idx = f_of_g * nb + fid(G.G_BLOCKID)
    r16 = lambda p: p.reshape(F * nb, res, res)[row_idx]  # noqa: E731
    d0 = i32(r16(geo0_t)) >> cfg.geo_shift
    d1 = (i32(r16(geo1_t)) >> cfg.geo_shift) if mc > 1 else d0
    occ_bit = i32(r16(ay_t[:, 0]) > 0)  # stand-in: no upsample
    cy0 = i32(r16(ay_t[:, 0]))
    cy1 = i32(r16(ay_t[:, 1])) if mc > 1 else cy0
    cu0 = i32(r16(ay_t[:, 0]))  # stand-ins for the chroma upsamples
    cv0 = i32(r16(ay_t[:, mc - 1]))
    cu1, cv1 = cv0, cu0
    grids = (d0, d1, occ_bit, cy0, cy1, cu0, cu1, cv0, cv1)
    w0, zs, wc, valid, emi = T._grids_to_words(
        fields_f, fid, grids, F, FG, S, rcfg, _narrow_emit=True
    )
    return T._compact_narrow_triple(w0, zs, wc, valid, emi, F, S)


def run_raw_slicerows(*args, cfg):
    """COST PROBE: the raw path with every row gather replaced by a
    contiguous row slice (WRONG output, full pipeline otherwise — all
    outputs consumed, so nothing DCEs). full - this = the marginal cost
    of gather randomness."""
    from dataclasses import replace as _rp

    import tpu_vpcc.ops.tiled as T

    rcfg = _rp(cfg, raw_gather=True)
    fields = args[0]
    F = fields.shape[0]
    FG = F * fields.shape[1]
    S = fields.shape[1] * cfg.slots_per_block
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    fid_fake = lambda idx: (  # noqa: E731
        jax.lax.broadcasted_iota(jnp.int32, (FG,), 0)
        if idx == G.G_BLOCKID else fields_f[:, idx]
    )
    grids = T._pretiled_gather_raw(
        fields_f, fid_fake, *args[1:], rcfg, F
    )
    w0, zs, wc, valid, emi = T._grids_to_words(
        fields_f, fid, grids, F, FG, S, rcfg, _narrow_emit=True
    )
    return T._compact_narrow_triple(w0, zs, wc, valid, emi, F, S)


def run_raw_nosort(*args, cfg):
    """raw_gather words stage without the sort (cost split probe)."""
    from dataclasses import replace as _rp

    from tpu_vpcc.ops.tiled import (
        _grids_to_words,
        _pretiled_gather_raw,
        _unpack_narrow_sorted,
    )

    rcfg = _rp(cfg, raw_gather=True)
    fields = args[0]
    F = fields.shape[0]
    FG = F * fields.shape[1]
    S = fields.shape[1] * cfg.slots_per_block
    fields_f = fields.reshape(FG, G.N_GROUP_FIELDS)
    fid = lambda idx: fields_f[:, idx]  # noqa: E731
    grids = _pretiled_gather_raw(fields_f, fid, *args[1:], rcfg, F)
    w0, zs, wc, valid, emi = _grids_to_words(
        fields_f, fid, grids, F, FG, S, rcfg, _narrow_emit=True
    )
    pos, col, counts = _probe_unpack(w0, zs, wc, valid, F, S)
    counts = counts + (emi[0, 0] & 1).astype(jnp.int32)
    return pos, col, counts


def run_nosort(*args, cfg, **probe):
    """Same shapes/dtypes as run_full, compaction replaced by a direct
    unpack (output is uncompacted — a cost probe, not a correct result)."""
    (w0, w1, w2, valid), F, S = _words(*args, cfg=cfg, **probe)
    counts = valid.sum(axis=1, dtype=jnp.int32)
    lo = lambda w: (w & 0xFFFF).astype(jnp.uint16)  # noqa: E731
    hi = lambda w: (w >> 16).astype(jnp.uint16)  # noqa: E731
    positions = jnp.stack([lo(w0), hi(w0), lo(w1)], axis=-1).reshape(F, S, 3)
    colors16 = jnp.stack([hi(w1), lo(w2), hi(w2)], axis=-1).reshape(F, S, 3)
    return positions, colors16, counts


def _probe_unpack(w0, zs, wc, valid, F, S):
    """Unsorted unpack for words-stage probes, handling both narrow
    layouts (split zs, or the pack30 zs=None layout)."""
    from tpu_vpcc.ops.tiled import _unpack_narrow_sorted, _unpack_pack30

    if zs is None:
        return _unpack_pack30(w0, wc, valid, F, S)
    return _unpack_narrow_sorted(w0, zs, wc, valid, F, S)


def run_nosort_narrow(*args, cfg, **probe):
    """Words-stage probe for the PRODUCTION (narrow-emit) path: narrow
    words + direct unsorted unpack — the full pipeline minus its sort."""
    (w0, zs, wc, valid, emi), F, S = _words(
        *args, cfg=cfg, _narrow_emit=True, **probe
    )
    pos, col, counts = _probe_unpack(w0, zs, wc, valid, F, S)
    # keep the emission-index computation alive (part of the real path)
    counts = counts + (emi[0, 0] & 1).astype(jnp.int32)
    return pos, col, counts


def run_nosort_narrow_nocolor(*args, cfg):
    """Narrow words probe with the color path dead."""
    return run_nosort_narrow(*args, cfg=cfg, _color=False)


def run_nosort_nofix(*args, cfg):
    """Stage probe: nosort with the SWAP-tile transpose step removed
    (wrong output for SWAP tiles; isolates the [N,16,16] transpose cost)."""
    return run_nosort(*args, cfg=cfg, _fix_orientation=False)


def run_nosort_nocolor(*args, cfg):
    """Stage probe: nosort with the whole color path dead (t_b/t_c
    unused; isolates the attribute processing cost)."""
    return run_nosort(*args, cfg=cfg, _color=False)


def _make_compact_variant(compact_fn):
    def run(*args, cfg):
        (w0, w1, w2, valid), F, S = _words(*args, cfg=cfg)
        return compact_fn(w0, w1, w2, valid, F, S)
    return run


run_payload_sort = _make_compact_variant(_compact_words_payload_sort)
run_packed_sort = _make_compact_variant(_compact_words_packed_sort)
run_key_iota_sort = _make_compact_variant(_compact_words_key_iota)
run_scatter_partition = _make_compact_variant(_compact_words_scatter)
run_narrow_stable = _make_compact_variant(_compact_words_narrow_stable)
run_narrow_unique = _make_compact_variant(_compact_words_narrow_unique)


def _make_segsort_probe(seg):
    def run(*args, cfg):
        """COST PROBE: batched per-segment sort along the minor axis —
        each `seg`-wide segment partitions independently (output is only
        segment-partitioned, NOT the global prefix; measures how much of
        the full sort's O(n log^2 n) a two-stage design could save)."""
        (w0, w1, w2, valid), F, S = _words(*args, cfg=cfg)
        N = F * S
        assert N % seg == 0
        r = lambda a: a.reshape(N // seg, seg)  # noqa: E731
        k = r((~valid).reshape(-1).astype(jnp.uint8))
        _, s0, s1, s2 = jax.lax.sort(
            (k, r(w0.reshape(-1)), r(w1.reshape(-1)), r(w2.reshape(-1))),
            num_keys=1, is_stable=True,
        )
        from tpu_vpcc.ops.tiled import _unpack_sorted

        return _unpack_sorted(
            s0.reshape(F, S), s1.reshape(F, S), s2.reshape(F, S),
            valid, F, S,
        )
    return run


run_segsort_8k = _make_segsort_probe(8192)
run_segsort_2k = _make_segsort_probe(2048)


ROWS, LANES = 8, 1024  # CH = ROWS * LANES per grid step
assert CH == ROWS * LANES


def _cursor_kernel(w0_ref, w1_ref, w2_ref, v_ref,
                   out0_ref, out1_ref, out2_ref, cnt_ref,
                   cur_ref, sems):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cur_ref[0] = 0

    cursor = cur_ref[0]  # element count
    n = jnp.sum(v_ref[...])
    # Mosaic requires DMA destination offsets provably divisible by the
    # sublane tiling (8), so the overlap writes land at 8-row (chunk)
    # granularity: same DMA volume as element-granular compaction with
    # BETTER-aligned destinations — the floor stays a floor
    row_cursor = pl.multiple_of((cursor // CH) * ROWS, ROWS)
    copies = [
        pltpu.make_async_copy(
            src, dst.at[pl.ds(row_cursor, ROWS)], sems.at[k]
        )
        for k, (src, dst) in enumerate(
            ((w0_ref, out0_ref), (w1_ref, out1_ref), (w2_ref, out2_ref))
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    cur_ref[0] = cursor + n

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0, 0] = cursor + n


def run_pallas_cursor(*args, cfg):
    (w0, w1, w2, valid), F, S = _words(*args, cfg=cfg)
    N = F * S
    assert N % CH == 0, (N, CH)
    nc = N // CH
    shape2 = lambda a: a.reshape(nc * ROWS, LANES)  # noqa: E731
    in_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))
    out0, out1, out2, cnt = pl.pallas_call(
        _cursor_kernel,
        grid=(nc,),
        in_specs=[in_spec] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((N // LANES, LANES), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(shape2(w0), shape2(w1), shape2(w2), shape2(valid.astype(jnp.int32)))
    lo = lambda w: (w & 0xFFFF).astype(jnp.uint16)  # noqa: E731
    hi = lambda w: (w >> 16).astype(jnp.uint16)  # noqa: E731
    positions = jnp.stack([lo(out0), hi(out0), lo(out1)], -1).reshape(F, S, 3)
    colors16 = jnp.stack([hi(out1), lo(out2), hi(out2)], -1).reshape(F, S, 3)
    # chain the timing carry through the kernel's SMEM count so the DMA
    # pass can never be dead-code-eliminated
    counts = jnp.broadcast_to(cnt[0], (F,)).astype(jnp.int32)
    return positions, colors16, counts


def measure_variant(fn, cfg, fcfg, inputs, loop_n, K=9, reps=5):
    # single-compile dynamic-trip-count loop (same as bench.py): the
    # long and short measurements share one remote compile (~400 s each
    # on a congested tunnel)
    @jax.jit
    def chained(n, fields, occ, geo0, geo1, ay, au, av):
        def body(i, carry):
            c = carry
            bump = jnp.where(c < 0, 1, 0)
            pos, col, cnt = fn(
                fields, occ + bump.astype(occ.dtype), geo0, geo1,
                ay + bump.astype(ay.dtype), au, av, cfg=fcfg,
            )
            # consume every sort OPERAND, not just output families — a
            # partial probe lets XLA's SortSimplifier drop individual
            # payload operands (see bench.py): pos[...,0/2] pin w0/zs,
            # col[...] pins wc (and s1/s2 of the wide layout)
            return (
                c + cnt.sum()
                + pos[0, 0, 0].astype(jnp.int32)
                + pos[0, 0, 2].astype(jnp.int32)
                + col[0, 0, 0].astype(jnp.int32)
                + col[0, 0, 1].astype(jnp.int32)
            )
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    n_long = np.int32(loop_n * K)
    n_short = np.int32(loop_n)
    _ = np.asarray(chained(n_long, *inputs))  # one compile for both
    dt_k, dt_1 = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chained(n_long, *inputs))
        dt_k.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(chained(n_short, *inputs))
        dt_1.append(time.perf_counter() - t0)
    return (min(dt_k) - min(dt_1)) / (loop_n * (K - 1))


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    loop_n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    variants = (
        sys.argv[3].split(",") if len(sys.argv) > 3
        else ["full_sort", "nosort", "pallas_cursor"]
    )
    K = 9
    loop_n = min(loop_n, max(1, (2**31 - 1) // (batch * K * 3_000_000)))

    cfg = FlagshipConfig(batch=batch)
    fcfg = cfg.frame_config()
    raw = example_batch_inputs(cfg, occupancy_fill=0.7, n_patches=48)
    res = fcfg.occupancy_resolution
    # group-axis bucketing + pack30 gating, shared with bench.py and the
    # production dispatch (flagship.bucket_flagship_inputs)
    from tpu_vpcc.models.flagship import bucket_flagship_inputs

    raw, fcfg, g_bucket, n_live = bucket_flagship_inputs(raw, fcfg)
    host_inputs = (
        raw[0],
        tile_plane(raw[1], res // fcfg.occupancy_precision),
        tile_plane(raw[2], res),
        tile_plane(raw[3], res),
        tile_plane(raw[4], res),
        tile_plane(raw[5], res // 2),
        tile_plane(raw[6], res // 2),
    )
    dev = jax.devices()[0]
    inputs = [jax.device_put(a, dev) for a in host_inputs]

    want = None
    if "pallas_cursor" in variants:
        # correctness probe: the cursor kernel's final count must equal
        # the XLA count (the data outputs are deliberately uncompacted
        # garbage)
        full = jax.jit(functools.partial(run_full, cfg=fcfg))(*inputs)
        pc = jax.jit(functools.partial(run_pallas_cursor, cfg=fcfg))(*inputs)
        want = int(np.asarray(full[2]).sum())
        got = int(np.asarray(pc[2])[0])
        assert got == want, (got, want)

    all_fns = {
        "full_sort": run_full,
        "raw_gather": run_raw_gather,
        "raw_nosort": run_raw_nosort,
        "raw_slicerows": run_raw_slicerows,
        "megarow": run_megarow,
        "megaraw": run_megaraw,
        "sort_primitive": run_sort_primitive,
        "halfsplit": run_halfsplit,
        "split2": run_split2,
        "split4": run_split4,
        "split8": run_split8,
        "split16": run_split16,
        "split32": run_split32,
        "split64": run_split64,
        "splitb8": run_splitb8,
        "splitb16": run_splitb16,
        "splitb48": run_splitb48,
        "splitb64": run_splitb64,
        "splitb96": run_splitb96,
        "splitb192": run_splitb192,
        "splitb384": run_splitb384,
        "splitb96tree": run_splitb96tree,
        "splitb48tree": run_splitb48tree,
        "mega_nosort": run_mega_nosort,
        "raw_noup": run_raw_noup,
        "raw_blocksorted": run_raw_gather,  # reordered inputs (see main)
        "cell_full": run_full,  # cell-mode cfg + inputs (see main)
        "nosort": run_nosort,
        "nosort_narrow": run_nosort_narrow,
        "nosort_narrow_nocolor": run_nosort_narrow_nocolor,
        "nosort_nofix": run_nosort_nofix,
        "nosort_nocolor": run_nosort_nocolor,
        "pallas_cursor": run_pallas_cursor,
        "payload_sort": run_payload_sort,
        "packed_sort": run_packed_sort,
        "key_iota_sort": run_key_iota_sort,
        "scatter_partition": run_scatter_partition,
        "narrow_stable": run_narrow_stable,
        "narrow_unique": run_narrow_unique,
        "segsort_8k": run_segsort_8k,
        "segsort_2k": run_segsort_2k,
    }
    # cell-granular variants use their own inputs (cell tables + planes
    # tiled at the precision edge) and a cell-mode FrameConfig
    cell_variants = {n for n in variants if n.startswith("cell")}
    if cell_variants:
        from dataclasses import replace

        from tpu_vpcc.models.flagship import example_cell_batch_inputs

        cell_raw, n_cells = example_cell_batch_inputs(
            cfg, occupancy_fill=0.7, n_patches=48
        )
        cell_inputs = [jax.device_put(a, dev) for a in cell_raw]
        cell_cfg = replace(fcfg, cell_groups=True)
        print(
            f"# cells: live {n_cells}, bucket {cell_raw[0].shape[1]}, "
            f"slots {cell_raw[0].shape[1] * cell_cfg.slots_per_group}",
            file=sys.stderr,
        )
        # correctness cross-check once per run
        a = jax.jit(functools.partial(run_full, cfg=fcfg))(*inputs)
        b = jax.jit(functools.partial(run_full, cfg=cell_cfg))(*cell_inputs)
        na = np.asarray(a[2])
        nb_ = np.asarray(b[2])
        assert (na == nb_).all(), (na, nb_)
        pa = np.asarray(a[0])[0][: na[0]]
        pb = np.asarray(b[0])[0][: nb_[0]]
        assert (pa == pb).all(), "cell-mode positions diverge on device"

    # host-reordered table: rows sorted by G_BLOCKID so the raw row
    # gathers see ascending indices (emission order rides G_EMITBASE
    # through the sort, so table order is free on the narrow path);
    # output is bit-identical — pinned on CPU by test_pretiled
    bs_inputs = None
    if "raw_blocksorted" in variants:
        fb = np.array(host_inputs[0])
        for f in range(fb.shape[0]):
            order = np.argsort(fb[f, :, G.G_BLOCKID], kind="stable")
            fb[f] = fb[f][order]
        bs_inputs = [jax.device_put(fb, dev)] + inputs[1:]

    results = {}
    for name in variants:
        if name == "raw_blocksorted":
            dt = measure_variant(
                run_raw_gather, cfg, fcfg, bs_inputs, loop_n, K=K
            )
            results[name] = round(dt / batch * 1000, 4)
            print(f"# {name}: {results[name]} ms/frame", flush=True)
            continue
        if name in cell_variants:
            dt = measure_variant(
                all_fns[name], cfg, cell_cfg, cell_inputs, loop_n, K=K
            )
        else:
            dt = measure_variant(all_fns[name], cfg, fcfg, inputs, loop_n, K=K)
        results[name] = round(dt / batch * 1000, 4)  # ms/frame
        # incremental line so a timeout can never lose completed variants
        print(f"# {name}: {results[name]} ms/frame", flush=True)

    if "full_sort" in results and "nosort" in results:
        results["sort_cost_ceiling_ms"] = round(
            results["full_sort"] - results["nosort"], 4
        )
    if "pallas_cursor" in results and "nosort" in results:
        results["pallas_mechanism_floor_ms"] = round(
            results["pallas_cursor"] - results["nosort"], 4
        )
    results["batch"] = batch
    results["device"] = str(dev)
    if want is not None:
        results["total_points_check"] = want
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
