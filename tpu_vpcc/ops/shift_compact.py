"""Sort-free compaction: Pallas merge + shift-network partition kernel.

Replaces the batched split-sort + segment merge (the ~1.2 ms/frame
dominating the 1.9 ms round-5 kernel; ``tiled._batched_split_sort``)
with a destination-driven data movement pass. The insight: once the
gathered tiles are in PATCH memory order (SWAP-family tiles transposed
at the gather), every slot's final compacted position is computable
ELEMENTWISE — ``dest = excl-cumsum of per-pixel validity`` over the
frame's patch-raster pixel order (+``v0`` for the D1 slot of a pixel)
— so no comparison sort is needed to discover the permutation, only a
mover that routes each element to its known destination:

  1. XLA computes ``dest`` (one cumsum) and per-chunk window scalars,
     and lays each chunk's operands out as ``[garbage row | D0 rows |
     D1 rows]`` — the D0/D1 interleave is NEVER materialized (Mosaic
     has no lane-interleave primitive; stack/reshape does not lower,
     measured: tools/pallas_probe*.py).
  2. Each half-run is dest-sorted by construction, so a Batcher
     ODD-EVEN MERGE (static masks, log2(run)+1 compare-exchange
     passes built from flat-order rolls + selects) produces a fully
     dest-sorted chunk window. Bitonic would need a reversal
     (``lax.rev`` does not lower); Batcher merges two ascending runs.
  3. A DOWN-SHIFT network (log2(extent)+1 passes) moves every valid
     element down by its remaining shift ``pos - dest - delta``: in
     pass b, elements whose remaining shift has bit b move down 2^b.
     Monotone nondecreasing shifts cannot collide (see
     PERFORMANCE.md); a cell whose element departs without a
     replacement is marked inert (shift 0) so stale copies never
     travel and can never overwrite a live element.
  4. ``delta = base % LANES`` offsets every destination so each
     chunk's output window starts on a DMA row boundary; the
     sequential grid writes OVERLAPPING full windows (chunk k+1's
     window starts at the row containing the running point count and
     overwrites chunk k's garbage tail) and a carried pending-row
     scratch re-merges the partially-filled boundary row — together
     replacing the segment-merge stage entirely.

Bit-exactness contract: identical compacted prefix to the narrow
unique-key sort (``tiled._compact_narrow_triple``) fed the same words
with patch-order emission indices; pinned by tests/test_shift_compact.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane width of every in-kernel array (one DMA row = LANES u32 words).
# 128 = the native (8, 128) vector-register/tile width: lane rolls stay
# within one register. On-chip lane sweep in the full production graph
# (extent 32768): 128 -> 0.586 ms/frame, 256 -> 0.737, 512 -> 0.720.
LANES = 128
# HBM refs are (8, 128)-tiled: dynamic row slices must be 8-row blocks,
# so output windows align to 8-row granularity = ALIGN slots
ALIGN_ROWS = 8
ALIGN = ALIGN_ROWS * LANES  # 1024
_LOG_ALIGN = 10
# block width of the MXU destination-cumsum matmul (independent of the
# kernel lane width; 512 measured best)
_CS_LANES = 512
# default chunk extent in slots (one grid step's window; power of two)
DEFAULT_EXTENT = 16384
# chunk-local dest key (dest << 1 | v) and shift bound (< 2*extent +
# ALIGN) stay far inside i32 at any plausible extent; the cap is the
# VMEM window budget (~6 live (2Rh+8, LANES) u32 arrays) and the
# on-chip sweep (PERFORMANCE.md round-6: at LANES=128 both 65536 and
# 131072 lose to 32768 — the extra merge/shift passes outweigh the
# saved grid steps)
MAX_EXTENT = 131072


def shift_supported(S: int, extent: int = DEFAULT_EXTENT) -> bool:
    """Host gate: the frame slot extent divides into whole chunks."""
    return (
        extent <= MAX_EXTENT
        and ALIGN <= extent
        and extent % (2 * ALIGN) == 0
        and S % extent == 0
    )


# --------------------------------------------------------------------------
# flat-order shifts on (R, LANES) blocks (row-major linear semantics)
# --------------------------------------------------------------------------


def _rollm(x, k, axis):
    """np.roll(x, -k, axis) via pltpu.roll (shift must be >= 0)."""
    n = x.shape[axis]
    return pltpu.roll(x, shift=(n - (k % n)) % n, axis=axis)


def _fsd(x, k, lane_iota):
    """Flat shift DOWN: out[p] = x[p + k]; wrapped tail is garbage
    (callers mask with in-bounds predicates)."""
    L = x.shape[1]
    if k % L == 0:
        return _rollm(x, k // L, 0)
    assert k < L
    xr = _rollm(x, k, 1)
    xrr = _rollm(xr, 1, 0)
    return jnp.where(lane_iota < L - k, xr, xrr)


def _fsu(x, k, lane_iota):
    """Flat shift UP: out[p] = x[p - k]; wrapped head is garbage."""
    L = x.shape[1]
    if k % L == 0:
        return pltpu.roll(x, shift=k // L, axis=0)
    assert k < L
    xr = pltpu.roll(x, shift=k, axis=1)
    xrr = pltpu.roll(xr, shift=1, axis=0)
    return jnp.where(lane_iota >= k, xr, xrr)


def _log2(n: int) -> int:
    assert n & (n - 1) == 0
    return n.bit_length() - 1


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------


def _make_kernel(nops: int, Rh: int, merge: bool = True,
                 pred: str = "off"):
    """Kernel for ``nops`` payload operands; one grid step per chunk.

    Ref layout after the 4 scalar-prefetch refs:
      [key_in, op_in x nops] [op_out_hbm x nops]
      [pend_scratch x nops, out_scratch x nops, sh_scratch, dma_sems]

    ``merge=False`` (the full-order paths: wide, and narrow behind the
    MXU interleave): the window's 2*Rh data rows are ONE dest-sorted
    run — memory order is already emission order — so the odd-even
    merge phase is skipped entirely and the kernel is the shift
    network + windowed DMA alone.

    ``pred`` (round 7, per-chunk work predication on the prefetched
    ``shbits`` scalar = bit_length of the chunk's shift bound, 0 for
    an empty chunk):
      "off"  — every chunk runs all passes (values stay in registers/
               whatever Mosaic chooses; no scratch round-trips).
      "skip" — the whole body runs under pl.when(shbits > 0): chunks
               with no valid element (bucket padding) do nothing (the
               pending block is preserved by construction — the next
               live chunk's window starts at the same output row).
      "bits" — additionally, shift pass b runs under pl.when(b <
               shbits): passes above the chunk's shift bound vanish.
               Ops route through the out/sh VMEM scratch refs between
               passes (pl.when regions cannot carry values).
    """
    W_rows = 2 * Rh + ALIGN_ROWS
    M = Rh * LANES  # run length: slots per map half per chunk
    assert pred in ("off", "skip", "bits")

    def kern(row0_ref, delta_ref, pend_ref, shb_ref, *refs):
        key_ref = refs[0]
        in_refs = refs[1 : 1 + nops]
        out_hbm = refs[1 + nops : 1 + 2 * nops]
        pend = refs[1 + 2 * nops : 1 + 3 * nops]
        outs = refs[1 + 3 * nops : 1 + 4 * nops]
        shref = refs[1 + 4 * nops]
        sems = refs[2 + 4 * nops]

        i = pl.program_id(0)
        W = W_rows * LANES
        shb = shb_ref[i]

        def body():
            lane = jax.lax.broadcasted_iota(jnp.int32, (W_rows, LANES), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (W_rows, LANES), 0)
            flat = row * LANES + lane  # window-local linear position

            key = key_ref[0]
            ops = [r[0] for r in in_refs]

            # --- phase 1: odd-even merge of the two dest-sorted runs ------
            # runs live after the ALIGN garbage rows; j = in-window index.
            # Masks are STATIC iota predicates (validated in tools+tests).
            # The network's k=M pass compares each pixel's D0 key against
            # its OWN D1 key, and key1 - key0 = v0 + v1 >= 0 by
            # construction (same d0l), so that pass never swaps — skipped.
            j = flat - ALIGN
            k = M // 2 if merge else 0
            while k >= 1:
                lo_mask = (j >= 0) & ((j % (2 * k)) >= k) & (j + k < 2 * M)
                jk = j - k
                hi_mask = (jk >= 0) & ((jk % (2 * k)) >= k) & (j < 2 * M)
                kd = _fsd(key, k, lane)
                ku = _fsu(key, k, lane)
                swap_lo = lo_mask & (kd < key)
                swap_hi = hi_mask & (ku > key)
                ops_m = [
                    jnp.where(swap_lo, _fsd(x, k, lane),
                              jnp.where(swap_hi, _fsu(x, k, lane), x))
                    for x in ops
                ]
                ops = ops_m
                key = jnp.where(swap_lo, kd, jnp.where(swap_hi, ku, key))
                k //= 2

            # --- phase 2: down-shift network ------------------------------
            delta = delta_ref[i]
            dest = key >> 1
            validf = (key & 1) == 1
            sh = jnp.where(validf, flat - dest - delta, 0)
            nbits = _log2(2 * M) + 1  # max sh < extent + ALIGN <= 2^nbits

            if pred == "bits":
                shref[:] = sh
                for n in range(nops):
                    outs[n][:] = ops[n]
                for b in range(nbits):
                    @pl.when(b < shb)
                    def _pass(b=b):
                        step = 1 << b
                        s = shref[:]
                        s_in = _fsd(s, step, lane)
                        move_in = ((((s_in >> b) & 1) == 1)
                                   & (flat + step < W))
                        self_mv = ((s >> b) & 1) == 1
                        for n in range(nops):
                            x = outs[n][:]
                            outs[n][:] = jnp.where(
                                move_in, _fsd(x, step, lane), x
                            )
                        shref[:] = jnp.where(
                            move_in, s_in, jnp.where(self_mv, 0, s)
                        )
                ops = [outs[n][:] for n in range(nops)]
            else:
                for b in range(nbits):
                    step = 1 << b
                    s_in = _fsd(sh, step, lane)
                    move_in = (((s_in >> b) & 1) == 1) & (flat + step < W)
                    self_mv = ((sh >> b) & 1) == 1
                    ops = [
                        jnp.where(move_in, _fsd(x, step, lane), x)
                        for x in ops
                    ]
                    sh = jnp.where(move_in, s_in, jnp.where(self_mv, 0, sh))

            # --- phase 3: pending merge, pending update, window DMA -------
            # positions [0, delta) of the window belong to the PREVIOUS
            # chunks' output (the pending block carries them); delta
            # spans up to ALIGN_ROWS rows.
            pr = pend_ref[i]  # 8-aligned window row block with delta+n_k
            row0 = pl.multiple_of(row0_ref[i] * ALIGN_ROWS, ALIGN_ROWS)
            boundary = (flat < delta)[:ALIGN_ROWS]
            cps = []
            for n in range(nops):
                merged_head = jnp.where(
                    boundary, pend[n][:], ops[n][:ALIGN_ROWS]
                )
                outs[n][:] = ops[n]
                outs[n][0:ALIGN_ROWS, :] = merged_head
                # (dynamic_slice on a traced VALUE does not lower in
                # Mosaic; the new pending block is read back from the
                # scratch ref)
                pend[n][:] = outs[n][
                    pl.ds(pl.multiple_of(pr * ALIGN_ROWS, ALIGN_ROWS),
                          ALIGN_ROWS), :,
                ]
                cp = pltpu.make_async_copy(
                    outs[n], out_hbm[n].at[pl.ds(row0, W_rows)], sems.at[n]
                )
                cp.start()
                cps.append(cp)
            for cp in cps:
                cp.wait()

        if pred == "off":
            body()
        else:
            pl.when(shb > 0)(body)

    return kern


# --------------------------------------------------------------------------
# XLA-side preparation + call wrapper
# --------------------------------------------------------------------------


def _dest_cumsum(s01, F: int, half: int):
    """Inclusive validity cumsum over the pixel raster — the ONE scan
    that replaces the compaction sort.

    On TPU, ``jnp.cumsum`` over (F, ~0.8M) lowered at 0.281 ms/frame in
    the round-5 integration probe (the second-largest non-kernel cost).
    Blockwise MXU scan instead: within-row inclusive prefix =
    ``s @ triu(ones)`` on (F*R, _CS_LANES) rows — ``s01`` in {0, 1, 2}
    is bf16-exact and row sums <= 2*_CS_LANES = 1024 are f32-exact, so
    the DEFAULT one-pass bf16 dot is bit-exact — plus a tiny (F, R)
    row-base cumsum. Policy mirrors :func:`tiled._mxu_policy` (TPU
    default; A/B knobs TPU_VPCC_MM_CS / TPU_VPCC_NO_MM_CS)."""
    from .tiled import _mxu_policy

    if half % _CS_LANES == 0 and _mxu_policy(
        "TPU_VPCC_MM_CS", "TPU_VPCC_NO_MM_CS"
    ):
        R = half // _CS_LANES
        s = s01.reshape(F * R, _CS_LANES).astype(jnp.float32)
        U = jnp.triu(jnp.ones((_CS_LANES, _CS_LANES), jnp.float32))
        incl_r = (
            jax.lax.dot(s, U, preferred_element_type=jnp.float32)
            .astype(jnp.int32)
            .reshape(F, R, _CS_LANES)
        )
        rowsum = incl_r[:, :, -1]
        rowbase = jnp.cumsum(rowsum, axis=1) - rowsum
        return (incl_r + rowbase[:, :, None]).reshape(F, half)
    return jnp.cumsum(s01, axis=1)


def _il_prec_policy() -> str:
    """Arithmetic mode of the interleave permutation matmul — the dot
    IS the cost here (round-7 noilmm probe: 0.095 ms/frame of ~0.35 at
    HIGHEST), unlike the transpose/upsample matmuls where round 6
    measured the dots ~free. One term per output means any
    input-exact representation is bit-exact, so cheaper modes are
    available:
      highest — 6-pass f32-exact dot (the conservative round-7 form)
      high    — 3-pass bf16x3 (exact for integers < 2^24: each 8-bit
                chunk of the significand is bf16-exact). ADOPTED TPU
                default: il3 0.324-0.339 vs il6 0.346-0.366 over four
                interleaved on-chip pairs, parity ok twice.
      chunk8  — split every operand into 8-bit chunks and run ONE
                single-pass DEFAULT-precision dot. MEASURED NEGATIVE
                (+0.045: 0.389-0.399 vs il6): the chunk extraction +
                shift/or reassembly passes cost more than the matmul
                passes they save — the f32 staging traffic, not the
                dot, dominates the noilmm delta.
    Knob TPU_VPCC_IL_PREC; default high on TPU, highest elsewhere."""
    import os

    env = os.environ.get("TPU_VPCC_IL_PREC")
    if env in ("highest", "high", "chunk8"):
        return env
    return "high" if jax.default_backend() == "tpu" else "highest"


def _interleave_pairs_mm(pairs, F: int, half: int, nbits=None):
    """Per-pixel D0/D1 lane interleave as ONE 0/1 MXU permutation matmul.

    ``out[:, 2p] = a0[:, p]; out[:, 2p+1] = a1[:, p]`` is a FIXED data
    movement (round-6 rule): pair the halves' 128-lane rows into
    (N, 256) blocks and multiply by the 256x256 interleave permutation
    — one term per output, so any input-exact precision is bit-exact
    (every operand here is <= 18 bits; callers split wider words).
    The jnp.stack/reshape formulation materializes a minor-dim-2
    intermediate (catastrophic lane padding, PERFORMANCE.md round 4)
    and does not lower in Mosaic at all (round 5) — this matmul is
    what finally makes the per-pixel interleave cheap enough to buy
    the merge-free kernel for the narrow path.

    ``pairs``: list of ``(a0, a1)`` (F, half) u32 arrays, each value
    < 2^24. ``nbits``: per-pair value-width bounds (bits; defaults to
    24) — the chunk8 mode emits ceil(nbits/8) chunk rows per pair.
    Returns the matching list of (F, 2*half) u32 arrays.
    """
    IL = 128  # pairing width — fixed, independent of the kernel LANES
    assert half % IL == 0
    N = (F * half) // IL
    mode = _il_prec_policy()
    if nbits is None:
        nbits = [24] * len(pairs)

    j = jnp.arange(2 * IL)
    src = (j // 2) + (j % 2) * IL
    peq = src[None, :] == jnp.arange(2 * IL)[:, None]

    def rows(a0, a1, dtype):
        return jnp.concatenate(
            [a0.reshape(N, IL).astype(dtype),
             a1.reshape(N, IL).astype(dtype)],
            axis=1,
        )

    if mode == "chunk8":
        # 8-bit chunks are bf16-exact, so ONE single-pass DEFAULT dot
        # carries everything; the chunk shifts fold back elementwise
        M8 = jnp.uint32(0xFF)
        chunks = []  # (pair index, shift)
        parts = []
        for k, (a0, a1) in enumerate(pairs):
            for s in range(0, nbits[k], 8):
                chunks.append((k, s))
                parts.append(rows((a0 >> s) & M8, (a1 >> s) & M8,
                                  jnp.bfloat16))
        X = jnp.concatenate(parts, axis=0)
        Y = jax.lax.dot(
            X, peq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        out = [jnp.zeros((N, 2 * IL), jnp.uint32)] * len(pairs)
        for i, (k, s) in enumerate(chunks):
            out[k] = out[k] | (
                Y[i * N : (i + 1) * N].astype(jnp.uint32) << s
            )
        return [o.reshape(F, 2 * half) for o in out]

    prec = (
        jax.lax.Precision.HIGH if mode == "high"
        else jax.lax.Precision.HIGHEST
    )
    X = jnp.concatenate(
        [rows(a0, a1, jnp.float32) for a0, a1 in pairs], axis=0
    )
    Y = jax.lax.dot(
        X, peq.astype(jnp.float32),
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    return [
        Y[k * N : (k + 1) * N].astype(jnp.uint32).reshape(F, 2 * half)
        for k in range(len(pairs))
    ]


def _chunk_scalars(dest0, counts, stride: int, rows_per_frame: int,
                   extent: int):
    """Per-chunk window scalars (8-row = ALIGN-slot granularity: HBM
    refs are (8,128)-tiled and dynamic row slices must be 8-aligned).

    ``shbits`` (round 7): per-chunk shift-pass count for the kernel's
    work predication. A valid element's shift is ``ALIGN + p - dest -
    delta`` and ``p - dest`` counts the invalid slots before it in the
    chunk, so ``bound = ALIGN - delta + (extent - live)`` dominates
    every shift; passes at bit >= bit_length(bound) are no-ops. An
    empty chunk (live = 0, e.g. bucket padding) gets shbits = 0 and
    the kernel skips its body entirely (the pending block is preserved
    by construction). ``extent`` is the chunk's SLOT capacity (the
    stride is in pixels on the narrow path)."""
    base = dest0[:, ::stride]  # (F, K) valid count before the chunk
    delta = (base & (ALIGN - 1)).astype(jnp.int32)
    row0_blk = (
        jax.lax.broadcasted_iota(jnp.int32, base.shape, 0)
        * (rows_per_frame // ALIGN_ROWS)
        + (base >> _LOG_ALIGN)
    ).astype(jnp.int32)
    nxt = jnp.concatenate([base[:, 1:], counts[:, None]], axis=1)
    live = (nxt - base).astype(jnp.int32)
    pendrow = ((delta + live) >> _LOG_ALIGN).astype(jnp.int32)
    bound = ALIGN - delta + (extent - live)
    shbits = jnp.where(live > 0, 32 - jax.lax.clz(bound), 0).astype(
        jnp.int32
    )
    return base, delta, row0_blk, pendrow, shbits


def _pred_policy() -> str:
    """Kernel work-predication level (see _make_kernel): default
    "skip" on TPU, "off" elsewhere; A/B knob TPU_VPCC_PRED=off|skip|bits.

    Round-7 on-chip A/B (full production graph, extent 32768, 70%
    density, interleaved): skip ~= off (0.451 vs 0.453 mean of 4) with
    near-zero bucket padding, and skip provably does strictly less
    work when dead padding chunks exist (quarter-pow2 buckets leave up
    to ~25% dead groups), so skip is the default. "bits" is a MEASURED
    NEGATIVE (+0.03: 0.483-0.511 vs 0.446-0.474 over 4 interleaved
    pairs): routing ops through VMEM scratch between predicated passes
    costs more than the ~2 passes the shift bound skips at realistic
    density — revisit only if Mosaic grows value-carrying conditionals."""
    import os

    env = os.environ.get("TPU_VPCC_PRED")
    if env in ("off", "skip", "bits"):
        return env
    return "skip" if jax.default_backend() == "tpu" else "off"


def _launch(key_b, op_blocks, dtypes, row0_blk, delta, pendrow, shbits,
            F: int, K: int, Rh: int, rows_per_frame: int,
            merge: bool, interpret: bool):
    """Common pallas_call plumbing for both window layouts."""
    nops = len(op_blocks)
    W_rows = 2 * Rh + ALIGN_ROWS
    total_rows = F * rows_per_frame + W_rows  # slack for the last window
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(F * K,),
        in_specs=[
            pl.BlockSpec((1, W_rows, LANES),
                         lambda i, r, d, p, s: (i, 0, 0))
        ]
        * (1 + nops),
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * nops,
        scratch_shapes=(
            [pltpu.VMEM((ALIGN_ROWS, LANES), dt) for dt in dtypes]
            + [pltpu.VMEM((W_rows, LANES), dt) for dt in dtypes]
            + [pltpu.VMEM((W_rows, LANES), jnp.int32)]
            + [pltpu.SemaphoreType.DMA((nops,))]
        ),
    )
    outs = pl.pallas_call(
        _make_kernel(nops, Rh, merge=merge, pred=_pred_policy()),
        out_shape=tuple(
            jax.ShapeDtypeStruct((total_rows, LANES), dt) for dt in dtypes
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        row0_blk.reshape(-1),
        delta.reshape(-1),
        pendrow.reshape(-1),
        shbits.reshape(-1),
        key_b,
        *op_blocks,
    )
    return [o[: F * rows_per_frame] for o in outs]


def _blocks_full(a, F: int, K: int, Rh: int):
    """Window layout for the merge-free kernel: [ALIGN garbage rows |
    2*Rh data rows], data already in full (emission) order."""
    W_rows = 2 * Rh + ALIGN_ROWS
    z = jnp.zeros((F, K, ALIGN_ROWS, LANES), a.dtype)
    return jnp.concatenate(
        [z, a.reshape(F, K, 2 * Rh, LANES)], axis=2
    ).reshape(F * K, W_rows, LANES)


def shift_compact_full_order(ops_in, valid, F: int, S: int,
                             extent: int = DEFAULT_EXTENT,
                             interpret: bool | None = None):
    """Sort-free compaction of (F, S) operands whose MEMORY order IS
    the emission order (the WIDE path: maps interleaved per pixel,
    tiles already transposed — see tiled._compact_words).

    Since dest = exclusive-cumsum(valid) is nondecreasing over the
    flat order, the window's data rows form ONE dest-sorted run: the
    kernel runs WITHOUT the merge phase (shift network + overlapping
    windowed DMA only). Returns ``([compacted u32 ops], counts)`` with
    the compacted prefix in emission order, bit-identical to the
    unique-key sort's prefix."""
    assert shift_supported(S, extent), (S, extent)
    K = S // extent
    Rh = (extent // 2) // LANES
    W_rows = 2 * Rh + ALIGN_ROWS
    rows_per_frame = S // LANES
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    v = valid.astype(jnp.int32)
    incl = _dest_cumsum(v, F, S)
    dest0 = incl - v
    counts = incl[:, -1]
    base, delta, row0_blk, pendrow, shbits = _chunk_scalars(
        dest0, counts, extent, rows_per_frame, extent
    )
    base_b = jnp.broadcast_to(
        base[:, :, None], (F, K, extent)
    ).reshape(F, S)
    key = ((dest0 - base_b) << 1) | v

    op_list = [o.astype(jnp.uint32) for o in ops_in]
    dtypes = [jnp.uint32] * len(op_list)
    outs = _launch(
        _blocks_full(key, F, K, Rh),
        [_blocks_full(o, F, K, Rh) for o in op_list], dtypes,
        row0_blk, delta, pendrow, shbits, F, K, Rh, rows_per_frame,
        merge=False, interpret=interpret,
    )
    return [o.reshape(F, S) for o in outs], counts.astype(jnp.int32)


def shift_compact_ops(w0, zs, wc, valid, F: int, S: int,
                      extent: int = DEFAULT_EXTENT,
                      interpret: bool | None = None):
    """Compact the narrow-path words to their emission prefix WITHOUT a
    sort.

    Inputs are the ``emit_concat`` (F, S) arrays of the narrow words
    stage in PATCH memory order ([D0 half | D1 half], each half in
    frame patch-raster pixel order — the caller transposed SWAP tiles
    at the gather): ``w0`` u32, ``zs`` u16 or None (pack30), ``wc``
    u32, ``valid`` bool. Returns ``(ops, counts)`` shaped exactly like
    ``tiled._narrow_sort_ops`` + per-frame counts: ops = [w0c(, zsc),
    wcc], each (F, S) with the compacted prefix in emission order
    (tail garbage beyond the count, as with the sort).
    """
    assert shift_supported(S, extent), (S, extent)
    half = S // 2
    ch_half = extent // 2  # pixels per chunk
    K = S // extent
    Rh = ch_half // LANES
    W_rows = 2 * Rh + ALIGN_ROWS
    rows_per_frame = S // LANES

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    v0 = valid[:, :half]
    v1 = valid[:, half:]
    s01 = v0.astype(jnp.int32) + v1.astype(jnp.int32)
    incl = _dest_cumsum(s01, F, half)
    dest0 = incl - s01  # (F, half) exclusive: valids before this pixel
    counts = incl[:, -1]
    base, delta, row0_blk, pendrow, shbits = _chunk_scalars(
        dest0, counts, ch_half, rows_per_frame, extent
    )

    # chunk-local dest keys: (dest - base) << 1 | valid  — valid slots
    # sort AFTER invalids sharing their dest, keeping each run
    # nondecreasing; the merge orders by dest with that tiebreak.
    base_b = jnp.broadcast_to(
        base[:, :, None], (F, K, ch_half)
    ).reshape(F, half)
    d0l = dest0 - base_b
    key0 = (d0l << 1) | v0.astype(jnp.int32)
    key1 = ((d0l + v0.astype(jnp.int32)) << 1) | v1.astype(jnp.int32)
    # MEASURED NEGATIVE (round 6): u16 keys/shifts (they fit whenever
    # extent <= 32768) do NOT lower — Mosaic's tpu.dynamic_rotate is
    # "not implemented: Rotate with non-32-bit data", so every roll
    # would need a widen/narrow pair and the density win evaporates.
    # Keys stay i32.

    from .tiled import _mxu_policy

    if _mxu_policy("TPU_VPCC_MM_IL", "TPU_VPCC_NO_MM_IL"):
        # MERGE-FREE narrow path (round 7): interleave the words into
        # per-pixel emission order with the MXU permutation matmul —
        # once memory order IS emission order, dest is nondecreasing
        # over the flat window and the kernel's odd-even merge phase
        # (log2(extent/2) of its ~29 VPU passes, existing solely to
        # perform this interleave) disappears. Words wider than 24
        # bits split into f32-exact halves around the matmul; the
        # chunk-local keys (< 2*extent <= 2^18) ride directly.
        u32 = lambda a: a.astype(jnp.uint32)  # noqa: E731
        pairs = [(u32(key0), u32(key1))]
        # chunk-local key < 2*extent (see above); the split halves are
        # 15/16-bit by construction — the bounds feed chunk8's per-pair
        # chunk counts (see _interleave_pairs_mm)
        kb = extent.bit_length() + 1
        if zs is None:
            M15 = jnp.uint32(0x7FFF)
            pairs += [
                (w0[:, :half] & M15, w0[:, half:] & M15),
                (w0[:, :half] >> 15, w0[:, half:] >> 15),
                (wc[:, :half] & M15, wc[:, half:] & M15),
                (wc[:, :half] >> 15, wc[:, half:] >> 15),
            ]
            il = _interleave_pairs_mm(
                pairs, F, half, nbits=[kb, 15, 15, 15, 15]
            )
            key_i = il[0].astype(jnp.int32)
            ops_i = [il[1] | (il[2] << 15), il[3] | (il[4] << 15)]
        else:
            M16 = jnp.uint32(0xFFFF)
            M15 = jnp.uint32(0x7FFF)
            pairs += [
                (w0[:, :half] & M16, w0[:, half:] & M16),
                (w0[:, :half] >> 16, w0[:, half:] >> 16),
                (u32(zs[:, :half]), u32(zs[:, half:])),
                (wc[:, :half] & M15, wc[:, half:] & M15),
                (wc[:, :half] >> 15, wc[:, half:] >> 15),
            ]
            il = _interleave_pairs_mm(
                pairs, F, half, nbits=[kb, 16, 16, 16, 15, 15]
            )
            key_i = il[0].astype(jnp.int32)
            ops_i = [
                il[1] | (il[2] << 16),
                il[3],
                il[4] | (il[5] << 15),
            ]
        dtypes = [jnp.uint32] * len(ops_i)
        outs = _launch(
            _blocks_full(key_i, F, K, Rh),
            [_blocks_full(o, F, K, Rh) for o in ops_i], dtypes,
            row0_blk, delta, pendrow, shbits, F, K, Rh, rows_per_frame,
            merge=False, interpret=interpret,
        )
        ops = [o.reshape(F, S) for o in outs]
        if zs is not None:
            ops[1] = ops[1].astype(jnp.uint16)
        return ops, counts.astype(jnp.int32)

    def blocks(a0, a1):
        z = jnp.zeros((F, K, ALIGN_ROWS, LANES), a0.dtype)
        return jnp.concatenate(
            [z, a0.reshape(F, K, Rh, LANES), a1.reshape(F, K, Rh, LANES)],
            axis=2,
        ).reshape(F * K, W_rows, LANES)

    key_b = blocks(key0, key1)
    op_halves = [(w0[:, :half], w0[:, half:])]
    dtypes = [jnp.uint32]
    if zs is not None:
        op_halves.append((zs[:, :half].astype(jnp.uint32),
                          zs[:, half:].astype(jnp.uint32)))
        dtypes.append(jnp.uint32)
    op_halves.append((wc[:, :half], wc[:, half:]))
    dtypes.append(jnp.uint32)
    op_blocks = [blocks(a0, a1) for a0, a1 in op_halves]

    outs = _launch(
        key_b, op_blocks, dtypes, row0_blk, delta, pendrow, shbits,
        F, K, Rh, rows_per_frame, merge=True, interpret=interpret,
    )
    ops = [o.reshape(F, S) for o in outs]
    if zs is not None:
        ops[1] = ops[1].astype(jnp.uint16)
    return ops, counts.astype(jnp.int32)
