"""Shift-network compaction (ops/shift_compact) vs the narrow
unique-key sort: identical compacted prefixes on the same words.

The kernel runs in interpret mode on the CPU test backend; the real
Mosaic lowering is exercised on TPU by tools/shift_bench.py and the
production dispatch (bench.py tpu_parity certifies it on-chip).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpu_vpcc.ops.shift_compact import (
    DEFAULT_EXTENT,
    LANES,
    shift_compact_ops,
    shift_supported,
)
from tpu_vpcc.ops.tiled import _narrow_sort_ops


def _patch_order_emi(F, S):
    half = S // 2
    iota = np.arange(half, dtype=np.uint32)
    return jnp.asarray(
        np.concatenate([2 * iota, 2 * iota + 1])[None, :].repeat(F, 0)
    )


def _run_both(w0, zs, wc, valid, F, S, extent):
    sort_ops = _narrow_sort_ops(
        jnp.asarray(w0),
        None if zs is None else jnp.asarray(zs),
        jnp.asarray(wc),
        jnp.asarray(valid),
        _patch_order_emi(F, S),
        F,
        S,
    )
    ops, counts = shift_compact_ops(
        jnp.asarray(w0),
        None if zs is None else jnp.asarray(zs),
        jnp.asarray(wc),
        jnp.asarray(valid),
        F,
        S,
        extent=extent,
        interpret=True,
    )
    return sort_ops, ops, np.asarray(counts)


@pytest.mark.parametrize(
    "F,S,extent,density",
    [
        (1, 16384, 8192, 0.6),
        (2, 32768, 8192, 0.5),
        (1, 32768, 16384, 0.95),
        (2, 16384, 8192, 0.0),
        (1, 16384, 8192, 1.0),
        (3, 24576, 8192, 0.3),
        (1, 16384, 16384, 0.61),  # single-chunk frame
        (1, 8192, 2048, 0.55),  # granularity floor: extent == 2*ALIGN
        (2, 16384, 4096, 0.4),
    ],
)
def test_prefix_matches_sort(F, S, extent, density):
    r = np.random.default_rng(S * 7 + F)
    w0 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    wc = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    valid = r.random((F, S)) < density
    sort_ops, ops, counts = _run_both(w0, None, wc, valid, F, S, extent)
    for f in range(F):
        n = counts[f]
        assert n == valid[f].sum()
        for a, b in zip(sort_ops, ops):
            np.testing.assert_array_equal(
                np.asarray(a)[f, :n], np.asarray(b)[f, :n]
            )


def test_zs_operand_rides_along():
    """Non-pack30 layout: the u16 zs operand must compact identically."""
    F, S, extent = 2, 16384, 8192
    r = np.random.default_rng(3)
    w0 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    zs = r.integers(0, 1 << 16, (F, S), dtype=np.uint16)
    wc = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    valid = r.random((F, S)) < 0.55
    sort_ops, ops, counts = _run_both(w0, zs, wc, valid, F, S, extent)
    assert len(ops) == 3
    assert ops[1].dtype == jnp.uint16
    for f in range(F):
        n = counts[f]
        for a, b in zip(sort_ops, ops):
            np.testing.assert_array_equal(
                np.asarray(a)[f, :n], np.asarray(b)[f, :n]
            )


def test_degenerate_validity_patterns():
    """Window-boundary stress: validity concentrated in single chunks,
    runs of length 1, and alternating D0/D1-only pixels."""
    F, S, extent = 1, 32768, 8192
    half = S // 2
    r = np.random.default_rng(11)
    w0 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    wc = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    patterns = []
    # only the last chunk valid
    v = np.zeros((F, S), bool)
    v[:, half - extent // 2 :] = True
    patterns.append(v.copy())
    # exactly one valid slot per chunk-half (boundary pendings of 1)
    v = np.zeros((F, S), bool)
    v[:, :: extent // 2] = True
    patterns.append(v.copy())
    # D0-only and D1-only alternating pixels
    v = np.zeros((F, S), bool)
    v[:, 0:half:2] = True
    v[:, half + 1 :: 2] = True
    patterns.append(v.copy())
    for valid in patterns:
        sort_ops, ops, counts = _run_both(w0, None, wc, valid, F, S, extent)
        for f in range(F):
            n = counts[f]
            assert n == valid[f].sum()
            for a, b in zip(sort_ops, ops):
                np.testing.assert_array_equal(
                    np.asarray(a)[f, :n], np.asarray(b)[f, :n]
                )


@pytest.mark.parametrize(
    "F,S,extent,density",
    [
        (1, 16384, 8192, 0.6),
        (2, 32768, 16384, 0.35),
        (1, 8192, 2048, 0.0),
        (1, 16384, 16384, 1.0),
        (3, 16384, 4096, 0.5),
    ],
)
def test_full_order_prefix_matches_reference(F, S, extent, density):
    """The merge-free full-order kernel (wide path: memory order IS
    emission order) compacts to exactly the valid elements in order."""
    from tpu_vpcc.ops.shift_compact import shift_compact_full_order

    r = np.random.default_rng(S * 13 + F)
    w0 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    w1 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    w2 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    valid = r.random((F, S)) < density
    ops, counts = shift_compact_full_order(
        (jnp.asarray(w0), jnp.asarray(w1), jnp.asarray(w2)),
        jnp.asarray(valid), F, S, extent=extent, interpret=True,
    )
    counts = np.asarray(counts)
    for f in range(F):
        n = counts[f]
        assert n == valid[f].sum()
        for w, o in zip((w0, w1, w2), ops):
            np.testing.assert_array_equal(
                np.asarray(o)[f, :n], w[f][valid[f]]
            )


def test_full_order_degenerate_patterns():
    """Chunk-boundary stress for the merge-free layout."""
    from tpu_vpcc.ops.shift_compact import shift_compact_full_order

    F, S, extent = 1, 16384, 4096
    r = np.random.default_rng(5)
    w0 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    patterns = []
    v = np.zeros((F, S), bool)
    v[:, S - extent:] = True  # only the last chunk valid
    patterns.append(v.copy())
    v = np.zeros((F, S), bool)
    v[:, ::extent] = True  # one valid slot per chunk
    patterns.append(v.copy())
    v = np.zeros((F, S), bool)
    v[:, : extent + 7] = True  # run crossing one chunk boundary
    patterns.append(v.copy())
    for valid in patterns:
        ops, counts = shift_compact_full_order(
            (jnp.asarray(w0),), jnp.asarray(valid), F, S,
            extent=extent, interpret=True,
        )
        n = int(np.asarray(counts)[0])
        assert n == valid.sum()
        np.testing.assert_array_equal(
            np.asarray(ops[0])[0, :n], w0[0][valid[0]]
        )


@pytest.mark.parametrize(
    "F,S,extent,density,with_zs",
    [
        (1, 16384, 8192, 0.6, False),
        (2, 32768, 8192, 0.5, True),
        (1, 16384, 16384, 1.0, False),
        (2, 16384, 8192, 0.0, True),
        (3, 24576, 8192, 0.3, False),
        (1, 8192, 2048, 0.55, True),
        (1, 32768, 16384, 0.95, False),
    ],
)
def test_merge_free_interleave_matches_sort(
    F, S, extent, density, with_zs, monkeypatch
):
    """Round 7: the MXU per-pixel interleave + merge-free kernel
    (TPU_VPCC_MM_IL) compacts bit-identically to the unique-key sort.
    Random FULL-32-bit words also certify the f32 split exactness (the
    15/15 split's high half is 17 bits < 2^24)."""
    monkeypatch.setenv("TPU_VPCC_MM_IL", "1")
    monkeypatch.delenv("TPU_VPCC_NO_MM_IL", raising=False)
    r = np.random.default_rng(S * 7 + F)
    w0 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    zs = (
        r.integers(0, 1 << 16, (F, S), dtype=np.uint16) if with_zs else None
    )
    wc = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    valid = r.random((F, S)) < density
    sort_ops, ops, counts = _run_both(w0, zs, wc, valid, F, S, extent)
    if with_zs:
        assert ops[1].dtype == jnp.uint16
    for f in range(F):
        n = counts[f]
        assert n == valid[f].sum()
        for a, b in zip(sort_ops, ops):
            np.testing.assert_array_equal(
                np.asarray(a)[f, :n], np.asarray(b)[f, :n]
            )


@pytest.mark.parametrize("pred", ["skip", "bits"])
@pytest.mark.parametrize("mm_il", [False, True])
def test_pred_variants_match_sort(pred, mm_il, monkeypatch):
    """Round 7: the work-predicated kernels (TPU_VPCC_PRED=skip/bits)
    compact bit-identically to the unique-key sort on both the merge
    and MXU-interleave layouts, including EMPTY chunks (the skip path
    must preserve the carried pending block by construction) and a
    dense tail (the bits path's per-chunk shift bound must dominate
    every realized shift)."""
    monkeypatch.setenv("TPU_VPCC_PRED", pred)
    if mm_il:
        monkeypatch.setenv("TPU_VPCC_MM_IL", "1")
        monkeypatch.delenv("TPU_VPCC_NO_MM_IL", raising=False)
    else:
        monkeypatch.setenv("TPU_VPCC_NO_MM_IL", "1")
        monkeypatch.delenv("TPU_VPCC_MM_IL", raising=False)
    F, S, extent = 2, 32768, 8192
    half = S // 2
    r = np.random.default_rng(41)
    w0 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    wc = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    # frame 0: empty middle chunks (bucket-padding shape), dense tail;
    # frame 1: sparse random — mixed shbits across chunks
    valid = np.zeros((F, S), bool)
    valid[0, : extent // 4] = True
    valid[0, half - extent // 2 :] = True  # fully dense final chunk
    valid[1] = r.random(S) < 0.2
    sort_ops, ops, counts = _run_both(w0, None, wc, valid, F, S, extent)
    for f in range(F):
        n = counts[f]
        assert n == valid[f].sum()
        for a, b in zip(sort_ops, ops):
            np.testing.assert_array_equal(
                np.asarray(a)[f, :n], np.asarray(b)[f, :n]
            )


@pytest.mark.parametrize("pred", ["skip", "bits"])
def test_pred_variants_full_order(pred, monkeypatch):
    """Predication on the merge-free full-order (wide-path) kernel."""
    from tpu_vpcc.ops.shift_compact import shift_compact_full_order

    monkeypatch.setenv("TPU_VPCC_PRED", pred)
    F, S, extent = 1, 16384, 4096
    r = np.random.default_rng(43)
    w0 = r.integers(0, 1 << 32, (F, S), dtype=np.uint32)
    valid = np.zeros((F, S), bool)
    valid[:, :128] = True
    valid[:, S - extent :] = True  # empty middle chunks, dense last
    ops, counts = shift_compact_full_order(
        (jnp.asarray(w0),), jnp.asarray(valid), F, S,
        extent=extent, interpret=True,
    )
    n = int(np.asarray(counts)[0])
    assert n == valid.sum()
    np.testing.assert_array_equal(
        np.asarray(ops[0])[0, :n], w0[0][valid[0]]
    )


def test_interleave_pairs_mm_exactness():
    """The 256x256 interleave permutation matmul is bit-exact for
    <=24-bit operands (one term per output)."""
    from tpu_vpcc.ops.shift_compact import _interleave_pairs_mm

    r = np.random.default_rng(31)
    F, half = 2, 1024
    a0 = r.integers(0, 1 << 24, (F, half), dtype=np.uint32)
    a1 = r.integers(0, 1 << 24, (F, half), dtype=np.uint32)
    b0 = r.integers(0, 1 << 18, (F, half), dtype=np.uint32)
    b1 = r.integers(0, 1 << 18, (F, half), dtype=np.uint32)
    outs = _interleave_pairs_mm(
        [(jnp.asarray(a0), jnp.asarray(a1)),
         (jnp.asarray(b0), jnp.asarray(b1))], F, half
    )
    for (x0, x1), o in zip([(a0, a1), (b0, b1)], outs):
        want = np.stack([x0, x1], axis=-1).reshape(F, 2 * half)
        np.testing.assert_array_equal(np.asarray(o), want)


def test_mxu_cumsum_matches_jnp(monkeypatch):
    """The blockwise MXU scan (_dest_cumsum) is bit-exact vs jnp.cumsum
    for every lane-divisible extent (s01 in {0,1,2} is bf16-exact; row
    sums are f32-exact — see the docstring's exactness argument)."""
    from tpu_vpcc.ops.shift_compact import _CS_LANES, _dest_cumsum

    r = np.random.default_rng(21)
    for F, half in [(1, _CS_LANES), (3, _CS_LANES * 7), (2, _CS_LANES * 16)]:
        s01 = r.integers(0, 3, (F, half)).astype(np.int32)
        monkeypatch.setenv("TPU_VPCC_MM_CS", "1")
        monkeypatch.delenv("TPU_VPCC_NO_MM_CS", raising=False)
        mm = np.asarray(_dest_cumsum(jnp.asarray(s01), F, half))
        np.testing.assert_array_equal(mm, np.cumsum(s01, axis=1))
    # non-divisible extent falls back to jnp.cumsum
    s01 = r.integers(0, 3, (1, _CS_LANES + 64)).astype(np.int32)
    out = np.asarray(_dest_cumsum(jnp.asarray(s01), 1, _CS_LANES + 64))
    np.testing.assert_array_equal(out, np.cumsum(s01, axis=1))


def test_mxu_tile_transpose_matches_select(monkeypatch):
    """The MXU matmul orientation fix (tiled._tile_transpose_mm) is
    bit-exact vs where(sw, transpose, t) over the full packed-plane
    bit range (21-bit plane A, 30-bit planes B/C)."""
    from tpu_vpcc.ops.tiled import _tile_transpose_mm

    r = np.random.default_rng(22)
    for FG, tile in [(5, 16), (64, 16), (9, 4)]:
        ta = r.integers(0, 1 << 21, (FG, tile, tile)).astype(np.uint32)
        tb = r.integers(0, 1 << 30, (FG, tile, tile)).astype(np.uint32)
        tc = r.integers(0, 1 << 30, (FG, tile, tile)).astype(np.uint32)
        sw = (r.integers(0, 2, (FG,)) == 1)[:, None, None]
        outs = _tile_transpose_mm(
            jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(tc),
            jnp.asarray(sw), tile,
        )
        for t, o in zip((ta, tb, tc), outs):
            np.testing.assert_array_equal(
                np.asarray(o), np.where(sw, t.transpose(0, 2, 1), t)
            )


def test_shift_supported_gate():
    assert shift_supported(3072 * 512, DEFAULT_EXTENT)
    assert not shift_supported(3072 * 512 + LANES, DEFAULT_EXTENT)
    assert not shift_supported(1 << 20, 1 << 18)  # extent above budget
    assert not shift_supported(1 << 20, 1024)  # below 2*ALIGN granularity
