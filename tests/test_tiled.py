"""Tiled fast-path kernel: bit-exactness vs the baseline gather kernel
(which is itself diff-tested against the oracle)."""

import numpy as np
import pytest

from tpu_vpcc.atlas.groups import build_group_table
from tpu_vpcc.ops.reconstruct import make_config, reconstruct_frame
from tpu_vpcc.ops.tiled import (
    reconstruct_batch_tiled,
    reconstruct_frame_tiled,
    tiled_supported,
)
from tpu_vpcc.utils.synthetic import make_synthetic_frame


def frame_inputs(sf):
    gt = build_group_table(sf.meta)
    geo0 = sf.geo_planes[0]
    geo1 = sf.geo_planes[1] if sf.map_count > 1 else sf.geo_planes[0]
    return gt, (
        gt.fields,
        sf.occ_plane,
        geo0,
        geo1,
        np.stack([p[0] for p in sf.attr_planes]),
        np.stack([p[1] for p in sf.attr_planes]),
        np.stack([p[2] for p in sf.attr_planes]),
    )


def check_frame(sf, **cfg_kw):
    gt, inputs = frame_inputs(sf)
    assert gt.tiled_ok
    cfg = make_config(
        width=sf.meta.width,
        height=sf.meta.height,
        occupancy_resolution=sf.occupancy_resolution,
        occupancy_precision=sf.occupancy_precision,
        map_count=sf.map_count,
        **cfg_kw,
    )
    assert tiled_supported(cfg)
    p1, c1, n1 = reconstruct_frame(*inputs, cfg=cfg)
    p2, c2, n2 = reconstruct_frame_tiled(*inputs, cfg=cfg)
    n1, n2 = int(n1), int(n2)
    assert n1 == n2
    np.testing.assert_array_equal(np.asarray(p1)[:n1], np.asarray(p2)[:n1])
    np.testing.assert_array_equal(np.asarray(c1)[:n1], np.asarray(c2)[:n1])
    return n1


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_tiled_matches_baseline(seed):
    rng = np.random.default_rng(seed)
    sf = make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                              occupancy_precision=4, n_patches=4)
    assert check_frame(sf) > 0


def test_tiled_single_map():
    rng = np.random.default_rng(20)
    sf = make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                              occupancy_precision=2, map_count=1, n_patches=3)
    assert check_frame(sf) > 0


def test_tiled_differential_d1():
    rng = np.random.default_rng(21)
    sf = make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                              occupancy_precision=4, n_patches=4)
    assert check_frame(sf, absolute_d1=False) > 0


def test_tiled_res16():
    rng = np.random.default_rng(22)
    sf = make_synthetic_frame(rng, width=128, height=128, occupancy_resolution=16,
                              occupancy_precision=4, n_patches=5)
    assert check_frame(sf) > 0


def test_tiled_empty():
    rng = np.random.default_rng(23)
    sf = make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                              occupancy_precision=4, n_patches=3)
    sf.occ_plane[:] = 0
    assert check_frame(sf) == 0


def test_tiled_batch_matches_per_frame():
    rng = np.random.default_rng(24)
    frames = [
        make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                             occupancy_precision=4, n_patches=3, frame_index=0)
        for _ in range(3)
    ]
    cfg = make_config(width=64, height=64, occupancy_resolution=8,
                      occupancy_precision=4, map_count=2)
    per = [frame_inputs(f)[1] for f in frames]
    batch = tuple(np.stack([p[i] for p in per]) for i in range(7))
    bpos, bcol, bcnt = reconstruct_batch_tiled(*batch, cfg=cfg)
    for k, inputs in enumerate(per):
        p, c, n = reconstruct_frame_tiled(*inputs, cfg=cfg)
        n = int(n)
        assert int(bcnt[k]) == n
        np.testing.assert_array_equal(np.asarray(bpos[k])[:n], np.asarray(p)[:n])
        np.testing.assert_array_equal(np.asarray(bcol[k])[:n], np.asarray(c)[:n])


def test_compaction_variants_bit_exact():
    """Every alternative compaction strategy produces the identical
    compacted prefix (and count) as the production payload sort, on
    random payload words with a random validity mask — incl. F>1 frame
    folding and all-valid / all-invalid frames."""
    import jax.numpy as jnp

    from tpu_vpcc.ops.tiled import (
        _compact_words,
        _compact_words_key_iota,
        _compact_words_packed_sort,
        _compact_words_payload_sort,
        _compact_words_scatter,
    )

    from tpu_vpcc.ops.tiled import (
        _compact_words_narrow_stable,
        _compact_words_narrow_unique,
    )

    rng = np.random.default_rng(41)
    for F, S in ((1, 4096), (3, 2048), (2, 512)):
        # contract-consistent payload words (tiled path: 10-bit samples):
        # w0 = xs|ys<<16 (full u16 halves), w1 = zs|cy<<16 (cy 10-bit),
        # w2 = cu|cv<<16 (10-bit each)
        xs, ys, zs = (rng.integers(0, 2**16, (3, F, S), dtype=np.uint32)
                      .astype(np.uint32))
        cy, cu, cv = (rng.integers(0, 1024, (3, F, S), dtype=np.uint32)
                      .astype(np.uint32))
        w = np.stack([xs | (ys << 16), zs | (cy << 16), cu | (cv << 16)])
        valid = rng.random((F, S)) < rng.uniform(0.1, 0.9)
        valid[0, :] = True if F == 2 else valid[0, :]
        if F == 3:
            valid[1, :] = False  # an empty frame inside the batch
        args = (jnp.asarray(w[0]), jnp.asarray(w[1]), jnp.asarray(w[2]),
                jnp.asarray(valid), F, S)
        rp, rc, rcnt = [np.asarray(x) for x in _compact_words_payload_sort(*args)]
        for fn in (_compact_words, _compact_words_packed_sort,
                   _compact_words_key_iota, _compact_words_scatter,
                   _compact_words_narrow_stable, _compact_words_narrow_unique):
            p, c, cnt = [np.asarray(x) for x in fn(*args)]
            np.testing.assert_array_equal(cnt, rcnt, err_msg=fn.__name__)
            for f in range(F):
                n = int(rcnt[f])
                np.testing.assert_array_equal(
                    p[f, :n], rp[f, :n], err_msg=fn.__name__
                )
                np.testing.assert_array_equal(
                    c[f, :n], rc[f, :n], err_msg=fn.__name__
                )
