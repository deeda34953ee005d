"""Exact integer color conversion (ops/color.py) vs the reference f64
chain (``src/codec.rs:661-687``).

The r and b channels are verified over their COMPLETE domains here (2^20
pairs each). The g channel's complete 2^30 domain is proven offline by
tools/verify_color_exact.py (result in PERFORMANCE.md); this suite covers
g with full-y sweeps on adversarial chroma slices — the systematically
dangerous ones where the real offset 85*(a+b) lands exactly on or next to
an integer — plus a broad random sample.
"""

import numpy as np
import pytest

from tpu_vpcc.ops.color import (
    color_luts,
    convert_yuv10_to_rgb8_lut,
    rgb8_from_rgb16,
    rgb8_from_yuv16,
)
from tpu_vpcc.reconstruction.pointset import convert_yuv10_to_rgb8


def all_pairs_grid(chroma_axis: int):
    """(2^20, 3) u16 grid: all (y, chroma) pairs, other chroma fixed."""
    y, c = np.meshgrid(
        np.arange(1024, dtype=np.uint16),
        np.arange(1024, dtype=np.uint16),
        indexing="ij",
    )
    cols = np.full((1024 * 1024, 3), 512, dtype=np.uint16)
    cols[:, 0] = y.ravel()
    cols[:, chroma_axis] = c.ravel()
    return cols


@pytest.mark.parametrize("chroma_axis", [1, 2])
def test_full_domain_single_chroma(chroma_axis):
    """All 2^20 (y,u) / (y,v) pairs: covers r and b completely, plus the
    u=512 / v=512 g slices (where the offset is exactly integral)."""
    cols = all_pairs_grid(chroma_axis)
    np.testing.assert_array_equal(
        convert_yuv10_to_rgb8_lut(cols), convert_yuv10_to_rgb8(cols)
    )


def _g_offset_near_integer_uv(limit: int = 64):
    """(u, v) pairs whose real g offset 85*(0.18733*(u-512)+0.46813*(v-512))
    is within 1e-6 of an integer — the systematically dangerous cells."""
    d = np.arange(1024, dtype=np.float64) - 512.0
    s = 85.0 * (0.18733 * d[:, None] + 0.46813 * d[None, :])
    frac = np.abs(s - np.rint(s))
    uv = np.argwhere(frac < 1e-6)
    return uv[:limit]


def test_g_adversarial_slices():
    """Full y sweep on every near-integer-offset (u, v) cell."""
    uv = _g_offset_near_integer_uv()
    assert len(uv) > 0
    y = np.arange(1024, dtype=np.uint16)
    for u, v in uv:
        cols = np.empty((1024, 3), dtype=np.uint16)
        cols[:, 0] = y
        cols[:, 1] = u
        cols[:, 2] = v
        np.testing.assert_array_equal(
            convert_yuv10_to_rgb8_lut(cols),
            convert_yuv10_to_rgb8(cols),
            err_msg=f"u={u} v={v}",
        )


def test_random_sample_full_triple_domain():
    rng = np.random.default_rng(7)
    cols = rng.integers(0, 1024, size=(200_000, 3)).astype(np.uint16)
    np.testing.assert_array_equal(
        convert_yuv10_to_rgb8_lut(cols), convert_yuv10_to_rgb8(cols)
    )


def test_device_matches_numpy_lut():
    """The jitted device form computes the same bytes as the numpy LUT
    form (and hence the f64 chain)."""
    import jax

    rng = np.random.default_rng(11)
    cols = rng.integers(0, 1024, size=(4096, 3)).astype(np.uint16)
    dev = np.asarray(jax.jit(rgb8_from_yuv16)(cols))
    assert dev.dtype == np.uint8
    np.testing.assert_array_equal(dev, convert_yuv10_to_rgb8_lut(cols))


def test_device_rgb16_truncation():
    import jax

    rng = np.random.default_rng(13)
    cols = rng.integers(0, 1024, size=(1024, 3)).astype(np.uint16)
    got = np.asarray(jax.jit(rgb8_from_rgb16)(cols))
    np.testing.assert_array_equal(got, (cols & 0xFF).astype(np.uint8))


def test_lut_tables_shapes_and_determinism():
    s_r, s_b, packed_g = color_luts()
    assert s_r.shape == (1024,) and s_b.shape == (1024,)
    assert packed_g.shape == (1024, 1024)
    # neutral chroma: channel == clamp(floor(y/1023*255)) with S == 0
    assert s_r[512] == 0 and s_b[512] == 0
    assert packed_g[512, 512] == 32768  # S == 0, no deviation mask
    again = color_luts()
    assert again[0] is s_r  # cached, read-only
    assert not packed_g.flags.writeable


def test_g_chain_deviation_sites_exact():
    """Every one of the 45 proven f64-chain deviation triples converts
    exactly through the packed-mask repair."""
    from tpu_vpcc.ops.color import _G_CHAIN_DEVIATIONS

    sites = np.array(sorted(_G_CHAIN_DEVIATIONS), dtype=np.uint16)
    assert len(sites) == 45
    np.testing.assert_array_equal(
        convert_yuv10_to_rgb8_lut(sites), convert_yuv10_to_rgb8(sites)
    )
    # and their whole neighborhoods (y±2 sweeps at the same chroma)
    for dy in (-2, -1, 1, 2):
        n = sites.copy()
        n[:, 0] = np.clip(n[:, 0].astype(np.int32) + dy, 0, 1023).astype(np.uint16)
        np.testing.assert_array_equal(
            convert_yuv10_to_rgb8_lut(n), convert_yuv10_to_rgb8(n)
        )
