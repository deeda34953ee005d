"""Flagship model: the whole-frame V-PCC reconstruction pipeline.

Bundles a :class:`~tpu_vpcc.ops.reconstruct.FrameConfig` with input
construction and the jittable apply function — the unit that the graft
entry, the benchmark, and the multi-chip dry-run all drive. "Model" here
is the decoder's compute graph (this framework has no trainable
parameters; the reference is a decoder, SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import numpy as np

from ..atlas.groups import build_group_table
from ..ops.reconstruct import FrameConfig, make_config, _reconstruct_frame_impl
from ..utils.synthetic import make_synthetic_frame


@dataclass
class FlagshipConfig:
    """8iVFB-class single-stream configuration (BASELINE.json config 1)."""

    width: int = 1280
    height: int = 1280
    occupancy_resolution: int = 16
    occupancy_precision: int = 4
    map_count: int = 2
    batch: int = 4  # frames reconstructed per device step

    def frame_config(self) -> FrameConfig:
        return make_config(
            width=self.width,
            height=self.height,
            occupancy_resolution=self.occupancy_resolution,
            occupancy_precision=self.occupancy_precision,
            map_count=self.map_count,
        )


def example_frame_inputs(
    cfg: FlagshipConfig,
    seed: int = 0,
    n_patches: int = 48,
    occupancy_fill: float = 0.7,
) -> Tuple:
    """Synthetic single-frame inputs shaped like a real 8iVFB frame."""
    rng = np.random.default_rng(seed)
    sf = make_synthetic_frame(
        rng,
        width=cfg.width,
        height=cfg.height,
        occupancy_resolution=cfg.occupancy_resolution,
        occupancy_precision=cfg.occupancy_precision,
        map_count=cfg.map_count,
        n_patches=n_patches,
        occupancy_fill=occupancy_fill,
    )
    gt = build_group_table(sf.meta)
    return (
        gt.fields,
        sf.occ_plane,
        sf.geo_planes[0],
        sf.geo_planes[1] if cfg.map_count > 1 else sf.geo_planes[0],
        np.stack([p[0] for p in sf.attr_planes]),
        np.stack([p[1] for p in sf.attr_planes]),
        np.stack([p[2] for p in sf.attr_planes]),
    )


def example_batch_inputs(cfg: FlagshipConfig, seed: int = 0, **kw) -> Tuple:
    """Batched (GOF-shaped) inputs: leading frame axis on every array."""
    frames = [example_frame_inputs(cfg, seed=seed + k, **kw) for k in range(cfg.batch)]
    return tuple(np.stack([f[i] for f in frames]) for i in range(7))


def forward_fn(cfg: FlagshipConfig):
    """The jittable single-frame forward step (positions, colors16, count),
    using the baseline gather kernel (works for any geometry)."""
    return functools.partial(_reconstruct_frame_impl, cfg=cfg.frame_config())


def example_pretiled_batch_inputs(cfg: FlagshipConfig, seed: int = 0, **kw) -> Tuple:
    """Batched inputs in the block-tiled layout of the fast path."""
    from ..ops.tiled import tile_plane

    raw = example_batch_inputs(cfg, seed=seed, **kw)
    res = cfg.occupancy_resolution
    return (
        raw[0],
        tile_plane(raw[1], res // cfg.occupancy_precision),
        tile_plane(raw[2], res),
        tile_plane(raw[3], res),
        tile_plane(raw[4], res),
        tile_plane(raw[5], res // 2),
        tile_plane(raw[6], res // 2),
    )


def fast_forward_fn(cfg: FlagshipConfig):
    """The production fast path: pre-tiled batched forward step."""
    from ..ops.tiled import _flat_pretiled_impl

    return functools.partial(_flat_pretiled_impl, cfg=cfg.frame_config())


def bucket_flagship_inputs(raw, fcfg):
    """Apply the production dispatch's group-axis bucketing and pack30
    gating to flagship example inputs — THE shared implementation for
    bench.py and the experiment tools, so the measured config can never
    drift from what `_gof_device_inputs` would dispatch.

    Returns ``(raw_bucketed, fcfg', g_bucket, n_live)``.
    """
    from dataclasses import replace

    from ..atlas import groups as G

    n_live = int(raw[0][:, :, G.G_VALID].sum(axis=1).max())
    g_bucket = G.bucket_group_count(n_live, raw[0].shape[1])
    raw = (np.ascontiguousarray(raw[0][:, :g_bucket]),) + tuple(raw[1:])
    pack30 = all(
        G.coords_fit_10bit(
            raw[0][k], g_bucket, fcfg.group_tile, fcfg.geo_shift,
            fcfg.absolute_d1,
        )
        for k in range(raw[0].shape[0])
    )
    from ..ops.tiled import choose_compaction

    _shift, _split_k, _split_batched = choose_compaction(
        g_bucket, fcfg.slots_per_group, fcfg.cell_groups
    )
    fcfg = replace(
        fcfg,
        pack30=pack30,
        shift_compact=_shift,
        sort_split=_split_k,
        sort_split_batched=_split_batched,
    )
    return raw, fcfg, g_bucket, n_live


def example_cell_batch_inputs(
    cfg: FlagshipConfig, seed: int = 0, n_patches: int = 48,
    occupancy_fill: float = 0.7, **kw,
):
    """Batched inputs for the CELL-granular fast path: per-frame cell
    tables (padded to the shared bucket) + planes tiled at the precision
    cell edge. Returns (inputs, n_cells_max)."""
    from ..atlas.groups import (
        N_GROUP_FIELDS,
        bucket_group_count,
        build_cell_table,
    )
    from ..ops.tiled import tile_plane
    from ..utils.synthetic import make_synthetic_frame

    prec = cfg.occupancy_precision
    frames = []
    tables = []
    for k in range(cfg.batch):
        rng = np.random.default_rng(seed + k)
        sf = make_synthetic_frame(
            rng,
            width=cfg.width,
            height=cfg.height,
            occupancy_resolution=cfg.occupancy_resolution,
            occupancy_precision=prec,
            map_count=cfg.map_count,
            n_patches=n_patches,
            occupancy_fill=occupancy_fill,
            **kw,
        )
        frames.append(sf)
        tables.append(
            build_cell_table(
                sf.meta, sf.occ_plane, prec,
                occupancy_resolution=cfg.occupancy_resolution,
            )
        )
    n_max = max(t.n_groups for t in tables)
    cell_cap = (cfg.width // prec) * (cfg.height // prec)
    bucket = bucket_group_count(n_max, cell_cap)
    fields = np.zeros((cfg.batch, bucket, N_GROUP_FIELDS), np.int32)
    for k, t in enumerate(tables):
        fields[k, : t.n_groups] = t.fields[: t.n_groups]

    def stack(get):
        return np.stack([get(sf) for sf in frames])

    geo0 = stack(lambda sf: sf.geo_planes[0])
    geo1 = stack(
        lambda sf: sf.geo_planes[1] if cfg.map_count > 1 else sf.geo_planes[0]
    )
    ay = stack(lambda sf: np.stack([p[0] for p in sf.attr_planes]))
    au = stack(lambda sf: np.stack([p[1] for p in sf.attr_planes]))
    av = stack(lambda sf: np.stack([p[2] for p in sf.attr_planes]))
    occ_dummy = np.zeros((cfg.batch, 1, 1, 1), np.uint8)
    inputs = (
        fields,
        occ_dummy,
        tile_plane(geo0, prec),
        tile_plane(geo1, prec),
        tile_plane(ay, prec),
        tile_plane(au, prec // 2),
        tile_plane(av, prec // 2),
    )
    return inputs, n_max
