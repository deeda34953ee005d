"""Multi-stream batched decoding (BASELINE.json config 5).

Decodes several V3C bitstreams concurrently: the host stages (V3C parse +
HEVC sub-stream decode) run in a thread pool, one worker per stream, and
frames from all streams are reconstructed in shared device batches — GOFs
whose :class:`~tpu_vpcc.runtime.pipeline.DeviceInputs` share a batch key
(equal ``FrameConfig`` + layout) are concatenated along the frame axis and
dispatched to the device together, one compiled kernel for all of them.
With a ``mesh``, each shared batch additionally shards frames over the
mesh's ``data`` axis and groups over ``space``
(``tpu_vpcc.parallel.spatial``).
"""

from __future__ import annotations

import logging
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, replace
from pathlib import Path
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from ..bitio import Bitstream
from ..reconstruction.pointset import PointSet3
from ..v3c.context import Context
from ..v3c.stream import SampleStreamV3CUnit
from ..runtime.pipeline import (
    DEVICE_BATCH,
    DeviceInputs,
    Params,
    _append_eom_points,
    _append_layer_frame,
    _append_plr_points,
    _append_raw_points,
    _dispatch_device,
    _emit_pointset,
    _gof_device_inputs,
    _gof_map_pair_view,
    _gof_tables_and_bucket,
    _merge_layer_sec_vals,
    _meta_has_plr,
    _reconstruct_gof_oracle,
    _secondary_gof_values,
    prepare_gof,
)

log = logging.getLogger(__name__)


@dataclass
class _StreamState:
    index: int
    ssvu: SampleStreamV3CUnit
    next_frame: int = 0
    done: bool = False


def _concat_inputs(dis: List[DeviceInputs]) -> DeviceInputs:
    """Merge same-key DeviceInputs along the frame axis (one dispatch)."""
    if len(dis) == 1:
        return dis[0]
    arrays = tuple(
        None
        if dis[0].arrays[i] is None  # host-pack cat-mode: (fields, cat,
        else np.concatenate([di.arrays[i] for di in dis])  # None x 5)
        for i in range(7)
    )
    return DeviceInputs(
        cfg=dis[0].cfg,
        use_tiled=dis[0].use_tiled,
        arrays=arrays,
        n_frames=sum(di.n_frames for di in dis),
        color_mode=dis[0].color_mode,
    )


def _dispatch_chunked(di: DeviceInputs, mesh=None):
    """Dispatch a (possibly merged) batch in DEVICE_BATCH-sized chunks,
    returning the flat per-frame result list."""
    chunk = DEVICE_BATCH * (mesh.shape["data"] if mesh is not None else 1)
    out = []
    for i in range(0, di.n_frames, chunk):
        sub = DeviceInputs(
            cfg=di.cfg,
            use_tiled=di.use_tiled,
            arrays=tuple(
                None if a is None else a[i : i + chunk] for a in di.arrays
            ),
            n_frames=min(chunk, di.n_frames - i),
            color_mode=di.color_mode,
        )
        out.extend(_dispatch_device(sub, mesh=mesh))
    return out


def decode_streams_batched(
    paths: Sequence,
    max_host_workers: int = 8,
    mesh=None,
    coalesce_initial: bool = True,
    params: Params = None,
) -> Iterator[Tuple[int, int, PointSet3]]:
    """Decode multiple streams, yielding (stream_index, frame_index, frame).

    GOFs across streams are host-prepared concurrently; every wave of
    prepared GOFs is grouped by device-batch key and each group runs as
    ONE concatenated device dispatch (chunked at the device batch size).
    With ``coalesce_initial`` the first wave waits for every stream's
    first GOF so all streams share the first dispatch (they start
    together; later waves take whatever has completed). Yields in
    completion order across streams; frames within a stream are in order.

    ``params`` carries the same decode options as the single-stream
    ``Decoder`` (smoothing toggles, per-GOF video threads, oracle
    fallback, mesh) and applies to every stream; the explicit ``mesh``
    argument wins over ``params.mesh`` when both are given.
    """
    params = params if params is not None else Params()
    mesh = mesh if mesh is not None else params.mesh
    space = mesh.shape["space"] if mesh is not None else 1
    states = []
    for i, path in enumerate(paths):
        data = Path(path).read_bytes()
        states.append(
            _StreamState(index=i, ssvu=SampleStreamV3CUnit.from_bitstream(Bitstream(data)))
        )

    def prep(state: _StreamState):
        if state.ssvu.get_v3c_unit_count() == 0:
            return state, None
        context = Context()
        state.ssvu.decode_gof(context)
        return state, prepare_gof(
            context,
            num_video_threads=max(1, params.num_threads),
            tiled=params.use_device,
            apply_geo_smoothing=params.apply_geo_smoothing_type,
            apply_attr_smoothing=params.apply_attr_smoothing_type,
            apply_occupancy_synthesis=params.apply_occupancy_synthesis_type,
        )

    with ThreadPoolExecutor(max_workers=max_host_workers) as pool:
        pending = {pool.submit(prep, s) for s in states}
        first_wave = coalesce_initial
        while pending:
            when = "ALL_COMPLETED" if first_wave else FIRST_COMPLETED
            finished, pending = wait(pending, return_when=when)
            first_wave = False
            # one wave: every GOF whose host prep has completed by now
            items = []  # (state, gof, DeviceInputs, prebuilt, g_bucket)
            for fut in finished:
                state, gof = fut.result()
                if gof is None or not gof.metas:
                    state.done = True
                    continue
                if not params.use_device:
                    # oracle fallback: per-stream scalar path (debug/CI)
                    for ps in _reconstruct_gof_oracle(gof):
                        yield state.index, state.next_frame, ps
                        state.next_frame += 1
                    pending.add(pool.submit(prep, state))
                    continue
                layer_views = []
                if gof.map_count > 2:
                    # >2 maps: the batched dispatch covers the map-0/1
                    # pair; trailing layers run per GOF after it (the
                    # same drop_map0 passes the single-stream driver
                    # uses — see _reconstruct_gof_device)
                    layer_views = [
                        _gof_map_pair_view(gof, m - 1)
                        for m in range(2, gof.map_count)
                    ]
                    gof = _gof_map_pair_view(gof, 0)
                if gof.sec_attrs or layer_views:
                    # share the tables/bucket with the secondary twin /
                    # layer dispatches instead of rebuilding them per GOF
                    cfg_t, tables_t, g_b = _gof_tables_and_bucket(
                        gof, space
                    )
                    prebuilt = (cfg_t, tables_t)
                else:
                    prebuilt = g_b = None
                items.append((state, gof, _gof_device_inputs(
                    gof, space_multiple=space,
                    prebuilt=prebuilt, g_bucket=g_b,
                ), prebuilt, g_b, layer_views))
                pending.add(pool.submit(prep, state))

            by_key: Dict[object, list] = {}
            for it in items:
                by_key.setdefault(it[2].batch_key, []).append(it)
            for group in by_key.values():
                merged = _concat_inputs([it[2] for it in group])
                results = _dispatch_chunked(merged, mesh=mesh)
                offset = 0
                for state, gof, di, prebuilt, g_b, layer_views in group:
                    sec_vals = (
                        _secondary_gof_values(
                            gof, mesh=mesh, prebuilt=prebuilt, g_bucket=g_b
                        )
                        if gof.sec_attrs else None
                    )
                    layer_results = None
                    if layer_views:
                        lcfg = replace(prebuilt[0], drop_map0=True)
                        layer_results = [
                            _dispatch_chunked(
                                _gof_device_inputs(
                                    lv, space_multiple=space,
                                    prebuilt=(lcfg, prebuilt[1]),
                                    g_bucket=g_b,
                                ),
                                mesh=mesh,
                            )
                            for lv in layer_views
                        ]
                        if sec_vals is not None:
                            for lv in layer_views:
                                _merge_layer_sec_vals(
                                    sec_vals,
                                    _secondary_gof_values(
                                        lv, mesh=mesh,
                                        prebuilt=(lcfg, prebuilt[1]),
                                        g_bucket=g_b,
                                    ),
                                )
                    for j, (pos, col) in enumerate(
                        results[offset : offset + di.n_frames]
                    ):
                        ps = _emit_pointset(pos, col, gof)
                        if layer_results is not None:
                            for lres in layer_results:
                                _append_layer_frame(ps, *lres[j], gof)
                        if sec_vals is not None:
                            ps.extra_attrs = sec_vals[j]
                        meta = gof.metas[j]
                        # the same tail order as the single-stream GOF
                        # driver: PLR, then EOM, then raw
                        if _meta_has_plr(gof, meta):
                            _append_plr_points(ps, gof, meta)
                        if meta.eom_patches:
                            _append_eom_points(ps, gof, meta)
                        if meta.raw_patches:
                            _append_raw_points(ps, gof, meta)
                        yield state.index, state.next_frame, ps
                        state.next_frame += 1
                    offset += di.n_frames


def decode_streams(paths: Sequence, **kw) -> List[List[PointSet3]]:
    """Convenience wrapper: fully decode all streams, returning per-stream
    ordered frame lists."""
    out: Dict[int, List[PointSet3]] = {i: [] for i in range(len(paths))}
    for stream_idx, _frame_idx, ps in decode_streams_batched(paths, **kw):
        out[stream_idx].append(ps)
    return [out[i] for i in range(len(paths))]
