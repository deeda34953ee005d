"""Device-mesh data parallelism for batched reconstruction.

The workload's natural distributed axes (SURVEY.md §2.3) are:
  * ``data``  — frames within a GOF / concurrent streams (embarrassingly
    parallel, ``src/decoder.rs:186``),
  * ``space`` — slots within a frame (see ``tpu_vpcc.parallel.spatial``).

This module shards the frame batch across a 1D/2D ``jax.sharding.Mesh``
with NamedSharding annotations; XLA lays the frames out across chips and
no cross-chip collectives are needed on this axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.reconstruct import FrameConfig


def make_mesh(
    devices: Optional[Sequence] = None, data: int = 0, space: int = 1
) -> Mesh:
    """Build a ('data', 'space') mesh. With space=1 this is pure DP."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data <= 0:
        data = n // space
    if data * space != n:
        raise ValueError(f"mesh {data}x{space} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, space)
    return Mesh(dev_array, axis_names=("data", "space"))


def reconstruct_batch_data_parallel(
    mesh: Mesh,
    fields,
    occ,
    geo0,
    geo1,
    attr_y,
    attr_u,
    attr_v,
    cfg: FrameConfig,
):
    """Batched reconstruction with the frame axis sharded over 'data'.

    The batch size must be divisible by the 'data' axis size. Outputs come
    back with the same sharding (positions/colors/count per frame). Each
    device runs the flat-batch kernel on its local frames (vmap-free).
    """
    batch_spec = P("data")
    shard = NamedSharding(mesh, batch_spec)

    args = [fields, occ, geo0, geo1, attr_y, attr_u, attr_v]
    args = [jax.device_put(np.asarray(a), shard) for a in args]

    from ..ops.reconstruct import _flat_batch_impl
    from jax import shard_map

    def local(fields_b, occ_b, g0_b, g1_b, ay_b, au_b, av_b):
        return _flat_batch_impl(
            fields_b, occ_b, g0_b, g1_b, ay_b, au_b, av_b, cfg
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(batch_spec,) * 7,
        out_specs=(batch_spec, batch_spec, batch_spec),
        check_vma=False,
    )
    return jax.jit(fn)(*args)


def pad_batch(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the leading axis to a multiple (padding frames are empty)."""
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
