"""Benchmark: whole-frame V-PCC reconstruction throughput on one chip.

Reconstructs a batch of synthetic 8iVFB-class frames (1280x1280 atlas,
16px blocks, occupancy precision 4, two geometry maps, ~1M points/frame)
with the flagship device pipeline and reports frames/sec.

Timing methodology: N kernel executions chained with a data dependency
inside a single jit (lax.fori_loop) and synced with a device_get — on
this environment's tunneled TPU backend, ``block_until_ready`` returns
before execution finishes, so naive per-dispatch timing reads as ~0 ms.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is fps / 300 (the BASELINE.json north-star: >=300 fps of
1M-point frames per v5e chip).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpu_vpcc.models.flagship import FlagshipConfig, example_batch_inputs
    from tpu_vpcc.ops.tiled import _flat_tiled_impl as _flat_batch_impl

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    loop_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    cfg = FlagshipConfig(batch=batch)
    fcfg = cfg.frame_config()
    host_inputs = example_batch_inputs(cfg, occupancy_fill=0.7, n_patches=48)

    dev = jax.devices()[0]
    inputs = [jax.device_put(a, dev) for a in host_inputs]

    @jax.jit
    def once(fields, occ, geo0, geo1, ay, au, av):
        return _flat_batch_impl(fields, occ, geo0, geo1, ay, au, av, fcfg)

    @jax.jit
    def loop(fields, occ, geo0, geo1, ay, au, av):
        def body(i, carry):
            # data-dependent (provably zero) perturbation defeats loop
            # hoisting so every iteration really runs the kernel
            bump = jnp.where(carry < 0, 1, 0).astype(occ.dtype)
            _, _, cnt = _flat_batch_impl(
                fields, occ + bump, geo0, geo1, ay, au, av, fcfg
            )
            return carry + cnt.sum()
        return jax.lax.fori_loop(0, loop_n, body, jnp.int32(0))

    # compile + points-per-frame
    pos, col, cnt = once(*inputs)
    counts = np.asarray(cnt)
    mean_points = float(counts.mean())
    _ = np.asarray(loop(*inputs))  # compile loop

    # --- device-true kernel throughput (chained loop, one sync) ----------
    t0 = time.perf_counter()
    _ = np.asarray(loop(*inputs))
    dt_loop = (time.perf_counter() - t0) / loop_n

    # --- dispatch-path wall time (per-batch dispatch + count fetch) ------
    t0 = time.perf_counter()
    for _ in range(loop_n):
        _, _, cnt = once(*inputs)
        np.asarray(cnt)
    dt_dispatch = (time.perf_counter() - t0) / loop_n

    fps = batch / dt_loop
    result = {
        "metric": "fps_1Mpt_frame_reconstruction",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 300.0, 3),
        "extras": {
            "mean_points_per_frame": int(mean_points),
            "mpoints_per_sec": round(mean_points * fps / 1e6, 1),
            "ms_per_frame_device": round(dt_loop / batch * 1000, 2),
            "ms_per_frame_dispatch_path": round(dt_dispatch / batch * 1000, 2),
            "batch": batch,
            "device": str(jax.devices()[0]),
            "atlas": f"{cfg.width}x{cfg.height}",
            "s_cap": fcfg.s_cap,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
