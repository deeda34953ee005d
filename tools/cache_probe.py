"""Diagnose persistent-compile-cache behavior on this backend.

The extras' pipeline jits persist to .jax_cache, but the bench-local
jits (`once`/`chained`) never have (round-4/5 observation: every fresh
official run re-pays their compile, 60 s - 27 min under congestion).
This probe compiles the same production-shaped graph with the
compilation-cache logger at DEBUG and reports every attempted write and
its outcome, so the failure mode (size cap, unsupported serialization,
silent skip) is visible instead of inferred.

Usage:  python tools/cache_probe.py [batch]
"""

from __future__ import annotations

import logging
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

logging.basicConfig(level=logging.WARNING)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402


def main() -> int:
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    # the sitecustomize imports jax before this script's env setdefault,
    # so the dir must be set through the config API (see bench.py)
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from tpu_vpcc.models.flagship import (  # noqa: E402
        FlagshipConfig,
        bucket_flagship_inputs,
        example_batch_inputs,
    )
    from tpu_vpcc.ops.tiled import (  # noqa: E402
        _flat_pretiled_impl,
        narrow_emit_ok,
        tile_plane,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = FlagshipConfig(batch=batch)
    fcfg = cfg.frame_config()
    raw = example_batch_inputs(cfg, occupancy_fill=0.7, n_patches=48)
    raw, fcfg, g_bucket, _ = bucket_flagship_inputs(raw, fcfg)
    res = fcfg.occupancy_resolution
    inputs = (
        raw[0],
        tile_plane(raw[1], res // fcfg.occupancy_precision),
        tile_plane(raw[2], res),
        tile_plane(raw[3], res),
        tile_plane(raw[4], res),
        tile_plane(raw[5], res // 2),
        tile_plane(raw[6], res // 2),
    )
    packed = narrow_emit_ok(fcfg, batch, g_bucket * fcfg.slots_per_group)

    @jax.jit
    def once(fields, occ, geo0, geo1, ay, au, av):
        return _flat_pretiled_impl(
            fields, occ, geo0, geo1, ay, au, av, fcfg, _packed_out=packed
        )

    cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    before = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    print(f"cache entries before: {len(before)}", flush=True)
    out = once(*inputs)
    cnt = np.asarray(out[1] if packed else out[2])
    print(f"compiled+ran once: counts={cnt.tolist()}", flush=True)

    @jax.jit
    def chained(n, fields, occ, geo0, geo1, ay, au, av):
        def body(i, carry):
            bump = jnp.where(carry < 0, 1, 0)
            o = _flat_pretiled_impl(
                fields, occ + bump.astype(occ.dtype), geo0, geo1,
                ay + bump.astype(ay.dtype), au, av, fcfg,
                _packed_out=packed,
            )
            if packed:
                ops, cnt = o
                probe = sum(x[0, 0].astype(jnp.int32) for x in ops)
            else:
                pos, col, cnt = o
                probe = pos[0, 0, 0].astype(jnp.int32)
            return carry + cnt.sum() + probe
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    _ = np.asarray(chained(np.int32(2), *inputs))
    print("compiled+ran chained", flush=True)
    after = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    print(f"cache entries after: {len(after)}; new: {sorted(after - before)}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
