"""Mosaic probe set 3: the minor-dims-only interleave reshape and
fallback primitives.

  P9   jnp.stack([a,b], -1).reshape(R, 2L)  — lane interleave via a
       minor-dim reshape only (P3's failure reshaped across rows)
  P10  pltpu.repeat(x, 2, axis=1) semantics (element-repeat vs tile)
  P11  lax.rev (lane reversal)
  P12  in-kernel u16 stream of the P9 interleave (bitcastable payloads)
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv


def report(name, got, want):
    got = np.asarray(got)
    want = np.asarray(want)
    ok = got.shape == want.shape and np.array_equal(got, want)
    print(f"{name}: {'OK' if ok else 'FAIL'}"
          + ("" if ok else f" shape={got.shape} vs {want.shape}"))
    if not ok and got.shape == want.shape:
        print("   got ", got.reshape(-1)[:16])
        print("   want", want.reshape(-1)[:16])
    return ok


def run(name, kern, out_shape, *args):
    try:
        o = pl.pallas_call(kern, out_shape=out_shape, interpret=INTERPRET)(*args)
        return o
    except Exception as e:  # noqa: BLE001
        print(f"{name}: EXC {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    print("devices:", jax.devices())
    R, L = 8, 512
    a = (np.arange(R * L, dtype=np.int32) % 50001).reshape(R, L)
    b = ((np.arange(R * L, dtype=np.int32) * 3 + 7) % 50001).reshape(R, L)
    want = np.empty((R, 2 * L), np.int32)
    want[:, 0::2] = a
    want[:, 1::2] = b

    # P9 stack + minor reshape
    def kern9(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.stack([a_ref[:], b_ref[:]], axis=-1).reshape(R, 2 * L)

    o = run("P9", kern9, jax.ShapeDtypeStruct((R, 2 * L), jnp.int32),
            jnp.asarray(a), jnp.asarray(b))
    if o is not None:
        report("P9 minor-dim interleave reshape", o, want)

    # P10 repeat semantics
    def kern10(a_ref, o_ref):
        o_ref[:] = pltpu.repeat(a_ref[:], 2, axis=1)

    o = run("P10", kern10, jax.ShapeDtypeStruct((R, 2 * L), jnp.int32),
            jnp.asarray(a))
    if o is not None:
        elem = np.repeat(a, 2, axis=1)
        tile = np.concatenate([a, a], axis=1)
        if np.array_equal(np.asarray(o), elem):
            print("P10 pltpu.repeat: ELEMENT-repeat semantics")
        elif np.array_equal(np.asarray(o), tile):
            print("P10 pltpu.repeat: TILE-concat semantics")
        else:
            print("P10 pltpu.repeat: unknown semantics", np.asarray(o)[0, :6])

    # P11 lane reversal
    def kern11(a_ref, o_ref):
        o_ref[:] = jax.lax.rev(a_ref[:], dimensions=(1,))

    o = run("P11", kern11, jax.ShapeDtypeStruct((R, L), jnp.int32),
            jnp.asarray(a))
    if o is not None:
        report("P11 lax.rev lanes", o, a[:, ::-1])

    # P12 u16 interleave (the stream dtype the kernel actually uses)
    a16 = (a % 60000).astype(np.uint16)
    b16 = (b % 60000).astype(np.uint16)
    want16 = np.empty((R, 2 * L), np.uint16)
    want16[:, 0::2] = a16
    want16[:, 1::2] = b16

    def kern12(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.stack([a_ref[:], b_ref[:]], axis=-1).reshape(R, 2 * L)

    o = run("P12", kern12, jax.ShapeDtypeStruct((R, 2 * L), jnp.uint16),
            jnp.asarray(a16), jnp.asarray(b16))
    if o is not None:
        report("P12 u16 interleave reshape", o, want16)


if __name__ == "__main__":
    main()
