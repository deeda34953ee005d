"""tpu_vpcc — a TPU-native V-PCC (MPEG V3C) point-cloud decoding framework.

Capabilities mirror benclmnt/tmc2-rs (a Rust port of mpeg-pcc-tmc2 v18,
decoder-only, rec0 conformance): V3C sample-stream parsing and HEVC
sub-stream decode on the host, with all point-cloud reconstruction running
as batched whole-frame JAX/XLA/Pallas passes on TPU.

Public API (mirrors the reference ``tmc2rs::{Decoder, Params}``):

    from tpu_vpcc import Decoder, Params
    decoder = Decoder(Params("stream.bin"))
    decoder.start()
    for frame in decoder:          # PointSet3 per frame, in order
        ...
"""

__version__ = "0.1.0"

_LAZY = {
    "Decoder": ("tpu_vpcc.runtime.pipeline", "Decoder"),
    "Params": ("tpu_vpcc.runtime.pipeline", "Params"),
    "PointSet3": ("tpu_vpcc.reconstruction.pointset", "PointSet3"),
}


def __getattr__(name):
    # Lazy so that host-only users (bitstream tools) never pull in jax.
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'tpu_vpcc' has no attribute {name!r}")
