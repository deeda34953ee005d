"""End-to-end example: synthesize a scene, mux a V3C bitstream, decode it
back with the streaming API, and write PLY files.

    python examples/roundtrip.py [out_dir]

Everything runs locally: the scene generator and the lossless HEVC
encoder (libx265 through the native bridge) stand in for a V-PCC encoder;
the decode path is the same one used for real rec0 conformance streams.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# honor JAX_PLATFORMS even under a sitecustomize that imports jax before
# env vars are read (the config update after import is what switches
# backends there — same pattern as runtime/cli.py)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from tpu_vpcc import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.ply import write_ply
from tpu_vpcc.utils.synthetic import make_synthetic_frame


def main() -> int:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "roundtrip_out")
    out_dir.mkdir(parents=True, exist_ok=True)

    print("synthesizing a 4-frame scene (256x256 atlas)...")
    rng = np.random.default_rng(2024)
    frames = [
        make_synthetic_frame(
            rng, width=256, height=256, occupancy_resolution=16,
            occupancy_precision=4, n_patches=12, frame_index=i,
        )
        for i in range(4)
    ]

    print("encoding to a V3C sample stream (lossless HEVC sub-streams)...")
    stream = build_fixture_stream(frames)
    stream_path = out_dir / "stream.bin"
    stream_path.write_bytes(stream)
    print(f"  wrote {stream_path} ({len(stream)} bytes)")

    print("decoding with the streaming API...")
    decoder = Decoder(Params(stream))  # in-memory bytes work too
    t0 = time.time()
    decoder.start()
    for i, frame in enumerate(decoder):
        ply = out_dir / f"{i:04d}.ply"
        write_ply(frame, ply)
        print(f"  frame {i}: {len(frame)} points -> {ply}")
    print(f"done in {time.time() - t0:.2f}s")
    for gof in decoder.stats.gofs:
        print(" ", gof.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
