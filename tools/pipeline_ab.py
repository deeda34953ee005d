"""A/B the pipelined GOF reconstruction (Params.pipeline_gofs) on the
real device: depth 1 (serial) vs depth 2 (GOF k's fetch overlaps GOF
k+1's dispatch). Both depths run the IDENTICAL compiled graphs — only
host threading differs — so the comparison is clean. Interleaved
A/B/A/B per the repo's probe discipline (congestion drift once produced
a phantom -0.062; read pairwise on drifting pools).

Usage: python tools/pipeline_ab.py [n_gofs] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_gofs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.utils.fixtures import build_fixture_stream, concat_streams
    from tpu_vpcc.utils.synthetic import make_synthetic_frame

    rng = np.random.default_rng(0)
    gofs = []
    for g in range(n_gofs):
        frames = [
            make_synthetic_frame(
                rng, width=320, height=320, occupancy_resolution=16,
                occupancy_precision=4, n_patches=12, frame_index=i,
            )
            for i in range(2)
        ]
        gofs.append(build_fixture_stream(frames))
    stream = concat_streams(gofs)
    print(f"stream: {n_gofs} GOFs x 2 frames, {len(stream)} bytes",
          flush=True)

    def run(depth):
        t0 = time.perf_counter()
        d = Decoder(Params(stream, pipeline_gofs=depth))
        d.start()
        n = sum(1 for _ in d)
        dt = time.perf_counter() - t0
        assert n == 2 * n_gofs
        return dt

    # warm both (same graphs; the second warm is cheap)
    print(f"warmup d1: {run(1):.3f}s", flush=True)
    print(f"warmup d2: {run(2):.3f}s", flush=True)

    times = {1: [], 2: []}
    for r in range(reps):
        for depth in (1, 2, 2, 1):  # ABBA within each rep
            times[depth].append(run(depth))
            print(f"rep {r} depth {depth}: {times[depth][-1]:.3f}s",
                  flush=True)
    for depth in (1, 2):
        ts = sorted(times[depth])
        print(f"depth {depth}: median {ts[len(ts) // 2]:.3f}s  "
              f"all {['%.3f' % t for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
