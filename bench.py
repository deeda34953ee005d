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
import os
import sys
import time

import numpy as np

# persistent compilation cache: the extras subprocesses (and repeat bench
# runs) reuse compiled executables instead of re-paying the 30s-5min
# tunneled compile. Lives INSIDE the repo (gitignored) so it survives
# /tmp cleanup between the development session and the driver's run.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

_T_START = time.perf_counter()


def _cache_file_count() -> int:
    try:
        return len(os.listdir(os.environ["JAX_COMPILATION_CACHE_DIR"]))
    except OSError:
        return -1


def _wait_for_gate(gate: str, timeout: float = 1200.0) -> None:
    """Block until the parent bench process touches the gate file (it does
    so only after the headline kernel measurement is done, so an extra's
    TPU work can never distort that timing). Falls through on timeout so
    an orphaned extra still produces a number — the timeout must exceed
    any plausible kernel-stage duration (559s observed on a congested
    tunnel), or the fall-through itself violates the one-TPU-job rule
    mid-measurement."""
    if not gate:
        return
    deadline = time.perf_counter() + timeout
    while time.perf_counter() < deadline:
        if os.path.exists(gate):
            return
        time.sleep(0.25)


def e2e_decoder_metric(
    gate: str = "",
    n_gofs: int = 3, frames_per_gof: int = 2, width: int = 640, height: int = 640,
):
    # frames_per_gof=2 == one DEVICE_BATCH chunk per GOF: the fewest
    # tunneled round trips that still exercise multi-GOF streaming —
    # under pool congestion each round trip can queue for minutes, and
    # a skipped e2e block costs the artifact more than a smaller sample.
    # n_gofs=3 (round 12, was 2): the pipelined decoder overlaps GOF
    # k's fetch with k+1's dispatch (measured ~-32% wall on this
    # tunnel, tools/pipeline_ab.py), which needs >= 2 overlap windows
    # to show; same graphs, so no extra compiles
    """Frames/sec through the full streaming Decoder on a synthetic
    multi-GOF stream: V3C parse + host HEVC decode + H2D + device
    reconstruction + D2H + exact color conversion. This container has
    ONE CPU core, so host video decode dominates (the stage breakdown
    quantifies it); the kernel metric above is the device-side number.
    """
    import time

    try:
        from tpu_vpcc.runtime.pipeline import Decoder, Params
        from tpu_vpcc.utils.fixtures import build_fixture_stream, concat_streams
        from tpu_vpcc.utils.synthetic import make_synthetic_frame
        from tpu_vpcc.video import encoder_supports

        if not (encoder_supports(8) and encoder_supports(10)):
            return {"skipped": "libx265 unavailable"}

        t_prep = time.perf_counter()
        rng = np.random.default_rng(0)
        gofs = []
        for g in range(n_gofs):
            frames = [
                make_synthetic_frame(
                    rng, width=width, height=height, occupancy_resolution=16,
                    occupancy_precision=4, n_patches=24, frame_index=i,
                )
                for i in range(frames_per_gof)
            ]
            gofs.append(build_fixture_stream(frames))
        stream = concat_streams(gofs)
        prep_s = time.perf_counter() - t_prep

        # host prep (x265 encode) overlapped the parent's compile; the TPU
        # part waits for the parent's go-ahead
        _wait_for_gate(gate)

        # warm-up decode below bears the XLA compilation (30s-5min cold
        # on this tunneled backend); the metric is the steady state
        cache_before = _cache_file_count()
        t_warm = time.perf_counter()
        warm = Decoder(Params(stream))
        warm.start()
        for _ in warm:
            pass
        warm_s = time.perf_counter() - t_warm

        t0 = time.perf_counter()
        decoder = Decoder(Params(stream))
        decoder.start()
        n_frames = 0
        n_points = 0
        for frame in decoder:
            n_frames += 1
            n_points += len(frame)
        wall = time.perf_counter() - t0
        stages = {k: round(v, 3) for k, v in decoder.stats.stage_totals().items()}
        return {
            "fps": round(n_frames / wall, 2),
            "frames": n_frames,
            "mean_points": int(n_points / max(n_frames, 1)),
            "wall_seconds": round(wall, 3),
            "prep_seconds": round(prep_s, 3),
            # warm-up bears the compiles; with a hitting persistent cache
            # warmup_seconds collapses toward wall_seconds (the recorded
            # file delta distinguishes hit from miss)
            "warmup_seconds": round(warm_s, 3),
            "cache_files_before": cache_before,
            "cache_files_after": _cache_file_count(),
            "stage_seconds": stages,
            "atlas": f"{width}x{height}",
            "host_cores": os.cpu_count(),
        }
    except Exception as e:  # the headline metric must never be lost
        return {"error": f"{type(e).__name__}: {e}"}


def multistream_metric(gate: str = "", n_streams: int = 8, frames_per_gof: int = 2,
                       width: int = 320, height: int = 320):
    """Aggregate frames/sec decoding n_streams concurrent bitstreams with
    cross-stream device batching (BASELINE config 5 shape, single chip).
    Host stages run in a thread pool; GOFs from all streams coalesce into
    shared dispatches. Steady-state (one warm-up pass)."""
    import tempfile
    import time
    from pathlib import Path

    try:
        from tpu_vpcc.parallel.batcher import decode_streams_batched
        from tpu_vpcc.utils.fixtures import build_fixture_stream
        from tpu_vpcc.utils.synthetic import make_synthetic_frame
        from tpu_vpcc.video import encoder_supports

        if not (encoder_supports(8) and encoder_supports(10)):
            return {"skipped": "libx265 unavailable"}

        rng = np.random.default_rng(1)
        frames = [
            make_synthetic_frame(
                rng, width=width, height=height, occupancy_resolution=16,
                occupancy_precision=4, n_patches=12, frame_index=i,
            )
            for i in range(frames_per_gof)
        ]
        stream = build_fixture_stream(frames)
        with tempfile.TemporaryDirectory() as td:
            paths = []
            for s in range(n_streams):
                p = Path(td) / f"s{s}.bin"
                p.write_bytes(stream)
                paths.append(p)

            _wait_for_gate(gate)
            cache_before = _cache_file_count()
            t_warm = time.perf_counter()
            for _ in decode_streams_batched(paths):  # warm-up (compile)
                pass
            warm_s = time.perf_counter() - t_warm
            t0 = time.perf_counter()
            n_frames = 0
            for _si, _fi, ps in decode_streams_batched(paths):
                n_frames += 1
            wall = time.perf_counter() - t0
        return {
            "aggregate_fps": round(n_frames / wall, 2),
            "streams": n_streams,
            "frames": n_frames,
            "wall_seconds": round(wall, 3),
            "warmup_seconds": round(warm_s, 3),
            "cache_files_before": cache_before,
            "cache_files_after": _cache_file_count(),
            "atlas": f"{width}x{height}",
        }
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"}


def tpu_parity_check(width: int = 128, height: int = 128, n_frames: int = 2):
    """Certify output correctness ON THE REAL DEVICE (VERDICT item 3):
    decode a small lossless fixture with the device pipeline (this
    process's backend — the TPU in the driver's run) and byte-compare
    positions/colors against the NumPy oracle. All other bit-exactness
    evidence is CPU-backend (the test suite forces jax_platforms=cpu);
    this is the one check that runs on the chip the headline number
    comes from."""
    try:
        import numpy as np

        from tpu_vpcc.runtime.pipeline import Decoder, Params
        from tpu_vpcc.utils.fixtures import build_fixture_stream
        from tpu_vpcc.utils.synthetic import make_synthetic_frame
        from tpu_vpcc.video import encoder_supports

        if not (encoder_supports(8) and encoder_supports(10)):
            return {"tpu_parity": "skipped: libx265 unavailable"}
        rng = np.random.default_rng(99)
        frames = [
            make_synthetic_frame(
                rng, width=width, height=height, occupancy_resolution=16,
                occupancy_precision=4, n_patches=5, frame_index=i,
            )
            for i in range(n_frames)
        ]
        stream = build_fixture_stream(frames)

        dev = Decoder(Params(stream))
        dev.start()
        dev_frames = list(dev)
        orc = Decoder(Params(stream, use_device=False))
        orc.start()
        orc_frames = list(orc)
        if len(dev_frames) != len(orc_frames):
            return {"tpu_parity": "FAIL: frame count mismatch"}
        for i, (a, b) in enumerate(zip(dev_frames, orc_frames)):
            if not (
                np.array_equal(a.positions, b.positions)
                and np.array_equal(a.colors, b.colors)
            ):
                npos = int((np.asarray(a.positions) != np.asarray(b.positions)).sum())
                ncol = int((np.asarray(a.colors) != np.asarray(b.colors)).sum())
                return {
                    "tpu_parity": f"FAIL: frame {i}: {npos} position and "
                    f"{ncol} color component mismatches"
                }
        return {
            "tpu_parity": "ok",
            "tpu_parity_frames": len(dev_frames),
            "tpu_parity_points": sum(len(f) for f in dev_frames),
        }
    except Exception as e:
        return {"tpu_parity": f"error: {type(e).__name__}: {e}"}


def tpu_family_parity(budget_s: float = 600.0):
    """Per-family ON-DEVICE byte-compare certification (round-4 VERDICT
    item 1): every decode-feature extension family — 45°, EOM, raw/aux,
    PLR, pixel-interleave, multi-tile + aux bands, 4:2:2, secondary
    attributes, smoothing, VUI, hash SEI — decodes a small fixture on
    THIS process's backend (the real TPU in the driver's run) and its
    full PLY output is byte-compared against the NumPy oracle. This
    converts the suite's CPU-only bit-exactness evidence into
    driver-visible on-chip certification (the reference's validation
    bar is conformance-by-comparison, ``README.md:16-21``). Families
    share atlas dims where possible so device graphs reuse compiles;
    the budget stops (and reports) remaining families rather than
    risking the headline."""
    import numpy as np

    from tpu_vpcc.runtime.pipeline import Decoder, Params
    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.ply import format_ply
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        return {"tpu_family_parity": "skipped: libx265 unavailable"}

    def mk(seed, n_frames=1, **kw):
        rng = np.random.default_rng(seed)
        return [
            make_synthetic_frame(
                rng, width=64, height=64, occupancy_resolution=8,
                occupancy_precision=4, n_patches=3, frame_index=i, **kw,
            )
            for i in range(n_frames)
        ]

    def fam_proj45():
        from tpu_vpcc.atlas.patches import Patch

        (sf,) = mk(99)
        for p, plane in zip(sf.meta.patches, (1, 2, 3)):
            views = [
                v for v, r in Patch._VIEW_TABLE.items()
                if r[0] == plane and r[4] == p.projection_mode
            ]
            p.set_view_id(views[0])
        return build_fixture_stream([sf]), {}

    def fam_eom():
        from tests.test_eom import make_eom_frame_1map

        return build_fixture_stream(
            [make_eom_frame_1map(np.random.default_rng(71))]
        ), {}

    def fam_plr():
        from tests.test_plr import make_plr_p_sequence

        return make_plr_p_sequence(seed=23)[1], {}

    def fam_aux_raw():
        from tests.test_aux_video import make_aux_frames

        return build_fixture_stream(
            make_aux_frames(seed=5, n_frames=1, with_main_raw=True)
        ), {}

    def fam_pixel_interleave():
        from tests.test_pixel_interleave import make_pix_il_stream

        return make_pix_il_stream(seed=7, n_frames=1)[1], {}

    def fam_multi_tile_aux():
        from tests.test_aux_multitile import (
            make_two_tile_frame,
            plant_banded_aux_raws,
        )

        rng = np.random.default_rng(61)
        sf = make_two_tile_frame(rng)
        plant_banded_aux_raws(rng, sf)
        return build_fixture_stream(
            [sf], tiles=(2, 1), aux_tile_row_heights=[1, 1]
        ), {}

    def fam_chroma422():
        frames = mk(31, map_count=2)
        return build_fixture_stream(
            frames, multi_map_streams=True, chroma422=True
        ), {}

    def fam_secondary_attrs():
        frames = mk(41, map_count=2)
        return build_fixture_stream(
            frames, secondary_attrs=[(3, 1, None), (0, 3, None)]
        ), {}

    def fam_smoothing():
        frames = mk(47, n_frames=2, map_count=2)
        return build_fixture_stream(
            frames, geo_smoothing_sei=(8, 16),
            attr_smoothing_sei=(8, 255, 1),
        ), dict(
            apply_geo_smoothing_type=True, apply_attr_smoothing_type=True
        )

    def fam_multi_map3():
        # >2 maps (round-5 extension): trailing-layer passes on device
        frames = mk(67, map_count=3)
        return build_fixture_stream(frames, multi_map_streams=True), {}

    def fam_vui():
        from tests.test_vui import rich_vui

        return build_fixture_stream(mk(53, map_count=2), vui=rich_vui()), {}

    def fam_atlas_hash():
        # hash VERIFICATION runs in-path on both decodes too
        return build_fixture_stream(
            mk(59, map_count=2), atlas_hash_sei=True
        ), {}

    families = [
        ("proj45", fam_proj45),
        ("eom", fam_eom),
        ("plr", fam_plr),
        ("aux_raw", fam_aux_raw),
        ("pixel_interleave", fam_pixel_interleave),
        ("multi_tile_aux", fam_multi_tile_aux),
        ("chroma422", fam_chroma422),
        ("secondary_attrs", fam_secondary_attrs),
        ("smoothing", fam_smoothing),
        ("multi_map3", fam_multi_map3),
        ("vui", fam_vui),
        ("atlas_hash", fam_atlas_hash),
    ]
    t0 = time.perf_counter()
    results = {}
    for name, builder in families:
        if time.perf_counter() - t0 > budget_s:
            results[name] = "skipped: family budget exhausted"
            continue
        try:
            stream, kw = builder()
            dev = Decoder(Params(bytes(stream), use_device=True, **kw))
            dev.start()
            dev_frames = list(dev)
            orc = Decoder(Params(bytes(stream), use_device=False, **kw))
            orc.start()
            orc_frames = list(orc)
            if len(dev_frames) != len(orc_frames) or not dev_frames:
                results[name] = (
                    f"FAIL: {len(dev_frames)} device vs "
                    f"{len(orc_frames)} oracle frames"
                )
                continue
            bad = [
                i for i, (a, b) in enumerate(zip(dev_frames, orc_frames))
                if format_ply(a) != format_ply(b)
            ]
            results[name] = (
                "ok" if not bad else f"FAIL: frames {bad} differ"
            )
        except Exception as e:
            results[name] = f"error: {type(e).__name__}: {e}"
    results["seconds"] = round(time.perf_counter() - t0, 1)
    return {"tpu_family_parity": results}


# total wall budget for one bench run; the driver's own timeout is
# unknown, but the round-3 official artifact survived ~750s (rc=0 with
# a 407s + 150s extras wait recorded), and round 8/9 rehearsals showed
# the full artifact (numeric e2e + multistream) needs up to ~20 min on
# a cold extras cache / congested pool. Losing the extras evidence has
# cost three rounds; spend the wall time.
_TOTAL_BUDGET_S = float(os.environ.get("TPU_VPCC_BENCH_BUDGET_S", "1500"))


def _spawn_extra(name: str, gate: str):
    """Launch an extras metric subprocess immediately (host prep overlaps
    the parent's compile; TPU work waits on the gate file)."""
    import subprocess
    import tempfile

    out = tempfile.NamedTemporaryFile(
        mode="w+", suffix=f"_{name}.out", delete=False
    )
    proc = subprocess.Popen(
        [sys.executable, __file__, "--extra", name, "--gate", gate],
        stdout=out, stderr=subprocess.DEVNULL,
    )
    return {"name": name, "proc": proc, "out": out, "gate": gate}


def _collect_extra(extra, deadline: float):
    """Release an extra's gate, wait for it within the global budget, and
    parse its JSON line. A hang or crash can never cost the headline."""
    try:
        with open(extra["gate"], "w"):
            pass
        # floor of 240s even when the kernel stage ate the budget: losing
        # the extras evidence (round-2 failure mode) costs more than the
        # overrun, prep has already been paid concurrently, and a warm-
        # cache extra still needs ~60-120s of import + queued dispatches
        # on a congested tunnel (150s proved marginal in round-8/9
        # rehearsals when the pool was busy)
        timeout = max(240.0, deadline - time.perf_counter())
        try:
            extra["proc"].wait(timeout=timeout)
        except Exception:
            extra["proc"].kill()
            return {"skipped": f"budget exhausted after {timeout:.0f}s wait"}
        extra["out"].seek(0)
        for line in reversed(extra["out"].read().strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"error": f"no output (rc={extra['proc'].returncode})"}
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"}
    finally:
        try:
            extra["out"].close()
            os.unlink(extra["out"].name)
            os.unlink(extra["gate"])
        except OSError:
            pass


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--extra":
        gate = ""
        if len(sys.argv) >= 5 and sys.argv[3] == "--gate":
            gate = sys.argv[4]
        fn = {"e2e": e2e_decoder_metric, "multistream": multistream_metric}[
            sys.argv[2]
        ]
        print(json.dumps(fn(gate=gate)))
        return 0

    # extras launch first: their CPU-heavy prep (x265 fixture encode) runs
    # while this process sits in tunnel-bound XLA compiles; their TPU work
    # is gated until the kernel measurement below is done, and the gates
    # are released one at a time so the extras never contend either.
    # TPU_VPCC_SKIP_EXTRAS=1 is the development fast path (kernel-only
    # iteration); the driver's official run never sets it.
    extras_procs = []
    skip_extras = bool(os.environ.get("TPU_VPCC_SKIP_EXTRAS"))
    try:
        if not skip_extras:
            gate_dir = f"/tmp/tpu_vpcc_bench_gates_{os.getpid()}"
            os.makedirs(gate_dir, exist_ok=True)
            for name in ("e2e", "multistream"):
                extras_procs.append(_spawn_extra(name, f"{gate_dir}/{name}.go"))
    except Exception:
        # never orphan an already-spawned extra: its gate would never be
        # released and it would eventually run TPU work unsupervised
        for e in extras_procs:
            for op in (e["proc"].kill, e["proc"].wait,
                       e["out"].close, lambda: os.unlink(e["out"].name)):
                try:
                    op()
                except Exception:
                    pass
        extras_procs = []

    import jax

    # The axon sitecustomize imports jax at INTERPRETER startup — before
    # this file's env-var setdefault runs — so the env var alone never
    # enables the cache in THIS process (only in spawned extras, which
    # inherit it). That, not an executable-size limit, is why the
    # bench-local jits re-compiled on every official run (round-5
    # diagnosis: tools/cache_probe.py logged "cache is disabled/not
    # initialized"). The config update works regardless of import order.
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    import jax.numpy as jnp

    from tpu_vpcc.models.flagship import FlagshipConfig, example_batch_inputs
    from tpu_vpcc.ops.tiled import (
        _flat_pretiled_impl,
        narrow_emit_ok,
        tile_plane,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    loop_n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    # int32 carry overflow guard: each chained run adds ~1M/frame to the
    # carry (any extra op on the carry chain — mod, min — measured
    # +0.19 ms/run by breaking fusion, so the add stays bare and the
    # chain length is bounded instead)
    K = 9
    max_loop = max(1, (2**31 - 1) // (batch * K * 3_000_000))
    loop_n = min(loop_n, max_loop)

    cfg = FlagshipConfig(batch=batch)
    fcfg = cfg.frame_config()
    raw = example_batch_inputs(cfg, occupancy_fill=0.7, n_patches=48)
    res = fcfg.occupancy_resolution
    # group-axis bucketing + pack30 gating, exactly as the production
    # dispatch applies them (shared helper — see flagship)
    from tpu_vpcc.models.flagship import bucket_flagship_inputs

    raw, fcfg, g_bucket, n_live = bucket_flagship_inputs(raw, fcfg)
    pack30 = fcfg.pack30
    # Block-tiling happens on the host; in the production pipeline the
    # native video bridge emits this layout during its decode memcpy.
    host_inputs = (
        raw[0],
        tile_plane(raw[1], res // fcfg.occupancy_precision),
        tile_plane(raw[2], res),
        tile_plane(raw[3], res),
        tile_plane(raw[4], res),
        tile_plane(raw[5], res // 2),
        tile_plane(raw[6], res // 2),
    )

    # HOST PACK (round 7, the production TPU default): the host emits
    # the three u32 sample planes packed + concatenated (the native
    # bridge can do this during its decode memcpy) and the device graph
    # starts at the mega-row gather — exactly what the pipeline
    # dispatches (runtime/pipeline._gof_device_inputs cat-mode).
    from tpu_vpcc.ops.tiled import cat_mode_ok, stage_cat_inputs

    if cat_mode_ok(fcfg):
        host_inputs, fcfg = stage_cat_inputs(*host_inputs, fcfg)

    dev = jax.devices()[0]
    inputs = [
        None if a is None else jax.device_put(a, dev) for a in host_inputs
    ]

    # measure the PRODUCTION dispatch graph: the packed-output narrow
    # path (compacted sorted operands stay (F, S) lane-friendly; the
    # pipeline unpacks minor-dim-3 point arrays only at the prefix-fetch
    # extent). With unpacked (F, S, 3) outputs the corner probes let XLA
    # slice through the elementwise unpack, so the measured graph would
    # UNDERcount vs production anyway — packed outputs make the measured
    # and dispatched graphs identical.
    S_cap = g_bucket * fcfg.slots_per_group
    packed = narrow_emit_ok(fcfg, batch, S_cap)

    @jax.jit
    def once(fields, occ, geo0, geo1, ay, au, av):
        return _flat_pretiled_impl(
            fields, occ, geo0, geo1, ay, au, av, fcfg, _packed_out=packed
        )

    # K-vs-1 differential with ONE compiled program: the chained loop
    # takes its trip count as a DYNAMIC argument, so the long (loop_n*K
    # kernels) and short (loop_n) measurements share a single compile.
    # Remote compiles are the dominant kernel-stage cost on this tunnel
    # (a trivial probe measured 383s for one compile on a congested pool,
    # and the persistent cache does not cover this path), so going from
    # two loop compiles to one directly shrinks the worst case. The
    # differential math is unchanged: t(n*K) - t(n) = n*(K-1) chained
    # kernel runs with the per-call overhead cancelling; the only added
    # term is the device loop-step bookkeeping (sub-µs per step).

    @jax.jit
    def chained(n, fields, occ, geo0, geo1, ay, au, av):
        def body(i, carry):
            # Data-dependent (provably zero) perturbations defeat loop
            # hoisting so every chained run really executes — occ feeds
            # the geometry/validity path and ay the color path (without
            # the ay bump the attribute gathers are loop-invariant and
            # hoist). The carry must stay BARE adds — any extra op on
            # the chain (mod, min) measured +0.19 ms/run by breaking
            # fusion, so overflow is prevented by bounding loop_n above.
            c = carry
            bump = jnp.where(c < 0, 1, 0)
            # cat-mode: occ carries the packed cat — ALL three plane
            # families ride it, so the one bump perturbs geometry,
            # validity, and color alike (ay is None)
            out = _flat_pretiled_impl(
                fields, occ + bump.astype(occ.dtype), geo0, geo1,
                ay if ay is None else ay + bump.astype(ay.dtype),
                au, av, fcfg, _packed_out=packed,
            )
            # consume every SORT OPERAND: cnt alone lets XLA dead-code
            # the compaction sort and the whole color path (round-3
            # finding — 0 sort ops survived in the loop HLO), and a
            # partial probe lets the SortSimplifier drop individual
            # payload operands (second round-3 finding: without
            # pos[...,2] the narrow layout's u16 zs operand was removed,
            # verified in HLO). Packed mode: one element of EVERY merged
            # operand — each operand's merge scan is independent, and
            # XLA cannot slice through the scan, so this pins each
            # operand's full sort+merge. Unpacked fallback: pos[...,0/1]
            # -> w0, pos[...,2] -> zs, col[...] -> wc (also pins all
            # wide-layout operands).
            if packed:
                ops, cnt = out
                probe = sum(o[0, 0].astype(jnp.int32) for o in ops)
            else:
                pos, col, cnt = out
                probe = (
                    pos[0, 0, 0].astype(jnp.int32)
                    + pos[0, 0, 2].astype(jnp.int32)
                    + col[0, 0, 0].astype(jnp.int32)
                    + col[0, 0, 1].astype(jnp.int32)
                )
            return c + cnt.sum() + probe
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    n_long = np.int32(loop_n * K)
    n_short = np.int32(loop_n)

    # compile + points-per-frame
    cnt = once(*inputs)[1 if packed else 2]
    counts = np.asarray(cnt)
    mean_points = float(counts.mean())
    _ = np.asarray(chained(n_long, *inputs))  # one compile for both trip counts

    # --- device-true kernel throughput (K-vs-1 differential) -------------
    def measure(reps):
        dt_k, dt_1 = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(chained(n_long, *inputs))
            dt_k.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = np.asarray(chained(n_short, *inputs))
            dt_1.append(time.perf_counter() - t0)
        net = (min(dt_k) - min(dt_1)) / (loop_n * (K - 1))
        return net, min(dt_1)

    # min-of-9: post-compile samples cost ~1-2 s each and the shared
    # pool's congestion spikes distort any single sample (observed
    # 1451 vs 1700 fps across otherwise-identical runs)
    dt_net, dt_1_min = measure(9)
    differential_invalid = False
    if dt_net <= 0:
        # noise-inverted differential (congested tunnel): retry harder
        # rather than record an absurd clamped number
        dt_net, dt_1_min = measure(10)
    if dt_net <= 0:
        differential_invalid = True
        dt_net = 1e-6  # placeholder; flagged below and vs_baseline zeroed

    # --- dispatch-path wall time (per-batch dispatch + count fetch) ------
    t0 = time.perf_counter()
    for _ in range(loop_n):
        cnt = once(*inputs)[1 if packed else 2]
        np.asarray(cnt)
    dt_dispatch = (time.perf_counter() - t0) / loop_n

    fps = batch / dt_net
    # headline measured — certify on-device correctness, then release
    # the extras sequentially, spending whatever is left of the total
    # budget (their host prep already ran concurrently with the
    # compiles above)
    deadline = _T_START + _TOTAL_BUDGET_S
    kernel_s = round(time.perf_counter() - _T_START, 1)
    # the parity decode uses this process's device and must finish
    # before the extras' gates open (one TPU job at a time). It ALWAYS
    # runs in an official collection — like the extras' 150 s floors,
    # losing the on-device correctness evidence costs more than a
    # budget overrun, and with warm caches it takes well under a
    # minute. Kernel-only dev mode skips it (its x265 encode + two
    # decodes cost minutes per iteration) unless explicitly forced.
    if skip_extras and not os.environ.get("TPU_VPCC_FORCE_PARITY"):
        parity = {"tpu_parity": "skipped: TPU_VPCC_SKIP_EXTRAS set"}
    else:
        parity = tpu_parity_check()
        # per-family on-chip certification, inside the remaining budget
        # (a 300 s reserve keeps the extras' gates from starving; their
        # 240 s collection floors still apply regardless)
        fam_budget = min(
            float(os.environ.get("TPU_VPCC_FAMILY_BUDGET_S", "600")),
            max(120.0, deadline - time.perf_counter() - 300.0),
        )
        parity.update(tpu_family_parity(fam_budget))
    if extras_procs:
        e2e = _collect_extra(extras_procs[0], deadline)
        multistream = _collect_extra(extras_procs[1], deadline)
    elif skip_extras:
        e2e = multistream = {"skipped": "TPU_VPCC_SKIP_EXTRAS set"}
    else:
        e2e = multistream = {"error": "extras failed to launch"}
    result = {
        "metric": "fps_1Mpt_frame_reconstruction",
        "value": 0.0 if differential_invalid else round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": 0.0 if differential_invalid else round(fps / 300.0, 3),
        "extras": {
            "mean_points_per_frame": int(mean_points),
            "mpoints_per_sec": round(mean_points * fps / 1e6, 1),
            "ms_per_frame_device": round(dt_net / batch * 1000, 3),
            "ms_per_iter_fixed_overhead": round(dt_1_min / loop_n * 1000, 2),
            "ms_per_frame_dispatch_path": round(dt_dispatch / batch * 1000, 2),
            "batch": batch,
            "device": str(jax.devices()[0]),
            "atlas": f"{cfg.width}x{cfg.height}",
            "s_cap": g_bucket * fcfg.slots_per_block,
            "g_bucket": g_bucket,
            "g_live": n_live,
            "g_cap_full": fcfg.g_cap,
            "pack30": pack30,
            "packed_out": packed,
            "kernel_stage_seconds": kernel_s,
            **parity,
            "e2e": e2e,
            "multistream": multistream,
            "differential_invalid": differential_invalid,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
