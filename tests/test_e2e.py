"""End-to-end tests: synthetic V3C bitstream → streaming Decoder → PLY,
checked bit-exactly against the NumPy oracle on the source planes
(the HEVC coding is lossless, so the oracle defines the exact output)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tpu_vpcc.reconstruction.oracle import (
    GeneratePointCloudParams,
    generate_point_cloud,
)
from tpu_vpcc.runtime.pipeline import Decoder, Params
from tpu_vpcc.utils.fixtures import build_fixture_stream
from tpu_vpcc.utils.ply import format_ply
from tpu_vpcc.utils.synthetic import make_synthetic_frame
from tpu_vpcc.video import encoder_supports


pytestmark = pytest.mark.skipif(
    not (encoder_supports(8) and encoder_supports(10)),
    reason="libx265 lossless 8/10-bit required for fixtures",
)


def make_fixture(tmp_path, n_frames=2, seed=21, **kw):
    rng = np.random.default_rng(seed)
    frames = [
        make_synthetic_frame(
            rng, width=kw.get("width", 64), height=kw.get("height", 64),
            occupancy_resolution=kw.get("res", 8),
            occupancy_precision=kw.get("prec", 4),
            map_count=kw.get("map_count", 2),
            n_patches=kw.get("n_patches", 3),
            frame_index=i,
        )
        for i in range(n_frames)
    ]
    stream = build_fixture_stream(frames)
    path = tmp_path / "fixture.bin"
    path.write_bytes(stream)
    return frames, path


def oracle_frames(frames):
    out = []
    for sf in frames:
        params = GeneratePointCloudParams(
            occupancy_resolution=sf.occupancy_resolution,
            occupancy_precision=sf.occupancy_precision,
            map_count_minus1=sf.map_count - 1,
        )
        mc = sf.map_count
        # oracle indexes geo/attr by frame_index * map_count + map
        geo = [None] * (sf.meta.frame_index * mc) + sf.geo_planes
        attr = [None] * (sf.meta.frame_index * mc) + sf.attr_planes
        ps, _, _ = generate_point_cloud(sf.meta, params, sf.occ_plane, geo, [attr])
        ps.convert_yuv16_to_rgb8()
        out.append(ps)
    return out


@pytest.mark.parametrize("use_device", [True, False])
def test_e2e_decoder_matches_oracle(tmp_path, use_device):
    frames, path = make_fixture(tmp_path)
    expected = oracle_frames(frames)
    decoder = Decoder(Params(path, use_device=use_device))
    decoder.start()
    decoded = list(decoder)
    assert len(decoded) == len(expected)
    for got, want in zip(decoded, expected):
        np.testing.assert_array_equal(got.positions, want.positions)
        np.testing.assert_array_equal(got.colors, want.colors)


def test_e2e_device_and_oracle_paths_agree(tmp_path):
    _, path = make_fixture(tmp_path, n_frames=2, seed=33)
    d1 = Decoder(Params(path, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(path, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) > 0
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)


def test_e2e_hostpack_matches_oracle(tmp_path, monkeypatch):
    """Full decode with the host-side plane pack + orientation fix (the
    TPU production defaults; opt-in on CPU): bit-identical to the
    oracle."""
    monkeypatch.setenv("TPU_VPCC_HOSTPACK", "1")
    monkeypatch.setenv("TPU_VPCC_HOSTORIENT", "1")
    frames, path = make_fixture(tmp_path, n_frames=2, seed=29)
    expected = oracle_frames(frames)
    decoder = Decoder(Params(path, use_device=True))
    decoder.start()
    decoded = list(decoder)
    assert len(decoded) == len(expected)
    for got, want in zip(decoded, expected):
        np.testing.assert_array_equal(got.positions, want.positions)
        np.testing.assert_array_equal(got.colors, want.colors)


def test_e2e_decoder_on_mesh(tmp_path):
    """Production Decoder with a ('data','space') mesh: bit-identical
    output to the single-device path."""
    from tpu_vpcc.parallel.mesh import make_mesh

    _, path = make_fixture(tmp_path, n_frames=3, seed=34)
    dm = Decoder(Params(path, mesh=make_mesh(data=4, space=2)))
    dm.start()
    sharded = list(dm)
    d1 = Decoder(Params(path))
    d1.start()
    plain = list(d1)
    assert len(sharded) == len(plain) > 0
    for a, b in zip(sharded, plain):
        assert format_ply(a) == format_ply(b)


def test_e2e_decoder_on_mesh_hostpack(tmp_path, monkeypatch):
    """Mesh decode through the cat-mode dispatch (host pack + host
    orientation; the cat replicates over 'space' exactly like the
    planes did): bit-identical to the meshless cat-mode decode."""
    from tpu_vpcc.parallel.mesh import make_mesh

    monkeypatch.setenv("TPU_VPCC_HOSTPACK", "1")
    monkeypatch.setenv("TPU_VPCC_HOSTORIENT", "1")
    _, path = make_fixture(tmp_path, n_frames=3, seed=35)
    dm = Decoder(Params(path, mesh=make_mesh(data=4, space=2)))
    dm.start()
    sharded = list(dm)
    d1 = Decoder(Params(path))
    d1.start()
    plain = list(d1)
    assert len(sharded) == len(plain) > 0
    for a, b in zip(sharded, plain):
        assert format_ply(a) == format_ply(b)


def test_e2e_rotated_orientations_res1(tmp_path):
    """Full bitstream round trip at log2_patch_packing_block_size=0 with
    rotated/mirrored patches — the inputs the reference itself decodes
    (its quirked transform is in-range at resolution 1) but this repo
    formerly blanket-rejected. Device output must equal the oracle's."""
    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.v3c.syntax import PatchOrientation

    orientations = [
        PatchOrientation.ROT90, PatchOrientation.ROT180,
        PatchOrientation.MIRROR, PatchOrientation.MROT90,
        PatchOrientation.DEFAULT, PatchOrientation.ROT270,
    ]
    rng = np.random.default_rng(55)
    sfs = []
    for fi in range(2):
        patches = []
        for k, o in enumerate(orientations):
            p = Patch(
                uv0=(6 + (k % 3) * 18, 6 + (k // 3) * 24),
                size_uv0=(5, 3),
                uv1=(int(rng.integers(0, 100)), int(rng.integers(0, 100))),
                occupancy_resolution=1,
                patch_orientation=o,
            )
            p.set_view_id(k % 6)
            p.d1 = 60 if p.projection_mode == 0 else 960
            p.size_d = 255
            patches.append(p)
        sfs.append(
            make_synthetic_frame(
                rng, width=64, height=64, occupancy_resolution=1,
                occupancy_precision=1, frame_index=fi, patches=patches,
            )
        )
    stream = build_fixture_stream(sfs)
    expected = oracle_frames(sfs)
    decoder = Decoder(Params(stream, use_device=True))
    decoder.start()
    decoded = list(decoder)
    assert len(decoded) == 2 and all(len(f) > 0 for f in decoded)
    for got, want in zip(decoded, expected):
        np.testing.assert_array_equal(got.positions, want.positions)
        np.testing.assert_array_equal(got.colors, want.colors)


def test_e2e_streaming_api(tmp_path):
    _, path = make_fixture(tmp_path, n_frames=3, seed=5)
    decoder = Decoder(Params(path))
    decoder.start()
    f1 = decoder.recv_frame()
    assert f1 is not None and len(f1) > 0
    rest = list(decoder)
    assert len(rest) == 2
    assert decoder.recv_frame() is None  # exhausted stays None


def test_e2e_early_close(tmp_path):
    _, path = make_fixture(tmp_path, n_frames=3, seed=6)
    decoder = Decoder(Params(path))
    decoder.start()
    assert decoder.recv_frame() is not None
    decoder.close()  # receiver drop stops the decode thread


def test_e2e_multi_gof(tmp_path):
    """Two GOFs in one file decode as independent sequences, in order."""
    from tpu_vpcc.utils.fixtures import concat_streams

    rng = np.random.default_rng(55)
    gofs = []
    per_gof_frames = []
    for g in range(2):
        frames = [
            make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                                 occupancy_precision=4, n_patches=3, frame_index=i)
            for i in range(2)
        ]
        per_gof_frames.append(frames)
        gofs.append(build_fixture_stream(frames))
    path = tmp_path / "multi.bin"
    path.write_bytes(concat_streams(gofs))

    decoder = Decoder(Params(path))
    decoder.start()
    decoded = list(decoder)
    expected = oracle_frames(per_gof_frames[0]) + oracle_frames(per_gof_frames[1])
    assert len(decoded) == 4
    for got, want in zip(decoded, expected):
        np.testing.assert_array_equal(got.positions, want.positions)
        np.testing.assert_array_equal(got.colors, want.colors)
    assert len(decoder.stats.gofs) == 2


def test_cli(tmp_path):
    frames, path = make_fixture(tmp_path, n_frames=2, seed=77)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    proc = subprocess.run(
        [
            sys.executable, "-m", "tpu_vpcc.runtime.cli",
            "-i", str(path), "-o", str(out_dir),
        ],
        capture_output=True,
        text=True,
        cwd=Path(__file__).resolve().parent.parent,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert proc.returncode == 0, proc.stderr
    plys = sorted(out_dir.glob("*.ply"))
    assert [p.name for p in plys] == ["0000.ply", "0001.ply"]
    expected = oracle_frames(frames)
    for ply, want in zip(plys, expected):
        assert ply.read_bytes() == format_ply(want)


def test_cli_multistream(tmp_path):
    """Repeated -i decodes several streams in shared device batches
    (BASELINE config 5 from the command line); per-stream subdirectories,
    byte-exact output."""
    frames_a, path_a = make_fixture(tmp_path, n_frames=2, seed=91)
    rng = np.random.default_rng(92)
    frames_b = [
        make_synthetic_frame(rng, width=64, height=64, occupancy_resolution=8,
                             occupancy_precision=4, n_patches=4, frame_index=i)
        for i in range(2)
    ]
    path_b = tmp_path / "second.bin"
    path_b.write_bytes(build_fixture_stream(frames_b))
    out_dir = tmp_path / "out_multi"
    proc = subprocess.run(
        [
            sys.executable, "-m", "tpu_vpcc.runtime.cli",
            "-i", str(path_a), "-i", str(path_b), "-o", str(out_dir),
        ],
        capture_output=True,
        text=True,
        cwd=Path(__file__).resolve().parent.parent,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert proc.returncode == 0, proc.stderr
    for name, frames in (("fixture", frames_a), ("second", frames_b)):
        plys = sorted((out_dir / name).glob("*.ply"))
        assert [p.name for p in plys] == ["0000.ply", "0001.ply"]
        for ply, want in zip(plys, oracle_frames(frames)):
            assert ply.read_bytes() == format_ply(want)


def test_decoder_accepts_bytes(tmp_path):
    frames, path = make_fixture(tmp_path, n_frames=1, seed=88)
    decoder = Decoder(Params(path.read_bytes()))
    decoder.start()
    decoded = list(decoder)
    expected = oracle_frames(frames)
    assert len(decoded) == 1
    np.testing.assert_array_equal(decoded[0].positions, expected[0].positions)


def test_inspect_tool(tmp_path, capsys):
    from tpu_vpcc.runtime.inspect import inspect

    _, path = make_fixture(tmp_path, n_frames=2, seed=89)
    assert inspect(path, verbose=True) == 0
    out = capsys.readouterr().out
    assert "GOF 0:" in out
    assert "atlas 64x64" in out
    assert "I-tile" in out


def test_e2e_close_terminates_decode_thread(tmp_path):
    """close() while the producer is blocked on the bounded queue must
    let the decode thread exit (no leaked thread pinning GOF buffers)."""
    import time

    _, path = make_fixture(tmp_path, n_frames=3, seed=7)
    decoder = Decoder(Params(path))
    decoder.start()
    assert decoder.recv_frame() is not None
    # give the producer time to fill the queue and block on the next put
    time.sleep(0.3)
    decoder.close()
    decoder._thread.join(timeout=30)
    assert not decoder._thread.is_alive(), "decode thread leaked after close()"


def test_e2e_full_32_frame_gof(tmp_path):
    """BASELINE config 1 shape: one 32-frame GOF through the streaming
    Decoder (16 DEVICE_BATCH chunks, AFOC 0..31), device vs oracle."""
    frames, path = make_fixture(tmp_path, n_frames=32, seed=99, n_patches=2)
    d1 = Decoder(Params(path, use_device=True))
    d1.start()
    dev = list(d1)
    d2 = Decoder(Params(path, use_device=False))
    d2.start()
    orc = list(d2)
    assert len(dev) == len(orc) == 32
    assert all(len(f) > 0 for f in dev)
    for a, b in zip(dev, orc):
        assert format_ply(a) == format_ply(b)
    assert len(d1.stats.gofs) == 1 and d1.stats.gofs[0].frame_count == 32


def test_e2e_shift_compact_matches_oracle(tmp_path, monkeypatch):
    """Full streaming Decoder with the shift-compact kernel forced on
    (the TPU production default; interpreted here) — byte-identical
    PLYs to the oracle path. The fixture is sized so the bucketed slot
    extent actually divides a supported chunk extent (asserted), or the
    policy would silently fall back to the sort."""
    monkeypatch.setenv("TPU_VPCC_SHIFT", "1")
    frames, path = make_fixture(
        tmp_path, n_frames=2, seed=57, res=16, width=256, height=256,
        n_patches=8,
    )
    # precondition: the dispatch policy will pick the shift kernel
    from tpu_vpcc.atlas.groups import bucket_group_count, build_group_table
    from tpu_vpcc.ops.tiled import choose_compaction

    gt = build_group_table(frames[0].meta)
    bucket = bucket_group_count(gt.n_groups, 16 * 16)
    shift_extent, _, _ = choose_compaction(bucket, 512, False)
    assert shift_extent > 0, (gt.n_groups, bucket)

    expected = oracle_frames(frames)
    decoder = Decoder(Params(path, use_device=True))
    decoder.start()
    decoded = list(decoder)
    assert len(decoded) == len(expected)
    for got, want in zip(decoded, expected):
        np.testing.assert_array_equal(got.positions, want.positions)
        np.testing.assert_array_equal(got.colors, want.colors)


def test_kitchen_sink_multi_gof_cli(tmp_path):
    """One file, eight GOFs, eight feature families — base two-map,
    P-tile PLR (single-map), 45-degree views, aux-video raw patches,
    pixel-interleaved geometry, single-map EOM, multi-tile frames with
    per-tile aux bands, 4:2:2 attributes in per-map sub-streams —
    decoded through the CLI on both paths, every frame
    byte-identical."""
    from tests.test_aux_multitile import (
        make_two_tile_frame,
        plant_banded_aux_raws,
    )
    from tests.test_aux_video import make_aux_frames
    from tests.test_eom import make_eom_frame_1map
    from tests.test_pixel_interleave import make_pix_il_stream
    from tests.test_plr import make_plr_p_sequence

    from tpu_vpcc.atlas.patches import Patch
    from tpu_vpcc.utils.fixtures import build_fixture_stream, concat_streams
    from tpu_vpcc.utils.synthetic import make_synthetic_frame

    rng = np.random.default_rng(99)
    base = [
        make_synthetic_frame(
            rng, width=64, height=64, occupancy_resolution=8,
            occupancy_precision=4, n_patches=3, frame_index=i,
        )
        for i in range(2)
    ]
    sf45 = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, n_patches=3, frame_index=0,
    )
    for p, plane in zip(sf45.meta.patches, (1, 2, 3)):
        views = [
            v for v, r in Patch._VIEW_TABLE.items()
            if r[0] == plane and r[4] == p.projection_mode
        ]
        p.set_view_id(views[0])
    gofs = [
        build_fixture_stream(base),
        make_plr_p_sequence(seed=23)[1],
        build_fixture_stream([sf45]),
        build_fixture_stream(
            make_aux_frames(seed=5, n_frames=1, with_main_raw=True)
        ),
        make_pix_il_stream(seed=7, n_frames=1)[1],
        build_fixture_stream(
            [make_eom_frame_1map(np.random.default_rng(71))]
        ),
    ]
    mt_rng = np.random.default_rng(61)
    sf_mt = make_two_tile_frame(mt_rng)
    plant_banded_aux_raws(mt_rng, sf_mt)
    gofs.append(
        build_fixture_stream(
            [sf_mt], tiles=(2, 1), aux_tile_row_heights=[1, 1]
        )
    )
    sf422 = make_synthetic_frame(
        rng, width=64, height=64, occupancy_resolution=8,
        occupancy_precision=4, map_count=2, n_patches=2, frame_index=0,
    )
    gofs.append(
        build_fixture_stream(
            [sf422], multi_map_streams=True, chroma422=True
        )
    )
    n_frames = 2 + 2 + 1 + 1 + 1 + 1 + 1 + 1
    path = tmp_path / "kitchen_sink.bin"
    path.write_bytes(concat_streams(gofs))

    def run(outdir, extra=()):
        r = subprocess.run(
            [sys.executable, "-m", "tpu_vpcc.runtime.cli",
             "-i", str(path), "-o", str(outdir), *extra],
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-2000:]

    run(tmp_path / "dev")
    run(tmp_path / "orc", ("--oracle",))
    for k in range(n_frames):
        a = (tmp_path / "dev" / f"{k:04d}.ply").read_bytes()
        b = (tmp_path / "orc" / f"{k:04d}.ply").read_bytes()
        assert a == b and len(a) > 100, f"frame {k}"


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_pipelined_gof_reconstruction_matches_serial(tmp_path, depth):
    """Device-pipelined GOF reconstruction (pipeline_gofs > 1: GOF k's
    fetch overlaps GOF k+1's dispatch) emits the exact frames, in
    order, of the serial decode — across 4 GOFs."""
    from tpu_vpcc.utils.fixtures import concat_streams

    gofs = []
    for g in range(4):
        frames, _ = make_fixture(tmp_path, n_frames=2, seed=100 + g)
        gofs.append(build_fixture_stream(frames))
    stream = concat_streams(gofs)

    d = Decoder(Params(stream, pipeline_gofs=depth))
    d.start()
    got = list(d)
    d1 = Decoder(Params(stream, pipeline_gofs=1))
    d1.start()
    serial = list(d1)
    assert len(got) == len(serial) == 8
    for a, b in zip(got, serial):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.colors, b.colors)
