"""Binary PLY output (framework extension; the reference stubs binary
formats out, src/writer.rs:10-11)."""

import numpy as np
import pytest

from tpu_vpcc.reconstruction.pointset import PointSet3
from tpu_vpcc.utils.ply import FORMAT_BINARY, format_ply, read_ply


def make_ps(n=100, seed=0, colors=True):
    rng = np.random.default_rng(seed)
    ps = PointSet3(
        positions=rng.integers(0, 1024, (n, 3)).astype(np.uint16),
        with_colors=colors,
    )
    if colors:
        ps.colors = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    return ps


@pytest.mark.parametrize("colors", [True, False])
def test_binary_roundtrip(colors):
    ps = make_ps(colors=colors)
    data = format_ply(ps, FORMAT_BINARY)
    assert b"format binary_little_endian 1.0" in data
    got = read_ply(data)
    np.testing.assert_array_equal(got.positions, ps.positions)
    if colors:
        np.testing.assert_array_equal(got.colors, ps.colors)


def test_ascii_and_binary_carry_identical_points():
    ps = make_ps(seed=3)
    a = read_ply(format_ply(ps))
    b = read_ply(format_ply(ps, FORMAT_BINARY))
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.colors, b.colors)


def test_binary_is_smaller():
    ps = make_ps(n=5000, seed=4)
    assert len(format_ply(ps, FORMAT_BINARY)) < len(format_ply(ps)) / 2


def test_cli_binary_output(tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    from tpu_vpcc.utils.fixtures import build_fixture_stream
    from tpu_vpcc.utils.synthetic import make_synthetic_frame
    from tpu_vpcc.video import encoder_supports

    if not (encoder_supports(8) and encoder_supports(10)):
        pytest.skip("libx265 required")
    rng = np.random.default_rng(5)
    frames = [make_synthetic_frame(rng, width=64, height=64,
                                   occupancy_resolution=8,
                                   occupancy_precision=4, n_patches=2)]
    path = tmp_path / "s.bin"
    path.write_bytes(build_fixture_stream(frames))
    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "tpu_vpcc.runtime.cli", "-i", str(path),
         "-o", str(out), "--ply-format", "binary_little_endian"],
        capture_output=True, text=True,
        cwd=Path(__file__).resolve().parent.parent,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert proc.returncode == 0, proc.stderr
    data = (out / "0000.ply").read_bytes()
    assert b"binary_little_endian" in data
    ps = read_ply(data)
    assert len(ps) > 0 and ps.colors.shape == ps.positions.shape
