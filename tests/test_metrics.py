"""D1 geometry metric and color PSNR (framework extension; the MPEG
pc_error tool is unavailable here)."""

import numpy as np
import pytest

from tpu_vpcc.reconstruction.pointset import PointSet3
from tpu_vpcc.utils.metrics import color_psnr, d1_metric

pytest.importorskip("scipy")


def make_ps(pos, colors=None):
    ps = PointSet3(positions=np.asarray(pos, np.uint16), with_colors=colors is not None)
    if colors is not None:
        ps.colors = np.asarray(colors, np.uint8)
    return ps


def test_identical_clouds_are_lossless():
    rng = np.random.default_rng(0)
    pos = rng.integers(0, 1024, (500, 3))
    a = make_ps(pos, rng.integers(0, 256, (500, 3)))
    m = d1_metric(a, a)
    assert m.mse == 0 and m.psnr == float("inf")
    c = color_psnr(a, a)
    assert all(v == float("inf") for v in c.values())


def test_unit_offset_mse():
    # B is A shifted by exactly 1 along x: every NN distance^2 is 1
    pos = np.stack([np.arange(0, 1000, 10), np.zeros(100), np.zeros(100)], 1)
    a = make_ps(pos)
    b = make_ps(pos + [1, 0, 0])
    m = d1_metric(a, b)
    assert m.mse_ab == pytest.approx(1.0)
    assert m.mse_ba == pytest.approx(1.0)
    # peak^2 = 3 * 1023^2; psnr = 10*log10(peak^2 / 1)
    assert m.psnr == pytest.approx(10 * np.log10(3 * 1023**2), abs=1e-6)


def test_cli_tool(tmp_path, capsys):
    from tpu_vpcc.utils.metrics import main
    from tpu_vpcc.utils.ply import write_ply

    # B = A shifted by exactly 1 in x: the expected D1 mse is exactly 1
    pos = np.stack([np.arange(0, 2000, 10), np.zeros(200), np.zeros(200)], 1)
    a = make_ps(pos, np.full((200, 3), 100))
    b = make_ps(pos + [1, 0, 0], np.full((200, 3), 100))
    write_ply(a, tmp_path / "a.ply")
    write_ply(b, tmp_path / "b.ply", fmt="binary_little_endian")
    assert main([str(tmp_path / "a.ply"), str(tmp_path / "b.ply")]) == 0
    out = capsys.readouterr().out
    assert "mse=1.000000" in out
    expected_psnr = 10 * np.log10(3 * 1023**2)
    assert f"psnr={expected_psnr:.3f}" in out
    assert "r=inf g=inf b=inf" in out  # identical colors
