"""PLY output, byte-compatible with the reference writer
(``src/writer.rs:32-74``): ASCII format, uint xyz, optional uchar rgb,
``element face 0`` stanza. Body formatting is NumPy-bulk instead of a
per-point write loop."""

from __future__ import annotations

import io
from pathlib import Path

import numpy as np

from ..reconstruction.pointset import PointSet3


def write_ply(ps: PointSet3, path) -> None:
    path = Path(path)
    with open(path, "wb") as f:
        f.write(format_ply(ps))


def format_ply(ps: PointSet3) -> bytes:
    buf = io.BytesIO()
    n = ps.point_count
    header = ["ply", "format ascii 1.0", f"element vertex {n}",
              "property uint x", "property uint y", "property uint z"]
    if ps.with_colors:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += ["element face 0", "property list uint8 int32 vertex_index", "end_header"]
    buf.write(("\n".join(header) + "\n").encode())
    if n:
        body = _format_body_native(ps)
        if body is None:
            body = _format_body_numpy(ps)
        buf.write(body)
    return buf.getvalue()


_ply_lib = None  # bound once; per-frame writes skip the ctypes setup


def _format_body_native(ps: PointSet3):
    """Fast ASCII body via the native bridge (~90x np.savetxt)."""
    global _ply_lib
    import ctypes

    if _ply_lib is None:
        try:
            from ..video.codec import _load

            lib = _load()
            if not hasattr(lib, "ply_format_body"):
                return None
            lib.ply_format_body.restype = ctypes.c_int64
            lib.ply_format_body.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
            ]
            _ply_lib = lib
        except Exception:
            return None
    lib = _ply_lib
    n = ps.point_count
    positions = np.ascontiguousarray(ps.positions, dtype=np.uint16)
    colors = (
        np.ascontiguousarray(ps.colors, dtype=np.uint8) if ps.with_colors else None
    )
    out = np.empty(n * 30, dtype=np.uint8)
    written = lib.ply_format_body(
        positions.ctypes.data_as(ctypes.c_void_p),
        colors.ctypes.data_as(ctypes.c_void_p) if colors is not None else None,
        n,
        out.ctypes.data_as(ctypes.c_void_p),
        out.nbytes,
    )
    if written < 0:
        return None
    return out[:written].tobytes()


def _format_body_numpy(ps: PointSet3) -> bytes:
    if ps.with_colors:
        cols = np.concatenate(
            [ps.positions.astype(np.int64), ps.colors.astype(np.int64)], axis=1
        )
    else:
        cols = ps.positions.astype(np.int64)
    buf = io.BytesIO()
    np.savetxt(buf, cols, fmt="%d", delimiter=" ", newline="\n")
    return buf.getvalue()


def frame_output_path(base, frame_num: int) -> Path:
    """Reference CLI naming: directory → NNNN.ply, else replace %4d
    (``src/bin/decoder.rs:101-109``)."""
    base = Path(base)
    if base.is_dir():
        return base / f"{frame_num:04d}.ply"
    return base.parent / base.name.replace("%4d", f"{frame_num:04d}")
