"""Patch metadata → padded struct-of-arrays tensors for the device kernels.

The per-patch scalar transforms of the reference (orientation transform,
view-id axes, depth projection — ``src/decoder.rs:694-889``) are encoded
as per-patch integer coefficients so the device reconstruction is pure
gather + elementwise arithmetic over *slots* (see ``tpu_vpcc.ops``):
every patch owns a contiguous range of slots in emission order, making
output compaction a single cumsum instead of a sort.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from .patches import FrameMeta


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@dataclass
class PatchSoA:
    """Padded per-patch tensors (all int32, shape [p_max])."""

    n_patches: int
    p_max: int
    total_slots: int  # sum over real patches of su0*sv0*res*res*2
    # orientation transform: x = a*q_u + b*q_v + (cx_*), y = c*q_u + d*q_v + (cy_*)
    a: np.ndarray
    b: np.ndarray
    c: np.ndarray
    d: np.ndarray
    cx_blk: np.ndarray
    cy_blk: np.ndarray
    cx_pix: np.ndarray
    cy_pix: np.ndarray
    size_u0: np.ndarray
    size_v0: np.ndarray
    uv1_u: np.ndarray
    uv1_v: np.ndarray
    d1: np.ndarray
    lod_x: np.ndarray
    lod_y: np.ndarray
    projection_mode: np.ndarray
    normal_axis: np.ndarray
    tangent_axis: np.ndarray
    bitangent_axis: np.ndarray
    slot_offset: np.ndarray  # [p_max + 1] exclusive prefix of slot counts

    def as_stack(self) -> np.ndarray:
        """All [p_max] fields stacked into one (n_fields, p_max) int32 array
        for a single host→device transfer."""
        return np.stack(
            [
                self.a, self.b, self.c, self.d,
                self.cx_blk, self.cy_blk, self.cx_pix, self.cy_pix,
                self.size_u0, self.size_v0,
                self.uv1_u, self.uv1_v, self.d1,
                self.lod_x, self.lod_y,
                self.projection_mode,
                self.normal_axis, self.tangent_axis, self.bitangent_axis,
            ]
        )

    FIELD_COUNT = 19


def build_patch_soa(meta: FrameMeta, p_max: int = 0) -> PatchSoA:
    """Pack a frame's patches into padded SoA tensors.

    Slots per patch = size_u0*size_v0*res*res*2 laid out in the exact
    reference emission order (v0-major blocks, then v1/u1 raster within
    the block, D0 before D1 — ``src/codec.rs:352-480``).
    """
    n = len(meta.patches)
    if p_max <= 0:
        p_max = max(1, _next_pow2(n))
    if n > p_max:
        raise ValueError(f"{n} patches > p_max {p_max}")

    z = lambda: np.zeros(p_max, dtype=np.int32)  # noqa: E731
    soa = PatchSoA(
        n_patches=n,
        p_max=p_max,
        total_slots=0,
        a=z(), b=z(), c=z(), d=z(),
        cx_blk=z(), cy_blk=z(), cx_pix=z(), cy_pix=z(),
        size_u0=z(), size_v0=z(),
        uv1_u=z(), uv1_v=z(), d1=z(),
        lod_x=np.ones(p_max, dtype=np.int32),
        lod_y=np.ones(p_max, dtype=np.int32),
        projection_mode=z(),
        normal_axis=z(), tangent_axis=z(), bitangent_axis=z(),
        slot_offset=np.zeros(p_max + 1, dtype=np.int32),
    )

    offset = 0
    for i, patch in enumerate(meta.patches):
        res = patch.occupancy_resolution
        a, b, cxp, c, d, cyp = patch.orientation_coeffs(res)
        _, _, cxb, _, _, cyb = patch.orientation_coeffs(1)
        soa.a[i], soa.b[i], soa.c[i], soa.d[i] = a, b, c, d
        soa.cx_pix[i], soa.cy_pix[i] = cxp, cyp
        soa.cx_blk[i], soa.cy_blk[i] = cxb, cyb
        soa.size_u0[i], soa.size_v0[i] = patch.size_uv0
        soa.uv1_u[i], soa.uv1_v[i] = patch.uv1
        soa.d1[i] = patch.d1
        soa.lod_x[i], soa.lod_y[i] = patch.level_of_detail
        soa.projection_mode[i] = patch.projection_mode
        soa.normal_axis[i], soa.tangent_axis[i], soa.bitangent_axis[i] = patch.axes
        soa.slot_offset[i] = offset
        offset += patch.size_uv0[0] * patch.size_uv0[1] * res * res * 2
    soa.total_slots = offset
    # padding patches get empty ranges at the end
    soa.slot_offset[n:] = offset
    return soa


def stack_soas(soas: List[PatchSoA]):
    """Stack per-frame SoAs (same p_max) into batched arrays for vmap."""
    fields = np.stack([s.as_stack() for s in soas])  # (F, n_fields, p_max)
    offsets = np.stack([s.slot_offset for s in soas])  # (F, p_max+1)
    totals = np.array([s.total_slots for s in soas], dtype=np.int32)
    return fields, offsets, totals
