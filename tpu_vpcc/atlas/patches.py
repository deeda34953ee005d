"""Patch-frame construction: tile layers → per-frame patch metadata.

Host-side port of the reference's ``create_patch_frame`` orchestration
(``src/decoder.rs:320-587``) and the ``Patch`` geometry math
(``src/decoder.rs:694-889``): view-id → axes table, the 9-orientation
canvas transform, and depth → 3D point generation. The per-pixel versions
of these transforms live in ``tpu_vpcc.ops`` as whole-frame device kernels;
this module is the scalar/metadata source of truth.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from ..v3c.context import Context
from ..v3c.syntax import (
    IntraPatchDataUnit,
    PatchModeITile,
    PatchModePTile,
    PatchOrientation,
    TileType,
    UnsupportedFeature,
)


@dataclass
class Patch:
    """Decoded patch record (``src/decoder.rs:711-783``)."""

    uv0: Tuple[int, int] = (0, 0)  # canvas block coords
    size_uv0: Tuple[int, int] = (0, 0)  # size in blocks
    uv1: Tuple[int, int] = (0, 0)  # tangential/bitangential shift
    size_uv1: Tuple[int, int] = (0, 0)
    d1: int = 0  # depth shift
    size_d: int = 0
    occupancy_resolution: int = 16
    level_of_detail: Tuple[int, int] = (1, 1)
    projection_mode: int = 0  # 0: min-depth, 1: max-depth
    axes: Tuple[int, int, int] = (0, 2, 1)  # (normal, tangent, bitangent)
    axis_of_additional_plane: int = 0
    patch_orientation: PatchOrientation = PatchOrientation.DEFAULT

    # -- view id ----------------------------------------------------------

    _VIEW_TABLE = {
        # view_id: (additional_plane, normal, tangent, bitangent, mode)
        0: (0, 0, 2, 1, 0),
        1: (0, 1, 2, 0, 0),
        2: (0, 2, 0, 1, 0),
        3: (0, 0, 2, 1, 1),
        4: (0, 1, 2, 0, 1),
        5: (0, 2, 0, 1, 1),
        6: (1, 0, 2, 1, 0),
        7: (1, 2, 0, 1, 0),
        8: (1, 0, 2, 1, 1),
        9: (1, 2, 0, 1, 1),
        10: (2, 2, 0, 1, 0),
        11: (2, 1, 2, 0, 0),
        12: (2, 2, 0, 1, 1),
        13: (2, 1, 2, 0, 1),
        14: (3, 1, 2, 0, 0),
        15: (3, 0, 2, 1, 0),
        16: (3, 1, 2, 0, 1),
        17: (3, 0, 2, 1, 1),
    }

    def set_view_id(self, view_id: int) -> None:
        """``src/decoder.rs:788-814`` (only 0..=5 reachable in rec0)."""
        plane, normal, tangent, bitangent, mode = self._VIEW_TABLE[view_id]
        self.axis_of_additional_plane = plane
        self.axes = (normal, tangent, bitangent)
        self.projection_mode = mode

    # -- orientation transform --------------------------------------------

    def patch_to_canvas_helper(self, u: int, v: int, resolution: int) -> Tuple[int, int]:
        """9-case orientation transform (``src/decoder.rs:853-867``)."""
        u0 = self.uv0[0] * resolution
        v0 = self.uv0[1] * resolution
        su0, sv0 = self.size_uv0
        o = self.patch_orientation
        if o == PatchOrientation.DEFAULT:
            return u + u0, v + v0
        if o == PatchOrientation.ROT90:
            return sv0 - 1 - v + u0, u + v0
        if o == PatchOrientation.ROT180:
            return su0 - 1 - u + u0, sv0 - 1 - v + v0
        if o == PatchOrientation.ROT270:
            return v + u0, su0 - 1 - u + v0
        if o == PatchOrientation.MIRROR:
            return su0 - 1 - u + u0, v + v0
        if o == PatchOrientation.MROT90:
            return sv0 - 1 - v + u0, su0 - 1 - u + v0
        if o == PatchOrientation.MROT180:
            return u + u0, sv0 - 1 - v + v0
        if o in (PatchOrientation.MROT270, PatchOrientation.SWAP):
            return v + u0, u + v0
        raise ValueError(f"unknown orientation {o}")

    def patch_block_to_canvas_block(
        self, u_blk: int, v_blk: int, stride_blk: int, height_blk: int
    ) -> int:
        x, y = self.patch_to_canvas_helper(u_blk, v_blk, 1)
        assert x < stride_blk and y < height_blk
        return y * stride_blk + x

    def patch_to_canvas(
        self, u: int, v: int, canvas_stride: int, canvas_height: int
    ) -> Tuple[int, int]:
        x, y = self.patch_to_canvas_helper(u, v, self.occupancy_resolution)
        assert x < canvas_stride and y < canvas_height
        return x, y

    def orientation_coeffs(self, resolution: int):
        """Affine coefficients (a, b, cx, c, d, cy) with
        x = a*u + b*v + cx and y = c*u + d*v + cy at the given resolution.

        Per-patch constants used by the device kernels to express the
        orientation transform as a gather. NOTE: the size terms stay in
        *block* units regardless of resolution — this replicates the
        tmc2-rs helper exactly (``src/decoder.rs:853-867``), which unlike
        TMC2 C++ does not scale size_uv0 by the resolution; rec0 parity is
        against the Rust reference.
        """
        u0 = self.uv0[0] * resolution
        v0 = self.uv0[1] * resolution
        su = self.size_uv0[0]  # block units, see docstring
        sv = self.size_uv0[1]
        o = self.patch_orientation
        # (a, b, cx, c, d, cy)
        table = {
            PatchOrientation.DEFAULT: (1, 0, u0, 0, 1, v0),
            PatchOrientation.ROT90: (0, -1, sv - 1 + u0, 1, 0, v0),
            PatchOrientation.ROT180: (-1, 0, su - 1 + u0, 0, -1, sv - 1 + v0),
            PatchOrientation.ROT270: (0, 1, u0, -1, 0, su - 1 + v0),
            PatchOrientation.MIRROR: (-1, 0, su - 1 + u0, 0, 1, v0),
            PatchOrientation.MROT90: (0, -1, sv - 1 + u0, -1, 0, su - 1 + v0),
            PatchOrientation.MROT180: (1, 0, u0, 0, -1, sv - 1 + v0),
            PatchOrientation.MROT270: (0, 1, u0, 1, 0, v0),
            PatchOrientation.SWAP: (0, 1, u0, 1, 0, v0),
        }
        return table[o]

    # -- point generation --------------------------------------------------

    def generate_normal_coordinate(self, depth: int) -> int:
        """``src/decoder.rs:881-888``."""
        if self.projection_mode == 0:
            return depth + self.d1
        return max(self.d1, depth) - depth

    def generate_point(self, u: int, v: int, depth: int) -> np.ndarray:
        """``src/decoder.rs:871-878``; u16 truncation semantics preserved."""
        point = np.zeros(3, dtype=np.uint16)
        normal, tangent, bitangent = self.axes
        point[normal] = np.uint16(self.generate_normal_coordinate(depth) & 0xFFFF)
        point[tangent] = np.uint16((u * self.level_of_detail[0] + self.uv1[0]) & 0xFFFF)
        point[bitangent] = np.uint16((v * self.level_of_detail[1] + self.uv1[1]) & 0xFFFF)
        return point


@dataclass
class FrameMeta:
    """Per-frame (single-tile) reconstruction metadata — the distilled
    ``TileContext`` (``context.rs:394-439``)."""

    frame_index: int = 0
    tile_index: int = 0
    atl_index: int = 0
    width: int = 0
    height: int = 0
    left_top_in_frame: Tuple[int, int] = (0, 0)
    patches: List[Patch] = field(default_factory=list)
    tile_type: TileType = TileType.I


def _patch_type(tile_type: TileType, patch_mode: int) -> str:
    """``src/decoder.rs:676-692``."""
    if tile_type == TileType.SKIP:
        return "skip"
    if tile_type == TileType.P:
        return {
            int(PatchModePTile.INTRA): "intra",
            int(PatchModePTile.INTER): "inter",
            int(PatchModePTile.MERGE): "merge",
            int(PatchModePTile.SKIP): "skip",
        }.get(patch_mode, "error")
    if tile_type == TileType.I:
        return {int(PatchModeITile.INTRA): "intra"}.get(patch_mode, "error")
    return "error"


def create_patch_frames(context: Context) -> List[FrameMeta]:
    """Build per-frame patch metadata from all tile layers in the context.

    Parity: ``Decoder::create_patch_frame`` (``src/decoder.rs:320-517``).
    Also derives AFOC for every tile layer (msb/val stored on the layer).
    """
    vps = context.get_vps()
    frames: List[FrameMeta] = []

    # AFOC derivation pass (``decoder.rs:328-335``)
    frame_count = 0
    for i in range(context.atlas_tile_layer_len()):
        msb, val = context.derive_afoc_val(i)
        atl = context.get_atlas_tile_layer(i)
        atl.atlas_frame_order_count_msb = msb
        atl.atlas_frame_order_count_val = val
        atl.header.frame_index = val & 0xFF  # u8 cast in the reference
        frame_count = max(frame_count, val + 1)

    for atgl_idx in range(context.atlas_tile_layer_len()):
        atl = context.get_atlas_tile_layer(atgl_idx)
        ath = atl.header
        afps = context.get_afps(ath.atlas_frame_parameter_set_id)
        asps = context.get_asps(afps.atlas_sequence_parameter_set_id)
        geometry_bitdepth_3d = asps.geometry_3d_bitdepth_minus1 + 1
        frame_index = ath.frame_index

        if frame_index > 0 and ath.tile_type != TileType.I:
            raise UnsupportedFeature(
                "non-I tiles at frame_index > 0 (inter patch reconstruction)"
            )

        meta = FrameMeta(
            frame_index=frame_index,
            tile_index=ath.id,
            atl_index=atgl_idx,
            width=asps.frame_width,
            height=asps.frame_height,
            tile_type=ath.tile_type,
        )

        min_level = 1 << ath.pos_min_d_quantizer
        packing_block_size = 1 << asps.log2_patch_packing_block_size

        for pid in atl.patch_information_data:
            ptype = _patch_type(ath.tile_type, pid.patch_mode)
            if ptype == "intra":
                pdu: IntraPatchDataUnit = pid.patch_data_unit
                patch = Patch(
                    occupancy_resolution=packing_block_size,
                    uv0=pdu.pos_2d,
                    uv1=pdu.pos_3d_offset,
                    size_d=(
                        0
                        if pdu.pos_3d_range_d == 0
                        else pdu.pos_3d_range_d * min_level - 1
                    ),
                    size_uv0=(pdu.size_2d_minus1[0] + 1, pdu.size_2d_minus1[1] + 1),
                    patch_orientation=pdu.orientation_index,
                )
                patch.set_view_id(pdu.projection_id)
                if patch.projection_mode == 0:
                    patch.d1 = pdu.pos_3d_offset_d * min_level
                else:
                    patch.d1 = (1 << geometry_bitdepth_3d) - pdu.pos_3d_offset_d * min_level
                if patch.axes not in ((0, 2, 1), (1, 2, 0), (2, 0, 1)):
                    raise UnsupportedFeature(f"unexpected axes {patch.axes}")
                meta.patches.append(patch)
            elif ptype in ("inter", "merge"):
                raise UnsupportedFeature(f"{ptype} patch reconstruction")
            elif ptype == "skip":
                raise UnsupportedFeature("skip patch in bitstream")
            else:
                raise UnsupportedFeature(f"unknown patch mode {pid.patch_mode}")
        frames.append(meta)

    return frames
