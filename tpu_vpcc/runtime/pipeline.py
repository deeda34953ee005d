"""Streaming decoder pipeline — the public API of the framework.

Mirrors the reference library surface (``src/lib.rs``): ``Params`` +
``Decoder`` with ``start()`` / ``recv_frame()`` / iteration, one background
decode thread, and a bounded queue of depth 1 for backpressure.

Per GOF (``src/lib.rs:113-137`` / ``src/decoder.rs:34-317``):
  1. host: demux V3C units into a fresh Context (C3-C12),
  2. host: build patch frames (C14) and pack the patch SoA tensors,
  3. host: decode the three HEVC sub-streams (native libavcodec bridge,
     all three in parallel threads),
  4. device: batched whole-GOF reconstruction (``tpu_vpcc.ops``),
  5. host: exact f64 YUV→RGB conversion, then emit frames in order.

Stage 3 of GOF k+1 overlaps stages 4-5 of GOF k via the pipelined
executor, keeping the TPU fed while the CPU decodes video.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, replace
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

from ..atlas.atlas_hash import collect_daih_by_frame, verify_frame_hashes
from ..atlas.patches import FrameMeta, create_patch_frames
from ..reconstruction.pointset import PointSet3
from ..utils.stats import DecodeStats, stage_timer
from ..v3c.context import Context
from ..v3c.stream import SampleStreamV3CUnit
from ..v3c.syntax import UnsupportedFeature, VideoType
from ..bitio import Bitstream
from ..video import decompress_video
from ..video.substream import codec_id_from_v3c

log = logging.getLogger(__name__)


@dataclass
class Params:
    """Decoder parameters (parity: ``src/lib.rs:24-68``).

    The nine rec-profile reconstruction toggles of the reference are all
    default-false (rec0 hard-wired); they are kept for API parity.
    """

    compressed_stream_path: Path = None
    video_decoder_path: Optional[Path] = None  # unused (native decode)
    keep_intermediate_files: bool = False
    patch_color_subsampling: bool = False
    color_space_conversion_path: Optional[Path] = None
    inverse_color_space_conversion_config: Optional[Path] = None
    # reconstruction options — rec0: all false (``src/lib.rs:39-48``)
    pixel_deinterleaving_type: bool = False
    point_local_reconstruction_type: bool = False
    reconstruction_eom_type: bool = False
    duplicated_point_removal_type: bool = False
    reconstruct_raw_type: bool = False
    apply_geo_smoothing_type: bool = False
    apply_attr_smoothing_type: bool = False
    attr_transfer_filter_type: bool = False
    apply_occupancy_synthesis_type: bool = False
    # framework extensions
    use_device: bool = True  # False: NumPy oracle path (debug/CI)
    queue_depth: int = 1  # reference uses a bounded(1) channel
    num_threads: int = 3  # host video-decode workers per GOF
    #: optional jax.sharding.Mesh with ('data', 'space') axes: GOF frames
    #: shard over 'data' and each frame's group table over 'space'
    #: (see tpu_vpcc.parallel.spatial)
    mesh: Optional[object] = None
    #: device pipeline depth: GOFs reconstructing concurrently (2 =
    #: GOF k's D2H fetch overlaps GOF k+1's dispatch; frames still
    #: emit in order). 1 restores strictly serial reconstruction.
    pipeline_gofs: int = 2

    def __post_init__(self):
        src = self.compressed_stream_path
        if isinstance(src, (bytes, bytearray)):
            self.compressed_stream_path = bytes(src)
        elif src is not None and not isinstance(src, Path):
            self.compressed_stream_path = Path(src)


class Decoder:
    """Streaming V-PCC decoder (parity: ``src/lib.rs:70-154``)."""

    def __init__(self, params: Params):
        self.params = params
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(1, params.queue_depth))
        self._thread: Optional[threading.Thread] = None
        self._started = False
        self._stop = threading.Event()
        self._done = False
        self._error: Optional[BaseException] = None
        #: per-GOF stage timings & counters, populated by the decode thread
        self.stats = DecodeStats()

    # -- public API --------------------------------------------------------

    def start(self) -> None:
        """Parse the stream and spawn the decode thread. One-shot.

        ``compressed_stream_path`` may also be raw ``bytes`` (in-memory
        streams — a framework extension; the reference is path-only)."""
        if self._started:
            raise RuntimeError("decoder can only be started once")
        self._started = True
        src = self.params.compressed_stream_path
        data = src if isinstance(src, (bytes, bytearray)) else Path(src).read_bytes()
        ssvu = SampleStreamV3CUnit.from_bitstream(Bitstream(data))
        self._thread = threading.Thread(
            target=self._decode_loop, args=(ssvu,), daemon=True
        )
        self._thread.start()

    def recv_frame(self) -> Optional[PointSet3]:
        """Block until the next frame; None once the stream is done (and
        forever after, like the reference's closed channel,
        ``src/lib.rs:143-145``)."""
        if self._done:
            return None
        item = self._queue.get()
        if item is _SENTINEL:
            self._done = True
            if self._error is not None:
                raise self._error
            return None
        return item

    def __iter__(self) -> Iterator[PointSet3]:
        while True:
            frame = self.recv_frame()
            if frame is None:
                return
            yield frame

    def close(self) -> None:
        """Drop the receiver: the decode thread stops at its next send."""
        self._stop.set()
        # drain to unblock a producer waiting on the bounded queue
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass

    # -- decode thread -----------------------------------------------------

    def _decode_loop(self, ssvu: SampleStreamV3CUnit) -> None:
        """GOF pipeline: host parse+video-decode of GOF k+1 overlaps device
        reconstruction of GOF k (a prefetch depth of 1)."""
        try:
            from concurrent.futures import ThreadPoolExecutor

            def prep_next():
                if ssvu.get_v3c_unit_count() == 0 or self._stop.is_set():
                    return None
                gs = self.stats.new_gof()
                with stage_timer(gs, "parse"):
                    context = Context()
                    ssvu.decode_gof(context)
                with stage_timer(gs, "host_prepare"):
                    gof = prepare_gof(
                        context,
                        num_video_threads=max(1, self.params.num_threads),
                        tiled=self.params.use_device,
                        apply_geo_smoothing=self.params.apply_geo_smoothing_type,
                        apply_attr_smoothing=self.params.apply_attr_smoothing_type,
                        apply_occupancy_synthesis=(
                            self.params.apply_occupancy_synthesis_type
                        ),
                    )
                for vt, vbs in (
                    ("occ", context.get_video_bitstream(VideoType.OCCUPANCY)),
                    ("geo", context.get_video_bitstream(VideoType.GEOMETRY)),
                    ("attr", context.get_video_bitstream(VideoType.ATTRIBUTE)),
                ):
                    if vbs is not None:
                        gs.video_bytes[vt] = len(vbs.data)
                return gof, gs

            def do_recon(gof, gs):
                with stage_timer(gs, "reconstruct"):
                    frames = list(
                        _reconstruct_gof_device(
                            gof, mesh=self.params.mesh, stats=gs
                        )
                        if self.params.use_device
                        else _reconstruct_gof_oracle(gof)
                    )
                gs.frame_count = len(frames)
                gs.total_points = sum(len(f) for f in frames)
                log.debug("%s", gs.summary())
                return frames

            def emit(frames) -> bool:
                for frame in frames:
                    if self._stop.is_set():
                        return False
                    self._queue.put(frame)
                return True

            # device pipeline depth (GOFs reconstructing concurrently).
            # 2 overlaps GOF k's D2H fetch wait with GOF k+1's H2D +
            # dispatch — on the tunneled bench chip those round trips
            # are the e2e cost (stage split: fetch 0.74 s vs dispatch
            # 0.55 s of a 1.38 s reconstruct) — and decouples the
            # bounded-queue emit from the next GOF's device work.
            # Frames still emit strictly in order; device memory holds
            # up to 2 GOFs of buffers.
            depth = max(1, int(self.params.pipeline_gofs))
            with ThreadPoolExecutor(max_workers=1) as prefetcher, \
                    ThreadPoolExecutor(max_workers=depth) as recon_exec:
                pending = prefetcher.submit(prep_next)
                in_flight = []  # recon futures, GOF order
                while True:
                    item = pending.result()
                    if item is None:
                        break
                    gof, gs = item
                    pending = prefetcher.submit(prep_next)
                    in_flight.append(recon_exec.submit(do_recon, gof, gs))
                    while len(in_flight) >= depth:
                        if not emit(in_flight.pop(0).result()):
                            return
                for fut in in_flight:
                    if not emit(fut.result()):
                        return
        except BaseException as e:  # surfaced on the consumer side
            log.exception("decode thread failed")
            self._error = e
        finally:
            if self._stop.is_set():
                # receiver dropped: nobody will drain the queue, and a
                # blocked daemon thread would pin the GOF buffers for the
                # process lifetime — discard pending frames for the
                # sentinel slot (sole producer, so this converges; a
                # concurrent close() drain only helps)
                while True:
                    try:
                        self._queue.put_nowait(_SENTINEL)
                        break
                    except queue.Full:
                        try:
                            self._queue.get_nowait()
                        except queue.Empty:
                            pass
            else:
                # normal completion: block until the consumer takes the
                # remaining frames (close() unblocks this by draining)
                self._queue.put(_SENTINEL)


_SENTINEL = object()


# ---------------------------------------------------------------------------
# GOF decode
# ---------------------------------------------------------------------------


@dataclass
class GofData:
    """Decoded inputs for one GOF, ready for reconstruction."""

    metas: List[FrameMeta]
    occ_planes: np.ndarray  # (F, H/prec, W/prec) uint8
    geo_planes: List[np.ndarray]  # map-interleaved Y planes
    attr_planes: List[List[np.ndarray]]  # per video frame [y, u, v]
    map_count: int
    occupancy_precision: int
    occupancy_resolution: int
    absolute_d1: bool
    geo_shift: int
    attribute_count: int
    frame_count: int
    # decoded attribute color format: chroma subsampling shift (1 = 4:2:0,
    # 0 = 4:4:4) and whether the samples are RGB (GBR 4:4:4 content) — the
    # reference branches on ``color_format()`` (``src/decoder.rs:300-305``)
    attr_chroma_shift: int = 1
    attr_is_rgb444: bool = False
    # grid geometry smoothing (SmoothingConfig) when the SEI is present
    # AND apply_geo_smoothing_type is set; None otherwise
    geo_smoothing: Optional[object] = None
    # grid attribute smoothing (AttrSmoothingConfig), same contract
    attr_smoothing: Optional[object] = None
    # When tiled, geo/attr planes are block-tiled (n_blocks, t, t) straight
    # from the native decoder copy (luma t = tile_size, chroma t/2);
    # occupancy stays raw (its size defines occupancy_precision).
    tiled: bool = False
    # tile edge of the tiled planes: the packing block size normally, or
    # the occupancy precision when the cell-granular path is active
    tile_size: int = 0
    # cell-granular dispatch (groups = occupied precision cells; see
    # atlas.groups.build_cell_table): chosen at prepare time so the
    # planes are decoded pre-tiled at the cell edge
    cell: bool = False
    # the tiled kernels bit-pack samples into 10-bit u32 fields; wider
    # decoded samples must use the gather kernel (i32 end to end)
    packed10_ok: bool = True
    # PLR (framework extension, single-map streams): the ASPS mode
    # table as (interpolate, filling, minimum_depth, neighbour_minus1)
    # tuples + the surface-thickness clamp; None when PLR is off
    plr_table: Optional[tuple] = None
    plr_thickness: int = 1
    # 3D geometry bit depth (asps_geometry_3d_bit_depth_minus1 + 1):
    # re-centering shift for the 45-degree inverse rotation
    geometry_bitdepth_3d: int = 10
    # single-map EOM: the fixed codeword bit count
    # (asps_eom_fix_bit_count_minus1 + 1); None on two-map streams
    # (there the D0..D1 gap bounds the codewords)
    eom_fix_bit_count: Optional[int] = None
    # auxiliary raw-patch videos (aux-flagged GVD/AVD units), raster
    # layout, one frame per atlas frame; None when the stream has none.
    # Only the host raw/EOM tails read them (framework extension).
    aux_geo_planes: Optional[List[np.ndarray]] = None
    aux_attr_planes: Optional[List[List[np.ndarray]]] = None
    aux_geo_shift: int = 0
    aux_chroma_shift: int = 1
    # FRAMEWORK EXTENSION: secondary attributes (vuh_attribute_index >
    # 0; the reference reads only attribute 0). Each decodes through
    # the IDENTICAL reconstruction graph with the attribute planes
    # swapped — emission order is a function of occupancy/geometry
    # only, so per-point alignment with the primary pass is free.
    sec_attrs: tuple = ()


# V3C attribute type ids (23090-5 table; the reference only ever
# consumes ATTR_TEXTURE). Names drive the extra PLY properties.
_ATTR_TYPE_NAMES = {
    0: "texture",
    1: "material_id",
    2: "transparency",
    3: "reflectance",
    4: "normal",
}


@dataclass(frozen=True)
class SecAttr:
    """One decoded secondary attribute (vuh_attribute_index >= 1)."""

    attr_index: int  # vuh_attribute_index (>= 1)
    type_id: int  # ai_attribute_type_id
    dimension: int  # ai_attribute_dimension_minus1 + 1 (1 or 3)
    planes: tuple  # per video frame (map-interleaved): [y, u, v]
    chroma_shift: int  # 1 = 4:2:0, 0 = 4:4:4 (after any 4:2:2 doubling)
    is_rgb444: bool
    bit_depth: int  # decoded sample bit depth
    # AttrSmoothingConfig when an attribute-smoothing SEI targets THIS
    # index (and the toggle is set, YUV dim-3 only); None otherwise
    smoothing: object = None
    # vuh_attribute_index as a string when another secondary shares this
    # type (PLY vertex properties must be uniquely named); "" otherwise
    name_suffix: str = ""
    # this attribute's AUXILIARY video (aux-flagged AVD units with this
    # vuh_attribute_index), raster, one frame per atlas frame; () when
    # the stream has no aux patches. The host tails' twin calls read it.
    aux_planes: tuple = ()
    aux_chroma_shift: int = 1

    def property_names(self) -> tuple:
        """PLY property names for this attribute's channels."""
        base = _ATTR_TYPE_NAMES.get(self.type_id, f"attr{self.attr_index}")
        sfx = self.name_suffix
        if self.dimension == 1:
            nm = base if self.type_id in _ATTR_TYPE_NAMES else f"{base}_c0"
            return (nm + sfx,)
        if self.type_id == 0:
            # a secondary texture: an index-suffixed RGB triple
            k = self.attr_index
            return (f"red{k}", f"green{k}", f"blue{k}")
        if self.type_id == 4:
            return (f"nx{sfx}", f"ny{sfx}", f"nz{sfx}")
        return tuple(f"{base}{sfx}_c{c}" for c in range(self.dimension))

    def finalize(self, col16: np.ndarray) -> np.ndarray:
        """Raw fetched (n, 3) u16 samples -> the output channel array.

        Texture-typed triples get the primary color treatment (exact
        f64 BT.709, or u8 truncation for decoded-RGB content); other
        types keep raw integer samples at the decoded bit depth."""
        from ..reconstruction.pointset import convert_yuv10_to_rgb8

        if self.dimension == 1:
            v = col16[:, :1]
            return v.astype(np.uint8) if self.bit_depth <= 8 else v
        if self.type_id == 0:
            if self.is_rgb444:
                return (col16 & 0xFF).astype(np.uint8)
            return convert_yuv10_to_rgb8(col16)
        return col16 if self.bit_depth > 8 else col16.astype(np.uint8)


def extract_geo_smoothing(context: Context, asps) -> Optional[object]:
    """Grid geometry-smoothing parameters from the first applicable
    prefix SEI (method_type 1), or None."""
    from ..ops.smoothing import SmoothingConfig
    from ..v3c.syntax import SeiPayloadType

    for i in range(context.atlas_tile_layer_len()):
        sei = context.get_atlas_tile_layer(i).sei
        if sei is None:
            continue
        for s in sei.sei_prefix:
            if s.payload_type != SeiPayloadType.GEOMETRY_SMOOTHING:
                continue
            for k in range(len(s.method_type)):
                if not s.instance_cancel_flag[k] and s.method_type[k] == 1:
                    cfg = SmoothingConfig(
                        grid_size=s.grid_size_minus_2[k] + 2,
                        threshold=s.threshold[k],
                        geometry_bitdepth_3d=asps.geometry_3d_bitdepth_minus1
                        + 1,
                    )
                    _check_grid_bound(cfg.grid_width)
                    return cfg
    return None


def extract_occupancy_synthesis(context: Context):
    """PBF parameters from the first applicable occupancy-synthesis SEI
    (method_type 1), or None (framework extension — the reference can
    neither parse the payload nor act on it, ``decoder.rs:240-242``)."""
    from ..reconstruction.occupancy_synthesis import (
        OccupancySynthesisConfig,
    )
    from ..v3c.syntax import SeiPayloadType

    for i in range(context.atlas_tile_layer_len()):
        sei = context.get_atlas_tile_layer(i).sei
        if sei is None:
            continue
        for s in sei.sei_prefix:
            if s.payload_type != SeiPayloadType.OCCUPANCY_SYNTHESIS:
                continue
            for k in range(len(s.method_type)):
                if not s.instance_cancel_flag[k] and s.method_type[k] == 1:
                    return OccupancySynthesisConfig(
                        threshold=1 << (s.pbf_log2_threshold_minus1[k] + 1),
                        passes=s.pbf_passes_count_minus1[k] + 1,
                        radius=s.pbf_filter_size_minus1[k] + 1,
                    )
    return None


# finest smoothing grid accepted: grid_width^3 cells x 6 int32 arrays per
# frame; 2^24 cells = ~400 MB at DEVICE_BATCH=2 — beyond that a (spec-
# legal) tiny grid_size would OOM the decode, so fail cleanly instead
_MAX_GRID_CELLS = 1 << 24


def _check_grid_bound(grid_width: int) -> None:
    if grid_width ** 3 > _MAX_GRID_CELLS:
        raise UnsupportedFeature(
            f"smoothing grid too fine: {grid_width}^3 cells exceeds the "
            f"supported bound ({_MAX_GRID_CELLS})"
        )


def extract_attr_smoothing(
    context: Context, asps, attr_idx: int = 0
) -> Optional[object]:
    """Grid attribute-smoothing parameters from the first applicable
    prefix SEI (method_type 1) targeting ``attr_idx``, or None. The SEI
    addresses attributes explicitly (``sai_attribute_idx``); secondary
    attributes take their own instance through the twin pass."""
    from ..ops.smoothing import AttrSmoothingConfig
    from ..v3c.syntax import SeiPayloadType

    for i in range(context.atlas_tile_layer_len()):
        sei = context.get_atlas_tile_layer(i).sei
        if sei is None:
            continue
        for s in sei.sei_prefix:
            if s.payload_type != SeiPayloadType.ATTRIBUTE_SMOOTHING:
                continue
            for j in range(s.num_attributes_updated):
                if (
                    s.attribute_smoothing_cancel_flag[j]
                    or s.attribute_idx[j] != attr_idx
                ):
                    continue
                for k in range(len(s.method_type[j])):
                    if (
                        not s.instance_cancel_flag[j][k]
                        and s.method_type[j][k] == 1
                    ):
                        cfg = AttrSmoothingConfig(
                            grid_size=s.grid_size_minus_2[j][k] + 2,
                            threshold_variation=s.threshold_variation[j][k],
                            threshold_difference=s.threshold_difference[j][k],
                            geometry_bitdepth_3d=asps.geometry_3d_bitdepth_minus1
                            + 1,
                        )
                        _check_grid_bound(cfg.grid_width)
                        return cfg
    return None


def prepare_gof(
    context: Context,
    num_video_threads: int = 3,
    tiled: bool = True,
    apply_geo_smoothing: bool = False,
    apply_attr_smoothing: bool = False,
    apply_occupancy_synthesis: bool = False,
) -> GofData:
    """Host stages 2-3: patch frames + video decode (parallel substreams).

    Enforces the same envelope the reference asserts in ``Decoder::decode``
    (``src/decoder.rs:34-180``).
    """
    vps = context.get_vps()
    oi = vps.occupancy_information
    gi = vps.geometry_information
    ai = vps.attribute_information
    asps = context.get_asps(0)

    if oi.occupancy_2d_bitdepth_minus1 != 7 or oi.occupancy_msb_align_flag:
        raise UnsupportedFeature("occupancy must be 8-bit, no msb align")
    if gi.geometry_msb_align_flag:
        raise UnsupportedFeature("geometry msb align")
    # FRAMEWORK EXTENSION: per-map video sub-streams decode (the
    # reference rejects the VPS flag, ``reader.rs:278-283``), for ANY
    # declared map count (the reference's own enum reserves
    # GeometryD0..D15, ``bitstream.rs:295-335``). Maps beyond the first
    # pair reconstruct as trailing surface layers: map m's point is
    # suppressed iff equal to map m-1's point (the m=1 rule of
    # ``codec.rs:421-427`` applied pairwise), appended per frame after
    # the map-0/1 points, before the raw/EOM/PLR tails.
    multi_map = vps.map_count_minus1 > 0 and vps.multiple_map_streams_present_flag
    map_count_total = vps.map_count_minus1 + 1
    if multi_map and any(vps.map_predictor_index_diff[1:]):
        raise UnsupportedFeature("map predictor index diff")
    if map_count_total > 2 and not all(
        vps.map_absolute_coding_enable_flag[1:]
    ):
        # the layer-m dedup comparand is map m-1's ABSOLUTE point; a
        # delta-coded intermediate map would need the predictor chain
        # materialized per layer
        raise UnsupportedFeature("delta-coded maps with more than two maps")
    # attribute 0 is the primary (texture -> colors); further indices
    # decode as extra per-point channels, and ZERO attributes decode
    # geometry-only (FRAMEWORK EXTENSIONS — the reference asserts
    # exactly one attribute, ``decoder.rs:133``, though its point-cloud
    # generator guards attribute_count > 0, ``codec.rs:274``)
    if ai.attribute_count >= 1 and ai.attribute_dimension_minus1[0] + 1 != 3:
        raise UnsupportedFeature("primary attribute must be 3-channel")
    for k in range(ai.attribute_count):
        if ai.attribute_dimension_partitions_minus1[k] + 1 != 1:
            raise UnsupportedFeature("attribute partitions != 1")
        if ai.attribute_msb_align_flag[k]:
            raise UnsupportedFeature("attribute msb align")
        if k > 0 and ai.attribute_dimension_minus1[k] + 1 not in (1, 3):
            raise UnsupportedFeature(
                f"secondary attribute dimension "
                f"{ai.attribute_dimension_minus1[k] + 1} (1 or 3)"
            )

    metas = create_patch_frames(context)
    frame_count = max((m.frame_index for m in metas), default=-1) + 1

    if map_count_total > 2:
        # layered-map envelope: EOM codewords are defined against the
        # D0/D1 pair, and smoothing's grid consumes the WHOLE frame's
        # point set (which the layered decomposition splits across
        # passes) — both gate cleanly. Secondary attributes DO decode
        # (per-view twin dispatches, _merge_layer_sec_vals). PLR /
        # pixel-interleave are single-map by parse.
        if any(m.eom_patches for m in metas):
            raise UnsupportedFeature("EOM patches with more than two maps")
        if apply_geo_smoothing or apply_attr_smoothing:
            raise UnsupportedFeature("smoothing with more than two maps")

    occ_bs = context.get_video_bitstream(VideoType.OCCUPANCY)
    if multi_map:
        geo_bs_list = [
            context.get_video_bitstream(
                VideoType(VideoType.GEOMETRY_D0 + m)
            )
            for m in range(map_count_total)
        ]
        attr_bs_sets = [
            [
                context.get_video_bitstream(
                    VideoType(VideoType.ATTRIBUTE_T0 + m), k
                )
                for m in range(map_count_total)
            ]
            for k in range(ai.attribute_count)
        ]
    else:
        geo_bs_list = [context.get_video_bitstream(VideoType.GEOMETRY)]
        attr_bs_sets = [
            [context.get_video_bitstream(VideoType.ATTRIBUTE, k)]
            for k in range(ai.attribute_count)
        ]
    if (
        occ_bs is None
        or None in geo_bs_list
        or any(None in s for s in attr_bs_sets)
    ):
        raise UnsupportedFeature("missing occupancy/geometry/attribute stream")

    occ_codec = codec_id_from_v3c(oi.occupancy_codec_id)
    geo_codec = codec_id_from_v3c(gi.geometry_codec_id)
    attr_codecs = [
        codec_id_from_v3c(ai.attribute_codec_id[k])
        for k in range(ai.attribute_count)
    ]

    # FRAMEWORK EXTENSION: auxiliary raw-patch videos (aux-flagged
    # GVD/AVD units — the reference asserts the header flag false,
    # ``reader.rs:74``). Raster layout: only the host raw/EOM tails
    # read them.
    aux_geo_bs = context.get_video_bitstream(VideoType.GEOMETRY_RAW)
    aux_attr_bs_list = [
        context.get_video_bitstream(VideoType.ATTRIBUTE_RAW, k)
        for k in range(ai.attribute_count)
    ]
    has_aux_raw = any(
        rp.in_aux_video for m in metas for rp in m.raw_patches
    )
    has_aux_eom = any(
        ep.in_aux_video for m in metas for ep in m.eom_patches
    )
    has_aux_patches = has_aux_raw or has_aux_eom
    # raw patches read their runs from the aux GEOMETRY video; raw and
    # EOM patches alike read their colors from the aux ATTRIBUTE video
    # of EVERY attribute family (the tails' twin calls)
    if has_aux_raw and aux_geo_bs is None:
        raise UnsupportedFeature(
            "aux-flagged raw patches but no auxiliary geometry "
            "video sub-stream"
        )
    if has_aux_patches:
        for k in range(ai.attribute_count):
            if aux_attr_bs_list[k] is None:
                raise UnsupportedFeature(
                    f"aux-flagged patches but attribute {k} has no "
                    f"auxiliary video sub-stream"
                )
    aux_geo_codec = (
        codec_id_from_v3c(gi.auxiliary_geometry_codec_id)
        if aux_geo_bs is not None else None
    )
    aux_attr_codecs = [
        codec_id_from_v3c(ai.auxiliary_attribute_codec_id[k])
        if aux_attr_bs_list[k] is not None else None
        for k in range(ai.attribute_count)
    ]

    occ_synth = (
        extract_occupancy_synthesis(context)
        if apply_occupancy_synthesis else None
    )
    if occ_synth is not None and (
        asps.pixel_deinterleaving_flag
        or asps.eom_patch_enabled_flag
    ):
        # the filter binarizes occupancy (destroying EOM codewords) and
        # pixel-interleave derivation consumes pre-synthesis occupancy
        raise UnsupportedFeature(
            "occupancy synthesis combined with EOM or pixel deinterleaving"
        )

    # FRAMEWORK EXTENSION: single-map pixel-interleaved geometry (the
    # reference asserts the ASPS flag false, ``reader.rs:1066``). The
    # host derives ordinary two-map D0/D1 planes once per frame
    # (reconstruction/pixel_interleave.py), so everything downstream
    # runs the standard two-map machinery.
    pix_il = asps.pixel_deinterleaving_flag
    if pix_il:
        if multi_map:
            raise UnsupportedFeature(
                "pixel deinterleaving with per-map video sub-streams"
            )
        if asps.plr_enabled_flag or any(
            m.raw_patches or m.eom_patches for m in metas
        ):
            raise UnsupportedFeature(
                "pixel deinterleaving combined with raw/EOM/PLR patches"
            )

    # Multiple attributes need no gate: raw/EOM/PLR tails take secondary
    # twin calls (the same tail with the attribute planes swapped) —
    # aux-flagged patches included, each attribute family carrying its
    # own auxiliary video (gated above when one is missing). Pixel-
    # interleaved streams work too: the secondary families alias one
    # frame per derived map, exactly like the primary.

    res = 1 << asps.log2_patch_packing_block_size
    # the tiled fast path requires even, precision-divisible block tiles
    tiled = tiled and res >= 2 and res % 2 == 0
    vtile = res if tiled else 0

    # Cell-granular dispatch wants planes tiled at the occupancy
    # PRECISION — which is only known from the decoded occupancy's
    # resolution, so occupancy decodes first (it is by far the smallest
    # substream; geo/attr still decode concurrently afterwards).
    cell = (
        CELL_GROUPS
        and tiled
        and not apply_geo_smoothing
        and not apply_attr_smoothing
        # synthesis re-resolves occupancy to precision 1 after decode;
        # the cell path sizes its tiles from the CODED precision
        and occ_synth is None
    )
    n_jobs = 1 + len(geo_bs_list) + sum(len(s) for s in attr_bs_sets)
    with ThreadPoolExecutor(max_workers=max(num_video_threads, n_jobs)) as pool:
        if cell:
            occ_frames = decompress_video(occ_bs.data, occ_codec)
            prec = (
                vps.frame_width // occ_frames[0].width if occ_frames else 0
            )
            if prec >= 2 and res % prec == 0:
                vtile = prec
            else:
                cell = False
            occ_f = None
        else:
            occ_f = pool.submit(decompress_video, occ_bs.data, occ_codec)
        geo_fs = [
            # pixel-interleaved geometry decodes RASTER: the host
            # deinterleave runs on canvas planes (re-tiled after)
            pool.submit(
                decompress_video, b.data, geo_codec, True,
                0 if pix_il else vtile,
            )
            for b in geo_bs_list
        ]
        attr_fs_sets = [
            [
                pool.submit(decompress_video, b.data, attr_codecs[k], True, vtile)
                for b in s
            ]
            for k, s in enumerate(attr_bs_sets)
        ]
        # aux videos decode raster (host-tail consumers only)
        aux_geo_f = (
            pool.submit(decompress_video, aux_geo_bs.data, aux_geo_codec)
            if aux_geo_bs is not None else None
        )
        aux_attr_fs = [
            pool.submit(decompress_video, b.data, aux_attr_codecs[k])
            if b is not None else None
            for k, b in enumerate(aux_attr_bs_list)
        ]
        if occ_f is not None:
            occ_frames = occ_f.result()
        geo_per_map = [f.result() for f in geo_fs]
        attr_per_map_sets = [[f.result() for f in fs] for fs in attr_fs_sets]
        attr_per_map = attr_per_map_sets[0] if attr_per_map_sets else []
        aux_geo_frames = aux_geo_f.result() if aux_geo_f else []
        aux_attr_frames_sets = [
            f.result() if f else [] for f in aux_attr_fs
        ]
    if has_aux_raw and len(aux_geo_frames) < frame_count:
        raise UnsupportedFeature(
            f"auxiliary geometry video decoded to {len(aux_geo_frames)} "
            f"frames, the atlas has {frame_count}"
        )
    aux_geo_shift = (
        max(0, aux_geo_frames[0].bit_depth - 8) if aux_geo_frames else 0
    )
    if multi_map:
        # interleave the per-map videos into the map-interleaved frame
        # order every downstream consumer indexes by (frame*mc + map)
        if len(set(len(v) for v in geo_per_map)) > 1 or any(
            len(set(len(v) for v in per_map)) > 1
            for per_map in attr_per_map_sets
        ):
            raise UnsupportedFeature(
                "per-map video sub-streams decoded to differing frame "
                f"counts (geo={[len(v) for v in geo_per_map]}, attr="
                f"{[[len(v) for v in s] for s in attr_per_map_sets]})"
            )
        geo_frames = [f for pair in zip(*geo_per_map) for f in pair]
        attr_frames_sets = [
            [f for pair in zip(*per_map) for f in pair]
            for per_map in attr_per_map_sets
        ]
    else:
        geo_frames = geo_per_map[0]
        attr_frames_sets = [per_map[0] for per_map in attr_per_map_sets]
    attr_frames = attr_frames_sets[0] if attr_frames_sets else []

    if not (
        occ_frames and geo_frames
        and (attr_frames or ai.attribute_count == 0)
    ):
        raise UnsupportedFeature(
            "a video sub-stream decoded to zero frames "
            f"(occ={len(occ_frames)}, geo={len(geo_frames)}, "
            f"attr={len(attr_frames)})"
        )
    if occ_frames[0].bit_depth != 8:
        raise UnsupportedFeature(
            f"occupancy decoded as {occ_frames[0].bit_depth}-bit, want 8"
        )
    geo_bit_depth = geo_frames[0].bit_depth
    # The reference divides geometry samples by 4 unconditionally because
    # libavcodec yields 10-bit planes (``src/codec.rs:532-534``); generalize
    # to the decoded bit depth so 8-bit-coded geometry also works.
    geo_shift = max(0, geo_bit_depth - 8)

    occupancy_precision = vps.frame_width // occ_frames[0].width

    # decoded-atlas-hash SEI verification (framework extension — the
    # reference skips hash SEI, ``lib.rs:100``): recompute each asserted
    # hash from the PARSED + DERIVED state and fail cleanly on mismatch.
    # Runs on the as-decoded occupancy (before PBF synthesis, which the
    # hash by definition precedes).
    daih_by_frame = collect_daih_by_frame(context)
    if daih_by_frame:
        from ..atlas.atlas_hash import high_level_byte_string
        from ..ops.tiled import untile_plane as _untile

        occ_res = 1 << asps.log2_patch_packing_block_size
        # frame-invariant; hoisted out of the loop (and only built when
        # some payload actually asserts a high-level hash)
        hl_bytes = (
            high_level_byte_string(context)
            if any(s.high_level_present
                   for seis in daih_by_frame.values() for s in seis)
            else b""
        )
        for fi, seis in sorted(daih_by_frame.items()):
            if fi >= len(occ_frames):
                continue  # frame-count mismatches gate later, uniformly
            occ = occ_frames[fi].planes[0]
            if occ.ndim == 3:  # native decoder emitted block-tiled
                t = occ.shape[-1]
                occ = _untile(
                    occ,
                    (vps.frame_height // occupancy_precision) // t,
                    (vps.frame_width // occupancy_precision) // t,
                )
            for sei in seis:  # every payload verifies (one per tile
                # layer in multi-tile streams)
                verify_frame_hashes(
                    sei,
                    [m for m in metas if m.frame_index == fi],
                    occ, occ_res, occupancy_precision, context, fi,
                    high_level_bytes=hl_bytes,
                )

    absolute_d1 = (
        vps.map_count_minus1 == 0 or vps.map_absolute_coding_enable_flag[1]
    )
    # decoded attribute color format (``src/decoder.rs:300-305`` branches
    # on it; ``Image::get`` indexes chroma by it, ``:973-980``). The
    # kernels' single shift covers 4:2:0 and 4:4:4; 4:2:2 upsamples to
    # 4:4:4 on the host below; anything else fails cleanly.
    def _normalize_chroma(frames, bs_list, codec):
        """FRAMEWORK EXTENSION: 4:2:2 attributes. Column-doubling the
        half-width chroma to 4:4:4 on the host is bit-exact with the
        x >> 1 sampling the decode would otherwise do (``Image::get``
        indexes by the format, ``decoder.rs:973-980``), so everything
        downstream runs the existing 4:4:4 machinery. The reference
        rejects the format outright. The block-tiled copy is
        luma-grid-aligned only for square subsampling, so a tiled
        4:2:2 first decode re-decodes raster (a raster first decode is
        reused as-is). Returns (frames, chroma_shift, forced_raster)."""
        if not frames:
            return frames, 1, False
        shifts = (frames[0].chroma_w_shift, frames[0].chroma_h_shift)
        forced = False
        if shifts == (1, 0):
            if frames[0].planes[0].ndim == 3:
                # per-map streams re-decode concurrently, like the
                # first decode fan-out above
                with ThreadPoolExecutor(len(bs_list)) as repool:
                    per_map = list(
                        repool.map(
                            lambda b: decompress_video(b.data, codec),
                            bs_list,
                        )
                    )
                frames = (
                    [f for pair in zip(*per_map) for f in pair]
                    if multi_map
                    else per_map[0]
                )
            for f in frames:
                f.planes[1] = np.repeat(f.planes[1], 2, axis=1)
                f.planes[2] = np.repeat(f.planes[2], 2, axis=1)
                f.chroma_w_shift = 0
            shifts = (0, 0)
            forced = True
        if shifts not in ((1, 1), (0, 0)):
            raise UnsupportedFeature(
                f"attribute chroma subsampling {shifts} (only 4:2:0 / "
                f"4:2:2 / 4:4:4)"
            )
        return frames, shifts[0], forced

    force_raster = False
    attr_chroma_shift = 1
    for k in range(len(attr_frames_sets)):
        frames_k, shift_k, forced_k = _normalize_chroma(
            attr_frames_sets[k], attr_bs_sets[k], attr_codecs[k]
        )
        attr_frames_sets[k] = frames_k
        force_raster |= forced_k
        if k == 0:
            attr_chroma_shift = shift_k
    attr_frames = attr_frames_sets[0] if attr_frames_sets else []
    attr_is_rgb444 = bool(attr_frames and attr_frames[0].is_rgb)

    # FRAMEWORK EXTENSION: one validation loop for EVERY attribute
    # family's auxiliary video (primary included — primary-only aliases
    # were a review-flagged bug class). The tails apply the REGULAR
    # video's bit depth / RGB-ness to aux-sourced samples
    # (SecAttr.finalize, the primary color conversion), so a format
    # mismatch must gate cleanly instead of silently mangling values.
    aux_attr_shifts = [1] * len(attr_frames_sets)
    if has_aux_patches:
        for k, aux_fr in enumerate(aux_attr_frames_sets):
            if len(aux_fr) < frame_count:
                raise UnsupportedFeature(
                    f"attribute {k} auxiliary video decoded to "
                    f"{len(aux_fr)} frames, the atlas has {frame_count}"
                )
            aux_sh = (aux_fr[0].chroma_w_shift, aux_fr[0].chroma_h_shift)
            if aux_sh not in ((1, 1), (0, 0)):
                raise UnsupportedFeature(
                    f"attribute {k} auxiliary chroma subsampling "
                    f"{aux_sh} (only 4:2:0 / 4:4:4)"
                )
            aux_attr_shifts[k] = aux_sh[0]
            reg = attr_frames_sets[k][0] if attr_frames_sets[k] else None
            if reg is not None and (
                aux_fr[0].bit_depth != reg.bit_depth
                or bool(aux_fr[0].is_rgb) != bool(reg.is_rgb)
            ):
                raise UnsupportedFeature(
                    f"attribute {k} auxiliary video format "
                    f"({aux_fr[0].bit_depth}-bit, "
                    f"rgb={bool(aux_fr[0].is_rgb)}) differs from the "
                    f"regular video ({reg.bit_depth}-bit, "
                    f"rgb={bool(reg.is_rgb)})"
                )
    if force_raster and tiled:
        # 4:2:2 attrs re-decoded raster: bring the geometry back to the
        # canvas layout — one GOF carries ONE plane layout (the dispatch
        # re-tiles for the kernels at staging; relayout); the attribute
        # sets are normalized by the shared loop below
        from ..ops.tiled import untile_plane

        for f in geo_frames:
            if f.planes[0].ndim == 3:
                f.planes[0] = untile_plane(
                    f.planes[0],
                    vps.frame_height // vtile,
                    vps.frame_width // vtile,
                )
        tiled = False
        cell = False
    # the native copy falls back to raw layout when dims don't divide
    # (pixel-interleaved geometry decodes raster by design — the attr
    # planes carry the tiled-or-not signal there; a geometry-only
    # pixel-interleaved stream has NO decoded plane carrying it, and
    # the host-built zero planes + re-tiled derived geometry take
    # whichever layout was requested, so `tiled` stands as-is)
    if not (pix_il and not attr_frames):
        probe_frames = attr_frames if pix_il else geo_frames
        tiled = (
            tiled and bool(probe_frames)
            and probe_frames[0].planes[0].ndim == 3
        )
    cell = cell and tiled

    # every attribute set must share the GOF's single plane layout (the
    # dispatch relayout is keyed once per GOF): 4:2:2 re-decodes and
    # per-video native raster fallbacks can leave stragglers in either
    # direction, so normalize them all against the final decision
    from ..ops.tiled import tile_plane, untile_plane

    for frames_k in attr_frames_sets:
        for f in frames_k:
            set_tiled = f.planes[0].ndim == 3
            if set_tiled == tiled:
                continue
            if set_tiled:
                bh = vps.frame_height // vtile
                bw = vps.frame_width // vtile
                for i in range(len(f.planes)):
                    f.planes[i] = untile_plane(f.planes[i], bh, bw)
            else:
                cs = f.chroma_w_shift
                f.planes[0] = tile_plane(f.planes[0], vtile)
                f.planes[1] = tile_plane(f.planes[1], vtile >> cs)
                f.planes[2] = tile_plane(f.planes[2], vtile >> cs)

    # PLR mode table (framework extension; the ASPS parse pins the
    # single-map envelope)
    plr_table = None
    plr_thickness = 1
    if asps.plr_enabled_flag:
        plri = next(
            (p for p in asps.plr_information if p.map_present_flag), None
        )
        if plri is not None:
            plr_table = tuple(
                zip(
                    plri.interpolate_flag,
                    plri.filling_flag,
                    plri.minimum_depth_flag,
                    plri.neighbour_minus1,
                )
            )
            plr_thickness = asps.vpcc_extension.surface_thickness_minus1 + 1

    if occ_synth is not None:
        # PBF occupancy synthesis (framework extension): refine the
        # occupancy at canvas resolution once per frame; the stream
        # behaves as occupancy-precision 1 downstream
        from ..ops.tiled import untile_plane
        from ..reconstruction.occupancy_synthesis import (
            synthesize_occupancy,
        )

        mc0 = vps.map_count_minus1 + 1
        if len(occ_frames) < frame_count or len(geo_frames) < frame_count * mc0:
            raise UnsupportedFeature(
                f"occupancy synthesis needs one occupancy+geometry frame "
                f"per atlas frame (occ={len(occ_frames)}, "
                f"geo={len(geo_frames)}, atlas={frame_count})"
            )
        # every decoded occupancy frame resolves to canvas resolution
        # so GofData's stack stays uniform; frames past the atlas count
        # are unused downstream (clamped geo reference)
        for i in range(len(occ_frames)):
            d0 = geo_frames[min(i, frame_count - 1) * mc0].planes[0]
            if d0.ndim == 3:
                d0 = untile_plane(
                    d0, vps.frame_height // vtile, vps.frame_width // vtile
                )
            occ_frames[i].planes[0] = synthesize_occupancy(
                occ_frames[i].planes[0], occupancy_precision, d0,
                geo_shift, occ_synth,
            )
        occupancy_precision = 1

    if pix_il:
        from ..ops.tiled import tile_plane
        from ..reconstruction.pixel_interleave import (
            deinterleave_geometry,
            upsample_occupancy_full,
        )

        if len(geo_frames) < frame_count or len(occ_frames) < frame_count:
            raise UnsupportedFeature(
                f"pixel-interleaved stream decoded {len(geo_frames)} "
                f"geometry frames for {frame_count} atlas frames"
            )
        geo_planes_out = []
        for i in range(frame_count):
            occ_c = upsample_occupancy_full(
                occ_frames[i].planes[0], occupancy_precision
            )
            d0, d1 = deinterleave_geometry(geo_frames[i].planes[0], occ_c)
            if tiled:
                d0 = tile_plane(d0, vtile)
                d1 = tile_plane(d1, vtile)
            geo_planes_out += [d0, d1]
        attr_planes_out = []
        for f in attr_frames[:frame_count]:
            planes = [p.astype(np.uint16, copy=False) for p in f.planes]
            # both derived maps sample the single interleaved attribute
            # frame (defined behavior; entries alias read-only planes)
            attr_planes_out += [planes, planes]
    else:
        geo_planes_out = [
            f.planes[0].astype(np.uint16, copy=False) for f in geo_frames
        ]
        attr_planes_out = [
            [p.astype(np.uint16, copy=False) for p in f.planes]
            for f in attr_frames
        ]

    if ai.attribute_count == 0:
        # FRAMEWORK EXTENSION: geometry-only streams (the reference
        # asserts exactly one attribute, ``decoder.rs:133``). The
        # kernels' color words ride ONE shared zero plane-set aliased
        # across every video frame; _emit_pointset and the tails drop
        # colors entirely (with_colors=False, attr=None), so the zeros
        # never surface in the output.
        from ..ops.tiled import tile_plane

        zy = np.zeros((vps.frame_height, vps.frame_width), np.uint16)
        zc = np.zeros(
            (vps.frame_height // 2, vps.frame_width // 2), np.uint16
        )
        if tiled:
            zy = tile_plane(zy, vtile)
            zc = tile_plane(zc, vtile >> 1)
        mc0 = 2 if pix_il else vps.map_count_minus1 + 1
        attr_planes_out = [[zy, zc, zc]] * (frame_count * mc0)

    # FRAMEWORK EXTENSION: secondary attributes (see SecAttr). Their
    # video-frame structure mirrors the primary's: per-map interleaved
    # (or per-map sub-streams), and on pixel-interleaved streams both
    # derived maps alias the single attribute frame.
    sec_attrs = []
    for k in range(1, len(attr_frames_sets)):
        fr = attr_frames_sets[k]
        mc_v = 1 if pix_il else vps.map_count_minus1 + 1
        if len(fr) < frame_count * mc_v:
            raise UnsupportedFeature(
                f"secondary attribute {k} decoded to {len(fr)} frames, "
                f"the atlas needs {frame_count * mc_v}"
            )
        if fr[0].bit_depth > 10:
            raise UnsupportedFeature(
                f"secondary attribute {k} decoded as "
                f"{fr[0].bit_depth}-bit (10-bit envelope)"
            )
        if pix_il:
            # both derived maps sample the single interleaved frame,
            # like the primary alias block above
            fr_planes = []
            for f in fr[:frame_count]:
                planes = [p.astype(np.uint16, copy=False) for p in f.planes]
                fr_planes += [planes, planes]
        else:
            fr_planes = [
                [p.astype(np.uint16, copy=False) for p in f.planes]
                for f in fr
            ]
        dim_k = ai.attribute_dimension_minus1[k] + 1
        # unique PLY property names when two secondaries share a type
        # (secondary textures already embed their index)
        type_k = ai.attribute_type_id[k]
        dup = sum(
            1 for j in range(1, len(attr_frames_sets))
            if ai.attribute_type_id[j] == type_k
        ) > 1
        suffix = str(k) if dup and not (type_k == 0 and dim_k == 3) else ""
        # validated (frame count / chroma / format match) by the
        # per-family aux loop above
        aux_fr = aux_attr_frames_sets[k] if has_aux_patches else []
        sec_attrs.append(SecAttr(
            attr_index=k,
            type_id=type_k,
            dimension=dim_k,
            planes=tuple(fr_planes),
            chroma_shift=fr[0].chroma_w_shift,
            is_rgb444=bool(fr[0].is_rgb),
            bit_depth=fr[0].bit_depth,
            smoothing=(
                extract_attr_smoothing(context, asps, attr_idx=k)
                if apply_attr_smoothing and dim_k == 3
                and not fr[0].is_rgb else None
            ),
            name_suffix=suffix,
            aux_planes=tuple(
                [p.astype(np.uint16, copy=False) for p in f.planes]
                for f in aux_fr
            ),
            aux_chroma_shift=aux_attr_shifts[k],
        ))

    return GofData(
        metas=metas,
        occ_planes=np.stack([f.planes[0] for f in occ_frames]),
        geo_planes=geo_planes_out,
        attr_planes=attr_planes_out,
        map_count=2 if pix_il else vps.map_count_minus1 + 1,
        occupancy_precision=occupancy_precision,
        occupancy_resolution=1 << asps.log2_patch_packing_block_size,
        absolute_d1=absolute_d1,
        geo_shift=geo_shift,
        attribute_count=ai.attribute_count,
        frame_count=frame_count,
        attr_chroma_shift=attr_chroma_shift,
        attr_is_rgb444=attr_is_rgb444,
        geo_smoothing=(
            extract_geo_smoothing(context, asps) if apply_geo_smoothing else None
        ),
        attr_smoothing=(
            extract_attr_smoothing(context, asps) if apply_attr_smoothing else None
        ),
        tiled=tiled,
        tile_size=vtile if tiled else 0,
        cell=cell,
        packed10_ok=(
            geo_bit_depth <= 10
            and (not attr_frames or attr_frames[0].bit_depth <= 10)
        ),
        plr_table=plr_table,
        plr_thickness=plr_thickness,
        geometry_bitdepth_3d=asps.geometry_3d_bitdepth_minus1 + 1,
        eom_fix_bit_count=(
            asps.eom_fix_bit_count_minus1 + 1
            if asps.eom_patch_enabled_flag and asps.map_count_minus1 == 0
            else None
        ),
        aux_geo_planes=(
            [f.planes[0].astype(np.uint16, copy=False) for f in aux_geo_frames]
            # same gate as aux_attr_planes: only aux-flagged raw patches
            # consume (and validate) the aux geometry video
            if has_aux_raw and aux_geo_frames else None
        ),
        aux_attr_planes=(
            [
                [p.astype(np.uint16, copy=False) for p in f.planes]
                for f in aux_attr_frames_sets[0]
            ]
            # gate on has_aux_patches: without aux-flagged patches the
            # per-family validation loop above never ran, so these
            # frames (and their chroma shift) are unvalidated
            if has_aux_patches
            and aux_attr_frames_sets and aux_attr_frames_sets[0] else None
        ),
        aux_geo_shift=aux_geo_shift,
        aux_chroma_shift=aux_attr_shifts[0] if aux_attr_shifts else 1,
        sec_attrs=tuple(sec_attrs),
    )


def decode_gof_frames(context: Context, params: Params) -> Iterator[PointSet3]:
    """Stages 2-5 for one GOF, yielding frames in order."""
    gof = prepare_gof(
        context,
        tiled=params.use_device,
        apply_geo_smoothing=params.apply_geo_smoothing_type,
        apply_attr_smoothing=params.apply_attr_smoothing_type,
        apply_occupancy_synthesis=params.apply_occupancy_synthesis_type,
    )
    if params.use_device:
        yield from _reconstruct_gof_device(gof, mesh=params.mesh)
    else:
        yield from _reconstruct_gof_oracle(gof)


# frames per device dispatch. Re-swept each time the kernel changes
# (round-4 megarow: B=1 3.80 vs B=2 4.43; round-7 merge-free + host
# pack: B=1 0.346-0.349 vs B=2 0.438-0.442 ms/frame device) — the
# compaction working set grows with the flattened batch, so per-frame
# COMPUTE is always best at B=1. On THIS tunneled environment a
# dispatch costs ~34 ms (B=1) vs ~17 ms/frame (B=2), so halving
# dispatches still wins end-to-end and B=2 stays; on a host-attached
# chip (~50 us dispatch) set this to 1.
DEVICE_BATCH = 2

# cell-granular dispatch (atlas.groups.build_cell_table): groups are
# occupied occupancy-precision cells, the device occupancy input
# disappears, and the compaction sort shrinks to ~the emitted point
# count. MEASURED SLOWER on TPU (round 4: 12.9 vs 7.7 ms/frame at
# 1280²/prec 4): the (N, 4, 4) slot grids waste ~97% of each vector
# lane and the 8-32 B row gathers pay per-row overhead, which together
# dwarf the ~17% sort-extent saving at realistic occupancy fill. Kept
# off (the path stays tested/bit-exact; flip only with new layout
# evidence, e.g. flattened 1-D grid compute).
CELL_GROUPS = False


def _convert_colors_device(col16, color_mode: str):
    """In-jit color finalization of a compacted prefix: 'yuv10' applies
    the exact integer BT.709 conversion (bit-equal to the host f64 chain
    — proof in ops/color.py), 'rgb16' the u16→u8 truncation, 'raw' keeps
    u16 YUV (oracle/debug surface)."""
    if color_mode == "yuv10":
        from ..ops.color import rgb8_from_yuv16

        return rgb8_from_yuv16(col16)
    if color_mode == "rgb16":
        from ..ops.color import rgb8_from_rgb16

        return rgb8_from_rgb16(col16)
    return col16


def _take_prefix_jit():
    import functools

    import jax

    @functools.partial(jax.jit, static_argnames=("b", "color_mode"))
    def take(pos, col, b, color_mode):
        return pos[:, :b], _convert_colors_device(col[:, :b], color_mode)

    return take


_take_prefix = None
_take_prefix_packed = None


def _take_prefix_packed_jit():
    import functools

    import jax

    from ..ops.tiled import _unpack_ops_points

    @functools.partial(jax.jit, static_argnames=("b", "color_mode"))
    def take(ops, b, color_mode):
        F = ops[0].shape[0]
        sliced = [o[:, :b] for o in ops]
        pos, col16 = _unpack_ops_points(sliced, F, b)
        return pos, _convert_colors_device(col16, color_mode)

    return take


def _prefix_bucket(counts, S: int) -> int:
    """Power-of-two fetch bucket covering the batch's max point count."""
    n_max = int(counts.max()) if counts.size else 0
    if n_max == 0:
        return 0
    bucket = 1
    while bucket < n_max:
        bucket *= 2
    return min(bucket, S)


def _fetch_prefixes_packed(ops, counts, color_mode: str = "raw"):
    """Device→host fetch for the PACKED narrow dispatch: the compacted
    sorted operands stay lane-friendly (F, S) u32/u16 on device; the
    prefix-slice jit unpacks positions/colors at the fetch bucket extent
    (the only place the 3-wide minor axis — which pads to the 128-lane
    tile on TPU — ever materializes) and the color conversion rides the
    same dispatch."""
    global _take_prefix_packed
    bucket = _prefix_bucket(counts, ops[0].shape[1])
    if bucket == 0:
        z = np.empty((counts.shape[0], 0, 3), dtype=np.uint16)
        cz = z if color_mode == "raw" else z.astype(np.uint8)
        return z, cz
    if _take_prefix_packed is None:
        _take_prefix_packed = _take_prefix_packed_jit()
    p, c = _take_prefix_packed(tuple(ops), b=bucket, color_mode=color_mode)
    return np.asarray(p), np.asarray(c)


def _fetch_prefixes(positions, colors16, counts, color_mode: str = "raw"):
    """Device→host fetch of a batch's compacted points: one extra dispatch
    slicing every frame to the max-count power-of-two bucket, instead of
    transferring the full padded slot arrays (outputs are compacted to the
    front). One dispatch total — round-trips dominate on high-latency
    links; transfer volume dominates on PCIe — this bounds both. The
    final color conversion rides the same dispatch (u8 on the wire)."""
    global _take_prefix
    bucket = _prefix_bucket(counts, positions.shape[1])
    if bucket == 0:
        z = np.empty((counts.shape[0], 0, 3), dtype=np.uint16)
        cz = z if color_mode == "raw" else z.astype(np.uint8)
        return z, cz
    if _take_prefix is None:
        _take_prefix = _take_prefix_jit()
    p, c = _take_prefix(positions, colors16, b=bucket, color_mode=color_mode)
    return np.asarray(p), np.asarray(c)


def _append_tail_points(ps: PointSet3, gof: GofData, pos_r, col_r,
                        extra_cols=None) -> None:
    """Append host-decoded tail points (raw/EOM patches) with the same
    exact color-conversion chain the regular points took (host f64 ==
    device jit, ops/color.py). ``extra_cols`` (one finalized array per
    ``gof.sec_attrs`` entry, from the tail's secondary twin calls)
    extends the extra-attribute channels in lockstep with positions."""
    from ..reconstruction.pointset import convert_yuv10_to_rgb8

    if pos_r.shape[0] == 0:
        return
    ps.positions = np.concatenate([ps.positions, pos_r])
    if gof.attribute_count > 0:
        rgb = (
            (col_r & 0xFF).astype(np.uint8)
            if gof.attr_is_rgb444
            else convert_yuv10_to_rgb8(col_r)
        )
        ps.colors = np.concatenate([ps.colors, rgb])
        if ps.colors16bit.shape[0]:
            ps.colors16bit = np.concatenate([ps.colors16bit, col_r])
    else:
        ps.colors = np.concatenate(
            [ps.colors, np.full((pos_r.shape[0], 3), 127, np.uint8)]
        )
    if gof.sec_attrs:
        assert extra_cols is not None and len(extra_cols) == len(
            ps.extra_attrs
        ), "tail points must extend every secondary channel"
        ps.extra_attrs = [
            (names, np.concatenate([vals, extra]))
            for (names, vals), extra in zip(ps.extra_attrs, extra_cols)
        ]


def _tail_secondary_extras(run, gof: GofData, base: int, fi: int):
    """Secondary twin calls for one host tail: rerun the tail function
    with each secondary's planes (regular AND auxiliary — every
    attribute family carries its own aux video) swapped in; tails are
    deterministic, so positions align, and the second call's colors
    are the secondary's samples."""
    return [
        sa.finalize(run(
            sa.planes[base], sa.chroma_shift,
            sa.aux_planes[fi] if sa.aux_planes else None,
            sa.aux_chroma_shift,
        )[1])
        for sa in gof.sec_attrs
    ]


def _append_raw_points(ps: PointSet3, gof: GofData, meta) -> None:
    """Append the frame's raw-patch points (framework extension — the
    reference panics on raw patches, ``reader.rs:1068``) AFTER the
    regular points and after smoothing/color conversion: raw coordinates
    are verbatim outliers, not projected surface, so smoothing never
    touches them. Host-side NumPy by design — raw patches are a tiny
    tail, far below device-dispatch scale."""
    from ..reconstruction.raw_points import raw_points_for_frame

    base = meta.frame_index * gof.map_count
    attr = gof.attr_planes[base] if gof.attribute_count > 0 else None

    def run(planes, shift, aux_planes, aux_shift):
        return raw_points_for_frame(
            meta.raw_patches,
            gof.geo_planes[base],
            planes,
            gof.geo_shift,
            shift,
            meta.width,
            tile_size=gof.tile_size if gof.tiled else 0,
            left_top=meta.left_top_in_frame,
            aux_geo_plane=(
                gof.aux_geo_planes[meta.frame_index]
                if gof.aux_geo_planes else None
            ),
            aux_attr_planes=aux_planes,
            aux_geo_shift=gof.aux_geo_shift,
            aux_chroma_shift=aux_shift,
        )

    fi = meta.frame_index
    pos_r, col_r = run(
        attr, gof.attr_chroma_shift,
        gof.aux_attr_planes[fi] if gof.aux_attr_planes else None,
        gof.aux_chroma_shift,
    )
    _append_tail_points(
        ps, gof, pos_r, col_r, _tail_secondary_extras(run, gof, base, fi)
    )


def _meta_has_plr(gof: GofData, meta) -> bool:
    return gof.plr_table is not None and any(
        p.plr_modes is not None for p in meta.patches
    )


def _append_plr_points(ps: PointSet3, gof: GofData, meta) -> None:
    """Append the frame's PLR-derived far-surface points (framework
    extension — the reference panics on the ASPS flag,
    ``reader.rs:1082``) AFTER the regular points and after smoothing.
    See ``reconstruction/plr_points.py`` for the mode semantics."""
    from ..reconstruction.plr_points import plr_points_for_frame

    base = meta.frame_index * gof.map_count
    attr = gof.attr_planes[base] if gof.attribute_count > 0 else None

    def run(planes, shift, _aux_planes=None, _aux_shift=1):
        # PLR has no auxiliary-video form; uniform twin signature
        return plr_points_for_frame(
            meta,
            gof.occ_planes[meta.frame_index],
            gof.geo_planes[base],
            planes,
            gof.geo_shift,
            shift,
            meta.width,
            gof.occupancy_precision,
            gof.plr_table,
            gof.plr_thickness,
            tile_size=gof.tile_size if gof.tiled else 0,
            left_top=meta.left_top_in_frame,
            geometry_bitdepth_3d=gof.geometry_bitdepth_3d,
        )

    pos_p, col_p = run(attr, gof.attr_chroma_shift)
    _append_tail_points(
        ps, gof, pos_p, col_p,
        _tail_secondary_extras(run, gof, base, meta.frame_index),
    )


def _append_eom_points(ps: PointSet3, gof: GofData, meta) -> None:
    """Append the frame's EOM in-between points (framework extension —
    the reference panics on EOM patches, ``reader.rs:1069``) AFTER the
    regular points and after smoothing, BEFORE raw points. See
    ``reconstruction/eom_points.py`` for the codeword convention and
    why this is host-side."""
    from ..reconstruction.eom_points import eom_points_for_frame

    base = meta.frame_index * gof.map_count
    attr = gof.attr_planes[base] if gof.attribute_count > 0 else None

    def run(planes, shift, aux_planes, aux_shift):
        return eom_points_for_frame(
            meta,
            gof.occ_planes[meta.frame_index],
            gof.geo_planes[base],
            planes,
            gof.geo_shift,
            shift,
            meta.width,
            gof.occupancy_precision,
            tile_size=gof.tile_size if gof.tiled else 0,
            left_top=meta.left_top_in_frame,
            geometry_bitdepth_3d=gof.geometry_bitdepth_3d,
            fix_bit_count=gof.eom_fix_bit_count,
            aux_attr_planes=aux_planes,
            aux_chroma_shift=aux_shift,
        )

    fi = meta.frame_index
    pos_e, col_e = run(
        attr, gof.attr_chroma_shift,
        gof.aux_attr_planes[fi] if gof.aux_attr_planes else None,
        gof.aux_chroma_shift,
    )
    _append_tail_points(
        ps, gof, pos_e, col_e, _tail_secondary_extras(run, gof, base, fi)
    )


def _reconstruct_gof_oracle(gof: GofData) -> Iterator[PointSet3]:
    from ..reconstruction.oracle import GeneratePointCloudParams, generate_point_cloud

    for meta in gof.metas:
        params = GeneratePointCloudParams(
            occupancy_resolution=gof.occupancy_resolution,
            occupancy_precision=gof.occupancy_precision,
            absolute_d1=gof.absolute_d1,
            map_count_minus1=gof.map_count - 1,
            attribute_count=gof.attribute_count,
            geo_shift=gof.geo_shift,
            geometry_bitdepth_3d=gof.geometry_bitdepth_3d,
        )
        mc = gof.map_count
        base = meta.frame_index * mc
        attr_video = gof.attr_planes  # full video; oracle indexes by map+shift
        ps, partition, _ = generate_point_cloud(
            meta,
            params,
            gof.occ_planes[meta.frame_index],
            gof.geo_planes,
            [attr_video],
        )
        if gof.geo_smoothing is not None and len(ps) > 0:
            from ..ops.smoothing import smooth_slots_np

            pos = ps.positions.astype(np.int32)
            sx, sy, sz = smooth_slots_np(
                pos[:, 0], pos[:, 1], pos[:, 2],
                np.ones(len(ps), np.int32),
                np.asarray(partition, np.int32),
                gof.geo_smoothing,
            )
            ps.positions = np.stack([sx, sy, sz], axis=1).astype(np.uint16)
        if (
            gof.attr_smoothing is not None
            and len(ps) > 0
            and gof.attribute_count > 0
            and not gof.attr_is_rgb444
        ):
            from ..ops.smoothing import smooth_colors_np

            pos = ps.positions.astype(np.int32)
            col = ps.colors16bit.astype(np.int32)
            cy2, cu2, cv2 = smooth_colors_np(
                pos[:, 0], pos[:, 1], pos[:, 2],
                col[:, 0], col[:, 1], col[:, 2],
                np.ones(len(ps), np.int32),
                np.asarray(partition, np.int32),
                gof.attr_smoothing,
            )
            ps.colors16bit = np.stack([cy2, cu2, cv2], axis=1).astype(np.uint16)
        if gof.attribute_count > 0:
            if gof.attr_is_rgb444:
                ps.copy_rgb16_to_rgb8()
            else:
                ps.convert_yuv16_to_rgb8()
        for sa in gof.sec_attrs:
            # oracle twin pass (cf. _secondary_chunk_values): the same
            # scalar reconstruction with the attribute video swapped;
            # positions/order are attribute-independent, colors16bit
            # carries the secondary's raw samples
            ps2, partition2, _ = generate_point_cloud(
                meta,
                params,
                gof.occ_planes[meta.frame_index],
                gof.geo_planes,
                [list(sa.planes)],
            )
            col2 = ps2.colors16bit
            if sa.smoothing is not None and len(ps2) > 0:
                # the secondary's own attribute-smoothing SEI instance:
                # smoothing consumes geometry-SMOOTHED positions, like
                # the primary sequence above
                from ..ops.smoothing import (
                    smooth_colors_np,
                    smooth_slots_np,
                )

                pos2 = ps2.positions.astype(np.int32)
                part2 = np.asarray(partition2, np.int32)
                ones = np.ones(len(ps2), np.int32)
                if gof.geo_smoothing is not None:
                    sx, sy, sz = smooth_slots_np(
                        pos2[:, 0], pos2[:, 1], pos2[:, 2],
                        ones, part2, gof.geo_smoothing,
                    )
                    pos2 = np.stack([sx, sy, sz], axis=1)
                c = col2.astype(np.int32)
                cy2, cu2, cv2 = smooth_colors_np(
                    pos2[:, 0], pos2[:, 1], pos2[:, 2],
                    c[:, 0], c[:, 1], c[:, 2],
                    ones, part2, sa.smoothing,
                )
                col2 = np.stack([cy2, cu2, cv2], axis=1).astype(np.uint16)
            ps.extra_attrs.append(
                (sa.property_names(), sa.finalize(col2))
            )
        if _meta_has_plr(gof, meta):
            _append_plr_points(ps, gof, meta)
        if meta.eom_patches:
            _append_eom_points(ps, gof, meta)
        if meta.raw_patches:
            _append_raw_points(ps, gof, meta)
        yield ps


@dataclass
class DeviceInputs:
    """Host-staged arrays for one device reconstruction dispatch.

    ``arrays`` = (fields, occ, geo0, geo1, attr_y, attr_u, attr_v), each
    with a leading frame axis; planes are block-tiled when ``use_tiled``.
    Inputs from different GOFs/streams with equal ``cfg``/``use_tiled``
    can be concatenated along the frame axis and dispatched together
    (the multi-stream batcher does exactly that)."""

    cfg: object  # FrameConfig (hashable, static)
    use_tiled: bool
    arrays: tuple
    n_frames: int
    # device color finalization: 'yuv10' (exact integer BT.709 → u8),
    # 'rgb16' (u16→u8 truncation), 'raw' (u16 YUV out). Part of the batch
    # key: same-cfg streams may still differ in RGB-vs-YUV content.
    color_mode: str = "raw"

    @property
    def group_cap(self) -> int:
        """Device group-axis extent: the field table's (possibly bucketed
        — see ``atlas.groups.bucket_group_count``) group count."""
        return self.arrays[0].shape[1]

    @property
    def slot_cap(self) -> int:
        return self.group_cap * self.cfg.slots_per_group

    @property
    def batch_key(self):
        # group_cap is part of the key: inputs bucketed to different
        # group extents cannot share one concatenated dispatch
        return (self.cfg, self.use_tiled, self.color_mode, self.group_cap)


def _gof_frame_tables(gof: GofData, metas, allow_cell: bool = True):
    """Host stage: the FrameConfig + per-frame group tables for ``metas``.

    ``allow_cell=False`` forces block-granular tables — required for
    spatially sharded dispatches: the sharded output stitch concatenates
    per-shard compacted prefixes, which is only emission-ordered when
    consecutive table rows own DISJOINT emission ranges. Block groups
    do; cells of one block interleave their pixel rows, so a shard
    boundary inside a block would interleave across shards."""
    from ..atlas.groups import build_group_table
    from ..ops.reconstruct import make_config

    cfg = make_config(
        width=metas[0].width,
        height=metas[0].height,
        occupancy_resolution=gof.occupancy_resolution,
        occupancy_precision=gof.occupancy_precision,
        map_count=gof.map_count,
        absolute_d1=gof.absolute_d1,
        geo_shift=gof.geo_shift,
        chroma_shift=gof.attr_chroma_shift,
        smoothing=gof.geo_smoothing,
        # color smoothing operates on YUV samples; skip for RGB content
        attr_smoothing=None if gof.attr_is_rgb444 else gof.attr_smoothing,
        # 45-degree views (framework extension): per-point inverse
        # rotation, wide emission only (tiled.narrow_emit_ok)
        additional_planes=any(
            p.axis_of_additional_plane != 0
            for m in metas for p in m.patches
        ),
        geometry_bitdepth_3d=gof.geometry_bitdepth_3d,
    )

    def occ_provider_for(m):
        # occupancy for the (rare) occupancy-gated ownership fallback —
        # overlapping non-block-aligned patches only. GofData.occ_planes
        # is always canvas-order (only geo/attr arrive block-tiled from
        # the native decoder; occ tiles in NumPy at dispatch)
        return lambda: gof.occ_planes[m.frame_index]

    tables = [
        build_group_table(
            m,
            occupancy_resolution=cfg.occupancy_resolution,
            occ_provider=occ_provider_for(m),
            occ_precision=gof.occupancy_precision,
        )
        for m in metas
    ]
    from ..atlas.groups import coords_fit_10bit

    from ..ops.tiled import narrow_emit_ok, tiled_supported

    if (
        allow_cell
        and gof.cell
        # cell tables only ever feed the narrow pretiled kernel — every
        # use_tiled precondition must hold too, or the gather fallback
        # would see cell-granular rows and a dummy occupancy plane
        and tiled_supported(cfg)
        and gof.packed10_ok
        # conservative dispatch-shape bound: F <= DEVICE_BATCH, cell
        # slots <= the block slot capacity (shared predicate with the
        # kernels — tiled.narrow_emit_ok)
        and narrow_emit_ok(cfg, DEVICE_BATCH, cfg.s_cap)
        and all(t.tiled_ok for t in tables)
        # quantized patch extents trim pixels of live cells; cell
        # tables skip the occupancy test, so such frames stay on
        # block tables (atlas.groups.build_cell_table raises)
        and all(t.trim is None for t in tables)
    ):
        from ..atlas.groups import build_cell_table

        cell_tables = [
            build_cell_table(
                m,
                gof.occ_planes[m.frame_index],
                gof.occupancy_precision,
                occupancy_resolution=cfg.occupancy_resolution,
                block_table=t,
            )
            for m, t in zip(metas, tables)
        ]
        cfg, tables = replace(cfg, cell_groups=True), cell_tables
    # pack30: one-u32 coordinate packing when the host can bound every
    # axis value below 1024 for this GOF (narrow-path sort payload
    # shrinks 10 B -> 8 B); content outside the bound keeps the split
    # layout — a separate compile variant either way
    if gof.packed10_ok and all(
        coords_fit_10bit(
            t.fields, t.n_groups, cfg.group_tile, cfg.geo_shift,
            cfg.absolute_d1,
        )
        for t in tables
    ):
        cfg = replace(cfg, pack30=True)
    return cfg, tables


def _group_capacity(cfg) -> int:
    """Static group-axis capacity for bucketing: all canvas blocks, or
    all precision cells in cell-groups mode."""
    return (cfg.width // cfg.group_tile) * (cfg.height // cfg.group_tile)


def _gof_device_inputs(
    gof: GofData, metas=None, space_multiple: int = 1,
    prebuilt=None, g_bucket: int = None,
) -> DeviceInputs:
    """Build the device input arrays for (a chunk of) a GOF's frames.

    The group axis is BUCKETED to the live group count (quarter-pow2
    steps, ``atlas.groups.bucket_group_count``): live groups sit at the
    front of every table in emission order, so slicing drops only
    G_VALID=0 padding — bit-identical compacted output while the words
    stage and the compaction sort process ~the live slot set instead of
    the full canvas-block capacity. ``space_multiple`` (the mesh 'space'
    axis size) keeps the bucket shardable. ``prebuilt``/``g_bucket``
    let the GOF driver share tables and pin ONE bucket across its
    chunks, so chunking never multiplies compile variants."""
    from ..atlas.groups import bucket_group_count
    from ..ops.tiled import (
        cat_mode_ok,
        tile_plane,
        tiled_supported,
        untile_plane,
    )

    from ..atlas.groups import N_GROUP_FIELDS

    metas = gof.metas if metas is None else metas
    mc = gof.map_count
    cfg, tables = (
        prebuilt
        if prebuilt is not None
        else _gof_frame_tables(gof, metas, allow_cell=space_multiple <= 1)
    )
    if g_bucket is None:
        g_bucket = bucket_group_count(
            max((t.n_groups for t in tables), default=0),
            _group_capacity(cfg),
            multiple_of=space_multiple,
        )
    # split-sort policy follows the bucket (deterministic, so chunks of
    # one GOF still share a config/compile)
    from ..ops.tiled import choose_compaction

    _shift, _split_k, _split_batched = choose_compaction(
        g_bucket, cfg.slots_per_group, cfg.cell_groups
    )
    if space_multiple > 1:
        # spatial sharding slices the group axis: the policy must hold
        # for the SHARD-LOCAL slot extent (per-shard compaction with
        # shard-local destinations is exactly per-shard sort semantics
        # — tests/test_sharding.py pins the stitch)
        _shift, _, _ = choose_compaction(
            g_bucket // space_multiple, cfg.slots_per_group,
            cfg.cell_groups,
        )
    cfg = replace(
        cfg, shift_compact=_shift,
        sort_split=_split_k, sort_split_batched=_split_batched,
    )
    fields = np.zeros((len(tables), g_bucket, N_GROUP_FIELDS), np.int32)
    trims = None
    if any(t.trim is not None for t in tables):
        # quantized patch extents (patch size quantizer): per-group
        # pixel limits, applied as a packed-occupancy-bit mask in the
        # cat staging (ops.tiled.trim_extent_bits)
        trims = np.full(
            (len(tables), g_bucket, 2), cfg.occupancy_resolution, np.int32
        )
    for k, t in enumerate(tables):
        # bucket_group_count guarantees bucket >= every live count for
        # the internal callers; a smaller explicit g_bucket would
        # silently drop live emission-ordered groups
        if t.n_groups > g_bucket:
            raise ValueError(
                f"g_bucket {g_bucket} < live group count {t.n_groups}"
            )
        fields[k, : t.n_groups] = t.fields[: t.n_groups]
        if trims is not None and t.trim is not None:
            trims[k, : t.n_groups] = t.trim[: t.n_groups]
    use_tiled = (
        tiled_supported(cfg)
        and gof.packed10_ok  # the tiled kernels pack samples into 10 bits
        and all(t.tiled_ok for t in tables)
    )
    res = cfg.occupancy_resolution
    # source tile edge of the gof's planes (0 = canvas layout) and the
    # kernel's wanted edge (block edge, or the precision cell edge when
    # the tables came back cell-granular)
    ts = gof.tile_size if gof.tiled else 0
    kt = cfg.group_tile if use_tiled else 0

    def relayout(plane, shift=0):
        # untile/retile between the decoder-emitted layout and the
        # kernel's — a no-op on the production path (prepare_gof decodes
        # straight into the wanted layout). ``shift`` is the chroma
        # subsampling of this plane: tile edges scale with it while tile
        # COUNTS stay resolution-independent (same grid as luma).
        if ts == kt:
            return plane
        if ts:
            plane = untile_plane(plane, cfg.height // ts, cfg.width // ts)
        return tile_plane(plane, kt >> shift) if kt else plane

    geo0 = np.stack(
        [relayout(gof.geo_planes[m.frame_index * mc]) for m in metas]
    )
    geo1 = np.stack(
        [
            relayout(
                gof.geo_planes[m.frame_index * mc + (1 if mc > 1 else 0)]
            )
            for m in metas
        ]
    )

    def attr_stack(plane_idx, shift):
        return np.stack(
            [
                np.stack(
                    [
                        relayout(
                            gof.attr_planes[m.frame_index * mc + z][plane_idx],
                            shift,
                        )
                        for z in range(mc)
                    ]
                )
                for m in metas
            ]
        )

    ay = attr_stack(0, 0)
    au = attr_stack(1, cfg.chroma_shift)
    av = attr_stack(2, cfg.chroma_shift)

    if cfg.cell_groups:
        # cell groups are occupied by construction — no occupancy input
        occ = np.zeros((len(metas), 1, 1, 1), np.uint8)
    else:
        occ = np.stack([gof.occ_planes[m.frame_index] for m in metas])
        if use_tiled:
            occ = tile_plane(occ, kt // cfg.occupancy_precision)

    arrays = (fields, occ, geo0, geo1, ay, au, av)
    if trims is not None and not (use_tiled and not cfg.raw_gather):
        # the quantized-extent trim is expressed as a packed-occupancy
        # mask in the block-tiled cat; the gather fallback and the
        # raw-gather debug path read occupancy at video precision where
        # a sub-cell trim boundary cannot be represented
        raise UnsupportedFeature(
            "patch size quantizer needs the block-tiled dispatch "
            "(rotated orientations / non-10-bit-packable streams are "
            "outside the quantized-patch envelope)"
        )
    if use_tiled and (cat_mode_ok(cfg) or trims is not None):
        # HOST PACK + HOST ORIENTATION (round 7): emit the three u32
        # sample planes packed + concatenated on the host with
        # SWAP-family blocks pre-transposed — the device graph starts
        # at the mega-row gather, dropping its largest non-kernel
        # stage AND the orientation fix (~-0.12-0.16 ms/frame on-chip)
        # for ~1.2x H2D bytes. The native pack (pack_planes.cc; numpy
        # fallback) rides host_prepare, overlapped with the previous
        # GOF's device work. Cat-mode dispatch: (fields, cat, None x5).
        # Mesh dispatches take it too: the cat replicates over 'space'
        # exactly like the planes did (parallel/spatial.py in_specs).
        # quantized frames FORCE the cat staging even when the hostpack
        # policy knob is off: the trim only exists as a bit mask in the
        # packed cat (numpy pack fallback works on every backend)
        from ..ops.tiled import stage_cat_inputs

        arrays, cfg = stage_cat_inputs(
            fields, occ, geo0, geo1, ay, au, av, cfg, trims=trims
        )
    return DeviceInputs(
        cfg=cfg,
        use_tiled=use_tiled,
        arrays=arrays,
        n_frames=len(metas),
        color_mode=_gof_color_mode(gof),
    )


_take_shard_prefix = None


_take_shard_prefix_packed = None


def _fetch_sharded_packed(ops, counts, n_space: int, s_loc: int,
                          color_mode: str = "raw"):
    """Prefix fetch + host stitch for the PACKED mesh-sharded layout:
    each op is globally (F, s_cap) with the slot axis sharded over
    'space'; shard d's compacted prefix occupies rows
    [d*s_loc, d*s_loc + counts[f, d]). The fetch jit slices every
    shard's prefix bucket and unpacks minor-dim-3 points at that
    extent only (cf. _fetch_prefixes_packed)."""
    import functools

    import jax

    global _take_shard_prefix_packed
    counts = np.asarray(counts)  # (F, n_space)
    n_max = int(counts.max()) if counts.size else 0
    if n_max == 0:
        z = np.empty((0, 3), dtype=np.uint16)
        cz = z if color_mode == "raw" else z.astype(np.uint8)
        return [(z, cz) for _ in range(counts.shape[0])]
    bucket = 1
    while bucket < n_max:
        bucket *= 2
    bucket = min(bucket, s_loc)
    if _take_shard_prefix_packed is None:
        from ..ops.tiled import _unpack_ops_points

        @functools.partial(jax.jit, static_argnames=("ns", "b", "color_mode"))
        def take(ops, ns, b, color_mode):
            F, S = ops[0].shape
            sliced = [o.reshape(F, ns, S // ns)[:, :, :b] for o in ops]
            flat = [s.reshape(F * ns, b) for s in sliced]
            pos, col16 = _unpack_ops_points(flat, F * ns, b)
            pos = pos.reshape(F, ns, b, 3)
            col = _convert_colors_device(col16, color_mode).reshape(
                F, ns, b, -1
            )
            return pos, col

        _take_shard_prefix_packed = take
    p, c = _take_shard_prefix_packed(
        tuple(ops), ns=n_space, b=bucket, color_mode=color_mode
    )
    p, c = np.asarray(p), np.asarray(c)  # (F, n_space, bucket, 3)
    per_frame = []
    for f in range(counts.shape[0]):
        parts_p = [p[f, d, : counts[f, d]] for d in range(n_space)]
        parts_c = [c[f, d, : counts[f, d]] for d in range(n_space)]
        per_frame.append((np.concatenate(parts_p), np.concatenate(parts_c)))
    return per_frame


def _fetch_sharded(
    positions, colors16, counts, n_space: int, s_loc: int,
    color_mode: str = "raw",
):
    """Prefix fetch + host stitch of the mesh-sharded output layout:
    each frame's shard d rows are [d*s_loc, d*s_loc + counts[f, d])."""
    import functools

    import jax

    global _take_shard_prefix
    counts = np.asarray(counts)  # (F, n_space)
    n_max = int(counts.max()) if counts.size else 0
    per_frame = []
    if n_max == 0:
        z = np.empty((0, 3), dtype=np.uint16)
        cz = z if color_mode == "raw" else z.astype(np.uint8)
        return [(z, cz) for _ in range(counts.shape[0])]
    bucket = 1
    while bucket < n_max:
        bucket *= 2
    bucket = min(bucket, s_loc)
    if _take_shard_prefix is None:

        @functools.partial(jax.jit, static_argnames=("ns", "b", "color_mode"))
        def take(pos, col, ns, b, color_mode):
            F, S, _ = pos.shape
            p = pos.reshape(F, ns, S // ns, 3)[:, :, :b]
            c = col.reshape(F, ns, S // ns, 3)[:, :, :b]
            return p, _convert_colors_device(c, color_mode)

        _take_shard_prefix = take
    p, c = _take_shard_prefix(
        positions, colors16, ns=n_space, b=bucket, color_mode=color_mode
    )
    p, c = np.asarray(p), np.asarray(c)  # (F, n_space, bucket, 3)
    for f in range(counts.shape[0]):
        parts_p = [p[f, d, : counts[f, d]] for d in range(n_space)]
        parts_c = [c[f, d, : counts[f, d]] for d in range(n_space)]
        per_frame.append((np.concatenate(parts_p), np.concatenate(parts_c)))
    return per_frame


def _gof_color_mode(gof: GofData) -> str:
    """Device color finalization for a GOF: exact integer BT.709 for YUV
    content, u16→u8 truncation for decoded-RGB content."""
    if gof.attribute_count <= 0:
        return "raw"
    return "rgb16" if gof.attr_is_rgb444 else "yuv10"


def _st(stats, name: str):
    """Sub-stage timer riding the GOF's stats record (no-op without
    one) — the e2e artifact's stage split (VERDICT r4 item 7) reads
    these to show WHERE reconstruct time goes on a tunneled chip."""
    from contextlib import nullcontext

    return stage_timer(stats, name) if stats is not None else nullcontext()


def _dispatch_device(di: DeviceInputs, mesh=None, stats=None):
    """Run one device dispatch; returns a per-frame list of host
    (positions (n,3) u16, colors (n,3)) in emission order. Colors are
    final u8 RGB unless ``di.color_mode`` is 'raw' (u16 YUV)."""
    from ..ops.reconstruct import reconstruct_batch
    from ..ops.tiled import reconstruct_batch_pretiled

    color_mode = di.color_mode

    # (smoothing works sharded too: the grid passes psum their cell
    # stats across the 'space' axis inside shard_map)
    if mesh is not None and di.use_tiled:
        from ..parallel.mesh import pad_batch
        from ..parallel.spatial import reconstruct_gof_spatial_pretiled

        data = mesh.shape["data"]
        n_space = mesh.shape["space"]
        if di.group_cap % n_space == 0:
            from ..ops.tiled import narrow_emit_ok

            arrays = [
                None if a is None else pad_batch(a, data)
                for a in di.arrays
            ]
            s_loc = di.slot_cap // n_space
            f_shard = arrays[0].shape[0] // data
            if narrow_emit_ok(di.cfg, f_shard, s_loc):
                from ..parallel.spatial import (
                    reconstruct_gof_spatial_pretiled_packed,
                )

                ops, cnt, _ = reconstruct_gof_spatial_pretiled_packed(
                    mesh, *arrays, di.cfg
                )
                return _fetch_sharded_packed(
                    ops, cnt, n_space, s_loc, color_mode=color_mode
                )[: di.n_frames]
            pos, col, cnt, _ = reconstruct_gof_spatial_pretiled(
                mesh, *arrays, di.cfg
            )
            return _fetch_sharded(
                pos, col, cnt, n_space, s_loc, color_mode=color_mode
            )[: di.n_frames]
        # g_cap not divisible by the mesh's space axis: single-device path
    if mesh is not None:
        # a mesh was configured but this dispatch cannot use it — surface
        # the degradation instead of silently going single-chip
        # (gather-path sharding is dryrun/fallback grade, and the spatial
        # kernel needs the group axis divisible by the 'space' axis)
        reason = (
            "group capacity %d not divisible by mesh space axis %d"
            % (di.group_cap, mesh.shape["space"])
            if di.use_tiled
            else "non-tileable frames (rotated orientations or >10-bit "
            "samples) use the gather kernel"
        )
        # warn once per GOF (the counter aggregates; a 300-frame stream
        # would otherwise emit one line per chunk)
        if stats is None or not stats.counters.get("mesh_fallback_dispatches"):
            log.warning(
                "mesh configured but dispatch of %d frame(s) falls back "
                "to single-device: %s", di.n_frames, reason,
            )
        if stats is not None:
            stats.count("mesh_fallback_dispatches")

    # single-device path: when a mesh-sized chunk (DEVICE_BATCH * data)
    # falls through here (non-tileable tables, indivisible g_cap), split
    # it back to DEVICE_BATCH — the flattened compaction sort degrades
    # sharply past ~2 frames (see DEVICE_BATCH measurements)
    if di.n_frames > DEVICE_BATCH:
        out = []
        for i in range(0, di.n_frames, DEVICE_BATCH):
            sub = DeviceInputs(
                cfg=di.cfg,
                use_tiled=di.use_tiled,
                arrays=tuple(
                    None if a is None else a[i : i + DEVICE_BATCH]
                    for a in di.arrays
                ),
                n_frames=min(DEVICE_BATCH, di.n_frames - i),
                color_mode=color_mode,
            )
            out.extend(_dispatch_device(sub, mesh=None, stats=stats))
        return out

    # host arrays stage implicitly on dispatch; an explicit batched
    # device_put was measured NO faster on the tunneled link (and the
    # extra eager transfer round trip read slightly slower), so the
    # simpler implicit path stays
    if di.use_tiled:
        from ..ops.tiled import narrow_emit_ok, reconstruct_batch_pretiled_packed

        F = di.arrays[0].shape[0]
        if narrow_emit_ok(di.cfg, F, di.slot_cap):
            # packed dispatch: compacted sorted operands stay (F, S)
            # lane-friendly on device; the prefix-fetch jit unpacks at
            # the bucket extent (see _fetch_prefixes_packed)
            with _st(stats, "recon_dispatch"):
                ops, counts = reconstruct_batch_pretiled_packed(
                    *di.arrays, di.cfg
                )
                counts = np.asarray(counts)  # device sync round trip
            with _st(stats, "recon_fetch"):
                pos_all, col_all = _fetch_prefixes_packed(
                    ops, counts, color_mode=color_mode
                )
            return [
                (pos_all[k, : counts[k]], col_all[k, : counts[k]])
                for k in range(di.n_frames)
            ]
        with _st(stats, "recon_dispatch"):
            positions, colors16, counts = reconstruct_batch_pretiled(
                *di.arrays, di.cfg
            )
            counts = np.asarray(counts)
    else:
        with _st(stats, "recon_dispatch"):
            positions, colors16, counts = reconstruct_batch(*di.arrays, di.cfg)
            counts = np.asarray(counts)
    with _st(stats, "recon_fetch"):
        pos_all, col_all = _fetch_prefixes(
            positions, colors16, counts, color_mode=color_mode
        )
    return [
        (pos_all[k, : counts[k]], col_all[k, : counts[k]])
        for k in range(di.n_frames)
    ]


def _secondary_chunk_values(gof: GofData, metas, prebuilt, g_bucket,
                            mesh=None, stats=None):
    """Decode every secondary attribute for one dispatch chunk: the
    IDENTICAL reconstruction graph runs again with the attribute
    planes swapped and a raw color fetch. Emission order is a function
    of occupancy/geometry/fields only — attribute samples never enter
    the validity/compaction math on any path (pinned by tests) — so
    row i of each pass is the same point and per-point alignment with
    the primary pass is free. Smoothing is disabled in the twin pass:
    geometry smoothing only moves positions (discarded here) and the
    attribute-smoothing SEI targets attribute 0. Returns a per-frame
    list of ``(property_names, values)`` entries."""
    cfg, tables = prebuilt
    out = [[] for _ in metas]
    for sa in gof.sec_attrs:
        # attribute smoothing consumes geometry-SMOOTHED positions (the
        # oracle order: smooth_slots then smooth_colors), so the twin
        # keeps geo smoothing on exactly when it smooths the secondary;
        # otherwise both passes drop (positions are discarded)
        geo_sm = gof.geo_smoothing if sa.smoothing is not None else None
        gof2 = replace(
            gof,
            attr_planes=list(sa.planes),
            attr_chroma_shift=sa.chroma_shift,
            attr_is_rgb444=sa.is_rgb444,
            geo_smoothing=geo_sm,
            attr_smoothing=sa.smoothing,
            sec_attrs=(),
        )
        cfg2 = replace(
            cfg,
            chroma_shift=sa.chroma_shift,
            smoothing=geo_sm,
            attr_smoothing=sa.smoothing,
        )
        di = _gof_device_inputs(
            gof2, metas, prebuilt=(cfg2, tables), g_bucket=g_bucket
        )
        di = replace(di, color_mode="raw")
        names = sa.property_names()
        for j, (_pos, col16) in enumerate(
            _dispatch_device(di, mesh=mesh, stats=stats)
        ):
            out[j].append((names, sa.finalize(col16)))
    return out


def _gof_tables_and_bucket(gof: GofData, space: int = 1):
    """Tables + ONE shared bucket for a whole GOF, so every chunk (and
    every secondary twin dispatch) shares a single compiled kernel
    variant. Cell granularity is incompatible with the spatial shard
    stitch, so it is only allowed on unsharded dispatches (see
    _gof_frame_tables)."""
    from ..atlas.groups import bucket_group_count

    cfg, tables = _gof_frame_tables(gof, gof.metas, allow_cell=space <= 1)
    g_bucket = bucket_group_count(
        max((t.n_groups for t in tables), default=0),
        _group_capacity(cfg),
        multiple_of=space,
    )
    return cfg, tables, g_bucket


def _secondary_gof_values(gof: GofData, mesh=None, stats=None,
                          prebuilt=None, g_bucket=None):
    """Secondary-attribute values for ALL frames of a GOF, chunked like
    the primary dispatch — used by the multi-stream batcher, which
    passes the (cfg, tables)/bucket it already built for the primary
    dispatch (recomputed here only when absent)."""
    space = mesh.shape["space"] if mesh is not None else 1
    if prebuilt is not None:
        cfg, tables = prebuilt
        assert g_bucket is not None
    else:
        cfg, tables, g_bucket = _gof_tables_and_bucket(gof, space)
    chunk = DEVICE_BATCH * (mesh.shape["data"] if mesh is not None else 1)
    out = []
    for i in range(0, len(gof.metas), chunk):
        out.extend(_secondary_chunk_values(
            gof, gof.metas[i : i + chunk],
            (cfg, tables[i : i + chunk]), g_bucket,
            mesh=mesh, stats=stats,
        ))
    return out


def _emit_pointset(pos: np.ndarray, col: np.ndarray, gof: GofData) -> PointSet3:
    """Wrap fetched device output. ``col`` is u8 RGB when the dispatch
    finalized colors on device (the production path — conversion proven
    bit-equal to the host f64 chain, see ops/color.py), or u16 YUV from a
    'raw'-mode dispatch, converted here with the reference f64 chain."""
    ps = PointSet3(
        positions=pos.copy(),
        with_colors=gof.attribute_count > 0,
    )
    if gof.attribute_count > 0:
        if col.dtype == np.uint8:
            ps.colors = col.copy()
        else:
            ps.colors16bit = col.copy()
            if gof.attr_is_rgb444:
                # decoded attribute is already RGB (GBR 4:4:4 content):
                # plain 16->8 bit copy, no matrix (``src/decoder.rs:300-305``)
                ps.copy_rgb16_to_rgb8()
            else:
                # exact f64 BT.709 conversion (``src/codec.rs:661-687``)
                ps.convert_yuv16_to_rgb8()
    else:
        # attribute-less frames keep a deterministic neutral filler so
        # direct array consumers match the tails' 127s (the PLY writer
        # omits colors entirely: with_colors is False)
        ps.colors = np.full((len(ps), 3), 127, dtype=np.uint8)
    return ps


def _append_layer_frame(ps: PointSet3, pos, col, gof: GofData) -> None:
    """Append one trailing-layer dispatch's frame output to ``ps`` (the
    layer points follow the map-0/1 points, before any tails)."""
    lps = _emit_pointset(pos, col, gof)
    ps.positions = np.concatenate([ps.positions, lps.positions])
    ps.colors = np.concatenate([ps.colors, lps.colors])
    ps.colors16bit = np.concatenate([ps.colors16bit, lps.colors16bit])


def _gof_map_pair_view(gof: GofData, lo: int) -> GofData:
    """A two-map view of an M-map GOF selecting geometry/attribute maps
    (lo, lo+1) — the unit the device kernels reconstruct. Trailing-layer
    passes (lo >= 1) run this view with ``cfg.drop_map0`` so only the
    second map's points emit (dedup'd against map lo)."""
    mc = gof.map_count
    sel = [
        f * mc + lo + d
        for f in range(gof.frame_count)
        for d in (0, 1)
    ]
    return replace(
        gof,
        map_count=2,
        geo_planes=[gof.geo_planes[i] for i in sel],
        attr_planes=(
            [gof.attr_planes[i] for i in sel] if gof.attr_planes else gof.attr_planes
        ),
        # secondary families pair-select too: their twin dispatches run
        # per view (primary + one per trailing layer), values merged by
        # _merge_layer_sec_vals; aux planes are not map-indexed
        sec_attrs=tuple(
            replace(sa, planes=tuple(sa.planes[i] for i in sel))
            for sa in gof.sec_attrs
        ),
    )


def _merge_layer_sec_vals(sec_vals, layer_vals) -> None:
    """Append a trailing-layer twin dispatch's secondary values to the
    primary's, frame by frame, family by family (rows follow the layer
    points appended by _append_layer_frame)."""
    for j in range(len(sec_vals)):
        sec_vals[j] = [
            (names, np.concatenate([vals, lvals]))
            for (names, vals), (_ln, lvals) in zip(sec_vals[j], layer_vals[j])
        ]


def _reconstruct_gof_device(gof: GofData, mesh=None, stats=None) -> Iterator[PointSet3]:
    """Device stage: batched reconstruction of the whole GOF, color
    finalization riding the fetch dispatch. M-map GOFs (M > 2,
    framework extension) run as the map-0/1 pass plus one trailing-
    layer pass per further map — same kernels, ``drop_map0`` config —
    whose points append per frame after the primary points."""
    if not gof.metas:
        return
    layer_views = []
    if gof.map_count > 2:
        layer_views = [
            _gof_map_pair_view(gof, m - 1) for m in range(2, gof.map_count)
        ]
        gof = _gof_map_pair_view(gof, 0)
    chunk = DEVICE_BATCH * (mesh.shape["data"] if mesh is not None else 1)
    space = mesh.shape["space"] if mesh is not None else 1
    with _st(stats, "recon_tables"):
        cfg, tables, g_bucket = _gof_tables_and_bucket(gof, space)
    layer_cfg = replace(cfg, drop_map0=True) if layer_views else None
    for i in range(0, len(gof.metas), chunk):
        with _st(stats, "recon_stage"):
            di = _gof_device_inputs(
                gof,
                gof.metas[i : i + chunk],
                prebuilt=(cfg, tables[i : i + chunk]),
                g_bucket=g_bucket,
            )
        results = _dispatch_device(di, mesh=mesh, stats=stats)
        if layer_views:
            # one pass per trailing map: same tables/bucket (geometry-
            # independent), drop_map0 config; per-frame appends below
            layer_results = [
                _dispatch_device(
                    _gof_device_inputs(
                        lv, lv.metas[i : i + chunk],
                        prebuilt=(layer_cfg, tables[i : i + chunk]),
                        g_bucket=g_bucket,
                    ),
                    mesh=mesh, stats=stats,
                )
                for lv in layer_views
            ]
        sec_vals = (
            _secondary_chunk_values(
                gof, gof.metas[i : i + chunk],
                (cfg, tables[i : i + chunk]), g_bucket,
                mesh=mesh, stats=stats,
            )
            if gof.sec_attrs else None
        )
        if sec_vals is not None and layer_views:
            # layer twin passes: secondary rows for the trailing-layer
            # points, merged in the same per-frame order
            for lv in layer_views:
                _merge_layer_sec_vals(sec_vals, _secondary_chunk_values(
                    lv, lv.metas[i : i + chunk],
                    (layer_cfg, tables[i : i + chunk]), g_bucket,
                    mesh=mesh, stats=stats,
                ))
        for j, (pos, col) in enumerate(results):
            with _st(stats, "recon_emit"):
                ps = _emit_pointset(pos, col, gof)
                if layer_views:
                    # trailing-layer points append per frame, map order,
                    # before any raw/EOM/PLR tails (the oracle's layer
                    # buffer order)
                    for lres in layer_results:
                        _append_layer_frame(ps, *lres[j], gof)
                if sec_vals is not None:
                    ps.extra_attrs = sec_vals[j]
                meta = gof.metas[i + j]
                if _meta_has_plr(gof, meta):
                    _append_plr_points(ps, gof, meta)
                if meta.eom_patches:
                    _append_eom_points(ps, gof, meta)
                if meta.raw_patches:
                    _append_raw_points(ps, gof, meta)
            yield ps
