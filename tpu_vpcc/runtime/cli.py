"""Command-line decoder (parity: ``src/bin/decoder.rs``).

    python -m tpu_vpcc.runtime.cli -i stream.bin -o out_dir/
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

from ..utils.ply import frame_output_path, write_ply
from .pipeline import Decoder, Params


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="An MPEG-VPCC-TMC2 conformant decoder")
    parser.add_argument(
        "-i", "--compressed-stream-path", required=True, type=Path,
        help="Path to the compressed bitstream input",
    )
    parser.add_argument(
        "-o", "--reconstructed-data-path", required=True, type=Path,
        help="Output folder (or %%4d-patterned path) for decoded point clouds",
    )
    parser.add_argument("--start-frame", type=int, default=0,
                        help="First frame number in the output naming")
    parser.add_argument("--num-threads", type=int, default=4,
                        help="Host video-decode worker threads")
    parser.add_argument("--keep-intermediate-files", action="store_true")
    parser.add_argument("-d", "--video-decoder-path", type=Path, default=None,
                        help="Unused: decoding is in-process (native libavcodec)")
    parser.add_argument("--oracle", action="store_true",
                        help="Use the NumPy oracle path instead of the device")
    parser.add_argument("--apply-geo-smoothing", action="store_true",
                        help="Apply grid geometry smoothing when the SEI "
                             "is present (the reference panics here)")
    parser.add_argument("--apply-attr-smoothing", action="store_true",
                        help="Apply grid attribute smoothing when the SEI "
                             "is present (the reference cannot parse it)")
    parser.add_argument("--ply-format", choices=["ascii", "binary_little_endian"],
                        default="ascii",
                        help="PLY output format (binary is a framework "
                             "extension: ~5x smaller, near-memcpy writes; "
                             "the reference stubs binary out)")
    parser.add_argument("-v", "--verbose", action="count", default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(levelname).1s %(name)s: %(message)s",
    )
    print("PccAppDecoder (tpu_vpcc)")

    out = args.reconstructed_data_path
    if "%4d" not in out.name:
        out.mkdir(parents=True, exist_ok=True)
    else:
        out.parent.mkdir(parents=True, exist_ok=True)

    decoder = Decoder(
        Params(
            args.compressed_stream_path,
            keep_intermediate_files=args.keep_intermediate_files,
            use_device=not args.oracle,
            num_threads=args.num_threads,
            apply_geo_smoothing_type=args.apply_geo_smoothing,
            apply_attr_smoothing_type=args.apply_attr_smoothing,
        )
    )
    try:
        decoder.start()
        for i, frame in enumerate(decoder):
            frame_num = i + args.start_frame
            path = frame_output_path(out, frame_num)
            write_ply(frame, path, fmt=args.ply_format)
            logging.info(
                "Frame %d written to %s (%d points)", frame_num, path, len(frame)
            )
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    except Exception as e:
        if args.verbose:
            raise
        print(f"error: decode failed: {e}", file=sys.stderr)
        return 1
    totals = decoder.stats.stage_totals()
    if totals:
        logging.info(
            "decoded %d frames, %d points total; %s",
            decoder.stats.total_frames,
            decoder.stats.total_points,
            " ".join(f"{k}={v:.2f}s" for k, v in sorted(totals.items())),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
