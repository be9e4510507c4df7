"""Command-line interface: the six reference modes on the TPU codec.

Mirrors the reference CLI's modes, flags and defaults (reference:
src/main.c:20-58): encode -e, decode -d, reconstruct -r, gap -g,
calculate -c, information -i; options -b/--bits-per-sample (default 4),
-s/--max-block-size (default 1024), -t/--num-encode-trials (default 2),
-m/--ms-conversion, -v/--version.

Usage: python -m aad_tpu.cli [options] INPUT [OUTPUT]
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np

from . import CODEC_VERSION, FILE_HEADER_SIZE, decode_header
from .codec.decoder import decode
from .codec.encoder import EncodeConfig, encode
from .codec.result import AadError
from .constants import CH_PROCESS_MS, CH_PROCESS_NONE
from .format.wav import WavFormat, read_wav, write_wav


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="aad_tpu",
        description="AAD (Ayashi Adaptive Differential PCM) TPU codec",
    )
    mode = p.add_argument_group("modes (exactly one)")
    mode.add_argument("-e", "--encode", action="store_true",
                      help="Encode mode (wav file -> .aad file)")
    mode.add_argument("-d", "--decode", action="store_true",
                      help="Decode mode (.aad file -> wav file)")
    mode.add_argument("-r", "--reconstruct", action="store_true",
                      help="Reconstruction mode (wav -> encode -> decode -> wav)")
    mode.add_argument("-g", "--gap", action="store_true",
                      help="Gap (residual output) mode")
    mode.add_argument("-c", "--calculate", action="store_true",
                      help="Calculate statistics (RMSE etc.) after a round trip")
    mode.add_argument("-i", "--information", action="store_true",
                      help="Show information of an encoded .aad file")
    p.add_argument("-b", "--bits-per-sample", type=int, default=4,
                   help="bits per sample in 2,3,4 (default: 4)")
    p.add_argument("-s", "--max-block-size", type=int, default=1024,
                   help="max block size in bytes (default: 1024)")
    p.add_argument("-t", "--num-encode-trials", type=int, default=2,
                   help="number of encode trials (default: 2)")
    p.add_argument("-m", "--ms-conversion", action="store_true",
                   help="use LR to MS conversion (default: no)")
    p.add_argument("-v", "--version", action="store_true",
                   help="show version information")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "native", "fused", "pallas", "scan"],
                   help="codec engine (default: auto — native host codec for "
                        "CLI latency, device pipeline otherwise)")
    p.add_argument("input", nargs="?")
    p.add_argument("output", nargs="?")
    return p


def _read_wav_16bit(path: str):
    """WAV -> (format, int16-valued (C, N) int32).

    The reference CLI truncates canonical PCM to 16 bits on ingest
    (reference: src/main.c:177).
    """
    fmt, pcm32 = read_wav(path)
    return fmt, (pcm32 >> 16).astype(np.int32)


def _config(args, fmt: WavFormat) -> EncodeConfig:
    return EncodeConfig(
        num_channels=fmt.num_channels,
        sampling_rate=fmt.sampling_rate,
        bits_per_sample=args.bits_per_sample,
        max_block_size=args.max_block_size,
        ch_process_method=CH_PROCESS_MS if args.ms_conversion else CH_PROCESS_NONE,
        num_encode_trials=args.num_encode_trials,
    )


def _write_wav_16bit(path: str, fmt: WavFormat, pcm16: np.ndarray) -> None:
    out_fmt = WavFormat(
        num_channels=fmt.num_channels,
        sampling_rate=fmt.sampling_rate,
        bits_per_sample=16,
        num_samples=pcm16.shape[1],
    )
    write_wav(path, out_fmt, pcm16.astype(np.int32) << 16)


def _use_native(args) -> bool:
    """auto -> native host codec (instant vs seconds of per-shape jit)."""
    if args.engine == "native":
        return True
    if args.engine != "auto":
        return False
    from . import native

    return native.available()


def _encode(args, pcm, fmt) -> bytes:
    cfg = _config(args, fmt)
    if _use_native(args):
        from . import native

        return native.encode(pcm, cfg)
    return encode(pcm, cfg)


def _decode(args, data):
    if _use_native(args):
        from . import native

        return native.decode(data)
    header, pcm = decode(data, engine=args.engine)
    return header, np.asarray(pcm)


def _reconstruct(args, path: str):
    """Round trip; returns (fmt, canonical (<<16-domain) pcm, decoded 16-bit).

    The canonical form is kept for residual/statistics modes — with >16-bit
    inputs the reference subtracts from the untruncated original
    (reference: src/main.c:425-432, 470-475).
    """
    fmt, canonical = read_wav(path)
    pcm = (canonical >> 16).astype(np.int32)
    data = _encode(args, pcm, fmt)
    _, decoded = _decode(args, data)
    return fmt, canonical, np.asarray(decoded)


def cmd_information(path: str) -> int:
    with open(path, "rb") as f:
        data = f.read(FILE_HEADER_SIZE)
    h = decode_header(data)
    ch_name = {0: "None", 1: "MS-Conversion"}.get(h.ch_process_method, "?")
    # Field layout mirrors the reference info dump (reference: src/main.c:260-269)
    rows = [
        ("Format Version:", h.format_version),
        ("Codec Version:", h.codec_version),
        ("Number of Channels:", h.num_channels),
        ("Number of Samples per Channel:", h.num_samples),
        ("Sampling Rate:", h.sampling_rate),
        ("Bits per Sample:", h.bits_per_sample),
        ("Block size:", h.block_size),
        ("Number of Samples per Block:", h.num_samples_per_block),
        ("Channel Processing:", ch_name),
    ]
    for label, value in rows:
        print(f"{label:<30} {value!s:<9}   ")
    bps = 8.0 * h.block_size * h.sampling_rate / h.num_samples_per_block
    print(f"{'Bits per Second(bps):':<30} {bps:<8.1f} ")
    return 0


def _apply_platform_override() -> None:
    """Honour AAD_TPU_PLATFORM (e.g. "cpu") even where a site hook selects a
    platform programmatically after env-var processing."""
    import os

    plat = os.environ.get("AAD_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main(argv=None) -> int:
    _apply_platform_override()
    args = _build_parser().parse_args(argv)

    if args.version:
        print(f"AAD TPU codec (format-compatible with AAD Version.{CODEC_VERSION})")
        return 0

    modes = [args.encode, args.decode, args.reconstruct, args.gap,
             args.calculate, args.information]
    if sum(modes) != 1:
        print("error: specify exactly one mode of -e/-d/-r/-g/-c/-i",
              file=sys.stderr)
        return 2
    if args.input is None:
        print("error: INPUT file required", file=sys.stderr)
        return 2
    needs_output = not (args.calculate or args.information)
    if needs_output and args.output is None:
        print("error: OUTPUT file required for this mode", file=sys.stderr)
        return 2

    try:
        if args.information:
            return cmd_information(args.input)

        if args.encode:
            fmt, pcm = _read_wav_16bit(args.input)
            data = _encode(args, pcm, fmt)
            with open(args.output, "wb") as f:
                f.write(data)
            return 0

        if args.decode:
            with open(args.input, "rb") as f:
                data = f.read()
            header, pcm = _decode(args, data)
            fmt = WavFormat(
                num_channels=header.num_channels,
                sampling_rate=header.sampling_rate,
                bits_per_sample=16,
                num_samples=header.num_samples,
            )
            write_wav(args.output, fmt, pcm << 16)
            return 0

        fmt, canonical, decoded = _reconstruct(args, args.input)

        if args.reconstruct:
            _write_wav_16bit(args.output, fmt, decoded)
            return 0

        # Residual in the canonical domain with int32 wraparound, exactly as
        # the reference's in-place int32 subtraction (reference:
        # src/main.c:425-432, 470-475).
        residual = (canonical - (decoded.astype(np.int32) << 16)).astype(np.int32)

        if args.gap:
            write_wav(args.output, fmt, residual)
            return 0

        # calculate: statistics with the reference's exact formula, including
        # its quirk — pcm1 is the residual in the canonical domain while pcm2
        # is the *unshifted* decoded value (reference: src/main.c:477-497).
        pcm1 = residual.astype(np.float64) / np.iinfo(np.int32).max
        pcm2 = decoded.astype(np.float64) / np.iinfo(np.int32).max
        diff = pcm1 - pcm2
        n = diff.size
        rmse = math.sqrt(float(np.sum(diff**2)) / n)
        msd = float(np.sum(np.abs(diff))) / n
        maxae = float(np.max(np.abs(diff)))
        print(f"RMSE:{rmse:f} MSD:{msd:f} MaxAE:{maxae:f} ")
        return 0

    except AadError as e:
        print(f"error: {e.result.name}: {e}", file=sys.stderr)
        return 1
    except FileNotFoundError as e:
        print(f"Failed to open {e.filename}.", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
