"""WAV reader/writer depth conversions and RIFF robustness."""

import struct

import numpy as np
import pytest

from aad_tpu.codec.result import InvalidFormatError
from aad_tpu.format.wav import WavFormat, read_wav, write_wav


@pytest.mark.parametrize("depth", [8, 16, 24, 32])
@pytest.mark.parametrize("nch", [1, 2])
def test_depth_roundtrip(tmp_path, depth, nch):
    """Canonical int32 -> file -> canonical survives at every depth.

    The canonical form is left-justified, so a round trip preserves the
    top ``depth`` bits exactly and zeroes the rest (reference converters:
    src/wav.c:391-436).
    """
    rng = np.random.default_rng(depth + nch)
    pcm = rng.integers(-(2**31), 2**31, (nch, 500), dtype=np.int64).astype(np.int32)
    keep = ~np.int32((1 << (32 - depth)) - 1)
    fmt = WavFormat(nch, 44100, depth, 500)
    path = str(tmp_path / f"d{depth}.wav")
    write_wav(path, fmt, pcm)
    fmt2, back = read_wav(path)
    assert (fmt2.num_channels, fmt2.bits_per_sample, fmt2.num_samples) == (
        nch, depth, 500,
    )
    np.testing.assert_array_equal(back, pcm & keep)


def test_reads_reference_corpus_depths(fixture_dir):
    # the corpus is 16-bit; spot-check shape/rate of each file
    for name, nch in [("sin300Hz.wav", 2), ("bunny1.wav", 1)]:
        fmt, pcm = read_wav(str(fixture_dir / name))
        assert fmt.num_channels == nch
        assert pcm.shape[0] == nch
        assert fmt.bits_per_sample == 16


def test_unknown_chunks_skipped(tmp_path):
    """LIST/junk chunks before and after fmt must be skipped
    (reference: src/wav.c:176-193)."""
    pcm = (np.arange(-50, 50, dtype=np.int32) << 16)[None]
    fmt_chunk = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data_chunk = (pcm[0] >> 16).astype("<i2").tobytes()
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # odd size, padded
    body = (
        b"WAVE"
        + junk
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(data_chunk)) + data_chunk
    )
    path = str(tmp_path / "chunky.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    fmt, back = read_wav(path)
    assert fmt.num_samples == 100
    np.testing.assert_array_equal(back, pcm)


def test_non_pcm_rejected(tmp_path):
    fmt_chunk = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float tag
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    path = str(tmp_path / "float.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(InvalidFormatError):
        read_wav(path)


def test_not_riff_rejected(tmp_path):
    path = str(tmp_path / "bogus.wav")
    with open(path, "wb") as f:
        f.write(b"OggS" + b"\x00" * 64)
    with pytest.raises(InvalidFormatError):
        read_wav(path)


def test_truncated_fmt_rejected(tmp_path):
    body = b"WAVE" + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    path = str(tmp_path / "shortfmt.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(InvalidFormatError):
        read_wav(path)


def _wav_blob(fmt_fields, data, riff_size=None, extra=b""):
    fmt_chunk = struct.pack("<HHIIHH", *fmt_fields)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(data)) + data
        + extra
    )
    return b"RIFF" + struct.pack("<I", riff_size or len(body)) + body


@pytest.mark.parametrize(
    "name,fmt_fields,data",
    [
        # zero channels: frame size would be 0 (ZeroDivision without the
        # early validation) — must be a typed format error, never a crash
        ("zero_nch", (1, 0, 8000, 0, 0, 16), b"\x00" * 8),
        # sub-byte depth: frame size would round to 0 at 1 channel
        ("depth4", (1, 1, 8000, 4000, 1, 4), b"\x00" * 8),
        ("depth0", (1, 1, 8000, 0, 0, 0), b"\x00" * 8),
        # unsupported but byte-aligned depth
        ("depth12", (1, 2, 8000, 24000, 3, 12), b"\x00" * 12),
    ],
)
def test_malformed_fmt_typed_errors(tmp_path, name, fmt_fields, data):
    path = str(tmp_path / f"{name}.wav")
    with open(path, "wb") as f:
        f.write(_wav_blob(fmt_fields, data))
    with pytest.raises(InvalidFormatError):
        read_wav(path)


def test_lying_chunk_sizes_robust(tmp_path):
    """A data chunk whose declared size runs past EOF must parse from the
    bytes that exist (sample count derives from actual data, matching the
    reference's byte-size accounting), and a chunk size that overflows the
    walk must terminate, not loop or crash."""
    pcm = (np.arange(-8, 8, dtype=np.int32) << 16)[None]
    data = (pcm[0] >> 16).astype("<i2").tobytes()
    fmt_chunk = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", 0xFFFF0000) + data  # lies past EOF
    )
    path = str(tmp_path / "lying.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    fmt, back = read_wav(path)
    assert fmt.num_samples == 16
    np.testing.assert_array_equal(back, pcm)


def test_data_not_frame_multiple_truncates(tmp_path):
    """A data chunk holding a partial trailing frame drops the fragment
    (sample count = byte size // frame size, reference: src/wav.c)."""
    data = b"\x01\x00\x02\x00\x03"  # 2.5 int16 mono samples
    path = str(tmp_path / "ragged.wav")
    with open(path, "wb") as f:
        f.write(_wav_blob((1, 1, 8000, 16000, 2, 16), data))
    fmt, back = read_wav(path)
    assert fmt.num_samples == 2
    np.testing.assert_array_equal(back[0] >> 16, [1, 2])


def test_cli_24bit_input_gap_mode(tmp_path, reference_cli):
    """-g on a 24-bit input: residual computed in the canonical domain,
    matching the reference bit-for-bit."""
    import subprocess
    import sys

    rng = np.random.default_rng(0)
    pcm = rng.integers(-(2**23), 2**23, (1, 2000), dtype=np.int64).astype(np.int32)
    canonical = pcm << 8
    path = tmp_path / "in24.wav"
    write_wav(str(path), WavFormat(1, 8000, 24, 2000), canonical)

    ours = tmp_path / "gap.wav"
    r = subprocess.run(
        [sys.executable, "-m", "aad_tpu.cli", "-g", "-s", "256",
         str(path), str(ours)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr
    ref = tmp_path / "gap_ref.wav"
    subprocess.run([str(reference_cli), "-g", "-s", "256", str(path), str(ref)],
                   check=True, timeout=300)
    _, got = read_wav(str(ours))
    _, want = read_wav(str(ref))
    np.testing.assert_array_equal(got, want)


def test_write_failure_after_open_is_wav_write_error():
    """ENOSPC mid-write (open succeeds on /dev/full) raises WavWriteError,
    not a plain OSError — the CLI keys its diagnostic on the distinction."""
    import os

    from aad_tpu.format.wav import WavWriteError

    if not os.path.exists("/dev/full"):
        pytest.skip("/dev/full unavailable")
    pcm = np.zeros((1, 64), dtype=np.int32)
    with pytest.raises(WavWriteError) as ei:
        write_wav("/dev/full", WavFormat(1, 8000, 16, 64), pcm)
    assert ei.value.filename == "/dev/full"
    assert ei.value.strerror
