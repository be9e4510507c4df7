"""Shared test helpers: deterministic signals, reference-CLI invocation."""

import subprocess

import numpy as np

from aad_tpu.format.wav import WavFormat, write_wav


def sine(n, nch, freq=440.0, rate=44100, amp=0.5):
    t = np.arange(n) / rate
    s = (amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int32)
    return np.tile(s, (nch, 1))


def noise(n, nch, seed=0, amp=0.9):
    rng = np.random.default_rng(seed)
    return (amp * 32767 * (2 * rng.random((nch, n)) - 1)).astype(np.int32)


def nyquist(n, nch, amp=1.0):
    s = np.where(np.arange(n) % 2 == 0, 32767, -32768).astype(np.int32)
    return (amp * np.tile(s, (nch, 1))).astype(np.int32)


def write_pcm16_wav(path, pcm, rate=44100):
    """pcm: (C, N) int16-valued int32 -> 16-bit WAV (canonical << 16)."""
    fmt = WavFormat(
        num_channels=pcm.shape[0],
        sampling_rate=rate,
        bits_per_sample=16,
        num_samples=pcm.shape[1],
    )
    write_wav(str(path), fmt, pcm.astype(np.int32) << 16)


def reference_encode(binary, wav_path, out_path, bps=4, block=1024, trials=2, ms=False):
    cmd = [
        str(binary),
        "-e",
        "-b", str(bps),
        "-s", str(block),
        "-t", str(trials),
    ]
    if ms:
        cmd.append("-m")
    cmd += [str(wav_path), str(out_path)]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return out_path.read_bytes()


def reference_decode(binary, aad_path, out_path):
    subprocess.run(
        [str(binary), "-d", str(aad_path), str(out_path)],
        check=True,
        capture_output=True,
        timeout=120,
    )
    return out_path
