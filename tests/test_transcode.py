"""Transcode API: .aad -> .aad at new parameters."""

import numpy as np
import pytest

import aad_tpu
from aad_tpu.codec.encoder import EncodeConfig, encode


def _stream(nch=2, bps=4, n=4000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    pcm = np.clip(
        9000 * np.sin(t / 13.0)[None, :] + rng.integers(-400, 400, (nch, n)),
        -32768, 32767,
    ).astype(np.int32)
    cfg = EncodeConfig(
        num_channels=nch, sampling_rate=16000, bits_per_sample=bps,
        max_block_size=256,
    )
    return pcm, cfg, encode(pcm, cfg, engine="scan")


def test_transcode_identity_parameters_is_second_generation():
    """Same parameters -> the stream re-encoded from its own decode (a
    second lossy generation, not a byte copy) that still decodes to
    something close to the first generation."""
    pcm, cfg, blob = _stream()
    out = aad_tpu.transcode(blob, engine="scan")
    h1, d1 = aad_tpu.decode(blob)
    h2, d2 = aad_tpu.decode(out)
    assert (
        h2.bits_per_sample, h2.block_size, h2.num_samples,
        h2.ch_process_method,
    ) == (
        h1.bits_per_sample, h1.block_size, h1.num_samples,
        h1.ch_process_method,
    )
    err = np.sqrt(
        np.mean((np.asarray(d2, np.float64) - np.asarray(d1)) ** 2)
    ) / 32768
    assert err < 5e-2


@pytest.mark.parametrize("bps_to", [2, 3])
def test_transcode_down_bitrate(bps_to):
    pcm, cfg, blob = _stream(bps=4)
    out = aad_tpu.transcode(blob, bits_per_sample=bps_to, engine="scan")
    h, dec = aad_tpu.decode(out)
    assert h.bits_per_sample == bps_to
    assert h.num_samples == pcm.shape[1]
    assert len(out) < len(blob)  # fewer bits per sample -> smaller stream
    err = np.sqrt(
        np.mean((np.asarray(dec, np.float64) - pcm) ** 2)
    ) / 32768
    assert err < {3: 8e-2, 2: 1.2e-1}[bps_to]


def test_transcode_block_size_and_ms():
    pcm, cfg, blob = _stream(nch=2)
    out = aad_tpu.transcode(
        blob, max_block_size=1024, ch_process_method=1, engine="scan"
    )
    h, dec = aad_tpu.decode(out)
    assert h.block_size > 256 and h.ch_process_method == 1
    assert dec.shape == (2, pcm.shape[1])


def test_transcode_parallel_mode():
    """Transcode through the block-parallel encoder emits a conforming
    stream the native decoder accepts."""
    from aad_tpu import native

    pcm, cfg, blob = _stream(nch=1, seed=3)
    out = aad_tpu.transcode(
        blob, engine="scan", parallel_blocks=True, parallel_chunk_blocks=2,
    )
    h, dec = aad_tpu.decode(out)
    if native.available():
        _, dn = native.decode(out)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(dn))
    assert dec.shape == (1, pcm.shape[1])
