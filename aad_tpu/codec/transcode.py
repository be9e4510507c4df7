"""Transcode: .aad -> .aad at a different bitrate / geometry.

A capability the reference CLI only reaches via two manual invocations
(decode to WAV, re-encode; reference: src/main.c modes -d then -e, with a
lossy 16-bit hop through the filesystem). Here it is one call: the
block-parallel device decode feeds the encoder directly — no file hop, no
WAV quantisation step beyond the format's own int16 domain — and every
encoder option (including the block-parallel mode and its quality knobs)
is available for the target stream.
"""

from __future__ import annotations

import numpy as np

from .decoder import decode
from .encoder import EncodeConfig, encode


def transcode(
    data: bytes | np.ndarray,
    *,
    bits_per_sample: int | None = None,
    max_block_size: int | None = None,
    ch_process_method: int | None = None,
    num_encode_trials: int = 2,
    engine: str = "auto",
    parallel_blocks: bool = False,
    parallel_chunk_blocks: int = 1,
    parallel_warm_passes: int = 0,
) -> bytes:
    """Re-encode an .aad stream with new parameters.

    Unspecified parameters keep the source stream's values
    (``num_encode_trials`` defaults to the reference CLI's 2 — the source
    stream does not record its trial count). Returns complete .aad bytes.
    """
    header, pcm = decode(data, engine=engine)
    cfg = EncodeConfig(
        num_channels=header.num_channels,
        sampling_rate=header.sampling_rate,
        bits_per_sample=(
            header.bits_per_sample if bits_per_sample is None
            else bits_per_sample
        ),
        max_block_size=(
            header.block_size if max_block_size is None else max_block_size
        ),
        ch_process_method=(
            header.ch_process_method if ch_process_method is None
            else ch_process_method
        ),
        num_encode_trials=num_encode_trials,
    )
    return encode(
        np.asarray(pcm, dtype=np.int32),
        cfg,
        engine=engine,
        parallel_blocks=parallel_blocks,
        parallel_chunk_blocks=parallel_chunk_blocks,
        parallel_warm_passes=parallel_warm_passes,
    )
