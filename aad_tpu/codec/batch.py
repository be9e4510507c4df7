"""Batched multi-stream decode: many .aad files in one device computation.

Block self-containedness means *every block of every stream* is an
independent decode task, so a heterogeneous pile of files flattens into one
lane batch for the fused kernel (BASELINE.json config: "batch
block/channel-parallel decode of many .aad streams"). Streams are grouped
by bit depth (a static kernel parameter); differing block sizes are handled
by padding the code axis — trailing zero codes cannot affect earlier
samples of a sequential recurrence.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp

from ..constants import CH_PROCESS_MS, FILE_HEADER_SIZE
from ..format.framing import frame_stream
from ..format.geometry import geometry_from_header
from ..format.header import HeaderInfo, decode_header, validate_header
from ..ops.decode import decode_blocks, ms_to_lr, resolve_engine


def decode_batch(
    streams: Sequence[bytes | np.ndarray], engine: str = "auto"
) -> list[tuple[HeaderInfo, np.ndarray]]:
    """Decode many complete .aad streams in (at most 3) device calls.

    Returns a list of (header, pcm[C, N]) in input order.
    """
    engine = resolve_engine(engine)

    parsed = []
    for data in streams:
        buf = (
            np.frombuffer(bytes(data), dtype=np.uint8)
            if isinstance(data, (bytes, bytearray))
            else np.asarray(data, dtype=np.uint8)
        )
        header = decode_header(buf.tobytes()[:FILE_HEADER_SIZE])
        validate_header(header)
        geo = geometry_from_header(
            header.num_channels, header.bits_per_sample, header.block_size
        )
        framed = frame_stream(buf[FILE_HEADER_SIZE:], header, geo)
        parsed.append((header, geo, framed))

    results: list = [None] * len(parsed)
    by_bps: dict[int, list[int]] = {}
    for i, (h, _, _) in enumerate(parsed):
        by_bps.setdefault(h.bits_per_sample, []).append(i)

    for bps, idxs in by_bps.items():
        T = max(parsed[i][2].codes.shape[-1] for i in idxs)
        lanes_codes, lanes_si, lanes_w, lanes_h = [], [], [], []
        spans = []  # (start, B, C, T_i) per stream
        start = 0
        for i in idxs:
            framed = parsed[i][2]
            B, C, Ti = framed.codes.shape
            codes = np.zeros((B * C, T), dtype=np.uint8)
            codes[:, :Ti] = framed.codes.reshape(B * C, Ti)
            lanes_codes.append(codes)
            lanes_si.append(framed.states.step_index.reshape(-1))
            lanes_w.append(framed.states.weight.reshape(-1, 4))
            lanes_h.append(framed.states.history.reshape(-1, 4))
            spans.append((start, B, C, Ti))
            start += B * C

        # bucket the lane count so differing piles reuse compiled shapes
        from .decoder import _bucket_blocks

        L_real = start
        L_pad = _bucket_blocks(L_real)
        pad = L_pad - L_real
        samples = decode_blocks(
            jnp.asarray(np.concatenate(
                lanes_codes + [np.zeros((pad, T), np.uint8)])),
            jnp.asarray(np.concatenate(
                lanes_si + [np.zeros(pad, np.int32)])),
            jnp.asarray(np.concatenate(
                lanes_w + [np.zeros((pad, 4), np.int32)])),
            jnp.asarray(np.concatenate(
                lanes_h + [np.zeros((pad, 4), np.int32)])),
            bits_per_sample=bps,
            engine=engine,
        )
        samples = np.asarray(samples)[:L_real]  # (L, 4 + T)

        for i, (off, B, C, Ti) in zip(idxs, spans):
            h = parsed[i][0]
            s = samples[off : off + B * C, : 4 + Ti].reshape(B, C, 4 + Ti)
            if h.ch_process_method == CH_PROCESS_MS:
                s = np.asarray(ms_to_lr(jnp.asarray(s)))
            pcm = np.swapaxes(s, 0, 1).reshape(C, -1)[:, : h.num_samples]
            results[i] = (h, pcm)

    return results
