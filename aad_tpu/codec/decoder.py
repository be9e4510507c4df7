"""High-level decoder: .aad bytes -> PCM.

The pipeline (reference behaviour: src/aad_decoder.c:478-538, re-architected
for TPU):

    bytes --host--> header + dense block batch (format.framing)
          --device--> phase A + phase B decode over all blocks in parallel
          --device--> MS->LR, block concatenation, tail truncation

Unlike the reference's sequential while-loop over blocks, every
block x channel task decodes independently (the block header carries full
state), so the whole file is one batched device computation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CH_PROCESS_MS, FILE_HEADER_SIZE, FILTER_ORDER
from ..format.framing import FramedStream, frame_stream
from ..format.geometry import BlockGeometry, geometry_from_header
from ..format.header import HeaderInfo, decode_header, validate_header
from .result import InvalidArgumentError
from ..ops.decode import decode_blocks, ms_to_lr


@functools.partial(
    jax.jit, static_argnames=("bits_per_sample", "ms", "num_samples", "engine")
)
def _decode_device(
    codes,
    step_index,
    weight,
    history,
    *,
    bits_per_sample: int,
    ms: bool,
    num_samples: int,
    engine: str,
):
    """Device side: (B, C, T) codes + per-block states -> (C, num_samples) PCM."""
    samples = decode_blocks(
        codes,
        step_index,
        weight,
        history,
        bits_per_sample=bits_per_sample,
        engine=engine,
    )  # (B, C, 4 + T)
    if ms:
        samples = ms_to_lr(samples)
    # (B, C, S) -> (C, B*S) -> truncate ragged tail
    pcm = jnp.swapaxes(samples, 0, 1).reshape(samples.shape[1], -1)
    return pcm[:, :num_samples]


def _device_pipeline(
    payload,
    *,
    geo: BlockGeometry,
    num_blocks: int,
    bits_per_sample: int,
    ms: bool,
    num_samples: int,
    engine: str,
):
    """Whole decode on device: padded payload bytes -> (C, num_samples) PCM.

    Every stage — block split, header parse, bit unpack, phase A/B decode,
    MS->LR, concatenation — is tensor ops under one jit, so entire files
    decode without per-sample host round-trips (north star: BASELINE.json).
    ``payload`` must be zero-padded to ``num_blocks * geo.block_size`` bytes.
    """
    from ..format.framing import parse_block_headers
    from ..ops.bitpack import unpack_codes

    from ..ops.bitpack import supports_direct_words, unpack_to_code_words

    blocks = payload.reshape(num_blocks, geo.block_size)
    states = parse_block_headers(blocks, geo)
    data = blocks[:, geo.header_bytes : geo.header_bytes + geo.data_bytes]
    C = geo.num_channels
    B = num_blocks
    T = geo.codes_per_block
    # Channel-major lane order: transposing (B, C, ...) -> (C, B, ...) here
    # moves whole contiguous rows (cheap); the final (C, B, S) -> (C, B*S)
    # flatten is then a free reshape instead of a 4-byte-granular relayout.
    si = jnp.swapaxes(states.step_index, 0, 1)
    wt = jnp.swapaxes(states.weight, 0, 1)
    hi = jnp.swapaxes(states.history, 0, 1)

    # NOTE: a word-space unpack fast path exists (ops.bitpack.
    # unpack_to_code_words + ops.pallas_decode.decode_fused_words) but
    # measured slower end-to-end than the u8 unpack on current XLA (u8->u32
    # bitcast lowering), so it is not wired in here.
    if False and engine == "fused" and supports_direct_words(geo):
        from ..ops.pallas_decode import decode_fused_words

        words = unpack_to_code_words(data, geo)  # (C*B, W), channel-major
        body = decode_fused_words(
            words,
            si.reshape(C * B),
            hi.reshape(C * B, 4),
            wt.reshape(C * B, 4),
            T,
            bits_per_sample=bits_per_sample,
        ).reshape(C, B, T)
        head = hi[..., ::-1]
        samples = jnp.concatenate([head, body], axis=-1)  # (C, B, 4 + T)
    else:
        codes = unpack_codes(data, geo)
        samples = decode_blocks(
            jnp.swapaxes(codes, 0, 1),
            si,
            wt,
            hi,
            bits_per_sample=bits_per_sample,
            engine=engine,
        )  # (C, B, 4 + T)
    if ms:
        from ..ops import cseman as cs

        mid, side = samples[0], samples[1]
        samples = jnp.stack(
            [cs.clip16(mid + side), cs.clip16(mid - side)], axis=0
        )
    pcm = samples.reshape(samples.shape[0], -1)
    return pcm[:, :num_samples]


def _bucket_blocks(n: int) -> int:
    """Round a block count up to a geometric bucket (~1.3x steps).

    Bounds wasted decode work to <=30% while collapsing the per-file-length
    jit-compile explosion to O(log) shapes.
    """
    if n <= 8:
        return n
    bucket = 8
    while bucket < n:
        bucket = max(bucket + 1, int(bucket * 1.3))
    return bucket


_device_pipeline_jit = jax.jit(
    _device_pipeline,
    static_argnames=(
        "geo",
        "num_blocks",
        "bits_per_sample",
        "ms",
        "num_samples",
        "engine",
    ),
)


@dataclasses.dataclass
class Decoder:
    """Reusable decoder bound to one stream configuration.

    Mirrors the reference's create/set-header/decode lifecycle
    (reference: src/aad_decoder.h:14-42) but is stateless across calls —
    block independence means there is nothing to carry.
    """

    header: HeaderInfo
    geometry: BlockGeometry
    engine: str = "auto"

    @classmethod
    def from_header(cls, header: HeaderInfo, engine: str = "auto") -> "Decoder":
        from ..ops.decode import resolve_engine

        validate_header(header)
        geo = geometry_from_header(
            header.num_channels, header.bits_per_sample, header.block_size
        )
        return cls(header=header, geometry=geo, engine=resolve_engine(engine))

    def frame(self, payload: np.ndarray) -> FramedStream:
        """Host-side framing of the post-header payload bytes."""
        framed = frame_stream(payload, self.header, self.geometry)
        from ..utils import debug

        if debug.enabled():
            debug.check_framed_stream(framed.states, framed.codes, self.geometry)
        return framed

    def decode_framed(self, framed: FramedStream) -> jax.Array:
        """Decode a pre-framed stream; returns (C, num_samples) int32."""
        h = self.header
        return _decode_device(
            jnp.asarray(framed.codes),
            jnp.asarray(framed.states.step_index),
            jnp.asarray(framed.states.weight),
            jnp.asarray(framed.states.history),
            bits_per_sample=h.bits_per_sample,
            ms=h.ch_process_method == CH_PROCESS_MS,
            num_samples=h.num_samples,
            engine=self.engine,
        )

    def decode_payload(self, payload: np.ndarray) -> jax.Array:
        return self.decode_framed(self.frame(payload))

    def decode_payload_ondevice(self, payload, bucket: bool = True) -> jax.Array:
        """Fully fused on-device decode (bitstream parsing included).

        ``payload`` is the post-header byte stream; it is zero-padded to a
        whole number of blocks host-side (cheap) and everything else runs in
        one jitted device computation.

        With ``bucket=True`` (default) the block count is padded up to a
        geometric bucket and the sample count left dynamic, so arbitrary
        file lengths share O(log) compiled pipelines instead of one per
        length — padding blocks decode garbage that is sliced away.
        """
        from ..format.geometry import num_blocks_for

        h = self.header
        nblocks = num_blocks_for(h.num_samples, h.num_samples_per_block)
        nb_padded = _bucket_blocks(nblocks) if bucket else nblocks
        total = nb_padded * self.geometry.block_size
        buf = np.zeros(total, dtype=np.uint8)
        src = np.asarray(payload, dtype=np.uint8)
        n = min(src.shape[0], nblocks * self.geometry.block_size)
        buf[:n] = src[:n]
        full = _device_pipeline_jit(
            jnp.asarray(buf),
            geo=self.geometry,
            num_blocks=nb_padded,
            bits_per_sample=h.bits_per_sample,
            ms=h.ch_process_method == CH_PROCESS_MS,
            num_samples=nb_padded * h.num_samples_per_block,
            engine=self.engine,
        )
        return full[:, : h.num_samples]

    def decode_time_range(
        self, payload: np.ndarray, start_seconds: float, end_seconds: float
    ) -> jax.Array:
        """Random-access decode of a time window (seek support).

        Returns (C, n) samples covering the requested window rounded out to
        block boundaries (block self-containedness makes any window
        decodable without preceding data); trims to the exact sample range.
        """
        h = self.header
        nspb = h.num_samples_per_block
        s0 = max(0, int(start_seconds * h.sampling_rate))
        s1 = min(h.num_samples, int(end_seconds * h.sampling_rate))
        if s1 <= s0:
            raise InvalidArgumentError("empty time range")
        b0 = s0 // nspb
        b1 = -(-s1 // nspb)
        samples = self.decode_block_range(payload, b0, b1 - b0)
        return samples[:, s0 - b0 * nspb : s1 - b0 * nspb]

    def decode_block_range(
        self, payload: np.ndarray, start_block: int, num_blocks: int
    ) -> jax.Array:
        """Random-access decode of a block range (seek support).

        Block self-containedness makes any block range decodable without
        touching preceding data — the TPU-native form of the reference's
        per-block ``DecodeBlock`` API (reference: src/aad_decoder.c:321).
        Returns (C, n) int32 where n covers the requested blocks (the final
        stream tail is truncated if the range includes the last block).
        """
        from .result import InvalidArgumentError

        framed = self.frame(payload)
        stop = min(start_block + num_blocks, framed.num_blocks)
        if start_block < 0 or start_block >= framed.num_blocks or stop <= start_block:
            raise InvalidArgumentError(
                f"block range [{start_block}, {start_block + num_blocks}) out of "
                f"bounds for {framed.num_blocks} blocks"
            )
        nspb = self.header.num_samples_per_block
        sub = FramedStream(
            states=type(framed.states)(
                step_index=framed.states.step_index[start_block:stop],
                weight=framed.states.weight[start_block:stop],
                history=framed.states.history[start_block:stop],
            ),
            codes=framed.codes[start_block:stop],
            num_blocks=stop - start_block,
            valid_last=framed.valid_last,
        )
        n = (stop - start_block) * nspb
        if stop == framed.num_blocks:
            n = (stop - start_block - 1) * nspb + framed.valid_last
        h = self.header
        return _decode_device(
            jnp.asarray(sub.codes),
            jnp.asarray(sub.states.step_index),
            jnp.asarray(sub.states.weight),
            jnp.asarray(sub.states.history),
            bits_per_sample=h.bits_per_sample,
            ms=h.ch_process_method == CH_PROCESS_MS,
            num_samples=n,
            engine=self.engine,
        )


def decode(data: bytes | np.ndarray, engine: str = "auto") -> tuple[HeaderInfo, np.ndarray]:
    """Decode a complete .aad stream.

    Returns (header, pcm) where pcm is (num_channels, num_samples) int32 in
    the int16 value range — the same convention as the reference's
    ``DecodeWhole`` output buffers (reference: src/aad_decoder.c:478).

    ``engine="auto"`` picks the fused device pipeline on TPU; on
    accelerator-less hosts it prefers the native codec (milliseconds vs a
    per-shape jit compile). Pass an explicit engine to override.
    """
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(
        data, (bytes, bytearray)
    ) else np.asarray(data, dtype=np.uint8)
    header = decode_header(buf.tobytes()[:FILE_HEADER_SIZE])
    validate_header(header)

    if engine == "auto":
        from ..ops.decode import _on_tpu

        if not _on_tpu():
            from .. import native

            if native.available():
                return native.decode(buf)
    elif engine == "native":
        from .. import native

        return native.decode(buf)

    dec = Decoder.from_header(header, engine=engine)
    pcm = dec.decode_payload(buf[FILE_HEADER_SIZE:])
    return header, np.asarray(pcm)
