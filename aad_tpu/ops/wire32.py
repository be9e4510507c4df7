"""Word-space (u32) wire pipeline: payload bytes -> kernel code words.

TPU XLA handles uint8 poorly: u8 arrays get (32, 128) tiling, so every
slice/transpose/stack over block bytes lowers to pathological relayouts
(measured ~3.8 ms of a ~6 ms decode for 11.5 M samples), and the on-device
``u8 -> u32`` bitcast that would escape byte space is itself slow (two
round-1 variants measured slower; see docs/DESIGN.md §2). This module
escapes byte space *on the host*, where reinterpreting the payload as
little-endian u32 words is a free ``numpy`` view:

    host:   payload bytes --view--> (B, words_per_block) uint32
    device: headers  = static single-word shift/mask extractions
            code words = one compact i32 transpose (time-major) followed by
            shift/mask permutations whose stride-2/-3 deinterleaves all land
            on the *major* axis (row slices — the minor-axis counterpart was
            measured pathological on this XLA)

The output feeds the fused decode kernel's packed-word format directly
(8 LSB-first 4-bit code slots per u32 — ops.pallas_decode), so no u8 tensor
ever exists on device. Wire layout facts: reference src/aad_decoder.c:394-455
(data region), src/aad_decoder.c:363-380 (block header).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FILTER_ORDER, TABLES_FLOAT_DIGITS
from ..format.geometry import BlockGeometry

__all__ = [
    "supports_wire32",
    "words_per_block",
    "payload_to_words",
    "parse_block_headers_u32",
    "wire_to_kernel_words",
    "kernel_words_to_codes",
]


def supports_wire32(geo: BlockGeometry) -> bool:
    """Every conforming geometry: 2/3/4-bit x mono/stereo."""
    return geo.bits_per_sample in (2, 3, 4) and geo.num_channels in (1, 2)


def _deinterleave_factor(geo: BlockGeometry) -> int:
    """Row-group size of the wire word pattern (see wire_to_kernel_words)."""
    if geo.bits_per_sample == 3:
        return 3
    if geo.bits_per_sample == 4 and geo.num_channels == 2:
        return 2
    return 1


def data_words_padded(geo: BlockGeometry) -> int:
    """Data-region word count, padded so every downstream shape is aligned.

    Rounded so that (a) the deinterleave reshape divides evenly and (b) the
    per-channel kernel word count is a multiple of the fused kernel's
    W_CHUNK (32). Doing this padding host-side (zero bytes in the row
    buffer) deletes two whole-array pad passes from the device pipeline.
    """
    wd = -(-geo.data_bytes // 4)
    k = _deinterleave_factor(geo)
    # kernel words produced per k-word group of data words:
    nch, bps = geo.num_channels, geo.bits_per_sample
    if bps == 4:
        per_group = 1                              # k=2 -> 1/ch; k=1 -> 1
    elif bps == 2:
        per_group = 2 if nch == 1 else 1          # k=1
    else:  # bps == 3, k=3
        per_group = 2 if nch == 2 else 4
    # Exact fit first: when the per-channel kernel word count can be made
    # exactly nspb/8, the decode kernel's head-integrated output has zero
    # pad rows and the whole final sample-slice pass disappears (the fused
    # kernel adapts its time-chunk size to any divisor-friendly W).
    nspb = geo.num_samples_per_block
    if nspb % 8 == 0:
        wk_exact = nspb // 8  # = (T + 4) / 8: exactly the 4-slot head slack
        if wk_exact % per_group == 0 and wk_exact // per_group * k >= wd:
            return wk_exact // per_group * k
    # Otherwise: align kernel words per channel to a 32-word granule.
    groups = -(-wd // k)
    g_align = -(-32 // per_group)
    groups = -(-groups // g_align) * g_align
    # The fused kernel emits the 4 header samples inline ahead of the code
    # samples (2 packed words), so the padded code capacity must exceed the
    # code count by >= 4 slots or the final samples would be shifted out.
    while 8 * groups * per_group - geo.codes_per_block < 4:
        groups += g_align
    return groups * k


def words_per_block(geo: BlockGeometry) -> int:
    """u32 words per (host-padded) block row.

    Covers the header + the alignment-padded data region, plus a spare word
    guarding the cross-word funnel shift when the header size is not 4-byte
    aligned (mono: 18 bytes).
    """
    base, rem = divmod(geo.header_bytes, 4)
    return base + (1 if rem else 0) + data_words_padded(geo)


def payload_to_words(
    payload: np.ndarray, geo: BlockGeometry, num_blocks: int
) -> np.ndarray:
    """Host: payload bytes -> (num_blocks, words_per_block) uint32 (LE).

    Zero-pads the (possibly short) final block. The reinterpret is a numpy
    view — no byte tensor is ever shipped to the device.
    """
    wpb = words_per_block(geo)
    buf = np.zeros((num_blocks, wpb * 4), dtype=np.uint8)
    src = np.asarray(payload, dtype=np.uint8).reshape(-1)
    n = min(src.shape[0], num_blocks * geo.block_size)
    full, rem = divmod(n, geo.block_size)
    buf[:full, : geo.block_size] = src[: full * geo.block_size].reshape(
        full, geo.block_size
    )
    if rem:
        buf[full, :rem] = src[full * geo.block_size :][:rem]
    return buf.view("<u4").reshape(num_blocks, wpb)


def _u16be_at(words: jax.Array, byte_off: int) -> jax.Array:
    """Big-endian u16 at a static even byte offset, from one u32 column."""
    assert byte_off % 2 == 0
    w = words[:, byte_off >> 2].astype(jnp.int32)
    s = (byte_off & 3) * 8
    return (((w >> s) & 0xFF) << 8) | ((w >> (s + 8)) & 0xFF)


def _sign16(x: jax.Array) -> jax.Array:
    return jnp.where(x >= 0x8000, x - 0x10000, x)


def parse_block_headers_u32(words: jax.Array, geo: BlockGeometry):
    """Block-header state load from u32 wire words.

    Same fields as format.framing.parse_block_headers (reference:
    src/aad_decoder.c:363-380) but every u16BE field is a single-column
    shift/mask — all header byte offsets are even, so no field straddles a
    u32 word. Returns a BlockStates with (B, C[, 4]) int32 leaves.
    """
    from ..format.framing import BlockStates

    nch = geo.num_channels
    per_ch = 2 + 4 * FILTER_ORDER
    # One small contiguous slice up front: the 18-36 header bytes live in the
    # first few words; extracting columns from the full array instead makes
    # XLA stream the whole payload per field.
    words = words[:, : -(-geo.header_bytes // 4)]
    step_index, weights, histories = [], [], []
    for ch in range(nch):
        base = ch * per_ch
        tag = _u16be_at(words, base)
        step_index.append(tag >> TABLES_FLOAT_DIGITS)
        shift = tag & 0xF
        w_taps, h_taps = [], []
        for k in range(FILTER_ORDER):
            w_taps.append(_sign16(_u16be_at(words, base + 2 + 4 * k)) << shift)
            h_taps.append(_sign16(_u16be_at(words, base + 4 + 4 * k)))
        weights.append(jnp.stack(w_taps, axis=-1))
        histories.append(jnp.stack(h_taps, axis=-1))
    return BlockStates(
        step_index=jnp.stack(step_index, axis=-1).astype(jnp.int32),
        weight=jnp.stack(weights, axis=-2).astype(jnp.int32),
        history=jnp.stack(histories, axis=-2).astype(jnp.int32),
    )


def _data_words(words: jax.Array, geo: BlockGeometry) -> jax.Array:
    """(B, wpb) row words -> (B, Wdp) realigned data-region words.

    Word i covers data bytes 4i..4i+3 (zero-padded past the block end by the
    host buffer). When the header size is not 4-byte aligned the realignment
    is a two-shift funnel across adjacent words.
    """
    base, rem = divmod(geo.header_bytes, 4)
    Wd = data_words_padded(geo)
    if rem == 0:
        return words[:, base : base + Wd]
    lo = words[:, base : base + Wd]
    hi = words[:, base + 1 : base + 1 + Wd]
    s = 8 * rem
    return ((lo >> s) | (hi << (32 - s))).astype(jnp.uint32)


def _nibble_swap(x: jax.Array) -> jax.Array:
    m = jnp.uint32(0x0F0F0F0F)
    return ((x >> 4) & m) | ((x & m) << 4)


def _expand3(v: jax.Array) -> jax.Array:
    """24-bit MSB-first 3-bit octet -> u32 of 8 LSB-first 4-bit slots."""
    out = jnp.zeros_like(v)
    for k in range(8):
        out = out | (((v >> (21 - 3 * k)) & 0x7) << (4 * k))
    return out


def _expand2_byte(b: jax.Array) -> jax.Array:
    """One byte of 4 MSB-first 2-bit codes -> 16 bits of 4-bit slots."""
    return (
        ((b >> 6) & 0x3)
        | (((b >> 4) & 0x3) << 4)
        | (((b >> 2) & 0x3) << 8)
        | ((b & 0x3) << 12)
    )


def _interleave_rows(parts: list[jax.Array]) -> jax.Array:
    """k arrays (G, B) -> (k*G, B) with rows interleaved (time order)."""
    if len(parts) == 1:
        return parts[0]
    return jnp.stack(parts, axis=1).reshape(-1, parts[0].shape[1])


def kernel_words_padded(geo: BlockGeometry) -> int:
    """Per-channel kernel word count produced by wire_to_kernel_words.

    A multiple of the fused kernel's W_CHUNK (guaranteed by
    data_words_padded); the pad slots decode garbage past codes_per_block
    that the final sample slice drops.
    """
    nch, bps = geo.num_channels, geo.bits_per_sample
    wd = data_words_padded(geo)
    if bps == 4:
        return wd // 2 if nch == 2 else wd
    if bps == 2:
        return wd if nch == 2 else 2 * wd
    return 2 * wd // 3 if nch == 2 else 4 * wd // 3


def wire_to_kernel_words(words: jax.Array, geo: BlockGeometry) -> jax.Array:
    """(B, wpb) wire words -> (Wk, C*B) time-major kernel code words.

    Lane order is channel-major (all blocks of channel 0, then channel 1),
    matching the decode pipeline; Wk = kernel_words_padded(geo) (codes past
    codes_per_block are pad garbage). The single large relayout is one 3-D
    transpose of the data region whose trailing reshape axis makes every
    stride-k row deinterleave a *free major-axis slice* (minor-axis stride
    slicing and post-transpose row gathers both measured pathological).
    """
    assert supports_wire32(geo)
    nch, bps = geo.num_channels, geo.bits_per_sample
    dw = _data_words(words, geo)          # (B, Wd)
    k = _deinterleave_factor(geo)
    if k == 1:
        groups = (dw.T.astype(jnp.uint32),)
    else:
        d3 = dw.reshape(dw.shape[0], dw.shape[1] // k, k)
        dT = jnp.transpose(d3, (2, 1, 0)).astype(jnp.uint32)  # (k, G, B)
        groups = tuple(dT[i] for i in range(k))  # free major slices
    ff = jnp.uint32(0xFF)

    if bps == 4:
        if nch == 1:
            chans = [[_nibble_swap(groups[0])]]
        else:
            a, b = groups
            ch0 = (
                (a & ff)
                | (((a >> 16) & ff) << 8)
                | ((b & ff) << 16)
                | (((b >> 16) & ff) << 24)
            )
            ch1 = (
                ((a >> 8) & ff)
                | (((a >> 24) & ff) << 8)
                | (((b >> 8) & ff) << 16)
                | (((b >> 24) & ff) << 24)
            )
            chans = [[_nibble_swap(ch0)], [_nibble_swap(ch1)]]
    elif bps == 2:
        dwT = groups[0]
        if nch == 1:
            lo = _expand2_byte(dwT & ff) | (_expand2_byte((dwT >> 8) & ff) << 16)
            hi = _expand2_byte((dwT >> 16) & ff) | (
                _expand2_byte((dwT >> 24) & ff) << 16
            )
            chans = [[lo, hi]]
        else:
            ch0 = _expand2_byte(dwT & ff) | (
                _expand2_byte((dwT >> 16) & ff) << 16
            )
            ch1 = _expand2_byte((dwT >> 8) & ff) | (
                _expand2_byte((dwT >> 24) & ff) << 16
            )
            chans = [[ch0], [ch1]]
    else:  # bps == 3: 3-byte (24-bit, 8-code) units; 12-byte period = 3 words
        g0, g1, g2 = groups
        vA = ((g0 & ff) << 16) | (((g0 >> 8) & ff) << 8) | ((g0 >> 16) & ff)
        vB = (((g0 >> 24) & ff) << 16) | ((g1 & ff) << 8) | ((g1 >> 8) & ff)
        vC = (((g1 >> 16) & ff) << 16) | (((g1 >> 24) & ff) << 8) | (g2 & ff)
        vD = (((g2 >> 8) & ff) << 16) | (((g2 >> 16) & ff) << 8) | (
            (g2 >> 24) & ff
        )
        if nch == 1:
            chans = [[_expand3(vA), _expand3(vB), _expand3(vC), _expand3(vD)]]
        else:
            chans = [[_expand3(vA), _expand3(vC)], [_expand3(vB), _expand3(vD)]]

    per_ch = [_interleave_rows(parts) for parts in chans]
    return jnp.concatenate(per_ch, axis=1) if len(per_ch) > 1 else per_ch[0]


def kernel_words_to_codes(kw: jax.Array, num_codes: int) -> jax.Array:
    """(..., Wk) kernel words -> (..., num_codes) uint8 codes (any engine).

    XLA unpack of the packed-slot format; used to feed the scan/pallas-lms
    engines and to test the wire permutation without the fused kernel.
    """
    parts = [((kw >> (4 * k)) & 0xF).astype(jnp.uint8) for k in range(8)]
    codes = jnp.stack(parts, axis=-1).reshape(*kw.shape[:-1], -1)
    return codes[..., :num_codes]
