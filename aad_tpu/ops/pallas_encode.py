"""Pallas TPU kernels for the encode-side per-sample scan.

One kernel family serves both encode-block and trial-measure passes (they
run the identical state recurrence — reference: src/aad_encoder.c:343-410
vs :431-467): lanes = stream x channel tasks, sequential over the block's
sample slots, emitting codes (encode variant only) and accumulating the
squared quantisation error as two uint32 limbs. A per-lane ``valid`` bound
freezes state and sse past the valid samples (the measure pass stops exactly
at the ragged tail; the encode pass uses valid = everything, matching the
reference's whole-unit zero-padded packing).

Two scalar-hostile ops are made vector-exact:

* the quantiser division ``min(diffabs << (bps-2) / stepsize, absmask)``
  needs at most ``absmask`` (<= 7) correct quotient steps, so it is computed
  as a threshold count ``sum_k [a >= k*b]`` — exact integer ops, no divide;
* the 256-entry step-size table uses the same exhaustively-verified f32
  formula (+ corrections) as the decode kernel.

Layout discipline: minor-dim transposes are the expensive part of driving
these kernels (a trial search touches each block six times), so callers
pre-convert sample blocks to the kernel's time-major tile layout once via
:func:`to_timemajor` and pass lane states in flat (L, ...) form.

Block-level orchestration (history seeding, weight rounding, trial
selection) stays in XLA between kernel calls — it is O(blocks), not
O(samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import interpret_mode

from ..constants import (
    FILTER_ORDER,
    FIXEDPOINT_0_5,
    FIXEDPOINT_DIGITS,
    INT16_MAX,
    INT16_MIN,
    LMSFILTER_SHIFT,
    STEP_INDEX_MAX,
    TABLES_FLOAT_0_5,
    TABLES_FLOAT_DIGITS,
)
from .pallas_decode import (
    LANES,
    SUBLANES,
    T_CHUNK,
    TILE,
    _delta_select,
    _stepsize_f32,
    stepsize_corrections,
)

__all__ = ["to_timemajor", "encode_scan_tiles", "padded_lanes"]


def padded_lanes(L: int) -> int:
    return -(-L // TILE) * TILE


def to_timemajor(samples: jax.Array) -> jax.Array:
    """(L, T) int16-valued int32 -> (Wp2, n_tiles, 8, 128) packed tiles.

    Samples are packed two per u32 word (low halfword first) before the
    time-major transpose — per-step dynamic VMEM loads dominate the kernel's
    cycle count, so one load feeds two steps and the relayout halves.
    """
    L, T = samples.shape
    Lp = padded_lanes(L)
    Tp = -(-T // T_CHUNK) * T_CHUNK
    x = jnp.pad(samples.astype(jnp.int32), ((0, Lp - L), (0, Tp - T)))
    lo = x[:, 0::2] & jnp.int32(0xFFFF)
    hi = x[:, 1::2] << 16
    w = hi | lo  # (Lp, Tp // 2)
    n_tiles = Lp // TILE
    return w.reshape(n_tiles, SUBLANES, LANES, Tp // 2).transpose(3, 0, 1, 2)


def _lane_tiles(x: jax.Array, k: int) -> jax.Array:
    """(L, k) -> (n_tiles, k, 8, 128)."""
    L = x.shape[0]
    Lp = padded_lanes(L)
    x = jnp.pad(x.astype(jnp.int32), ((0, Lp - L),) + ((0, 0),) * (x.ndim - 1))
    n_tiles = Lp // TILE
    if x.ndim == 1:
        return x.reshape(n_tiles, 1, SUBLANES, LANES)
    return x.T.reshape(k, n_tiles, SUBLANES, LANES).transpose(1, 0, 2, 3)


def _make_kernel(bits_per_sample: int, corrections, emit_codes: bool):
    signbit = 1 << (bits_per_sample - 1)
    absmask = signbit - 1
    wshift = FIXEDPOINT_DIGITS + LMSFILTER_SHIFT

    def kernel(samples_ref, idx_ref, h_ref, w_ref, valid_ref, *outs_and_scratch):
        if emit_codes:
            codes_ref, state_out_ref, sse_ref, state = outs_and_scratch
        else:
            state_out_ref, sse_ref, state = outs_and_scratch
        half = jnp.int32(FIXEDPOINT_0_5)
        lo16 = jnp.int32(INT16_MIN)
        hi16 = jnp.int32(INT16_MAX)
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _init():
            for k in range(4):
                state[k] = h_ref[0, k]
                state[4 + k] = w_ref[0, k]
            state[8] = idx_ref[0, 0]
            state[9] = jnp.zeros((SUBLANES, LANES), jnp.int32)   # sse_hi
            state[10] = jnp.zeros((SUBLANES, LANES), jnp.int32)  # sse_lo

        valid_codes = valid_ref[0, 0] - FILTER_ORDER

        def sample_step(sample, gt, carry):
            """One encode step on a (8,128) sample tile; returns (code, carry)."""
            h0, h1, h2, h3, w0, w1, w2, w3, idx, sh, sl = carry

            # step size from the verified formula
            slot = (idx + TABLES_FLOAT_0_5) >> TABLES_FLOAT_DIGITS
            stepsize = _stepsize_f32(slot).astype(jnp.int32)
            for s, d in corrections:
                stepsize = stepsize + jnp.where(
                    slot == s, jnp.int32(d), jnp.int32(0)
                )

            # prediction and residual (reference: src/aad_encoder.c:358-368)
            pred = (half + h0 * w0 + h1 * w1 + h2 * w2 + h3 * w3) >> FIXEDPOINT_DIGITS
            diff = sample - pred
            neg = diff < 0
            dabs = jnp.where(neg, -diff, diff)
            scaled = dabs << (bits_per_sample - 2)

            # quantise: min(scaled / stepsize, absmask) as a threshold count
            mag = jnp.zeros_like(scaled)
            for k in range(1, absmask + 1):
                mag = mag + (scaled >= k * stepsize).astype(jnp.int32)

            # reconstructed difference + state update (identical to decode)
            qmag = (stepsize * ((mag << 1) + 1)) >> (bits_per_sample - 1)
            qdiff = jnp.where(neg, -qmag, qmag)
            new_idx = jnp.maximum(
                jnp.int32(0),
                jnp.minimum(
                    jnp.int32(STEP_INDEX_MAX),
                    idx + _delta_select(mag, bits_per_sample),
                ),
            )
            s16 = jnp.maximum(lo16, jnp.minimum(hi16, qdiff + pred))
            nw0 = w0 + ((qdiff * h0 + half) >> wshift)
            nw1 = w1 + ((qdiff * h1 + half) >> wshift)
            nw2 = w2 + ((qdiff * h2 + half) >> wshift)
            nw3 = w3 + ((qdiff * h3 + half) >> wshift)

            # sse += (int32)(qdiff*qdiff) as i64 limbs (int32 registers; the
            # biased xor turns signed compares into unsigned carry
            # detection). The term is the WRAPPED int32 product — the
            # reference multiplies two int32s before the double add
            # (src/aad_encoder.c:459-461), so qdiff^2 >= 2^31 enters the
            # accumulator as a negative value; hi takes the sign extension.
            sq = qdiff * qdiff  # wraps exactly like the reference's product
            nsl = sl + sq
            usl = sl ^ jnp.int32(-2147483648)
            unsl = nsl ^ jnp.int32(-2147483648)
            # sign extension via arithmetic shift — a ``sq < 0`` compare
            # is folded to false by XLA ((x*x) < 0 simplification, unsound
            # under int32 wrap); the shift lowers correctly
            nsh = sh + (unsl < usl).astype(jnp.int32) + (sq >> 31)

            code = jnp.where(neg, mag | signbit, mag)
            live = gt < valid_codes
            return code, (
                jnp.where(live, s16, h0),
                jnp.where(live, h0, h1),
                jnp.where(live, h1, h2),
                jnp.where(live, h2, h3),
                jnp.where(live, nw0, w0),
                jnp.where(live, nw1, w1),
                jnp.where(live, nw2, w2),
                jnp.where(live, nw3, w3),
                jnp.where(live, new_idx, idx),
                jnp.where(live, nsh, sh),
                jnp.where(live, nsl, sl),
            )

        # grouped loop: 8 samples = 4 input sample-words = 1 output code word
        def group_step(g, carry):
            code_word = jnp.zeros((SUBLANES, LANES), jnp.int32)
            base = t_chunk * T_CHUNK + g * 8
            for j in range(4):
                word = samples_ref[g * 4 + j, 0]
                lo = (word << 16) >> 16  # arithmetic sign-extend
                hi = word >> 16
                for k, sample in ((2 * j, lo), (2 * j + 1, hi)):
                    code, carry = sample_step(sample, base + k, carry)
                    code_word = code_word | (code << (4 * k))
            if emit_codes:
                codes_ref[g, 0] = code_word
            return carry

        carry = tuple(state[k] for k in range(11))
        carry = lax.fori_loop(0, T_CHUNK // 8, group_step, carry)
        for k in range(11):
            state[k] = carry[k]
        for k in range(9):
            state_out_ref[0, k] = carry[k]
        sse_ref[0, 0] = carry[9]
        sse_ref[0, 1] = carry[10]

    return kernel


def encode_scan_tiles(
    samples_tm: jax.Array,
    step_index: jax.Array,
    history: jax.Array,
    weight: jax.Array,
    valid: jax.Array,
    *,
    bits_per_sample: int,
    emit_codes: bool,
):
    """Run the encode recurrence over pre-tiled time-major samples.

    Args:
      samples_tm: (Tp, n_tiles, 8, 128) from :func:`to_timemajor`.
      step_index: (L,), history/weight: (L, 4), valid: (L,) int32 — flat
        lane-major states (L may be less than n_tiles*1024; padding lanes
        compute garbage that callers must ignore).
      emit_codes: whether to materialise the code stream (encode pass) or
        skip it (measure pass — saves the dominant output traffic).
    Returns:
      (codes (L, T) int32 or None, (step_index', history', weight'),
       (sse_hi, sse_lo) uint32 (L,))
    """
    corrections = stepsize_corrections()
    return _encode_scan_tiles_impl(
        samples_tm, step_index, history, weight, valid,
        bits_per_sample=bits_per_sample,
        corrections=corrections,
        emit_codes=emit_codes,
    )


@functools.partial(
    jax.jit,
    static_argnames=("bits_per_sample", "corrections", "emit_codes"),
)
def _encode_scan_tiles_impl(
    samples_tm, step_index, history, weight, valid, *,
    bits_per_sample, corrections, emit_codes,
):
    # samples_tm holds 2 samples per word: (Tp/2, tiles, 8, 128)
    Tp = samples_tm.shape[0] * 2
    n_tiles = samples_tm.shape[1]
    L = step_index.shape[0]

    ii_t = _lane_tiles(step_index, 1)
    va_t = _lane_tiles(valid, 1)
    h_t = _lane_tiles(history, 4)
    w_t = _lane_tiles(weight, 4)

    grid = (n_tiles, Tp // T_CHUNK)
    lane_block = lambda i, j: (i, 0, 0, 0)
    time_block = lambda i, j: (j, i, 0, 0)

    out_specs = [
        pl.BlockSpec((1, 9, SUBLANES, LANES), lane_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, SUBLANES, LANES), lane_block, memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((n_tiles, 9, SUBLANES, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 2, SUBLANES, LANES), jnp.int32),
    ]
    if emit_codes:
        # codes leave packed 8 per u32 word
        out_specs.insert(
            0,
            pl.BlockSpec((T_CHUNK // 8, 1, SUBLANES, LANES), time_block,
                         memory_space=pltpu.VMEM),
        )
        out_shapes.insert(
            0,
            jax.ShapeDtypeStruct((Tp // 8, n_tiles, SUBLANES, LANES), jnp.int32),
        )

    outs = pl.pallas_call(
        _make_kernel(bits_per_sample, corrections, emit_codes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T_CHUNK // 2, 1, SUBLANES, LANES), time_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUBLANES, LANES), lane_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, SUBLANES, LANES), lane_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, SUBLANES, LANES), lane_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUBLANES, LANES), lane_block,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((11, SUBLANES, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(samples_tm, ii_t, h_t, w_t, va_t)

    if emit_codes:
        codes_t, state_out, sse = outs
    else:
        state_out, sse = outs
        codes_t = None

    Lp = n_tiles * TILE
    st = state_out.reshape(n_tiles, 9, TILE).transpose(0, 2, 1).reshape(Lp, 9)[:L]
    ss = sse.reshape(n_tiles, 2, TILE).transpose(0, 2, 1).reshape(Lp, 2)[:L]
    codes = None
    if codes_t is not None:
        words = codes_t.transpose(1, 2, 3, 0).reshape(Lp, Tp // 8)[:L]
        # unpack 8 codes per word (LSB-first 4-bit slots)
        nib = [(words >> (4 * k)) & 0xF for k in range(8)]
        codes = jnp.stack(nib, axis=-1).reshape(L, Tp)

    sse_hi = lax.bitcast_convert_type(ss[:, 0], jnp.uint32)
    sse_lo = lax.bitcast_convert_type(ss[:, 1], jnp.uint32)
    return codes, (st[:, 8], st[:, 0:4], st[:, 4:8]), (sse_hi, sse_lo)
