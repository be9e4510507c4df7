"""Per-sample codec transitions as pure functions on a small state pytree.

This is the functional core of the codec: the reference's mutable
``AADEncodeProcessor``/``AADDecodeProcessor`` handles (reference:
src/aad_encoder.c:10-15, src/aad_decoder.c:9-13) become an immutable
:class:`CodecState` pytree and pure ``state -> state`` transitions, which
compose with ``lax.scan`` over time and ``vmap`` over blocks / channels /
streams.

Shapes: every function is written for a leading *lane* shape ``(...,)`` with
the filter axis last, i.e. ``history``/``weight`` are ``(..., 4)`` and
``step_index`` is ``(...)``. Scalars and batches use the same code path.

Semantics are bit-exact with the reference hot loops:
* decode step — reference: src/aad_decoder.c:269-318
* encode step — reference: src/aad_encoder.c:343-410
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import (
    FILTER_ORDER,
    FIXEDPOINT_0_5,
    FIXEDPOINT_DIGITS,
    LMSFILTER_SHIFT,
    STEP_INDEX_MAX,
    TABLES_FLOAT_0_5,
    TABLES_FLOAT_DIGITS,
)
from ..tables import INDEX_TABLES, STEPSIZE_TABLE
from . import cseman as cs

Array = jax.Array


class CodecState(NamedTuple):
    """Adaptive-predictor state; identical for encoder and decoder.

    The decoder carries exactly this state; the encoder additionally
    tracks the last quantisation error separately (see encode_sample).
    """

    history: Array     # (..., 4) int32, [0] = newest sample
    weight: Array      # (..., 4) int32, Q15 filter weights
    step_index: Array  # (...)    int32, Q4 step-size index in [0, 4080]

    @classmethod
    def zeros(cls, lane_shape=(), dtype=jnp.int32) -> "CodecState":
        return cls(
            history=jnp.zeros((*lane_shape, FILTER_ORDER), dtype),
            weight=jnp.zeros((*lane_shape, FILTER_ORDER), dtype),
            step_index=jnp.zeros(lane_shape, dtype),
        )


def _tables_for(bits_per_sample: int) -> tuple[Array, Array]:
    """(index_delta_table, stepsize_table) as on-device int32 constants."""
    idx_tab = jnp.asarray(INDEX_TABLES[bits_per_sample], dtype=jnp.int32)
    step_tab = jnp.asarray(STEPSIZE_TABLE, dtype=jnp.int32)
    return idx_tab, step_tab


def stepsize_from_index(step_index: Array) -> Array:
    """Step size lookup (reference: src/aad_tables.h:15,28).

    ``mode="clip"`` defines the one case the reference leaves undefined:
    a malformed block header can carry a 12-bit wire index in (4080, 4095]
    whose table slot is 256 — one past the table. The reference reads out
    of bounds there (its AAD_ASSERTs are DEBUG-only); this framework
    clamps the slot to 255 in every engine (scan here; fused kernel and
    native scalar/SIMD at their own slot computations), so all engines
    agree bit-exactly even on adversarial streams. Valid streams never
    reach the clamp — the encoder's index adaptation is bounded at 4080.
    """
    step_tab = jnp.asarray(STEPSIZE_TABLE, dtype=jnp.int32)
    slot = cs.asr(step_index + cs.i32(TABLES_FLOAT_0_5), TABLES_FLOAT_DIGITS)
    return jnp.take(step_tab, slot, axis=0, mode="clip")


def update_step_index(step_index: Array, code: Array, bits_per_sample: int) -> Array:
    """Clipped-add index adaptation (reference: src/aad_tables.h:31-43)."""
    idx_tab, _ = _tables_for(bits_per_sample)
    delta = jnp.take(idx_tab, code.astype(jnp.int32), axis=0)
    return cs.clip(step_index + delta, 0, STEP_INDEX_MAX)


def predict(history: Array, weight: Array) -> Array:
    """Q15 4-tap prediction (reference: src/aad_decoder.c:291-295).

    int32 wraparound in the accumulation is intentional — it matches the C
    build on overflow.
    """
    acc = cs.i32(FIXEDPOINT_0_5) + jnp.sum(history * weight, axis=-1)
    return cs.asr(acc, FIXEDPOINT_DIGITS)


def _apply_qdiff(state: CodecState, qdiff: Array, pred: Array) -> tuple[CodecState, Array]:
    """Shared tail of both transitions: reconstruct, adapt weights, shift history.

    (reference: src/aad_decoder.c:297-315 == src/aad_encoder.c:391-406)
    """
    sample = cs.clip16(qdiff + pred)
    wdelta = cs.asr(
        qdiff[..., None] * state.history + cs.i32(FIXEDPOINT_0_5),
        FIXEDPOINT_DIGITS + LMSFILTER_SHIFT,
    )
    weight = state.weight + wdelta
    history = jnp.concatenate(
        [sample[..., None], state.history[..., : FILTER_ORDER - 1]], axis=-1
    )
    return CodecState(history, weight, state.step_index), sample


def quantized_diff(stepsize: Array, code: Array, bits_per_sample: int) -> Array:
    """Reconstruct the quantised difference from a code.

    qdiff = +/- (stepsize * (2*delta + 1)) >> (bps - 1)
    (reference: src/aad_decoder.c:284-288)
    """
    signbit = 1 << (bits_per_sample - 1)
    absmask = signbit - 1
    delta = jnp.bitwise_and(code.astype(jnp.int32), cs.i32(absmask))
    mag = cs.asr(stepsize * (cs.shl(delta, 1) + 1), bits_per_sample - 1)
    negative = jnp.bitwise_and(code.astype(jnp.int32), cs.i32(signbit)) != 0
    return jnp.where(negative, -mag, mag)


def decode_sample(
    state: CodecState, code: Array, bits_per_sample: int
) -> tuple[CodecState, Array]:
    """One decode step (reference: src/aad_decoder.c:269-318)."""
    stepsize = stepsize_from_index(state.step_index)
    qdiff = quantized_diff(stepsize, code, bits_per_sample)
    pred = predict(state.history, state.weight)
    step_index = update_step_index(state.step_index, code, bits_per_sample)
    state = state._replace(step_index=step_index)
    return _apply_qdiff(state, qdiff, pred)


def encode_sample(
    state: CodecState, sample: Array, bits_per_sample: int
) -> tuple[CodecState, Array, Array]:
    """One encode step; returns (state', code, qdiff).

    The encoder quantises the prediction residual and then applies the
    *identical* state update as the decoder using the quantised value — this
    lockstep is what makes blocks round-trip bit-exactly
    (reference: src/aad_encoder.c:343-410).

    ``qdiff`` is the quantisation error the trial search accumulates
    (reference: src/aad_encoder.c:389,461).
    """
    signbit = 1 << (bits_per_sample - 1)
    absmask = signbit - 1

    stepsize = stepsize_from_index(state.step_index)
    pred = predict(state.history, state.weight)

    diff = sample.astype(jnp.int32) - pred
    neg = diff < 0
    diffabs = jnp.where(neg, -diff, diff)

    # code = min(|diff| * 2**(bps-2) / stepsize, absmask), truncating division
    # (reference: src/aad_encoder.c:372). Operands are non-negative for any
    # in-range input; lax.div truncates toward zero matching C on the wrapped
    # edge cases as well.
    scaled = cs.shl(diffabs, bits_per_sample - 2)
    code = jnp.minimum(cs.trunc_div(scaled, stepsize), cs.i32(absmask))
    code = jnp.where(neg, jnp.bitwise_or(code, cs.i32(signbit)), code)

    qdiff = quantized_diff(stepsize, code, bits_per_sample)
    step_index = update_step_index(state.step_index, code, bits_per_sample)
    state = state._replace(step_index=step_index)
    state, _ = _apply_qdiff(state, qdiff, pred)
    return state, code, qdiff


def seed_history(state: CodecState, first_samples: Array, valid: Array | int) -> CodecState:
    """Load the first FILTER_ORDER samples into history, newest last-in.

    ``first_samples`` is (..., 4) = samples 0..3 of the block; entries at
    positions >= ``valid`` are zeroed, mirroring the encoder's seed loop for
    short blocks (reference: src/aad_encoder.c:606-616). history[k] receives
    sample[3-k].
    """
    idx = np.arange(FILTER_ORDER)
    samples = jnp.where(
        jnp.asarray(idx) < jnp.asarray(valid)[..., None],
        first_samples.astype(jnp.int32),
        0,
    )
    return state._replace(history=samples[..., ::-1])


# --- Step-index recurrence as an associative monoid -------------------------
# idx_t = clip(idx_{t-1} + d_t, 0, 4080) is a composition of saturating-add
# maps x -> clamp(x + a, lo, hi). These maps are closed under composition:
#   (a1,l1,h1) then (a2,l2,h2) == (a1+a2, clamp(l1+a2,l2,h2), clamp(h1+a2,l2,h2))
# which is associative, so all T step indices of a block are computable with
# lax.associative_scan in O(log T) depth — the key to a fully parallel decode
# front-end (design note: SURVEY.md §7.3).


def step_index_prefix(codes: Array, init_index: Array, bits_per_sample: int) -> Array:
    """Step index *used by* each decode step, for a whole code sequence.

    Args:
      codes: (..., T) int codes.
      init_index: (...) initial Q4 index from the block header.
    Returns:
      (..., T) int32: index consumed by step t (i.e. before t's update).
    """
    idx_tab, _ = _tables_for(bits_per_sample)
    a = jnp.take(idx_tab, codes.astype(jnp.int32), axis=0)
    lo = jnp.zeros_like(a)
    hi = jnp.full_like(a, STEP_INDEX_MAX)

    def combine(f, g):
        # f applied first, then g.
        fa, flo, fhi = f
        ga, glo, ghi = g
        return (
            fa + ga,
            cs.clip(flo + ga, glo, ghi),
            cs.clip(fhi + ga, glo, ghi),
        )

    pa, plo, phi = lax.associative_scan(combine, (a, lo, hi), axis=-1)
    # Prefix composition t applied to init gives the index AFTER step t; the
    # index used by step t is the one after step t-1.
    after = cs.clip(init_index[..., None] + pa, plo, phi)
    used = jnp.concatenate([init_index[..., None], after[..., :-1]], axis=-1)
    return used
