"""Block decode engines.

Decode of one block factors into two phases (design: SURVEY.md §7.3):

* **Phase A (parallel)** — the step-index recurrence depends only on the code
  sequence through clipped adds, so all T step indices — and hence all step
  sizes and quantised differences — are computed with an associative scan in
  O(log T) depth, fully parallel across blocks x channels x time.
* **Phase B (sequential, tiny)** — the remaining LMS recurrence
  (predict -> clip -> weight update -> history shift) is ~15 int ops per
  sample with no table lookups, scanned over time and vmapped over the
  block x channel batch. Throughput comes from the batch axis: every block
  decodes independently (reference: src/aad_decoder.c:363-380).

Two interchangeable engines are provided:
  * ``decode_blocks_scan``  — lax.scan reference engine (always available)
  * ``decode_blocks``       — dispatches to the Pallas kernel when profitable

Both are bit-exact with the reference decoder (reference:
src/aad_decoder.c:269-318, 321-475).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import (
    FILTER_ORDER,
    FIXEDPOINT_0_5,
    FIXEDPOINT_DIGITS,
    LMSFILTER_SHIFT,
)
from . import cseman as cs
from .transitions import quantized_diff, step_index_prefix, stepsize_from_index

Array = jax.Array


def compute_qdiffs(codes: Array, init_index: Array, bits_per_sample: int) -> Array:
    """Phase A: codes (..., T) + initial index (...) -> qdiff (..., T) int32."""
    idx_used = step_index_prefix(codes, init_index, bits_per_sample)
    stepsize = stepsize_from_index(idx_used)
    return quantized_diff(stepsize, codes, bits_per_sample)


def lms_scan(qdiffs: Array, history0: Array, weight0: Array) -> Array:
    """Phase B: sequential LMS reconstruction.

    Args:
      qdiffs:   (..., T) int32 quantised differences.
      history0: (..., 4) int32 initial history (newest first).
      weight0:  (..., 4) int32 initial weights.
    Returns:
      samples (..., T) int32.
    """

    def step(carry, qdiff):
        history, weight = carry
        pred = cs.asr(
            cs.i32(FIXEDPOINT_0_5) + jnp.sum(history * weight, axis=-1),
            FIXEDPOINT_DIGITS,
        )
        sample = cs.clip16(qdiff + pred)
        weight = weight + cs.asr(
            qdiff[..., None] * history + cs.i32(FIXEDPOINT_0_5),
            FIXEDPOINT_DIGITS + LMSFILTER_SHIFT,
        )
        history = jnp.concatenate(
            [sample[..., None], history[..., : FILTER_ORDER - 1]], axis=-1
        )
        return (history, weight), sample

    # scan over the time axis; batch axes ride along inside the carry.
    qdiffs_t = jnp.moveaxis(qdiffs, -1, 0)  # (T, ...)
    (_, _), samples_t = lax.scan(step, (history0, weight0), qdiffs_t)
    return jnp.moveaxis(samples_t, 0, -1)


@functools.partial(jax.jit, static_argnames=("bits_per_sample", "engine"))
def decode_blocks(
    codes: Array,
    step_index: Array,
    weight: Array,
    history: Array,
    *,
    bits_per_sample: int,
    engine: str = "auto",
) -> Array:
    """Decode a dense batch of independent block tasks.

    Args:
      codes:      (..., T) uint8/int codes (lane shape = blocks x channels ...).
      step_index: (...) int32 initial Q4 step index per lane.
      weight:     (..., 4) int32 initial weights per lane.
      history:    (..., 4) int32 initial history per lane (newest first).
      engine: "scan", "pallas", or "auto".
    Returns:
      (..., T + FILTER_ORDER) int32 samples: the four header samples
      (history reversed, reference: src/aad_decoder.c:386-391) followed by the
      T decoded samples.
    """
    qdiffs = compute_qdiffs(codes, step_index, bits_per_sample)
    if engine == "pallas":
        from .pallas_lms import lms_pallas

        body = lms_pallas(qdiffs, history, weight)
    elif engine == "scan":
        body = lms_scan(qdiffs, history, weight)
    else:
        body = _auto_lms(qdiffs, history, weight)
    head = history[..., ::-1]
    return jnp.concatenate([head, body], axis=-1)


def _auto_lms(qdiffs: Array, history: Array, weight: Array) -> Array:
    """Pick the Pallas kernel on TPU, lax.scan elsewhere."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu:
        try:
            from .pallas_lms import lms_pallas
        except ImportError:  # kernel not available in this build
            return lms_scan(qdiffs, history, weight)
        return lms_pallas(qdiffs, history, weight)
    return lms_scan(qdiffs, history, weight)


def ms_to_lr(samples: Array) -> Array:
    """Mid/side -> left/right with int16 clips.

    samples: (..., 2, N) with mid on channel 0, side on channel 1
    (reference: src/aad_decoder.c:458-470).
    """
    mid = samples[..., 0, :]
    side = samples[..., 1, :]
    left = cs.clip16(mid + side)
    right = cs.clip16(mid - side)
    return jnp.stack([left, right], axis=-2)
