"""Fused Pallas TPU kernel for the LMS reconstruction scan (decode phase B).

Decode phase A (associative step-index scan + table gathers) runs in XLA and
produces a dense ``qdiff`` stream; this kernel consumes it with the remaining
truly-sequential recurrence (reference: src/aad_decoder.c:291-315):

    pred = (2**14 + sum(h_i * w_i)) >> 15
    s    = clip16(qdiff + pred)
    w_i += (qdiff * h_i + 2**14) >> 18
    h    = shift_in(s)

Design: lanes = independent block x channel decode tasks. Tasks are tiled
(8, 128) onto the VPU; each grid row owns one lane tile and walks time
sequentially in T_CHUNK pieces, carrying the 9 state tiles in VMEM scratch
across chunks (grid iterates the trailing time dimension fastest, so state
persists per lane tile). All arithmetic is int32 on (8, 128) tiles — ~18 VPU
ops per decoded sample per 1024 lanes.

Memory layout: qdiffs/outputs are time-major ``(Tp, L/1024, 8, 128)`` so each
step reads/writes one contiguous tile; XLA transposes into this layout once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import interpret_mode

from ..constants import FIXEDPOINT_0_5, FIXEDPOINT_DIGITS, INT16_MAX, INT16_MIN, LMSFILTER_SHIFT

SUBLANES = 8
LANES = 128
TILE = SUBLANES * LANES  # 1024 lanes per grid row
T_CHUNK = 256


def _lms_kernel(qd_ref, h_ref, w_ref, out_ref, state):
    """state: VMEM scratch (8, SUBLANES, LANES) = h0..h3, w0..w3 (+1 spare)."""
    t_chunk = pl.program_id(1)

    @pl.when(t_chunk == 0)
    def _init():
        for k in range(4):
            state[k] = h_ref[0, k]
            state[4 + k] = w_ref[0, k]

    h0, h1, h2, h3 = state[0], state[1], state[2], state[3]
    w0, w1, w2, w3 = state[4], state[5], state[6], state[7]

    half = jnp.int32(FIXEDPOINT_0_5)
    wshift = FIXEDPOINT_DIGITS + LMSFILTER_SHIFT
    lo = jnp.int32(INT16_MIN)
    hi = jnp.int32(INT16_MAX)

    def step(t, carry):
        h0, h1, h2, h3, w0, w1, w2, w3 = carry
        qd = qd_ref[t, 0]
        pred = (half + h0 * w0 + h1 * w1 + h2 * w2 + h3 * w3) >> FIXEDPOINT_DIGITS
        s = jnp.maximum(lo, jnp.minimum(hi, qd + pred))
        w0 = w0 + ((qd * h0 + half) >> wshift)
        w1 = w1 + ((qd * h1 + half) >> wshift)
        w2 = w2 + ((qd * h2 + half) >> wshift)
        w3 = w3 + ((qd * h3 + half) >> wshift)
        out_ref[t, 0] = s
        return s, h0, h1, h2, w0, w1, w2, w3

    carry = lax.fori_loop(0, T_CHUNK, step, (h0, h1, h2, h3, w0, w1, w2, w3))
    for k in range(8):
        state[k] = carry[k]


@functools.partial(jax.jit, donate_argnums=())
def lms_pallas(qdiffs: jax.Array, history: jax.Array, weight: jax.Array) -> jax.Array:
    """Drop-in replacement for :func:`aad_tpu.ops.decode.lms_scan`.

    Args:
      qdiffs:  (..., T) int32
      history: (..., 4) int32 (newest first)
      weight:  (..., 4) int32
    Returns:
      samples (..., T) int32
    """
    lane_shape = qdiffs.shape[:-1]
    T = qdiffs.shape[-1]
    L = 1
    for d in lane_shape:
        L *= d

    qd = qdiffs.reshape(L, T)
    h = history.reshape(L, 4)
    w = weight.reshape(L, 4)

    Lp = -(-L // TILE) * TILE
    Tp = -(-T // T_CHUNK) * T_CHUNK
    qd = jnp.pad(qd, ((0, Lp - L), (0, Tp - T)))
    h = jnp.pad(h, ((0, Lp - L), (0, 0)))
    w = jnp.pad(w, ((0, Lp - L), (0, 0)))

    n_tiles = Lp // TILE
    # time-major tiles: (Tp, n_tiles, 8, 128)
    qd_t = qd.reshape(n_tiles, SUBLANES, LANES, Tp).transpose(3, 0, 1, 2)
    # state tiles: (n_tiles, 4, 8, 128)
    h_t = h.T.reshape(4, n_tiles, SUBLANES, LANES).transpose(1, 0, 2, 3)
    w_t = w.T.reshape(4, n_tiles, SUBLANES, LANES).transpose(1, 0, 2, 3)

    grid = (n_tiles, Tp // T_CHUNK)
    out = pl.pallas_call(
        _lms_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (T_CHUNK, 1, SUBLANES, LANES),
                lambda i, j: (j, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, SUBLANES, LANES),
                lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, SUBLANES, LANES),
                lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (T_CHUNK, 1, SUBLANES, LANES),
            lambda i, j: (j, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, n_tiles, SUBLANES, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((9, SUBLANES, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(qd_t, h_t, w_t)

    samples = out.transpose(1, 2, 3, 0).reshape(Lp, Tp)[:L, :T]
    return samples.reshape(*lane_shape, T)
