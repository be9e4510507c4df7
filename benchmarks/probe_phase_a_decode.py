#!/usr/bin/env python
"""Decide the phase-A-fed fused decode question by direct measurement.

The fused decode chain still carries idx-update -> step-size formula ->
qdiff ahead of the LMS recurrence (reference: src/aad_decoder.c:280-317).
The associative-scan phase A (ops/decode.py::compute_qdiffs) can precompute
qdiffs outside the chain — but feeding them through HBM costs 8x the code
traffic, so the only viable form is *in-kernel*: a first short-chain loop
computes the chunk's qdiffs into VMEM scratch, a second pure-LMS loop
consumes them. Whether that beats the single combined loop depends on how
much of the combined loop's latency the idx/formula branch actually adds —
this probe measures the decomposition directly, kernel-only:

  full       the shipped combined loop (_decode_word_step equivalent)
  lms_only   LMS chain with qdiff faked feed-forward from the word
             (lower-bounds any phase-A-fed consumer loop)
  qdiff_only idx chain + formula + qdiff, no LMS (phase A's in-kernel cost)
  two_loop   the real candidate: qdiff loop -> VMEM scratch -> LMS loop
  pipelined  software pipelining inside ONE loop: iteration wi computes
             word wi+1's qdiffs while the LMS chain consumes word wi's —
             two independent chains per body, no scratch traffic

If full <= two_loop/pipelined (and full is close to lms_only) the
direction is dead: the scheduler already overlaps the idx/formula branch
with the LMS chain inside the combined body.

VERDICT (v5e, round 4 — see docs/DESIGN.md §2a): dead. Neither split form
ever beat the combined loop (best case two_loop +0.5% at r=4, within
noise; both lose at r<=2), and the lms_only lower bound shows the
combined loop already hides most of the formula branch.

Usage: python benchmarks/probe_phase_a_decode.py [r] [w_chunk]
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aad_tpu.constants import (
    FIXEDPOINT_0_5,
    FIXEDPOINT_DIGITS,
    INT16_MAX,
    INT16_MIN,
    LMSFILTER_SHIFT,
    STEP_INDEX_MAX,
    TABLES_FLOAT_0_5,
    TABLES_FLOAT_DIGITS,
)
from aad_tpu.ops.pallas_common import interpret_mode
from aad_tpu.ops.pallas_decode import (
    LANES,
    SUBLANES,
    _delta_select,
    _stepsize_f32,
    stepsize_corrections,
)

ITERS = 100
BPS = 4
WSHIFT = FIXEDPOINT_DIGITS + LMSFILTER_SHIFT


def _qdiff_of(idx, mag, sign, corrections):
    slot = (idx + TABLES_FLOAT_0_5) >> TABLES_FLOAT_DIGITS
    stepsize = _stepsize_f32(slot).astype(jnp.int32)
    for s, d in corrections:
        stepsize = stepsize + jnp.where(slot == s, jnp.int32(d), jnp.int32(0))
    qmag = (stepsize * ((mag << 1) + 1)) >> (BPS - 1)
    return jnp.where(sign != 0, -qmag, qmag)


def _idx_next(idx, mag):
    return jnp.maximum(
        jnp.int32(0),
        jnp.minimum(jnp.int32(STEP_INDEX_MAX), idx + _delta_select(mag, BPS)),
    )


def _lms_step(qdiff, h0, h1, h2, h3, w0, w1, w2, w3):
    half = jnp.int32(FIXEDPOINT_0_5)
    pred = (half + h0 * w0 + h1 * w1 + h2 * w2 + h3 * w3) >> FIXEDPOINT_DIGITS
    s = jnp.maximum(jnp.int32(INT16_MIN),
                    jnp.minimum(jnp.int32(INT16_MAX), qdiff + pred))
    w0 = w0 + ((qdiff * h0 + half) >> WSHIFT)
    w1 = w1 + ((qdiff * h1 + half) >> WSHIFT)
    w2 = w2 + ((qdiff * h2 + half) >> WSHIFT)
    w3 = w3 + ((qdiff * h3 + half) >> WSHIFT)
    return s, (s, h0, h1, h2, w0, w1, w2, w3)


def make_kernel(variant: str, corrections, w_chunk: int):
    signbit = 1 << (BPS - 1)
    absmask = signbit - 1

    def kernel(words_ref, out_ref, state, *scratch):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            for k in range(9):
                state[k] = jnp.zeros_like(state[k])

        if variant == "two_loop":
            (qd,) = scratch

            def qloop(wi, idx):
                word = words_ref[wi, 0]
                for k in range(8):
                    code = (word >> (4 * k)) & 0xF
                    mag = code & absmask
                    qd[wi * 8 + k] = _qdiff_of(idx, mag, code & signbit,
                                               corrections)
                    idx = _idx_next(idx, mag)
                return idx

            idx = lax.fori_loop(0, w_chunk, qloop, state[8])
            state[8] = idx

            def lloop(wi, carry):
                outs = []
                for k in range(8):
                    s, carry = _lms_step(qd[wi * 8 + k], *carry)
                    outs.append(s)
                for j in range(4):
                    out_ref[wi * 4 + j, 0] = (
                        (outs[2 * j + 1] << 16) | (outs[2 * j] & 0xFFFF)
                    ).astype(jnp.uint32)
                return carry

            carry = lax.fori_loop(0, w_chunk, lloop,
                                  tuple(state[k] for k in range(8)))
            for k in range(8):
                state[k] = carry[k]
            return

        if variant == "pipelined":
            # Manual software pipelining: qdiffs for word wi+1 are computed
            # in iteration wi (idx chain + formula depend only on codes),
            # while the LMS chain consumes the qdiffs carried from the
            # previous iteration — two INDEPENDENT chains per body, so the
            # scheduler can overlap the formula branch under the LMS chain.
            def qd_word(word, idx):
                qs = []
                for k in range(8):
                    code = (word >> (4 * k)) & 0xF
                    mag = code & absmask
                    qs.append(_qdiff_of(idx, mag, code & signbit,
                                        corrections))
                    idx = _idx_next(idx, mag)
                return tuple(qs), idx

            def lms_word(wi, qs, lms):
                outs = []
                for k in range(8):
                    s, lms = _lms_step(qs[k], *lms)
                    outs.append(s)
                for j in range(4):
                    out_ref[wi * 4 + j, 0] = (
                        (outs[2 * j + 1] << 16) | (outs[2 * j] & 0xFFFF)
                    ).astype(jnp.uint32)
                return lms

            def body(wi, carry):
                lms, idx, qs = carry[:8], carry[8], carry[9:]
                nqs, idx = qd_word(words_ref[wi + 1, 0], idx)
                lms = lms_word(wi, qs, lms)
                return (*lms, idx, *nqs)

            qs0, idx0 = qd_word(words_ref[0, 0], state[8])
            carry = lax.fori_loop(
                0, w_chunk - 1, body,
                (*(state[k] for k in range(8)), idx0, *qs0),
            )
            lms, idx, qs = carry[:8], carry[8], carry[9:]
            lms = lms_word(w_chunk - 1, qs, lms)
            for k in range(8):
                state[k] = lms[k]
            state[8] = idx
            return

        def word_step(wi, carry):
            word = words_ref[wi, 0]
            outs = []
            if variant == "full":
                h0, h1, h2, h3, w0, w1, w2, w3, idx = carry
                for k in range(8):
                    code = (word >> (4 * k)) & 0xF
                    mag = code & absmask
                    qdiff = _qdiff_of(idx, mag, code & signbit, corrections)
                    idx = _idx_next(idx, mag)
                    s, (h0, h1, h2, h3, w0, w1, w2, w3) = _lms_step(
                        qdiff, h0, h1, h2, h3, w0, w1, w2, w3)
                    outs.append(s)
                carry = (h0, h1, h2, h3, w0, w1, w2, w3, idx)
            elif variant == "lms_only":
                h0, h1, h2, h3, w0, w1, w2, w3, idx = carry
                for k in range(8):
                    # feed-forward fake qdiff: one shift+mask off the word
                    qdiff = ((word >> (2 * k)) & 0x3FF) - 512
                    s, (h0, h1, h2, h3, w0, w1, w2, w3) = _lms_step(
                        qdiff, h0, h1, h2, h3, w0, w1, w2, w3)
                    outs.append(s)
                carry = (h0, h1, h2, h3, w0, w1, w2, w3, idx)
            else:  # qdiff_only
                h0, h1, h2, h3, w0, w1, w2, w3, idx = carry
                acc = h0
                for k in range(8):
                    code = (word >> (4 * k)) & 0xF
                    mag = code & absmask
                    q = _qdiff_of(idx, mag, code & signbit, corrections)
                    idx = _idx_next(idx, mag)
                    acc = acc + q
                    outs.append(acc)
                carry = (acc, h1, h2, h3, w0, w1, w2, w3, idx)
            for j in range(4):
                out_ref[wi * 4 + j, 0] = (
                    (outs[2 * j + 1] << 16) | (outs[2 * j] & 0xFFFF)
                ).astype(jnp.uint32)
            return carry

        carry = tuple(state[k] for k in range(9))
        carry = lax.fori_loop(0, w_chunk, word_step, carry)
        for k in range(9):
            state[k] = carry[k]

    return kernel


def launch(variant, words_t, corrections, w_chunk, r):
    Wp, ntR = words_t.shape[0], words_t.shape[1]
    RS = r * SUBLANES
    scratch = [pltpu.VMEM((9, RS, LANES), jnp.int32)]
    if variant == "two_loop":
        scratch.append(pltpu.VMEM((w_chunk * 8, RS, LANES), jnp.int32))
    return pl.pallas_call(
        make_kernel(variant, corrections, w_chunk),
        grid=(ntR, Wp // w_chunk),
        in_specs=[pl.BlockSpec((w_chunk, 1, RS, LANES),
                               lambda i, j: (j, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((w_chunk * 4, 1, RS, LANES),
                               lambda i, j: (j, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wp * 4, ntR, RS, LANES), jnp.uint32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(words_t)


def measure(variant, r=4, w_chunk=64, tiles=28, W=256):
    corrections = stepsize_corrections()
    ntR = tiles // r
    RS = r * SUBLANES
    rng = np.random.default_rng(0)
    words = jnp.asarray(
        rng.integers(0, 2**32, (W, ntR, RS, LANES), dtype=np.uint32)
    )
    n_samples = W * 8 * tiles * 1024

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def run(words, token, iters):
        def body(_, carry):
            w, tok = carry
            w = w.at[0, 0, 0, 0].set(tok.astype(jnp.uint32))
            out = launch(variant, w, corrections, w_chunk, r)
            return (w, out[-1, -1, -1, -1].astype(jnp.int32))

        return lax.fori_loop(0, iters, body, (words, token))

    words, token = run(words, jnp.int32(0), ITERS)
    float(token)
    words, token = run(words, token, ITERS)
    t0 = time.time()
    words, token = run(words, token, ITERS)
    float(token)
    dt = (time.time() - t0) / ITERS
    return n_samples / dt, dt


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    w_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    for variant in ("full", "lms_only", "qdiff_only", "two_loop",
                    "pipelined"):
        sps, dt = measure(variant, r=r, w_chunk=w_chunk)
        print(f"{variant:10s} r={r} w_chunk={w_chunk} "
              f"{sps / 1e9:7.2f} Gsamples/s  {dt * 1e3:6.3f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
