#!/usr/bin/env python
"""Probe: which op classes bound the decode kernel at r=3 (headline shape)?

At r>=2 lane interleave the kernel saturates after r=3 — evidence it is
issue-bound, not latency-bound. This probe times the kernel with op classes
knocked out (semantics-breaking, timing-only):

  base        shipped word step
  noformula   step-size formula -> constant (measures the transcendental share)
  nomul       every int32 multiply -> add (measures the multiply share)
  neither     both knockouts
  nodelta     index-delta select chain -> constant

Usage: python benchmarks/probe_decode_ops.py [iters]
"""

from __future__ import annotations

import functools
import json
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

import aad_tpu.ops.pallas_decode as pd


def make_word_step(formula: bool, muls: bool, delta: bool):
    """A _decode_word_step clone with op-class knockouts."""
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

    def mul(a, b):
        return a * b if muls else a + b

    def word_step(word, carry, *, bits_per_sample, corrections, unroll=8):
        signbit = 1 << (bits_per_sample - 1)
        absmask = signbit - 1
        wshift = FIXEDPOINT_DIGITS + LMSFILTER_SHIFT
        half = jnp.int32(FIXEDPOINT_0_5)
        lo16 = jnp.int32(INT16_MIN)
        hi16 = jnp.int32(INT16_MAX)

        h0, h1, h2, h3, w0, w1, w2, w3, idx = carry
        outs = []
        for k in range(unroll):
            code = (word >> (4 * k)) & 0xF
            mag = code & absmask

            slot = (idx + TABLES_FLOAT_0_5) >> TABLES_FLOAT_DIGITS
            if formula:
                stepsize = pd._stepsize_f32(slot).astype(jnp.int32)
                for s, d in corrections:
                    stepsize = stepsize + jnp.where(
                        slot == s, jnp.int32(d), jnp.int32(0)
                    )
            else:
                stepsize = slot + jnp.int32(17)

            qmag = (mul(stepsize, (mag << 1) + 1)) >> (bits_per_sample - 1)
            qdiff = jnp.where((code & signbit) != 0, -qmag, qmag)

            if delta:
                d_ = pd._delta_select(mag, bits_per_sample)
            else:
                d_ = mag - jnp.int32(2)
            idx = jnp.maximum(
                jnp.int32(0),
                jnp.minimum(jnp.int32(STEP_INDEX_MAX), idx + d_),
            )

            pred = (
                half + mul(h0, w0) + mul(h1, w1) + mul(h2, w2) + mul(h3, w3)
            ) >> FIXEDPOINT_DIGITS
            s_ = jnp.maximum(lo16, jnp.minimum(hi16, qdiff + pred))
            w0 = w0 + ((mul(qdiff, h0) + half) >> wshift)
            w1 = w1 + ((mul(qdiff, h1) + half) >> wshift)
            w2 = w2 + ((mul(qdiff, h2) + half) >> wshift)
            w3 = w3 + ((mul(qdiff, h3) + half) >> wshift)
            h3, h2, h1, h0 = h2, h1, h0, s_
            outs.append(s_)
        return outs, (h0, h1, h2, h3, w0, w1, w2, w3, idx)

    return word_step


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    corrections = pd.stepsize_corrections()
    bps = 4

    # headline shape: 57 lane tiles -> r=3, Wp=124, w_chunk=124
    n_tiles, W = 57, 124
    L = n_tiles * pd.TILE
    total = L * W * 8

    rng = np.random.default_rng(0)
    words_t = jnp.asarray(
        rng.integers(
            0, 2**32, (W, n_tiles, pd.SUBLANES, pd.LANES), dtype=np.uint32
        )
    )
    ii = jnp.asarray(rng.integers(0, 4081, L, dtype=np.int64).astype(np.int32))
    h = jnp.asarray(
        rng.integers(-30000, 30000, (L, 4), dtype=np.int64).astype(np.int32)
    )
    wt = jnp.asarray(
        rng.integers(-20000, 20000, (L, 4), dtype=np.int64).astype(np.int32)
    )

    print(json.dumps({"config": {
        "lanes": L, "words": W, "samples": total, "iters": iters,
        "r": pd._pick_r(n_tiles), "w_chunk": pd._pick_w_chunk(W, 3),
        "platform": jax.devices()[0].platform,
    }}))

    orig = pd._decode_word_step
    words_np = np.asarray(words_t)

    def timed(label, fn, n=iters):
        words_t = jnp.asarray(words_np)  # fresh buffer (donated per variant)
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def run(words, tok, n):
            def body(_, carry):
                words, tok, out = carry
                words = words.at[0, 0, 0, 0].set(tok.astype(jnp.uint32))
                out = fn(words)
                return (words, out[0, 0].astype(jnp.int32) & 1, out)

            out0 = fn(words)
            return lax.fori_loop(
                0, n, body, (words, out0[0, 0].astype(jnp.int32) & 1, out0)
            )

        try:
            w2, tok, out = run(words_t, jnp.int32(0), n)
            float(tok)
            t0 = time.time()
            w2, tok, out = run(w2, tok, n)
            float(tok)
            dt = (time.time() - t0) / (n + 1)
            print(json.dumps({
                "probe": label,
                "ms": round(dt * 1e3, 3),
                "gsamples_per_sec": round(total / dt / 1e9, 2),
            }))
        except Exception as e:
            print(json.dumps({"probe": label, "error": str(e)[:300]}))

    variants = [
        ("base", dict(formula=True, muls=True, delta=True)),
        ("noformula", dict(formula=False, muls=True, delta=True)),
        ("nomul", dict(formula=True, muls=False, delta=True)),
        ("neither", dict(formula=False, muls=False, delta=True)),
        ("nodelta", dict(formula=True, muls=True, delta=False)),
    ]
    for label, kw in variants:
        pd._decode_word_step = make_word_step(**kw)
        try:
            timed(label, lambda w: pd._decode_tiled(
                w, ii, h, wt, W * 8, bps, corrections,
                with_head=True, as_int16=True, packed_out=True,
            ))
        finally:
            pd._decode_word_step = orig


if __name__ == "__main__":
    main()
