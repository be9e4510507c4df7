"""Fully-fused Pallas encode: trials + block chain in ONE kernel execution.

This kernel runs the complete encoder — baseline measure, trial warm-ups on
the previous block, candidate selection by exact u64 SSE, history seeding,
weight rounding and the final code emission — for *all* blocks of a stream
batch in a single execution: grid = (lane_tiles, blocks), chain state
carried in VMEM scratch across the sequential block dimension.

MEASURED OUTCOME (v5e): bit-exact with the per-pass engine and *equal* in
throughput at every batch size tried (2.0 G/s trials=2 at 8k lanes, ~5 M/s
single-stream) — the encoder is bound by the per-step dependent-op chain on
the VPU, not by kernel-execution count (an earlier standalone measurement
suggesting ~1.5 ms/launch fixed cost turned out to be harness glue). Kept
as an alternative engine: it compiles ~8x faster than the per-pass trial
pipeline (2 s vs 18 s), which matters for shape-diverse workloads, and it
is the natural base for future hardware where launch cost grows.

The previous block's samples are re-read via a second input spec on the
same array with a shifted index map (the trial search re-reads raw input,
reference: src/aad_encoder.c:502-512).

Two word-residency strategies cover every geometry: blocks whose packed
sample words fit VMEM twice over (cur + prev, double-buffered) use plain
VMEM block specs; larger blocks (mono 3-bit 1024-byte: 2684 samples) keep
their words in HBM and the kernel streams STREAM_CHUNK-word pieces through
a VMEM scratch buffer by manual async DMA — same dependent-chain compute,
bounded VMEM.
"""

from __future__ import annotations

import functools
import os

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
    TILE,
    _delta_select,
    _stepsize_f32,
    stepsize_corrections,
)

# VMEM budget for the resident-block variant: cur + prev packed words
# (W2 = nspb/2 words each), double-buffered by Mosaic, plus the code-word
# output — roughly 4.5 * W2 * 4 KB per lane tile against the 16 MB scoped
# limit, so R * W2 <= ~832 (mono 4-bit 1024-byte blocks, W2=1008, measured
# 17.75 MB and OOMed at the old 2112 threshold). Above this the kernel
# switches to manual chunked DMA (words stay in HBM; see _make_kernel
# stream_chunk), so every geometry is supported in the single-execution
# path. The budget scales with R, the lane-interleave factor below.
MAX_NSPB_RESIDENT = 1664
# HBM->VMEM chunk for the streaming variant (words; x2 samples each),
# double-buffered (2 slots in scratch), so VMEM = 2*chunk*R*4 KB.
# _pick_stream_chunk prefers an exact divisor of the natural word count so
# the word array needs NO chunk-multiple padding (the pad lowered to a
# separate full-array copy pass — 65 MB / ~0.13 ms at the batch-encode
# bench scale) and the kernel never walks dead pad words; STREAM_CHUNK is
# the fallback when no divisor in [16, MAX_STREAM_CHUNK] exists.
STREAM_CHUNK = 128
MAX_STREAM_CHUNK = 160


def _pick_stream_chunk(w2: int) -> tuple[int, int]:
    """(padded word count, chunk): chunk | w2 and chunk % 4 == 0."""
    for cand in range(MAX_STREAM_CHUNK, 15, -4):
        if w2 % cand == 0:
            return w2, cand
    return -(-w2 // STREAM_CHUNK) * STREAM_CHUNK, STREAM_CHUNK
# Lane-interleave factor: process R independent (8, 128) lane tiles per
# grid step, folded onto the sublane axis as one (R*8, 128) vector working
# set. The encoder is bound by the per-sample dependent-op chain on the
# VPU (measured 72 cyc/step at R=1); R independent chains give the
# scheduler work to hide that latency. Measured per-pass throughput on
# v5e (W=512 words): R=1 17.5, R=2 26.6, R=4 27.8 Gsamples/s — a 1.56x
# kernel speedup that carries straight to end-to-end batch encode.
MAX_INTERLEAVE = 4


def _pick_interleave(num_lanes: int) -> int:
    """Largest R in [1, MAX_INTERLEAVE] without padding past the lane count."""
    cap = int(os.environ.get("AAD_TPU_ENCODE_R", MAX_INTERLEAVE))
    r = 1
    while r < cap and r * TILE < num_lanes:
        r *= 2
    return r


def supports_fused_encode(num_samples_per_block: int) -> bool:
    """Always true: large blocks stream their words by chunked DMA."""
    return True


def _make_kernel(
    bits_per_sample: int, corrections, num_trials: int, n_words: int,
    n_codes: int, stream_chunk: int | None = None, r: int = 1,
    warm_on_prev: bool = True, emit_state: bool = False,
    pass_stack: bool = False,
):
    signbit = 1 << (bits_per_sample - 1)
    absmask = signbit - 1
    wshift = FIXEDPOINT_DIGITS + LMSFILTER_SHIFT
    SHAPE = (r * SUBLANES, LANES)
    # When the trial search never reads the previous block (trials == 0, or
    # the block-independent mode's statically-dead warm-up) the prev inputs
    # are dropped from the argument list entirely — a windowed spec's block
    # is DMAed whether or not the kernel reads it.
    needs_prev = num_trials > 0 and warm_on_prev

    def kernel(*refs):
        if needs_prev:
            (cur_w_ref, prev_w_ref, prev0_w_ref, cur_h_ref, prev_h_ref,
             valid_ref, idx_ref, h_ref, w_ref, bb_ref, wf_ref,
             codes_ref, hdr_ref, *rest) = refs
        else:
            (cur_w_ref, cur_h_ref, valid_ref, idx_ref, h_ref, w_ref,
             wf_ref, codes_ref, hdr_ref, *rest) = refs
        if emit_state:
            fstate_ref, state, *stream_scratch = rest
        elif pass_stack:
            state, spec_ref = rest
            stream_scratch = []
        else:
            state, *stream_scratch = rest
        b = pl.program_id(1)
        lane_tile = pl.program_id(0)

        # ``prev_w_ref`` is the SAME array as ``cur_w_ref`` passed through a
        # second spec: shifted index map (resident) or an explicit b-1 DMA
        # index (streaming). The previous trial-warm-up block is therefore
        # re-read in place instead of materialising a whole-array shifted
        # copy on the XLA side (a 2x-payload-sized device copy, measured
        # ~0.8 ms of a ~10 ms batch encode). Block 0's previous block — the
        # streaming-carry block — comes from the small prev0 input, selected
        # by lax.cond so only one source is ever streamed.

        if stream_chunk is None:
            def stream_words(words_ref, bi, body_u, body_m, wfull, carry):
                """Iterate (word_index, word, carry) over a VMEM-resident
                block (block choice is baked into the ref's index map).

                Two-phase: words [0, wfull) run the unmasked body (every
                sample live for every lane — no per-sample live compare and
                no 9-way state select), the tail runs the masked body.
                ``wfull`` is a traced scalar or a static int."""
                del bi
                c = lax.fori_loop(
                    0, wfull,
                    lambda wi, c: body_u(wi, words_ref[0, wi, 0], c),
                    carry,
                )
                return lax.fori_loop(
                    wfull, n_words,
                    lambda wi, c: body_m(wi, words_ref[0, wi, 0], c),
                    c,
                )

            def stream_groups4(words_ref, bi, body4_u, body4_m, gfull, carry):
                """Iterate groups of 4 words (one code word's worth) with
                static in-group positions — the emit pass packs codes with
                static shift amounts this way (a traced shift per sample
                measured ~7x slower than the whole measure pass). Groups
                [0, gfull) run the unmasked body (all 8 codes live)."""
                del bi

                def g_u(g, c):
                    ws = tuple(words_ref[0, 4 * g + j, 0] for j in range(4))
                    return body4_u(g, ws, c)

                def g_m(g, c):
                    ws = tuple(words_ref[0, 4 * g + j, 0] for j in range(4))
                    return body4_m(g, ws, c)

                c = lax.fori_loop(0, gfull, g_u, carry)
                return lax.fori_loop(gfull, n_words // 4, g_m, c)
        else:
            buf, sem = stream_scratch
            n_chunks = n_words // stream_chunk

            def _dma_loop(words_ref, bi, chunk_body, carry):
                """Double-buffered chunked DMA over block ``bi``'s words.

                Chunk ci+1's copy is issued before chunk ci is consumed, so
                the DMA rides under the compute (the chain is compute-bound;
                the overlap recovered ~10% on the probe) while VMEM stays
                ~2 MB.
                """

                def copy(ci, slot):
                    return pltpu.make_async_copy(
                        words_ref.at[
                            bi, pl.ds(ci * stream_chunk, stream_chunk),
                            lane_tile,
                        ],
                        buf.at[slot],
                        sem.at[slot],
                    )

                copy(0, 0).start()

                def chunk_step(ci, c):
                    slot = lax.rem(ci, 2)

                    @pl.when(ci + 1 < n_chunks)
                    def _prefetch():
                        copy(ci + 1, 1 - slot).start()

                    copy(ci, slot).wait()
                    return chunk_body(ci, slot, c)

                return lax.fori_loop(0, n_chunks, chunk_step, carry)

            def stream_words(words_ref, bi, body_u, body_m, wfull, carry):
                def chunk_body(ci, slot, c):
                    base = ci * stream_chunk
                    u = jnp.clip(wfull - base, 0, stream_chunk)

                    def iu(wj, c2):
                        return body_u(base + wj, buf[slot, wj], c2)

                    def im(wj, c2):
                        return body_m(base + wj, buf[slot, wj], c2)

                    c = lax.fori_loop(0, u, iu, c)
                    return lax.fori_loop(u, stream_chunk, im, c)

                return _dma_loop(words_ref, bi, chunk_body, carry)

            def stream_groups4(words_ref, bi, body4_u, body4_m, gfull, carry):
                gpc = stream_chunk // 4

                def chunk_body(ci, slot, c):
                    base = ci * gpc
                    u = jnp.clip(gfull - base, 0, gpc)

                    def iu(gj, c2):
                        ws = tuple(buf[slot, 4 * gj + j] for j in range(4))
                        return body4_u(base + gj, ws, c2)

                    def im(gj, c2):
                        ws = tuple(buf[slot, 4 * gj + j] for j in range(4))
                        return body4_m(base + gj, ws, c2)

                    c = lax.fori_loop(0, u, iu, c)
                    return lax.fori_loop(u, gpc, im, c)

                return _dma_loop(words_ref, bi, chunk_body, carry)

        @pl.when(b == 0)
        def _init():
            for k in range(4):
                state[k] = h_ref[0, k]
                state[4 + k] = w_ref[0, k]
            state[8] = idx_ref[0, 0]

        half = jnp.int32(FIXEDPOINT_0_5)
        lo16 = jnp.int32(INT16_MIN)
        hi16 = jnp.int32(INT16_MAX)

        def sample_step(sample, st):
            """One encode transition; returns (code, qdiff, st')."""
            h0, h1, h2, h3, w0, w1, w2, w3, idx = st
            slot = (idx + TABLES_FLOAT_0_5) >> TABLES_FLOAT_DIGITS
            stepsize = _stepsize_f32(slot).astype(jnp.int32)
            for s, d in corrections:
                stepsize = stepsize + jnp.where(slot == s, jnp.int32(d), jnp.int32(0))
            pred = (half + h0 * w0 + h1 * w1 + h2 * w2 + h3 * w3) >> FIXEDPOINT_DIGITS
            diff = sample - pred
            neg = diff < 0
            dabs = jnp.where(neg, -diff, diff)
            scaled = dabs << (bits_per_sample - 2)
            # quantise: min(scaled / stepsize, absmask). Two exact integer
            # formulations (reference: src/aad_encoder.c:370-383 divides):
            #  * threshold count sum_k [scaled >= k*stepsize] — 3 ops per
            #    threshold but the compares are independent, so the
            #    *critical path* is short (cmp + log-depth add tree);
            #    best when the kernel is latency-bound (R == 1).
            #  * binary search on the quotient bits — fewer total ops
            #    (~14 vs ~21 at bps=4) but each stage depends on the last;
            #    best when R >= 2 chains make the kernel issue-bound.
            # Both clamp naturally (quotient >= 2^(bps-1) makes every
            # compare true) and agree for stepsize == 0.
            if r >= 2 and absmask >= 3:
                t = stepsize << (bits_per_sample - 2)
                mag = (scaled >= t).astype(jnp.int32)
                for i in range(bits_per_sample - 3, -1, -1):
                    t = (((mag << 1) + 1) << i) * stepsize
                    mag = (mag << 1) + (scaled >= t).astype(jnp.int32)
            else:
                mag = jnp.zeros_like(scaled)
                for k in range(1, absmask + 1):
                    mag = mag + (scaled >= k * stepsize).astype(jnp.int32)
            qmag = (stepsize * ((mag << 1) + 1)) >> (bits_per_sample - 1)
            qdiff = jnp.where(neg, -qmag, qmag)
            idx2 = jnp.maximum(
                jnp.int32(0),
                jnp.minimum(jnp.int32(STEP_INDEX_MAX),
                            idx + _delta_select(mag, bits_per_sample)),
            )
            s16 = jnp.maximum(lo16, jnp.minimum(hi16, qdiff + pred))
            st2 = (
                s16, h0, h1, h2,
                w0 + ((qdiff * h0 + half) >> wshift),
                w1 + ((qdiff * h1 + half) >> wshift),
                w2 + ((qdiff * h2 + half) >> wshift),
                w3 + ((qdiff * h3 + half) >> wshift),
                idx2,
            )
            code = jnp.where(neg, mag | signbit, mag)
            return code, qdiff, st2

        def seed(st, head_ref, mask=None):
            """history <- block's first 4 samples (mask=None: every lane)."""
            h3, h2, h1, h0 = (head_ref[0, 0, k] for k in range(4))
            # head[k] is sample k; history[j] = sample (3 - j)
            if mask is None:
                return (h0, h1, h2, h3, st[4], st[5], st[6], st[7], st[8])
            return (
                jnp.where(mask, h0, st[0]),
                jnp.where(mask, h1, st[1]),
                jnp.where(mask, h2, st[2]),
                jnp.where(mask, h3, st[3]),
                st[4], st[5], st[6], st[7], st[8],
            )

        def measure(st, words_ref, bi, live_mask_fn, wfull):
            """Two-phase measure pass; returns (st', (sse_hi, sse_lo)).

            Words [0, wfull) have every sample live for every lane in the
            tile and skip the per-sample live compare + 9-way state select
            (~11 of ~95 vector ops per step); the tail applies
            ``live_mask_fn`` exactly as the reference's in-block sample
            bound does (src/aad_encoder.c:443-455)."""

            def mk_body(masked):
                def body(wi, word, carry):
                    st, sh, sl = carry[:9], carry[9], carry[10]
                    lo = (word << 16) >> 16
                    hi = word >> 16
                    for k, sample in ((0, lo), (1, hi)):
                        gt = wi * 2 + k
                        _code, qdiff, st2 = sample_step(sample, st)
                        if masked:
                            live = live_mask_fn(gt)
                            st = tuple(
                                jnp.where(live, a, b)
                                for a, b in zip(st2, st)
                            )
                            # the reference's accumulator term is the
                            # WRAPPED int32 product
                            # (src/aad_encoder.c:459-461): qdiff^2 >= 2^31
                            # enters negative; hi takes the sign extension
                            sq = jnp.where(live, qdiff * qdiff, 0)
                        else:
                            st = st2
                            sq = qdiff * qdiff
                        nsl = sl + sq
                        usl = sl ^ jnp.int32(-2147483648)
                        unsl = nsl ^ jnp.int32(-2147483648)
                        # sign extension via arithmetic shift — a ``sq < 0``
                        # compare is folded to false by XLA ((x*x) < 0
                        # simplification, unsound under int32 wrap)
                        sh = sh + (unsl < usl).astype(jnp.int32) + (sq >> 31)
                        sl = nsl
                    return (*st, sh, sl)

                return body

            zero = jnp.zeros(SHAPE, jnp.int32)
            out = stream_words(
                words_ref, bi, mk_body(False), mk_body(True), wfull,
                (*st, zero, zero),
            )
            return out[:9], (out[9], out[10])

        def sse_better(cand, best):
            # the reference's ``min_rmse > tmp_rmse`` exactly: the wrapped
            # accumulator can go negative, where sqrt gives NaN and every
            # comparison is false — so both sums must be non-negative and
            # the candidate strictly smaller (signed i64 limb compare;
            # hi limbs are plain int32, lo compares need the unsigned bias)
            bias = jnp.int32(-2147483648)
            ch, cl, bh, bl = cand[0], cand[1], best[0], best[1]
            less = (ch < bh) | ((ch == bh) & ((cl ^ bias) < (bl ^ bias)))
            return (ch >= 0) & (bh >= 0) & less

        st = tuple(state[k] for k in range(9))
        valid = valid_ref[0, 0, 0]
        live_cur = lambda gt: gt < valid - FILTER_ORDER
        if num_trials > 0:
            # per-(block, tile) unmasked word bound: every word below it
            # has all lanes live (min over the tile's valid, computed on
            # the XLA side into SMEM)
            wf = wf_ref[b, lane_tile]
        # prev blocks are full-length: n_codes live codes, then the
        # pad-to-8 zero slots (which must not advance state) — a STATIC
        # bound, so the masked tail's live test is a scalar compare
        pw_full = n_codes // 2
        live_prev = lambda gt: gt < n_codes

        if pass_stack:
            # ---- pass-stacked single-tile trial search ------------------
            # Live lanes occupy sublane rows 0-3 only (gate: one lane tile,
            # L <= 512), so two INDEPENDENT passes ride in one set of
            # (8, 128) vector ops: rows 0-3 = chain X, rows 4-7 = chain Y —
            # a dual slot costs ~one pass of vector work (the mechanism
            # behind the R-interleave, applied to the pass axis). The
            # trials=N search (reference: src/aad_encoder.c:470-562) runs
            # in 2N slots instead of 2N+2 serial passes by pairing:
            #   slot0          baseline measure   X  ||  warm_1 (prev)  Y
            #   slot(M_1)      trial-1 measure    X  ||  emit[baseline] Y
            #   slot(W_i+1)    warm_i+1 (prev)    X  ||  emit[cand_i]   Y
            #   slot(M_N)      trial-N measure    X  ||  emit[cand_N]   Y
            # Speculative emits: emit[baseline] stores unconditionally,
            # emit[cand_i] (i < N) blends in place with the adopt flag
            # better_i (known by then), emit[cand_N] lands in VMEM scratch
            # and a cheap final loop blends it with better_N. Selection
            # semantics are the reference's exact fold: last strict
            # improvement wins (see sse_better).
            half_rows = SUBLANES // 2
            rowmask = lax.broadcasted_iota(jnp.int32, SHAPE, 0) < half_rows

            def stack2(a, b):
                return jnp.concatenate(
                    [a[:half_rows], b[:half_rows]], axis=0
                )

            def upper(x):
                return jnp.concatenate(
                    [x[half_rows:], x[half_rows:]], axis=0
                )

            def stack2_st(a, b):
                return tuple(stack2(x, y) for x, y in zip(a, b))

            def upper_st(x):
                return tuple(upper(v) for v in x)

            def sel_st(pred, a, b):
                return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))

            def round_seed(cand):
                """seed + weight rounding: an emit pass's entry state
                (the block-header snapshot, reference:
                src/aad_encoder.c:624-646)."""
                s = seed(cand, cur_h_ref)
                maxabs = jnp.zeros(SHAPE, jnp.int32)
                for k in range(4, 8):
                    w_ = s[k]
                    maxabs = jnp.maximum(
                        maxabs, jnp.where(w_ >= 0, w_, -w_)
                    )
                shf = jnp.zeros(SHAPE, jnp.int32)
                for _ in range(16):
                    over = maxabs > jnp.int32(INT16_MAX)
                    maxabs = jnp.where(over, maxabs >> 1, maxabs)
                    shf = shf + over.astype(jnp.int32)
                msk = ~((jnp.int32(1) << shf) - 1)
                return (
                    (*s[:4], s[4] & msk, s[5] & msk, s[6] & msk,
                     s[7] & msk, s[8]),
                    shf,
                )

            n_groups = n_words // 4

            def dual_groups(sti, refX, refY, liveX, liveY, want_sse, sink):
                """One stacked pass over the block's 4-word groups.

                rows 0-3 of ``sti`` = chain X, rows 4-7 = chain Y. The
                union body always runs masked (the single-stream tile has
                dead lanes, so the per-tile unmasked bound is 0 anyway).
                ``sink(g, word)`` consumes chain Y's packed code word,
                moved down to rows 0-3; packing shifts stay static (group
                iteration, see enc_group_u).
                """

                def group(g, carry):
                    if want_sse:
                        st_, sh, sl = carry[:9], carry[9], carry[10]
                    else:
                        st_ = carry
                    cw = None
                    for j in range(4):
                        wX = refX[0, 4 * g + j, 0]
                        wY = wX if refY is refX else refY[0, 4 * g + j, 0]
                        w = stack2(wX, wY)
                        lo = (w << 16) >> 16
                        hi = w >> 16
                        for k, sample in ((0, lo), (1, hi)):
                            t = g * 8 + 2 * j + k
                            code, qdiff, st2 = sample_step(sample, st_)
                            # bool-select via logical ops: a where() on two
                            # i1 vectors lowers to an i8->i1 trunci Mosaic
                            # rejects ("Unsupported target bitwidth")
                            live = (rowmask & liveX(t)) | (
                                ~rowmask & liveY(t)
                            )
                            st_ = tuple(
                                jnp.where(live, a2, b2)
                                for a2, b2 in zip(st2, st_)
                            )
                            if want_sse:
                                # wrapped int32 accumulator, u32-limb carry
                                # (see measure above); Y rows masked out
                                sq = jnp.where(
                                    live & rowmask, qdiff * qdiff, 0
                                )
                                nsl = sl + sq
                                usl = sl ^ jnp.int32(-2147483648)
                                unsl = nsl ^ jnp.int32(-2147483648)
                                sh = sh + (unsl < usl).astype(jnp.int32) + (
                                    sq >> 31
                                )
                                sl = nsl
                            if sink is not None:
                                piece = code << (4 * (2 * j + k))
                                cw = piece if cw is None else cw | piece
                    if sink is not None:
                        sink(g, upper(cw))
                    return (*st_, sh, sl) if want_sse else st_

                zero = jnp.zeros(SHAPE, jnp.int32)
                init = (*sti, zero, zero) if want_sse else sti
                out = lax.fori_loop(0, n_groups, group, init)
                if want_sse:
                    return out[:9], (out[9], out[10])
                return out, None

            liveM = lambda t: t < valid - FILTER_ORDER
            liveP = lambda t: t < n_codes  # prev warm and emit share it
            skip = valid < FILTER_ORDER
            has_prev = (b + bb_ref[0]) >= 1

            def sink_store(g, cwu):
                codes_ref[0, g, 0] = cwu

            def sink_blend(flag):
                def s(g, cwu):
                    codes_ref[0, g, 0] = jnp.where(
                        flag, cwu, codes_ref[0, g, 0]
                    )

                return s

            def sink_scratch(g, cwu):
                spec_ref[g] = cwu

            # slot 0: baseline measure (X, cur) || warm_1 (Y, prev)
            def slot0(prev_ref):
                sti = stack2_st(
                    seed(st, cur_h_ref), seed(st, prev_h_ref)
                )
                return dual_groups(
                    sti, cur_w_ref, prev_ref, liveM, liveP, True, None
                )

            end0, min_sse = lax.cond(
                b == 0,
                lambda: slot0(prev0_w_ref),
                lambda: slot0(prev_w_ref),
            )
            walker = sel_st(has_prev, upper_st(end0), st)
            min_h, min_l = min_sse

            ent_prev, shift_prev = round_seed(st)  # F_0 entry (baseline)
            hdr_state, hdr_shift = ent_prev, shift_prev
            carry_sel = None

            for i in range(1, num_trials + 1):
                cand = walker
                ent_i, shift_i = round_seed(cand)
                last = i == num_trials
                # slot (M_i || F_{i-1})  [F_N rides here too, via scratch]
                mseed = seed(walker, cur_h_ref, valid >= FILTER_ORDER)
                if i == 1:
                    sinkY, entY = sink_store, ent_prev
                elif last:
                    sinkY, entY = sink_scratch, ent_i
                else:
                    sinkY, entY = None, None  # M_i rides alone mid-search
                if last and i > 1:
                    # F_{N}: emit from cand_N into scratch alongside M_N
                    pass
                sti = stack2_st(mseed, entY if entY is not None else mseed)
                endi, sse = dual_groups(
                    sti, cur_w_ref, cur_w_ref, liveM, liveP, True,
                    sinkY,
                )
                walker = sel_st(skip, cand, tuple(endi))
                sse = (
                    jnp.where(skip, 0, sse[0]),
                    jnp.where(skip, 0, sse[1]),
                )
                better = sse_better(sse, (min_h, min_l))
                min_h = jnp.where(better, sse[0], min_h)
                min_l = jnp.where(better, sse[1], min_l)
                hdr_state = sel_st(better, ent_i, hdr_state)
                hdr_shift = jnp.where(better, shift_i, hdr_shift)
                if i == 1:
                    carry_sel = upper_st(endi)  # E_0
                if last:
                    if i == 1:
                        # F_1 runs standalone, blending with better_1
                        endf, _ = dual_groups(
                            stack2_st(ent_i, ent_i), cur_w_ref, cur_w_ref,
                            liveP, liveP, False, sink_blend(better),
                        )
                        carry_sel = sel_st(better, upper_st(endf), carry_sel)
                    else:
                        # F_N went to scratch in this slot; blend it in
                        carry_sel = sel_st(better, upper_st(endi), carry_sel)
                        better_last = better

                        def blend(g, _):
                            codes_ref[0, g, 0] = jnp.where(
                                better_last, spec_ref[g], codes_ref[0, g, 0]
                            )
                            return 0

                        lax.fori_loop(0, n_groups, blend, 0)
                else:
                    # slot (W_{i+1} || F_i): warm on prev + blend emit
                    def wslot(prev_ref, _w=walker, _e=ent_i, _f=better):
                        sti2 = stack2_st(seed(_w, prev_h_ref), _e)
                        return dual_groups(
                            sti2, prev_ref, cur_w_ref, liveP, liveP,
                            False, sink_blend(_f),
                        )

                    endw, _ = lax.cond(
                        b == 0,
                        lambda: wslot(prev0_w_ref),
                        lambda: wslot(prev_w_ref),
                    )
                    walker = sel_st(has_prev, tuple(endw), walker)
                    carry_sel = sel_st(better, upper_st(endw), carry_sel)

            for k in range(4):
                hdr_ref[0, 0, k] = hdr_state[k]
                hdr_ref[0, 0, 4 + k] = hdr_state[4 + k]
            hdr_ref[0, 0, 8] = hdr_state[8]
            hdr_ref[0, 0, 9] = hdr_shift
            for k in range(9):
                state[k] = carry_sel[k]
            return

        if num_trials > 0 and not warm_on_prev:
            # Block-independent mode: every block is a stream head, so the
            # previous-block warm-up is statically dead — and trial 1's
            # measure is the *baseline* measure (identical seed + input),
            # so its end state is reused. trials=N costs N measure passes
            # here instead of the sequential path's 3N.
            skip = valid < FILTER_ORDER
            baseline = seed(st, cur_h_ref)
            measured, min_sse = measure(baseline, cur_w_ref, b, live_cur, wf)
            walker = tuple(jnp.where(skip, a, m) for a, m in zip(st, measured))
            best = st
            for _ in range(num_trials - 1):
                candidate = walker
                walker = seed(walker, cur_h_ref, valid >= FILTER_ORDER)
                walker, sse = measure(walker, cur_w_ref, b, live_cur, wf)
                walker = tuple(
                    jnp.where(skip, c, w) for c, w in zip(candidate, walker)
                )
                sse = (jnp.where(skip, 0, sse[0]), jnp.where(skip, 0, sse[1]))
                better = sse_better(sse, min_sse)
                best = tuple(
                    jnp.where(better, c, bst) for c, bst in zip(candidate, best)
                )
                min_sse = (
                    jnp.where(better, sse[0], min_sse[0]),
                    jnp.where(better, sse[1], min_sse[1]),
                )
            st = best
        elif num_trials > 0:
            bb = bb_ref[0]
            has_prev = (b + bb) >= 1

            baseline = seed(st, cur_h_ref)
            _, min_sse = measure(baseline, cur_w_ref, b, live_cur, wf)
            best = st
            walker = st
            for _ in range(num_trials):
                # stream heads (b + blocks_before == 0) have no previous
                # block: the reference skips the warm-up measure entirely
                # (src/aad_encoder.c:536-544 guard), so a scalar cond
                # skips both the seed and the whole pass here
                def prev_warm(w):
                    w = seed(w, prev_h_ref)
                    w, _ = lax.cond(
                        b == 0,
                        lambda s: measure(s, prev0_w_ref, 0, live_prev,
                                          pw_full),
                        lambda s: measure(s, prev_w_ref, b - 1, live_prev,
                                          pw_full),
                        w,
                    )
                    return w

                walker = lax.cond(has_prev, prev_warm, lambda w: w, walker)
                candidate = walker
                walker = seed(walker, cur_h_ref, valid >= FILTER_ORDER)
                walker, sse = measure(walker, cur_w_ref, b, live_cur, wf)
                # valid < 4: the reference's early return — state stays at
                # the candidate, error is zero (never better than baseline).
                skip = valid < FILTER_ORDER
                walker = tuple(jnp.where(skip, c, w) for c, w in zip(candidate, walker))
                sse = (jnp.where(skip, 0, sse[0]), jnp.where(skip, 0, sse[1]))
                better = sse_better(sse, min_sse)
                best = tuple(jnp.where(better, c, bst) for c, bst in zip(candidate, best))
                min_sse = (
                    jnp.where(better, sse[0], min_sse[0]),
                    jnp.where(better, sse[1], min_sse[1]),
                )
            st = best

        # ---- block header: seed, round weights, emit state snapshot -----
        st = seed(st, cur_h_ref)
        maxabs = jnp.zeros(SHAPE, jnp.int32)
        for k in range(4, 8):
            w_ = st[k]
            a = jnp.where(w_ >= 0, w_, -w_)
            maxabs = jnp.maximum(maxabs, a)
        shift = jnp.zeros(SHAPE, jnp.int32)
        for _ in range(16):
            over = maxabs > jnp.int32(INT16_MAX)
            maxabs = jnp.where(over, maxabs >> 1, maxabs)
            shift = shift + over.astype(jnp.int32)
        mask = ~((jnp.int32(1) << shift) - 1)
        st = (*st[:4], st[4] & mask, st[5] & mask, st[6] & mask, st[7] & mask, st[8])

        for k in range(4):
            hdr_ref[0, 0, k] = st[k]          # history
            hdr_ref[0, 0, 4 + k] = st[4 + k]  # rounded weights
        hdr_ref[0, 0, 8] = st[8]              # step index
        hdr_ref[0, 0, 9] = shift

        # ---- data section: encode whole padded block, emit code words ---
        # 4 input sample-pair words = 8 codes = one packed code word. The
        # group iterator keeps the in-group position static, so every
        # ``code << shift`` is a constant shift and the flush store is
        # unconditional (a traced shift amount + per-word conditional flush
        # measured ~7x the cost of a measure pass).
        def enc_group_u(g, ws, carry):
            """All 8 codes of the group live (g < n_codes // 8, static)."""
            st = carry
            cw = None
            for j in range(4):
                lo = (ws[j] << 16) >> 16
                hi = ws[j] >> 16
                for k, sample in ((0, lo), (1, hi)):
                    code, _q, st = sample_step(sample, st)
                    piece = code << (4 * (2 * j + k))
                    cw = piece if cw is None else cw | piece
            codes_ref[0, g, 0] = cw
            return st

        def enc_group_m(g, ws, carry):
            st = carry
            cw = None
            for j in range(4):
                lo = (ws[j] << 16) >> 16
                hi = ws[j] >> 16
                for k, sample in ((0, lo), (1, hi)):
                    code, _q, st2 = sample_step(sample, st)
                    live = (g * 8 + 2 * j + k) < n_codes
                    st = tuple(
                        jnp.where(live, a, b_) for a, b_ in zip(st2, st)
                    )
                    piece = code << (4 * (2 * j + k))
                    cw = piece if cw is None else cw | piece
            codes_ref[0, g, 0] = cw
            return st

        st = stream_groups4(cur_w_ref, b, enc_group_u, enc_group_m,
                            n_codes // 8, st)
        if emit_state:
            for k in range(9):
                fstate_ref[0, 0, k] = st[k]
        for k in range(9):
            state[k] = st[k]

    return kernel


def encode_stream_fused(
    blocks: jax.Array,
    valid: jax.Array,
    bits_per_sample: int,
    num_trials: int,
    *,
    carry=None,
    blocks_before=0,
    packed_codes: bool = False,
    warm_on_prev: bool = True,
    need_carry: bool = True,
    emit_block_states: bool = False,
):
    """One-execution whole-stream encode. Same contract as
    ops.encode.encode_stream_blocks_carry (lane axes folded internally).

    Returns (headers, codes, carry') with the same pytree shapes. With
    ``packed_codes`` the codes stay in the kernel's packed-word format —
    (B, ..., W8) uint32, 8 LSB-first 4-bit code slots per word (slots past
    codes_per_block hold garbage from the zero-pad sample slots) — feeding
    ops.wire32.kernel_words_to_wire without the 8x nibble-unpack pass.

    ``warm_on_prev=False`` statically removes the trial search's
    previous-block passes (block-independent parallel mode — see
    ops.encode.encode_blocks_parallel). ``need_carry=False`` skips the
    final-chain-state reconstruction (a whole extra pass over the last
    block row); the carry slot is then ``None``. ``emit_block_states=True``
    replaces the carry slot with the per-(block, lane) final chain state —
    a CodecState with leaves shaped (B, *lanes[, 4]) — written directly by
    the kernel (no recompute pass); the warm parallel mode's state source.
    """
    from .encode import BlockHeaderFields
    from .transitions import CodecState

    corrections = stepsize_corrections()
    B, *lane_axes, nspb = blocks.shape
    L = int(np.prod(lane_axes, dtype=np.int64)) if lane_axes else 1
    T = nspb - FILTER_ORDER

    flat = blocks.reshape(B, L, nspb).astype(jnp.int32)
    if carry is None:
        init_state = CodecState.zeros((L,))
        prev0 = jnp.zeros_like(flat[0])
    else:
        init_state, prev0 = carry
        init_state = CodecState(
            history=init_state.history.reshape(L, 4),
            weight=init_state.weight.reshape(L, 4),
            step_index=init_state.step_index.reshape(L),
        )
        prev0 = prev0.reshape(L, nspb).astype(jnp.int32)

    va = jnp.asarray(valid, jnp.int32)
    while va.ndim < 1 + len(lane_axes):
        va = va[..., None]
    va = jnp.broadcast_to(va, (B, *lane_axes)).reshape(B, L)

    headers, codes, state9 = _fused_impl(
        flat, prev0, va,
        init_state.step_index, init_state.history, init_state.weight,
        jnp.asarray(blocks_before, jnp.int32),
        bits_per_sample=bits_per_sample,
        num_trials=num_trials,
        corrections=corrections,
        packed_codes=packed_codes,
        warm_on_prev=warm_on_prev,
        need_carry=need_carry and not emit_block_states,
        emit_state=emit_block_states,
    )

    def unflat(x):
        return x.reshape(B, *lane_axes, *x.shape[2:])

    def hfield(k):  # free leading-axis slice of the field-major header out
        return headers[k].reshape(B, *lane_axes)

    hdr = BlockHeaderFields(
        step_index=hfield(8),
        shift=hfield(9),
        weight=jnp.stack([hfield(4 + i) for i in range(4)], axis=-1),
        history=jnp.stack([hfield(i) for i in range(4)], axis=-1),
    )
    if emit_block_states:

        def sfield(k):
            return state9[k].reshape(B, *lane_axes)

        states = CodecState(
            history=jnp.stack([sfield(i) for i in range(4)], axis=-1),
            weight=jnp.stack([sfield(4 + i) for i in range(4)], axis=-1),
            step_index=sfield(8),
        )
        return hdr, unflat(codes), states
    if not need_carry:
        return hdr, unflat(codes), None
    out_state = CodecState(
        history=state9[:, 0:4].reshape(*lane_axes, 4),
        weight=state9[:, 4:8].reshape(*lane_axes, 4),
        step_index=state9[:, 8].reshape(tuple(lane_axes)),
    )
    return hdr, unflat(codes), (out_state, blocks[-1])


def _use_pass_stack(
    num_trials: int, warm_on_prev: bool, emit_state: bool, stream: bool,
    r: int, n_tiles: int, num_lanes: int,
) -> bool:
    """Gate for the pass-stacked single-tile trial search (DESIGN §3).

    True when the live lanes fit sublane rows 0-3 of ONE (8, 128) tile —
    the latency-bound single-stream regime — and the trial search warms
    on the previous block, so independent passes can stack onto the dead
    upper rows: the trials=N search runs in ~2N slot-passes instead of
    2N+2 serial passes. AAD_TPU_ENCODE_STACK=0 disables (probing; read
    at trace time — a jitted caller won't see a mid-process toggle).
    """
    return (
        num_trials > 0
        and warm_on_prev
        and not emit_state
        and not stream
        and r == 1
        and n_tiles == 1
        and num_lanes <= SUBLANES // 2 * LANES
        and os.environ.get("AAD_TPU_ENCODE_STACK") != "0"
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits_per_sample", "num_trials", "corrections", "packed_codes",
        "warm_on_prev", "need_carry", "emit_state",
    ),
)
def _fused_impl(
    flat, prev0, valid, step_index, history, weight, blocks_before,
    *, bits_per_sample, num_trials, corrections, packed_codes=False,
    warm_on_prev=True, need_carry=True, emit_state=False,
):
    B, L, nspb = flat.shape
    T = nspb - FILTER_ORDER
    R = _pick_interleave(L)
    RS = R * SUBLANES
    W2 = -(-T // 8) * 4          # packed sample words per block (pad to 8 samples)
    stream = R * nspb > MAX_NSPB_RESIDENT
    chunk = None
    if stream:
        # chunked-DMA variant: words stay in HBM; prefer a chunk that
        # divides the natural word count so no pad pass is needed
        W2, chunk = _pick_stream_chunk(W2)
    W8 = W2 // 4                 # code words per block

    Lp = -(-L // (R * TILE)) * (R * TILE)
    n_tiles = Lp // (R * TILE)   # grid groups of R interleaved lane tiles

    pass_stack = _use_pass_stack(
        num_trials, warm_on_prev, emit_state, stream, R, n_tiles, L
    )

    def pack_lane_words(x, off):  # (b, L, nspb) -> (b, W2, n_tiles, R*8, 128)
        b_ = x.shape[0]
        # Strided loads straight from the full sample array (no
        # materialised ``x[..., off:]`` slice — that intermediate plus its
        # relayout measured ~0.8 ms of a ~7 ms batch encode), packing
        # first and padding the 8x-smaller word array after.
        Te = T & ~1
        lo = x[..., off : off + Te : 2] & jnp.int32(0xFFFF)
        hi = x[..., off + 1 : off + Te : 2] << 16
        w = hi | lo  # (b, L, Te//2)
        if T & 1:
            w = jnp.concatenate(
                [w, x[..., off + T - 1 : off + T] & jnp.int32(0xFFFF)],
                axis=-1,
            )
        # pad the word tail by concatenating a zero block rather than
        # jnp.pad: the pad lowered to a separate full-array copy pass
        # (measured 0.95 -> 0.83 ms for the whole relayout at 32.4 M
        # samples, benchmarks/probe_fused_relayout.py)
        if w.shape[-1] < W2:
            z = jnp.zeros((b_, L, W2 - w.shape[-1]), jnp.int32)
            w = jnp.concatenate([w, z], axis=-1)
        if Lp > L:
            w = jnp.pad(w, ((0, 0), (0, Lp - L), (0, 0)))
        return w.reshape(b_, n_tiles, RS, LANES, W2).transpose(0, 4, 1, 2, 3)

    def lane_tiles(x, k):  # (b, L, k) -> (b, n_tiles, k, R*8, 128)
        b_ = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
        return xp.reshape(b_, n_tiles, RS, LANES, k).transpose(0, 1, 4, 2, 3)

    needs_prev = num_trials > 0 and warm_on_prev
    cur_w = pack_lane_words(flat, FILTER_ORDER)
    cur_h = lane_tiles(flat[..., :FILTER_ORDER], FILTER_ORDER)
    va_t = lane_tiles(valid[..., None], 1)
    # per-(block, tile) unmasked word bound for the measure passes: below
    # it every lane of the tile is live (pad lanes carry valid=0, so
    # boundary tiles fall back to the fully-masked path)
    va_p = jnp.pad(valid, ((0, 0), (0, Lp - L)))
    vmin = jnp.min(va_p.reshape(B, n_tiles, RS * LANES), axis=-1)
    wf_arr = jnp.clip((vmin - FILTER_ORDER) // 2, 0, W2).astype(jnp.int32)

    ii0 = jnp.pad(step_index.astype(jnp.int32), (0, Lp - L))
    ii_t = ii0.reshape(n_tiles, RS, LANES)[:, None]
    h0 = jnp.pad(history.astype(jnp.int32), ((0, Lp - L), (0, 0)))
    h_t = h0.reshape(n_tiles, RS, LANES, 4).transpose(0, 3, 1, 2)
    w0 = jnp.pad(weight.astype(jnp.int32), ((0, Lp - L), (0, 0)))
    w_t = w0.reshape(n_tiles, RS, LANES, 4).transpose(0, 3, 1, 2)

    lane5 = lambda i, b: (b, i, 0, 0, 0)
    grid = (n_tiles, B)
    if stream:
        word_spec = [pl.BlockSpec(memory_space=pl.ANY)]
        stream_scratch = [
            pltpu.VMEM((2, chunk, RS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        word_spec = [
            pl.BlockSpec((1, W2, 1, RS, LANES),
                         lambda i, b: (b, 0, i, 0, 0), memory_space=pltpu.VMEM),
        ]
        stream_scratch = []
    lane_tile_spec = lambda k: pl.BlockSpec(
        (1, 1, k, RS, LANES), lane5, memory_space=pltpu.VMEM
    )
    if needs_prev:
        prev0_w = pack_lane_words(prev0[None], FILTER_ORDER)
        prev_h0 = lane_tiles(prev0[None, ..., :FILTER_ORDER], FILTER_ORDER)[0]
        prev_h = jnp.concatenate([prev_h0[None], cur_h[:-1]], axis=0)
        if stream:
            prev_word_specs = [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
        else:
            prev_word_specs = [
                # the same array again, shifted one block back: the trial
                # warm-up's input (clamped at 0; block 0 uses prev0 instead)
                pl.BlockSpec((1, W2, 1, RS, LANES),
                             lambda i, b: (jnp.maximum(b - 1, 0), 0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W2, 1, RS, LANES),
                             lambda i, b: (0, 0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        inputs = (cur_w, cur_w, prev0_w, cur_h, prev_h, va_t,
                  ii_t, h_t, w_t, jnp.reshape(blocks_before, (1,)), wf_arr)
        in_specs = word_spec + prev_word_specs + [
            lane_tile_spec(FILTER_ORDER),
            lane_tile_spec(FILTER_ORDER),
            lane_tile_spec(1),
            pl.BlockSpec((1, 1, RS, LANES),
                         lambda i, b: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, RS, LANES),
                         lambda i, b: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, RS, LANES),
                         lambda i, b: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    else:
        inputs = (cur_w, cur_h, va_t, ii_t, h_t, w_t, wf_arr)
        in_specs = word_spec + [
            lane_tile_spec(FILTER_ORDER),
            lane_tile_spec(1),
            pl.BlockSpec((1, 1, RS, LANES),
                         lambda i, b: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, RS, LANES),
                         lambda i, b: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, RS, LANES),
                         lambda i, b: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    out_specs = [
        pl.BlockSpec((1, W8, 1, RS, LANES),
                     lambda i, b: (b, 0, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 10, RS, LANES), lane5,
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, W8, n_tiles, RS, LANES), jnp.int32),
        jax.ShapeDtypeStruct((B, n_tiles, 10, RS, LANES), jnp.int32),
    ]
    if emit_state:
        out_specs.append(
            pl.BlockSpec((1, 1, 9, RS, LANES), lane5,
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((B, n_tiles, 9, RS, LANES), jnp.int32)
        )
    stack_scratch = (
        [pltpu.VMEM((W2 // 4, RS, LANES), jnp.int32)] if pass_stack else []
    )
    outs = pl.pallas_call(
        _make_kernel(bits_per_sample, corrections, num_trials, W2, T,
                     stream_chunk=chunk, r=R,
                     warm_on_prev=warm_on_prev, emit_state=emit_state,
                     pass_stack=pass_stack),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((9, RS, LANES), jnp.int32)]
        + stack_scratch
        + stream_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(*inputs)
    codes_t, hdr_t = outs[0], outs[1]

    # code words -> lane-major (B, L, W8); unpack to int32 codes only when
    # asked — the wire pipeline consumes the packed words directly.
    words = codes_t.transpose(0, 2, 3, 4, 1).reshape(B, Lp, W8)[:, :L]
    if packed_codes:
        codes = lax.bitcast_convert_type(words, jnp.uint32)
    else:
        nib = [(words >> (4 * k)) & 0xF for k in range(8)]
        codes = jnp.stack(nib, axis=-1).reshape(B, L, W8 * 8)[..., :T]

    # header fields -> (10, B, L), FIELD-major: every downstream per-field
    # extraction is then a free leading-axis slice. The previous (B, L, 10)
    # form put fields on the minor axis, and the resulting strided column
    # extracts lowered to a pathological scalar-ish fusion — profiled at
    # 4.15 ms of a 9.13 ms parallel encode call (45%).
    hdrs = hdr_t.transpose(2, 0, 1, 3, 4).reshape(10, B, Lp)[:, :, :L]

    if emit_state:
        # per-(block, lane) final chain state straight from the kernel —
        # no recompute pass (the warm parallel mode's state source)
        fstates = outs[2].transpose(2, 0, 1, 3, 4).reshape(9, B, Lp)[:, :, :L]
        return hdrs, codes, fstates
    if not need_carry:
        return hdrs, codes, None

    # final chain state: history/weights/idx of the LAST block's carry live
    # in the kernel scratch — reconstruct from the last header + codes is
    # wrong; instead emit it via the header of a virtual extra block. For
    # simplicity, recompute: the carry state equals the state after encoding
    # the last block, which the caller only needs for streaming; derive it
    # with one per-pass kernel call on the last block.
    from .pallas_encode import encode_scan_tiles, to_timemajor

    last_hdr = hdrs[:, -1]  # (10, L)
    seeded_h = jnp.moveaxis(last_hdr[0:4], 0, -1)  # (L, 4)
    tm_last = to_timemajor(flat[-1, :, FILTER_ORDER:])
    _, (idx_f, h_f, w_f), _ = encode_scan_tiles(
        tm_last,
        last_hdr[8],
        seeded_h,
        jnp.moveaxis(last_hdr[4:8], 0, -1),
        jnp.full((L,), nspb, jnp.int32),
        bits_per_sample=bits_per_sample,
        emit_codes=False,
    )
    state9 = jnp.concatenate([h_f, w_f, idx_f[:, None]], axis=-1)
    return hdrs, codes, state9
