#!/usr/bin/env python
"""TPU probes for the round-3 decode-layout work (VERDICT item 1).

Isolates the two glue costs around the fused decode kernel at headline
scale and tests whether they can be fused into the kernel:

  A  kernel only, natural (time-major) output, no detile  — upper bound
  B  kernel + XLA detile transpose (the shipped path)
  C  kernel writing the final lane-major layout directly through the out
     BlockSpec (minor-axis word writes)
  D  XLA-side compact (B, G, k) -> (k, G, B) transpose alone (what an
     in-kernel swizzle fusion would leave of wire_to_kernel_words)
  E  full wire_to_kernel_words (the shipped permutation) for comparison

Usage: python benchmarks/probe_decode_layout.py [iters]
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


def main() -> None:
    from aad_tpu.ops.pallas_decode import (
        LANES,
        SUBLANES,
        TILE,
        _decode_word_step,
        _make_kernel,
        _pack_pair,
        stepsize_corrections,
    )
    from aad_tpu.ops.pallas_common import interpret_mode

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    corrections = stepsize_corrections()
    bps = 4

    # headline-ish scale: 64 lane tiles x 124 words = 65536 lanes x 992
    # samples = 65 M samples
    n_tiles = 64
    W = 128
    w_chunk = 32  # w_chunk*4 = 128: Mosaic needs the out block's minor dim
                  # divisible by 128 for the transposed-write variant
    L = n_tiles * TILE
    total = L * W * 8

    rng = np.random.default_rng(0)
    words = jnp.asarray(
        rng.integers(0, 2**32, (W, n_tiles, SUBLANES, LANES), dtype=np.uint32)
    )
    ii = jnp.asarray(
        rng.integers(0, 4081, (n_tiles, 1, SUBLANES, LANES), dtype=np.int32)
    )
    h = jnp.asarray(
        rng.integers(-30000, 30000, (n_tiles, 4, SUBLANES, LANES), dtype=np.int32)
    )
    wt = jnp.asarray(
        rng.integers(-20000, 20000, (n_tiles, 4, SUBLANES, LANES), dtype=np.int32)
    )

    lane_block = lambda i, j: (i, 0, 0, 0)
    in_specs = [
        pl.BlockSpec((w_chunk, 1, SUBLANES, LANES), lambda i, j: (j, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, SUBLANES, LANES), lane_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, SUBLANES, LANES), lane_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, SUBLANES, LANES), lane_block, memory_space=pltpu.VMEM),
    ]
    grid = (n_tiles, W // w_chunk)

    def launch_natural():
        """Kernel with the shipped natural output layout."""
        return pl.pallas_call(
            _make_kernel(bps, corrections, with_head=False, w_chunk=w_chunk),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (w_chunk * 4, 1, SUBLANES, LANES), lambda i, j: (j, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (W * 4, n_tiles, SUBLANES, LANES), jnp.int32
            ),
            scratch_shapes=[pltpu.VMEM((9, SUBLANES, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret_mode(),
        )(words, ii, h, wt)

    def kernel_transposed(words_ref, idx_ref, h_ref, w_ref, out_ref, state):
        """Variant C: out block (1, 8, 128, w_chunk*4), minor-axis writes."""
        chunk_idx = pl.program_id(1)

        @pl.when(chunk_idx == 0)
        def _init():
            for k in range(4):
                state[k] = h_ref[0, k]
                state[4 + k] = w_ref[0, k]
            state[8] = idx_ref[0, 0]

        def word_step(wi, carry):
            word = words_ref[wi, 0]
            outs, carry = _decode_word_step(
                word, carry, bits_per_sample=bps, corrections=corrections
            )
            for j in range(4):
                out_ref[0, :, :, wi * 4 + j] = _pack_pair(
                    outs[2 * j], outs[2 * j + 1]
                )
            return carry

        carry = tuple(state[k] for k in range(9))
        carry = lax.fori_loop(0, w_chunk, word_step, carry)
        for k in range(9):
            state[k] = carry[k]

    def launch_transposed():
        return pl.pallas_call(
            kernel_transposed,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, SUBLANES, LANES, w_chunk * 4), lambda i, j: (i, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles, SUBLANES, LANES, W * 4), jnp.int32
            ),
            scratch_shapes=[pltpu.VMEM((9, SUBLANES, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret_mode(),
        )(words, ii, h, wt)

    def timed(label, fn, n=iters):
        @functools.partial(jax.jit, static_argnums=(1,))
        def run(tok, n):
            def body(_, carry):
                tok, out = carry
                out = fn()
                return (out.reshape(-1)[0].astype(jnp.int32) + tok, out)

            out0 = fn()
            return lax.fori_loop(
                0, n, body, (out0.reshape(-1)[0].astype(jnp.int32), out0)
            )

        try:
            tok, out = run(jnp.int32(0), n)
            float(tok)
            t0 = time.time()
            tok, out = run(tok, n)
            float(tok)
            dt = (time.time() - t0) / (n + 1)
            print(json.dumps({
                "probe": label,
                "ms": round(dt * 1e3, 3),
                "gsamples_per_sec": round(total / dt / 1e9, 2),
            }))
            return out
        except Exception as e:  # Mosaic may reject a layout
            print(json.dumps({"probe": label, "error": str(e)[:300]}))
            return None

    print(json.dumps({"config": {
        "lanes": L, "words": W, "samples": total, "iters": iters,
        "platform": jax.devices()[0].platform,
    }}))

    a = timed("A_kernel_natural_out", launch_natural)
    if a is not None:
        # the shipped tail: transpose + lane-major flat reshape. The flat
        # 1-D result pins the physical layout, so the transpose cannot be
        # folded away by layout assignment (a bare .transpose() could —
        # measured indistinguishable from A, i.e. a probe artifact).
        timed("B_kernel_plus_xla_detile_flat",
              lambda: launch_natural().transpose(1, 2, 3, 0).reshape(-1))
    # C (minor-axis in-kernel stores) crashed the Mosaic compile helper and
    # would pay the same relayout cost inside the VPU anyway; replaced by
    # B2: emit tile-major from the kernel so the XLA transpose's stride
    # pattern is local to one 2 MB lane tile instead of spanning the array.
    def kernel_tilemajor(words_ref, idx_ref, h_ref, w_ref, out_ref, state):
        chunk_idx = pl.program_id(1)

        @pl.when(chunk_idx == 0)
        def _init():
            for k in range(4):
                state[k] = h_ref[0, k]
                state[4 + k] = w_ref[0, k]
            state[8] = idx_ref[0, 0]

        def word_step(wi, carry):
            word = words_ref[wi, 0]
            outs, carry = _decode_word_step(
                word, carry, bits_per_sample=bps, corrections=corrections
            )
            for j in range(4):
                out_ref[0, wi * 4 + j] = _pack_pair(outs[2 * j], outs[2 * j + 1])
            return carry

        carry = tuple(state[k] for k in range(9))
        carry = lax.fori_loop(0, w_chunk, word_step, carry)
        for k in range(9):
            state[k] = carry[k]

    def launch_tilemajor():
        return pl.pallas_call(
            kernel_tilemajor,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, w_chunk * 4, SUBLANES, LANES), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles, W * 4, SUBLANES, LANES), jnp.int32
            ),
            scratch_shapes=[pltpu.VMEM((9, SUBLANES, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret_mode(),
        )(words, ii, h, wt)

    b2 = timed("B2_tilemajor_out_plus_local_transpose_flat",
               lambda: launch_tilemajor().transpose(0, 2, 3, 1).reshape(-1))
    if a is not None and b2 is not None:
        want = np.asarray(launch_natural()).transpose(1, 2, 3, 0).reshape(-1)
        got = np.asarray(launch_tilemajor()).transpose(0, 2, 3, 1).reshape(-1)
        np.testing.assert_array_equal(got, want)
        print(json.dumps({"probe": "B2_correct", "ok": True}))

    # B3: same permutation expressed as one clean 2-D transpose
    timed("B3_2d_transpose_flat",
          lambda: launch_natural().reshape(W * 4, -1).T.reshape(-1))

    # K probes: kernel op-share diagnostics (NOT bit-exact — they replace a
    # stage with a constant to expose its cycle share)
    import aad_tpu.ops.pallas_decode as PD

    def probe_kernel(mode):
        def kernel(words_ref, idx_ref, h_ref, w_ref, out_ref, state):
            chunk_idx = pl.program_id(1)

            @pl.when(chunk_idx == 0)
            def _init():
                for k in range(4):
                    state[k] = h_ref[0, k]
                    state[4 + k] = w_ref[0, k]
                state[8] = idx_ref[0, 0]

            half = jnp.int32(1 << 14)
            lo16 = jnp.int32(-32768)
            hi16 = jnp.int32(32767)

            def word_step(wi, carry):
                h0, h1, h2, h3, w0, w1, w2, w3, idx = carry
                word = words_ref[wi, 0]
                outs = []
                for k in range(8):
                    code = (word >> (4 * k)) & 0xF
                    mag = code & 0x7
                    if mode == "no_stepsize":
                        stepsize = jnp.int32(1024) + idx  # cheap stand-in
                    else:
                        slot = (idx + 8) >> 4
                        stepsize = PD._stepsize_f32(slot).astype(jnp.int32)
                        for ss, d in corrections:
                            stepsize = stepsize + jnp.where(
                                slot == ss, jnp.int32(d), jnp.int32(0))
                    qmag = (stepsize * ((mag << 1) + 1)) >> 3
                    qdiff = jnp.where((code & 8) != 0, -qmag, qmag)
                    if mode == "no_delta":
                        idx = jnp.minimum(jnp.int32(4080), idx + mag)
                    else:
                        idx = jnp.maximum(jnp.int32(0), jnp.minimum(
                            jnp.int32(4080),
                            idx + PD._delta_select(mag, bps)))
                    pred = (half + h0 * w0 + h1 * w1 + h2 * w2 + h3 * w3) >> 15
                    sm = jnp.maximum(lo16, jnp.minimum(hi16, qdiff + pred))
                    if mode != "no_weights":
                        w0 = w0 + ((qdiff * h0 + half) >> 18)
                        w1 = w1 + ((qdiff * h1 + half) >> 18)
                        w2 = w2 + ((qdiff * h2 + half) >> 18)
                        w3 = w3 + ((qdiff * h3 + half) >> 18)
                    h3, h2, h1, h0 = h2, h1, h0, sm
                    outs.append(sm)
                for j in range(4):
                    out_ref[wi * 4 + j, 0] = _pack_pair(
                        outs[2 * j], outs[2 * j + 1])
                return (h0, h1, h2, h3, w0, w1, w2, w3, idx)

            carry = tuple(state[k] for k in range(9))
            carry = lax.fori_loop(0, w_chunk, word_step, carry)
            for k in range(9):
                state[k] = carry[k]
        return kernel

    def launch_probe(mode):
        return pl.pallas_call(
            probe_kernel(mode),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (w_chunk * 4, 1, SUBLANES, LANES), lambda i, j: (j, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (W * 4, n_tiles, SUBLANES, LANES), jnp.int32
            ),
            scratch_shapes=[pltpu.VMEM((9, SUBLANES, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret_mode(),
        )(words, ii, h, wt)

    # R-interleave: fold R lane tiles into one (R*8, 128) working set so
    # the scheduler can interleave R independent dependent chains (the
    # encode kernel's trick; the K probes show decode is latency-bound too)
    def launch_interleaved(R):
        ntR = n_tiles // R
        words_r = words.reshape(W, ntR, R * SUBLANES, LANES)
        ii_r = ii.reshape(ntR, R, SUBLANES, LANES).reshape(ntR, 1, R * SUBLANES, LANES)
        h_r = h.reshape(ntR, R, 4, SUBLANES, LANES).transpose(0, 2, 1, 3, 4).reshape(ntR, 4, R * SUBLANES, LANES)
        wt_r = wt.reshape(ntR, R, 4, SUBLANES, LANES).transpose(0, 2, 1, 3, 4).reshape(ntR, 4, R * SUBLANES, LANES)
        lane_block_r = lambda i, j: (i, 0, 0, 0)
        out = pl.pallas_call(
            _make_kernel(bps, corrections, with_head=False, w_chunk=w_chunk),
            grid=(ntR, W // w_chunk),
            in_specs=[
                pl.BlockSpec((w_chunk, 1, R * SUBLANES, LANES),
                             lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, R * SUBLANES, LANES), lane_block_r,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, R * SUBLANES, LANES), lane_block_r,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, R * SUBLANES, LANES), lane_block_r,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (w_chunk * 4, 1, R * SUBLANES, LANES),
                lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (W * 4, ntR, R * SUBLANES, LANES), jnp.int32
            ),
            scratch_shapes=[pltpu.VMEM((9, R * SUBLANES, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret_mode(),
        )(words_r, ii_r, h_r, wt_r)
        return out

    for R in (2, 4, 8):
        rr = timed(f"R{R}_interleaved_kernel", lambda R=R: launch_interleaved(R))
        if rr is not None and a is not None:
            want = np.asarray(launch_natural())
            got = np.asarray(launch_interleaved(R)).reshape(
                W * 4, n_tiles, SUBLANES, LANES)
            ok = bool((want == got).all())
            print(json.dumps({"probe": f"R{R}_correct", "ok": ok}))

    timed("K_full_replica", lambda: launch_probe("full"))
    timed("K_no_stepsize_formula", lambda: launch_probe("no_stepsize"))
    timed("K_no_delta_select", lambda: launch_probe("no_delta"))
    timed("K_no_weight_update", lambda: launch_probe("no_weights"))

    # D/E: input-side permutation costs (bench geometry: bps=4 stereo, k=2)
    from aad_tpu.format.geometry import compute_block_geometry
    from aad_tpu.ops.wire32 import data_words_padded, wire_to_kernel_words, words_per_block

    geo = compute_block_geometry(1024, 2, 4)
    B = L // 2  # stereo lanes = 2*B
    wpb = words_per_block(geo)
    rows = jnp.asarray(
        rng.integers(0, 2**32, (B, wpb), dtype=np.uint32)
    )
    Wd = data_words_padded(geo)

    def xla_compact_transpose():
        dw = rows[:, 9 : 9 + Wd]  # stereo header = 36 B = 9 words, aligned
        d3 = dw.reshape(B, Wd // 2, 2)
        return jnp.transpose(d3, (2, 1, 0))

    timed("D_xla_compact_transpose_only", xla_compact_transpose)
    timed("E_full_wire_to_kernel_words",
          lambda: wire_to_kernel_words(rows, geo))


if __name__ == "__main__":
    main()
