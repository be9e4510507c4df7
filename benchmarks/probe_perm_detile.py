#!/usr/bin/env python
"""Probes for the two headline-scale decode glue costs (round 3).

A. wire permutation: the shipped path slices the data region out of the
   (B, 257) row words at minor-axis offset 9 (a misaligned strided pass)
   before the compact 3-D transpose. Compare against a pre-split aligned
   (B, 248) data array.
B. detile: the shipped tail is transpose -> reshape(Lp, W2) -> bitcast ->
   reshape(-1), which lowers to a transpose-copy plus a linear-retile pass.
   Try single-expression variants.

Usage: python benchmarks/probe_perm_detile.py [iters]
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


def main() -> None:
    import bench as BM
    from aad_tpu import FILE_HEADER_SIZE, decode_header
    from aad_tpu.codec.decoder import Decoder
    from aad_tpu.ops.wire32 import payload_to_words, wire_to_kernel_words

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    data, _ = BM.build_synthetic_stream(48000 * 600)
    header = decode_header(data)
    dec = Decoder.from_header(header)
    geo = dec.geometry
    nblocks = -(-header.num_samples // header.num_samples_per_block)
    nblocks = -(-nblocks // 512) * 512
    payload = np.frombuffer(data, dtype=np.uint8)[FILE_HEADER_SIZE:]
    words_np = payload_to_words(payload, geo, nblocks)
    total = header.num_samples * header.num_channels

    base = -(-geo.header_bytes // 4)
    data_np = np.ascontiguousarray(words_np[:, base:])

    def timed(label, arr_np, fn, n=iters):
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def run(w, tok, n):
            def body(_, carry):
                w, out, tok = carry
                w = w.at[0, 0].set((tok & 1).astype(w.dtype))
                out = fn(w)
                return (w, out, out.reshape(-1)[0].astype(jnp.int32))

            out0 = fn(w)
            return lax.fori_loop(
                0, n, body, (w, out0, out0.reshape(-1)[0].astype(jnp.int32))
            )

        try:
            w, out, tok = run(jnp.asarray(arr_np), jnp.int32(0), n)
            float(tok)
            t0 = time.time()
            w, out, tok = run(w, tok, n)
            float(tok)
            dt = (time.time() - t0) / (n + 1)
            print(json.dumps({
                "probe": label,
                "ms": round(dt * 1e3, 3),
                "gsamples_per_sec": round(total / dt / 1e9, 2),
            }))
            return out
        except Exception as e:
            print(json.dumps({"probe": label, "error": str(e)[:300]}))
            return None

    print(json.dumps({"config": {
        "blocks": nblocks, "wpb": words_np.shape[1], "base_words": base,
        "samples": total,
    }}))

    # --- A: permutation from full rows vs pre-split aligned data region
    timed("perm_from_rows", words_np, lambda w: wire_to_kernel_words(w, geo))

    import aad_tpu.ops.wire32 as w32

    def perm_aligned(dw):
        # replicate wire_to_kernel_words' body for bps=4 stereo on an
        # already-aligned (B, Wd) data array
        k = w32._deinterleave_factor(geo)
        d3 = dw.reshape(dw.shape[0], dw.shape[1] // k, k)
        dT = jnp.transpose(d3, (2, 1, 0)).astype(jnp.uint32)
        a, b = dT[0], dT[1]
        ff = jnp.uint32(0xFF)
        ch0 = (
            (a & ff) | (((a >> 16) & ff) << 8)
            | ((b & ff) << 16) | (((b >> 16) & ff) << 24)
        )
        ch1 = (
            ((a >> 8) & ff) | (((a >> 24) & ff) << 8)
            | (((b >> 8) & ff) << 16) | (((b >> 24) & ff) << 24)
        )
        return jnp.concatenate(
            [w32._nibble_swap(ch0), w32._nibble_swap(ch1)], axis=1
        )

    timed("perm_aligned_presplit", data_np, perm_aligned)

    # just the misaligned slice alone
    timed("slice_only", words_np, lambda w: w[:, base:])
    # just the 3-D transpose on aligned data
    timed(
        "transpose_only", data_np,
        lambda dw: jnp.transpose(
            dw.reshape(dw.shape[0], dw.shape[1] // 2, 2), (2, 1, 0)
        ),
    )

    # --- B: detile formulations on a kernel-output-shaped array
    ntR, RS, LANES, W4 = 19, 24, 128, 496
    out_np = np.random.default_rng(0).integers(
        0, 2**31, (W4, ntR, RS, LANES), dtype=np.int32
    )
    Lp = ntR * RS * LANES

    timed("detile_shipped", out_np, lambda o: lax.bitcast_convert_type(
        o.transpose(1, 2, 3, 0).reshape(Lp, W4), jnp.uint32
    ).reshape(-1))
    timed("detile_flat_direct", out_np,
          lambda o: o.transpose(1, 2, 3, 0).reshape(-1))
    timed("detile_2d_stop", out_np,
          lambda o: o.transpose(1, 2, 3, 0).reshape(Lp, W4))


if __name__ == "__main__":
    main()
