"""Stage attribution for the sequential batch encode pipeline.

Stages (cumulative, same geometry as bench.py measure_encode):
  kernel   — input pack + fused 6-pass kernel, packed code words out
  +wire    — plus kernel_words_to_wire (channel-interleave permutation)
  +headers — plus build_header_words
  full     — plus assemble_wire_words (the shipped pipeline)

Usage: python benchmarks/probe_batch_encode_stages.py [iters]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aad_tpu.codec.encoder import (
        EncodeConfig,
        _encode_device_wire,
        resolve_encode_engine,
    )
    from aad_tpu.ops.encode import encode_stream_words
    from aad_tpu.ops.wire32 import (
        assemble_wire_words,
        build_header_words,
        kernel_words_to_wire,
    )

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    engine = resolve_encode_engine("auto")
    cfg = EncodeConfig(num_channels=2, sampling_rate=48000)
    geo = cfg.geometry()
    nspb = geo.num_samples_per_block
    S, B = 4096, 4
    C = 2
    sig = (9000 * np.sin(np.arange(S * B * C * nspb) / 17)).astype(np.int32)
    blocks0 = jnp.asarray(sig.reshape(B, S * C, nspb))
    valid = jnp.full((B, S * C), nspb, dtype=jnp.int32)
    total = S * B * C * nspb

    def stage_kernel(bl):
        headers, kw, _ = encode_stream_words(
            bl, valid, geo.bits_per_sample, 2, engine=engine,
            need_carry=False,
        )
        return kw

    def stage_wire(bl):
        headers, kw, _ = encode_stream_words(
            bl, valid, geo.bits_per_sample, 2, engine=engine,
            need_carry=False,
        )
        return kernel_words_to_wire(kw.reshape(B, C, S, -1), geo,
                                    channel_axis=1)

    def stage_headers(bl):
        headers, kw, _ = encode_stream_words(
            bl, valid, geo.bits_per_sample, 2, engine=engine,
            need_carry=False,
        )
        dw = kernel_words_to_wire(kw.reshape(B, C, S, -1), geo,
                                  channel_axis=1)

        def unfold(x):
            return jnp.moveaxis(x.reshape(B, C, S, *x.shape[2:]), 1, 2)

        hdr = build_header_words(
            unfold(headers.step_index), unfold(headers.shift),
            unfold(headers.weight), unfold(headers.history), geo,
        )
        return dw, hdr

    def stage_full(bl):
        return _encode_device_wire(
            bl, valid, geo=geo, num_trials=2, ms=False, engine=engine,
            lanes_folded=True,
        )

    def time_stage(name, fn):
        def first_leaf(out):
            leaves = jax.tree_util.tree_leaves(out)
            return leaves[0].reshape(-1)[0].astype(jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def run(bl, tok, iters):
            def body(_, carry):
                bl, out, tok = carry
                bl = bl.at[0, 0, 0].set(tok & 1)
                out = fn(bl)
                return (bl, out, first_leaf(out))

            out0 = fn(bl)
            return lax.fori_loop(0, iters, body, (bl, out0, first_leaf(out0)))

        bl = jnp.array(blocks0)
        bl, out, tok = run(bl, jnp.int32(0), iters)
        float(tok)
        t0 = time.time()
        bl, out, tok = run(bl, tok, iters)
        float(tok)
        dt = (time.time() - t0) / (iters + 1)
        print(f"{name:10s} {dt*1e3:7.3f} ms  {total/dt/1e9:6.2f} Gsamples/s",
              flush=True)
        return dt

    time_stage("kernel", stage_kernel)
    time_stage("+wire", stage_wire)
    time_stage("+headers", stage_headers)
    time_stage("full", stage_full)


if __name__ == "__main__":
    main()
