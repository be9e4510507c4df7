#!/usr/bin/env python
"""Per-stage decode/encode micro-benchmarks (JSON lines).

Splits the wire32 decode pipeline into stages with correct async-dispatch
methodology (in-jit token chains, full outputs returned so nothing is
dead-code eliminated — see docs/DESIGN.md §6) so regressions localize.

Usage: python benchmarks/microbench.py [seconds-of-audio]
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench as B
    from aad_tpu import FILE_HEADER_SIZE, decode_header
    from aad_tpu.codec.decoder import Decoder, _device_pipeline_words
    from aad_tpu.ops.decode import resolve_engine
    from aad_tpu.ops.pallas_decode import decode_words_timemajor
    from aad_tpu.ops.wire32 import (
        data_to_kernel_words,
        parse_block_headers_u32,
        payload_to_words_split,
    )

    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    data, _ = B.build_synthetic_stream(48000 * seconds)
    header = decode_header(data)
    dec = Decoder.from_header(header)
    geo = dec.geometry
    nblocks = -(-header.num_samples // header.num_samples_per_block)
    nblocks = -(-nblocks // 512) * 512
    payload = np.frombuffer(data, dtype=np.uint8)[FILE_HEADER_SIZE:]
    hdr_np, data_np = payload_to_words_split(payload, geo, nblocks)
    total = header.num_samples * header.num_channels
    engine = resolve_engine("auto")
    T = geo.codes_per_block

    baseline_ms = [0.0]

    def timed(label, fn, iters=100, is_baseline=False):
        from jax import lax

        # Whole iteration loop in ONE dispatch, and enough iterations to
        # amortise that dispatch: a single tunnel round trip costs ~25 ms,
        # so at 16 iterations every stage would read ~1.5 ms regardless of
        # its real cost (a round-2 footgun that briefly pointed the decode
        # "bottleneck" at the header parse). Stage outputs ride in the loop
        # carry so nothing is dead-code eliminated. The first stage timed
        # is a no-op tweak+slice whose per-iteration time is reported as
        # `dispatch_floor_ms` and subtracted from every later stage: the
        # printed ms is the stage's *marginal* device cost.
        @functools.partial(
            jax.jit, donate_argnums=(0, 1), static_argnums=(3,)
        )
        def run(hw, dw, tok, n):
            def body(_, carry):
                hw, dw, out, tok = carry
                return fn(hw, dw, tok)

            hw, dw, out0, tok = fn(hw, dw, tok)
            return lax.fori_loop(0, n, body, (hw, dw, out0, tok))

        # fresh device copies per stage: the donated buffers are consumed
        hw, dw, out, tok = run(
            jnp.asarray(hdr_np), jnp.asarray(data_np), jnp.int32(0), iters
        )
        float(tok)
        t0 = time.time()
        hw, dw, out, tok = run(hw, dw, tok, iters)
        float(tok)
        dt = (time.time() - t0) / (iters + 1)
        if is_baseline:
            baseline_ms[0] = dt * 1e3
            print(json.dumps({
                "stage": label,
                "dispatch_floor_ms": round(dt * 1e3, 3),
            }))
            return out
        ms = dt * 1e3 - baseline_ms[0]
        print(json.dumps({
            "stage": label,
            "marginal_ms": round(ms, 3),
            "gsamples_per_sec": round(total / (ms * 1e-3) / 1e9, 3),
        }))
        return out

    def tweak(hw, dw, tok):
        # perturb BOTH arrays so no stage is hoisted as loop-invariant
        b = (tok & 1).astype(jnp.uint32)
        return hw.at[0, 0].set(b), dw.at[(0,) * dw.ndim].set(b)

    def s_parse(hw, dw, tok):
        hw, dw = tweak(hw, dw, tok)
        st = parse_block_headers_u32(hw, geo)
        return hw, dw, st, st.step_index[0, 0].astype(jnp.int32)

    def s_kw(hw, dw, tok):
        hw, dw = tweak(hw, dw, tok)
        kw = data_to_kernel_words(dw, geo)
        return hw, dw, kw, kw[0, 0].astype(jnp.int32)

    def s_kernel(hw, dw, tok):
        hw, dw = tweak(hw, dw, tok)
        st = parse_block_headers_u32(hw, geo)
        kw = data_to_kernel_words(dw, geo)
        C, Bn = geo.num_channels, nblocks
        si = st.step_index.T.reshape(C * Bn)
        hi = jnp.swapaxes(st.history, 0, 1).reshape(C * Bn, 4)
        wt = jnp.swapaxes(st.weight, 0, 1).reshape(C * Bn, 4)
        out = decode_words_timemajor(
            kw, si, hi, wt, T + 4,
            bits_per_sample=header.bits_per_sample,
            with_head=True, packed_out=True,
        )
        return hw, dw, out, out[(-1,) * out.ndim].astype(jnp.int32)

    def s_full(hw, dw, tok):
        hw, dw = tweak(hw, dw, tok)
        out = _device_pipeline_words(
            hw, dw, geo=geo, num_blocks=nblocks,
            bits_per_sample=header.bits_per_sample, ms=False, engine=engine,
        )
        return hw, dw, out, out[(-1,) * out.ndim].astype(jnp.int32)

    def s_noop(hw, dw, tok):
        hw, dw = tweak(hw, dw, tok)
        return hw, dw, dw[0, :4], dw[(0,) * dw.ndim].astype(jnp.int32)

    print(json.dumps({"config": {"seconds": seconds, "blocks": nblocks,
                                 "engine": engine, "samples": total}}))
    timed("noop", s_noop, is_baseline=True)
    timed("parse_headers_u32", s_parse)
    timed("wire_to_kernel_words", s_kw)
    timed("through_kernel_packed", s_kernel)
    timed("full_pipeline_flat", s_full)

    encode_stages(seconds)


def encode_stages(seconds: int) -> None:
    """Marginal per-stage costs of the block-parallel encode pipeline."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aad_tpu.codec.encoder import (
        EncodeConfig,
        _encode_device_wire,
        resolve_encode_engine,
    )
    from aad_tpu.ops.encode import encode_blocks_parallel
    from aad_tpu.ops.wire32 import kernel_words_to_wire

    engine = resolve_encode_engine("auto")
    cfg = EncodeConfig(num_channels=2, sampling_rate=48000)
    geo = cfg.geometry()
    nspb = geo.num_samples_per_block
    B = max(512, (48000 * seconds) // (2 * nspb))
    B = -(-B // 512) * 512
    sig = (9000 * np.sin(np.arange(B * 2 * nspb) / 17)).astype(np.int32)
    blocks = jnp.asarray(sig.reshape(B, 2, nspb))
    valid = jnp.full(B, nspb, dtype=jnp.int32)
    total = B * 2 * nspb

    baseline_ms = [0.0]

    def timed(label, fn, iters=64, is_baseline=False):
        @functools.partial(jax.jit, static_argnums=(1,))
        def run(bl, n):
            def body(_, carry):
                bl, out, tok = carry
                bl2 = bl.at[0, 0, 0].set(tok & 1)
                return (bl,) + fn(bl2)

            out0, tok0 = fn(bl)
            return lax.fori_loop(0, n, body, (bl, out0, tok0))

        bl, out, tok = run(blocks, iters)
        float(tok)
        t0 = time.time()
        bl, out, tok = run(blocks, iters)
        float(tok)
        dt = (time.time() - t0) / (iters + 1)
        if is_baseline:
            baseline_ms[0] = dt * 1e3
            print(json.dumps({
                "stage": label, "dispatch_floor_ms": round(dt * 1e3, 3),
            }))
            return
        ms = dt * 1e3 - baseline_ms[0]
        print(json.dumps({
            "stage": label,
            "marginal_ms": round(ms, 3),
            "gsamples_per_sec": round(total / (ms * 1e-3) / 1e9, 3),
        }))

    def e_noop(bl):
        return bl[0, 0, :4], bl[0, 0, 0]

    def e_kernel(bl):  # relayout + 3-pass trials=2 kernel, packed words out
        h, kw = encode_blocks_parallel(bl, valid, 4, 2, engine=engine)
        return kw, (kw[0, 0, 0] + h.step_index[0, 0].astype(jnp.uint32)
                    ).astype(jnp.int32)

    def e_wire(bl):  # + channel-interleave wire permutation
        h, kw = encode_blocks_parallel(bl, valid, 4, 2, engine=engine)
        dw = kernel_words_to_wire(kw, geo)
        return dw, (dw[0, 0] + h.step_index[0, 0].astype(jnp.uint32)
                    ).astype(jnp.int32)

    def e_full(bl):  # + header packing + row assembly
        w = _encode_device_wire(
            bl, valid, geo=geo, num_trials=2, ms=False, engine=engine,
            parallel=True,
        )
        return w, w[0, 0].astype(jnp.int32)

    print(json.dumps({"config": {"encode_blocks": int(B),
                                 "samples": int(total)}}))
    timed("encode_noop", e_noop, is_baseline=True)
    timed("encode_relayout_kernel", e_kernel)
    timed("encode_plus_wire_permutation", e_wire)
    timed("encode_full_parallel", e_full)


if __name__ == "__main__":
    main()
