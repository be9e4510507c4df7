#!/usr/bin/env python
"""Per-stage decode/encode micro-benchmarks (JSON lines).

Splits the pipelines into stages with correct async-dispatch methodology
(in-jit token chains — see docs/DESIGN.md §6) so regressions localize.

Usage: python benchmarks/microbench.py [seconds-of-audio]
"""

from __future__ import annotations

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
    from aad_tpu.codec.decoder import Decoder, _device_pipeline
    from aad_tpu.format.framing import parse_block_headers
    from aad_tpu.ops.bitpack import unpack_codes
    from aad_tpu.ops.decode import decode_blocks, resolve_engine
    from aad_tpu.ops.pallas_decode import pack_code_words

    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    data, _ = B.build_synthetic_stream(48000 * seconds)
    header = decode_header(data)
    dec = Decoder.from_header(header)
    geo = dec.geometry
    nblocks = -(-header.num_samples // header.num_samples_per_block)
    padded = np.zeros(nblocks * geo.block_size, dtype=np.uint8)
    pl = np.frombuffer(data, dtype=np.uint8)[FILE_HEADER_SIZE:]
    padded[: len(pl)] = pl
    dev = jnp.asarray(padded)
    total = header.num_samples * header.num_channels
    engine = resolve_engine("auto")

    def timed(label, fn, iters=8):
        f = jax.jit(fn)
        tok = f(dev, jnp.int32(0))
        float(tok)
        t0 = time.time()
        for _ in range(iters):
            tok = f(dev, tok)
        float(tok)
        dt = (time.time() - t0) / iters
        print(json.dumps({
            "stage": label,
            "ms": round(dt * 1e3, 3),
            "gsamples_per_sec": round(total / dt / 1e9, 3),
        }))

    def tweak(p, tok):
        return p.at[0].set((tok & 1).astype(jnp.uint8))

    def s_parse(p, tok):
        p = tweak(p, tok)
        st = parse_block_headers(p.reshape(nblocks, geo.block_size), geo)
        return st.step_index[0, 0].astype(jnp.int32)

    def s_unpack(p, tok):
        p = tweak(p, tok)
        blocks = p.reshape(nblocks, geo.block_size)
        d = blocks[:, geo.header_bytes : geo.header_bytes + geo.data_bytes]
        codes = unpack_codes(d, geo)
        words = pack_code_words(
            jnp.swapaxes(codes, 0, 1).reshape(
                geo.num_channels * nblocks, -1
            )
        )
        return words[0, 0].astype(jnp.int32)

    def s_kernel(p, tok):
        p = tweak(p, tok)
        blocks = p.reshape(nblocks, geo.block_size)
        st = parse_block_headers(blocks, geo)
        d = blocks[:, geo.header_bytes : geo.header_bytes + geo.data_bytes]
        codes = unpack_codes(d, geo)
        out = decode_blocks(
            jnp.swapaxes(codes, 0, 1),
            jnp.swapaxes(st.step_index, 0, 1),
            jnp.swapaxes(st.weight, 0, 1),
            jnp.swapaxes(st.history, 0, 1),
            bits_per_sample=header.bits_per_sample,
            engine=engine,
        )
        return out[0, 0, 0].astype(jnp.int32)

    def s_full(p, tok):
        p = tweak(p, tok)
        pcm = _device_pipeline(
            p,
            geo=geo,
            num_blocks=nblocks,
            bits_per_sample=header.bits_per_sample,
            ms=False,
            num_samples=header.num_samples,
            engine=engine,
        )
        return pcm[0, 0].astype(jnp.int32)

    print(json.dumps({"config": {"seconds": seconds, "blocks": nblocks,
                                 "engine": engine, "samples": total}}))
    timed("parse_headers", s_parse)
    timed("unpack+pack_words", s_unpack)
    timed("through_kernel", s_kernel)
    timed("full_pipeline", s_full)


if __name__ == "__main__":
    main()
