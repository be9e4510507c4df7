#!/usr/bin/env python
"""Sweep the full wire32 decode pipeline across lane-tile counts.

Round-3 §5a found full-pipeline throughput tile-count-sensitive (57 tiles
31.7-34.2 G/s vs 58 tiles 25.1-27.1 G/s in an earlier pipeline state) with
the sensitivity localized in the XLA glue around the kernel. This probe
maps the pattern so the decoder's block bucketing can round to a
known-good tile class instead of the minimal whole-tile pad.

Usage: python benchmarks/probe_tile_counts.py [tiles...]  (default 52..64)
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

import os

ITERS = int(os.environ.get("AAD_PROBE_ITERS", "100"))


def measure(n_tiles: int) -> float:
    import bench
    from aad_tpu import FILE_HEADER_SIZE, decode_header
    from aad_tpu.codec.decoder import Decoder, _device_pipeline_words
    from aad_tpu.ops.decode import resolve_engine
    from aad_tpu.ops.wire32 import payload_to_words_split

    # stereo: lanes = 2 * nblocks, tiles = nblocks / 512
    nblocks = n_tiles * 512
    num_samples = nblocks * 1016  # whole blocks; nspb=1016 at the default geo
    data, _ = bench.build_synthetic_stream(num_samples)
    header = decode_header(data)
    dec = Decoder.from_header(header)

    payload = np.frombuffer(data, dtype=np.uint8)[FILE_HEADER_SIZE:]
    hdr_np, data_np = payload_to_words_split(payload, dec.geometry, nblocks)
    hdr_w, data_w = jnp.asarray(hdr_np), jnp.asarray(data_np)

    kwargs = dict(
        geo=dec.geometry,
        num_blocks=nblocks,
        bits_per_sample=header.bits_per_sample,
        ms=False,
        engine=resolve_engine("auto"),
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def run(hdr_w, data_w, token, iters):
        def body(_, carry):
            hw, dw, out, tok = carry
            dw = dw.at[0, 0].set((tok & 1).astype(jnp.uint32))
            out = _device_pipeline_words(hw, dw, **kwargs)
            return (hw, dw, out, out[(-1,) * out.ndim].astype(jnp.int32))

        out0 = _device_pipeline_words(hdr_w, data_w, **kwargs)
        return lax.fori_loop(
            0, iters, body,
            (hdr_w, data_w, out0, out0[(-1,) * out0.ndim].astype(jnp.int32)),
        )

    hdr_w, data_w, out, token = run(hdr_w, data_w, jnp.int32(0), ITERS)
    float(token)
    t0 = time.time()
    hdr_w, data_w, out, token = run(hdr_w, data_w, token, ITERS)
    float(token)
    dt = (time.time() - t0) / (ITERS + 1)
    return num_samples * 2 / dt


def main() -> None:
    tiles = [int(a) for a in sys.argv[1:]] or list(range(52, 65))
    from aad_tpu.ops.pallas_decode import _pick_r

    for n in tiles:
        gsps = measure(n) / 1e9
        print(f"tiles={n:3d} r={_pick_r(n)} {gsps:7.2f} Gsamples/s", flush=True)


if __name__ == "__main__":
    main()
