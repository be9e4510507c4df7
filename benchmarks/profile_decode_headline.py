#!/usr/bin/env python
"""Trace the headline decode pipeline (bench.py's exact setup) and dump the
per-op device-time breakdown from the profiler trace.

Usage: python benchmarks/profile_decode_headline.py [iters]
"""

from __future__ import annotations

import functools
import glob
import gzip
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
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import bench
    from aad_tpu import FILE_HEADER_SIZE, decode_header
    from aad_tpu.codec.decoder import Decoder, _device_pipeline_words
    from aad_tpu.ops.decode import resolve_engine
    from aad_tpu.ops.wire32 import payload_to_words_split

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    num_samples = bench.RATE * bench.SECONDS
    data, _ = bench.build_synthetic_stream(num_samples)
    header = decode_header(data)
    dec = Decoder.from_header(header)

    payload = np.frombuffer(data, dtype=np.uint8)[FILE_HEADER_SIZE:]
    nblocks = -(-header.num_samples // header.num_samples_per_block)
    nblocks = -(-nblocks // 512) * 512
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

    hdr_w, data_w, out, token = run(hdr_w, data_w, jnp.int32(0), iters)
    float(token)

    trace_dir = "/tmp/aad_profile_decode"
    with jax.profiler.trace(trace_dir):
        t0 = time.time()
        hdr_w, data_w, out, token = run(hdr_w, data_w, token, iters)
        float(token)
        dt = (time.time() - t0) / (iters + 1)

    samples = header.num_samples * header.num_channels
    print(json.dumps({
        "samples": samples,
        "ms_per_iter": round(dt * 1e3, 3),
        "gsamples_per_sec": round(samples / dt / 1e9, 2),
        "lanes": int(nblocks * header.num_channels),
    }))

    # pull per-op durations out of the trace proto
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace json found", glob.glob(trace_dir + "/**", recursive=True))
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep device-lane complete events, aggregate by name
    agg: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        pid = e.get("pid", 0)
        agg[name] = agg.get(name, 0.0) + e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    for name, us in top:
        print(f"{us/1e3/(iters+1):9.3f} ms/iter  {name[:110]}")


if __name__ == "__main__":
    main()
