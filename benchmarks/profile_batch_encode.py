"""Trace the sequential batch encode pipeline (bench.py's measure_encode
setup) and dump the per-op device-time breakdown from the profiler trace.

Usage: python benchmarks/profile_batch_encode.py [iters]
"""
import functools
import glob
import gzip
import json
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

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    engine = resolve_encode_engine("auto")
    cfg = EncodeConfig(num_channels=2, sampling_rate=48000)
    geo = cfg.geometry()
    nspb = geo.num_samples_per_block
    S, B = 4096, 4
    sig = (9000 * np.sin(np.arange(S * B * 2 * nspb) / 17)).astype(np.int32)
    blocks = jnp.asarray(sig.reshape(B, S * 2, nspb))
    valid = jnp.full((B, S * 2), nspb, dtype=jnp.int32)
    total = S * B * 2 * nspb

    def pipeline(bl):
        return _encode_device_wire(
            bl, valid, geo=geo, num_trials=cfg.num_encode_trials,
            ms=False, engine=engine, lanes_folded=True,
        )

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def run(bl, tok, iters):
        def body(_, carry):
            bl, out, tok = carry
            bl = bl.at[0, 0, 0].set(tok & 1)
            out = pipeline(bl)
            return (bl, out, out[0, 0, 0].astype(jnp.int32))

        out0 = pipeline(bl)
        return lax.fori_loop(
            0, iters, body, (bl, out0, out0[0, 0, 0].astype(jnp.int32))
        )

    bl, out, tok = run(blocks, jnp.int32(0), iters)
    float(tok)

    trace_dir = "/tmp/aad_profile_batch_encode"
    with jax.profiler.trace(trace_dir):
        t0 = time.time()
        bl, out, tok = run(bl, tok, iters)
        float(tok)
        dt = (time.time() - t0) / (iters + 1)

    print(json.dumps({
        "samples": total,
        "ms_per_iter": round(dt * 1e3, 3),
        "gsamples_per_sec": round(total / dt / 1e9, 2),
    }))

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace json found")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    agg = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        agg[name] = agg.get(name, 0.0) + e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    for name, us in top:
        print(f"{us/1e3/(iters+1):9.3f} ms/iter  {name[:110]}")


if __name__ == "__main__":
    main()
