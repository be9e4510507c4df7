"""Probe: block-parallel encode throughput vs B (blocks on the lane axis).

bench.py (B=16384) measures ~5.9 Gsamples/s while microbench (B=3072)
measures ~7.9 — this probe isolates which stage stops scaling.

Usage: python benchmarks/probe_encode_scale.py [B ...]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(bs):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aad_tpu.codec.encoder import (
        EncodeConfig,
        _encode_device_wire,
        resolve_encode_engine,
    )
    from aad_tpu.ops.encode import encode_blocks_parallel

    engine = resolve_encode_engine("auto")
    cfg = EncodeConfig(num_channels=2, sampling_rate=48000)
    geo = cfg.geometry()
    nspb = geo.num_samples_per_block

    for B in bs:
        sig = (9000 * np.sin(np.arange(B * 2 * nspb) / 17)).astype(np.int32)
        blocks = jnp.asarray(sig.reshape(B, 2, nspb))
        valid = jnp.full(B, nspb, dtype=jnp.int32)
        total = B * 2 * nspb

        def relayout_only(bl):
            from aad_tpu.ops.pallas_encode import to_timemajor

            flat = bl.reshape(B * 2, nspb).astype(jnp.int32)
            tm = to_timemajor(flat)
            return tm.reshape(-1)[:8].astype(jnp.int32)

        def kernel_t0(bl):
            h, kw = encode_blocks_parallel(bl, valid, 4, 0, engine=engine)
            return kw.reshape(-1)[:8].astype(jnp.int32)

        def kernel_only(bl):
            h, kw = encode_blocks_parallel(bl, valid, 4, 2, engine=engine)
            return kw.reshape(-1)[:8].astype(jnp.int32)

        def full(bl):
            out = _encode_device_wire(
                bl, valid, geo=geo, num_trials=cfg.num_encode_trials,
                ms=False, engine=engine, parallel=True,
            )
            return out[0, 0].astype(jnp.int32)

        for label, fn in (
            ("relayout", relayout_only), ("kernel_t0", kernel_t0),
            ("kernel", kernel_only), ("full", full),
        ):
            @functools.partial(jax.jit, static_argnums=(2,))
            def run(bl, tok, iters, fn=fn):
                def body(_, carry):
                    bl, tok = carry
                    bl2 = bl.at[0, 0, 0].set(tok & 1)
                    t = fn(bl2)
                    return (bl, t.reshape(-1)[0])

                return lax.fori_loop(0, iters, body, (bl, tok))

            iters = 100
            _, tok = run(blocks, jnp.int32(0), iters)
            float(tok)
            t0 = time.time()
            _, tok = run(blocks, tok, iters)
            float(tok)
            dt = (time.time() - t0) / iters
            print(
                {"B": B, "stage": label, "ms": round(dt * 1e3, 3),
                 "gsps": round(total / dt / 1e9, 2)},
                flush=True,
            )


if __name__ == "__main__":
    bs = [int(a) for a in sys.argv[1:]] or [3072, 8192, 16384]
    main(bs)
