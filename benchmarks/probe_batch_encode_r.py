"""Probe: sequential batch encode (trials=2) vs lane-interleave R / DMA chunk.

bench.py's measure_encode geometry (B=4 chained blocks x 8192 lanes,
nspb=992) runs the fused kernel's streaming-DMA variant at R=4
(R*nspb > MAX_NSPB_RESIDENT).  This sweeps R and STREAM_CHUNK to see
whether the 5.6 G/s headline has kernel-side headroom.

Usage: python benchmarks/probe_batch_encode_r.py [R ...]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(r, chunk, iters=24):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import aad_tpu.ops.pallas_encode_fused as pef
    from aad_tpu.codec.encoder import (
        EncodeConfig,
        _encode_device_wire,
        resolve_encode_engine,
    )

    os.environ["AAD_TPU_ENCODE_R"] = str(r)
    pef.STREAM_CHUNK = chunk
    jax.clear_caches()

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
    t0 = time.time()
    bl, out, tok = run(bl, tok, iters)
    float(tok)
    dt = (time.time() - t0) / (iters + 1)
    print(f"R={r} chunk={chunk}: {total / dt / 1e9:.2f} Gsamples/s "
          f"({dt * 1e3:.2f} ms / {total / 1e6:.1f} M samples)", flush=True)


if __name__ == "__main__":
    combos = [(4, 128), (4, 256), (8, 128), (2, 128), (4, 64), (8, 256)]
    if len(sys.argv) > 1:
        combos = [(int(a), 128) for a in sys.argv[1:]]
    for r, chunk in combos:
        try:
            run_one(r, chunk)
        except Exception as e:
            print(f"R={r} chunk={chunk}: FAILED {type(e).__name__}: {e}",
                  flush=True)
