"""Attribute the one-shot pallas-engine encode wall (VERDICT r4, item 1).

``encode_single_stream_tpu_samples_per_sec`` (bench.py) times the FULL
``encode(pcm, cfg, engine="pallas")`` call — host staging, upload,
device kernel, download, payload assembly — on the 30 s stereo bench
workload. Round 4 recorded 5.63 M samples/s there while DESIGN §3's
kernel-level measurement claims 6.5–6.7 M; this probe decomposes the
e2e wall so the gap is attributed stage by stage:

* ``e2e``          — the shipped call, best-of-N (what bench records).
* ``host_stage``   — ``_pad_to_blocks``: (C, N) -> (B, C, nspb) copy.
* ``upload``       — device_put of blocks+valid, blocked.
* ``device_call``  — one jitted ``_encode_device_wire`` dispatch with
                     device-resident inputs (includes the ~25 ms tunnel
                     dispatch cost), blocked.
* ``kernel``       — steady-state device time per pipeline run, from an
                     in-jit token-chained fori loop (the methodology the
                     other bench metrics use; amortises dispatch).
* ``download_assemble`` — words -> host -> wire_words_to_payload bytes.

``e2e`` is interleaved with a re-measure of the stage sum each round so
tunnel drift cannot masquerade as wrapper overhead.

Usage: python benchmarks/probe_encode_wrapper.py [rounds]
Prints one JSON line.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aad_tpu_hw_cache")

RATE, NCH, SECONDS = 48000, 2, 30


def main(rounds: int = 5) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aad_tpu.codec.encoder import (
        EncodeConfig,
        _encode_device_wire,
        _pad_to_blocks,
        encode,
        resolve_encode_engine,
    )
    from aad_tpu.ops.wire32 import wire_words_to_payload

    engine = resolve_encode_engine("pallas")
    cfg = EncodeConfig(num_channels=NCH, sampling_rate=RATE)
    geo = cfg.geometry()
    n = RATE * SECONDS
    t = np.arange(n) / RATE
    sig = (0.4 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int32)
    pcm = np.stack([sig, np.roll(sig, 11)])
    samples = n * NCH

    kwargs = dict(geo=geo, num_trials=cfg.num_encode_trials, ms=False,
                  engine=engine)

    # --- warm every path once -------------------------------------------
    encode(pcm, cfg, engine="pallas")
    blocks, valid, _ = _pad_to_blocks(pcm, geo)
    bd, vd = jax.device_put(blocks), jax.device_put(valid)
    words = _encode_device_wire(bd, vd, **kwargs)
    words.block_until_ready()

    # steady-state kernel rate: the whole loop in ONE dispatch, chained
    # through a token so XLA must run every iteration.
    ENC_ITERS = 32

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(bl, tok, iters):
        def body(_, carry):
            b, out, tk = carry
            b = b.at[0, 0, 0].set(tk)
            out = _encode_device_wire(b, vd, **kwargs)
            return (b, out, out[-1, -1].astype(jnp.int32))

        out0 = _encode_device_wire(bl, vd, **kwargs)
        return lax.fori_loop(
            0, iters, body, (bl, out0, out0[-1, -1].astype(jnp.int32))
        )

    _, _, tok = run(bd, jnp.int32(0), ENC_ITERS)
    int(tok)

    def stage_host():
        return _pad_to_blocks(pcm, geo)

    def stage_upload():
        b = jax.device_put(blocks)
        v = jax.device_put(valid)
        b.block_until_ready(), v.block_until_ready()
        return b, v

    def stage_device_call():
        w = _encode_device_wire(bd, vd, **kwargs)
        w.block_until_ready()
        return w

    def stage_download_assemble():
        w = np.asarray(words)
        return wire_words_to_payload(w, geo, n)

    def stage_kernel():
        _, _, tk = run(bd, jnp.int32(1), ENC_ITERS)
        int(tk)

    def e2e():
        encode(pcm, cfg, engine="pallas")

    best = {k: float("inf") for k in
            ("e2e", "host_stage", "upload", "device_call",
             "download_assemble", "kernel_loop")}
    stages = [("e2e", e2e), ("host_stage", stage_host),
              ("upload", stage_upload), ("device_call", stage_device_call),
              ("download_assemble", stage_download_assemble),
              ("kernel_loop", stage_kernel)]
    for _ in range(rounds):
        for name, fn in stages:  # interleaved: same drift regime per round
            t0 = time.time()
            fn()
            best[name] = min(best[name], time.time() - t0)

    kernel = best.pop("kernel_loop") / (ENC_ITERS + 1)
    wall = best["e2e"]
    out = {
        "workload": f"{SECONDS}s stereo {RATE} Hz ({samples} samples)",
        "e2e_ms": round(wall * 1e3, 2),
        "e2e_samples_per_sec": round(samples / wall),
        "kernel_ms": round(kernel * 1e3, 2),
        "kernel_samples_per_sec": round(samples / kernel),
        "stages_ms": {k: round(v * 1e3, 2) for k, v in best.items()
                      if k != "e2e"},
        "dispatch_ms": round((best["device_call"] - kernel) * 1e3, 2),
        "wrapper_overhead_ms": round(
            (wall - best["device_call"]) * 1e3, 2),
        "sum_vs_e2e": round(
            (best["host_stage"] + best["upload"] + best["device_call"]
             + best["download_assemble"]) / wall, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
