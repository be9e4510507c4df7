#!/usr/bin/env python
"""TPU probes for the encode input relayout floor (VERDICT round 2, item 4).

The encode kernel wants time-major packed sample pairs; the API receives
lane-major (L, T) int32 samples. Round 2 measured "every XLA formulation at
2.2-2.3 ms" for 32.5 M samples (~15 Gsamples/s ceiling) — but the round-3
decode probes showed the same-class transpose running at ~490 GB/s when the
strided *pack* is kept off the minor axis. Variants:

  R1  shipped to_timemajor (minor-axis stride-2 pack, then transpose)
  R2  astype(int16) pass + FREE bitcast pair-pack + transpose
  R3  R2 with the transpose before the bitcast (int16 half-width transpose)

Usage: python benchmarks/probe_encode_relayout.py [iters]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def main() -> None:
    from aad_tpu.ops.pallas_encode import LANES, SUBLANES, TILE, to_timemajor

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    L = 32768
    T = 1024
    total = L * T
    n_tiles = L // TILE
    W2 = T // 2

    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, (L, T), dtype=np.int64).astype(np.int32)

    def timed(label, fn, n=iters):
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def run(src, tok, n):
            def body(_, carry):
                src, tok, out = carry
                src = src.at[0, 0].set(tok)
                out = fn(src)
                return (src, out.reshape(-1)[-1].astype(jnp.int32) + tok, out)

            out0 = fn(src)
            return lax.fori_loop(
                0, n, body,
                (src, out0.reshape(-1)[-1].astype(jnp.int32), out0),
            )

        try:
            src, tok, out = run(jnp.asarray(x), jnp.int32(0), n)
            float(tok)
            t0 = time.time()
            src, tok, out = run(src, tok, n)
            float(tok)
            dt = (time.time() - t0) / (n + 1)
            print(json.dumps({
                "probe": label, "ms": round(dt * 1e3, 3),
                "gsamples_per_sec": round(total / dt / 1e9, 2),
            }))
            return out
        except Exception as e:
            print(json.dumps({"probe": label, "error": str(e)[:250]}))
            return None

    def r2(src):
        h = src.astype(jnp.int16)                     # one full pass, no strides
        w = lax.bitcast_convert_type(h.reshape(L, W2, 2), jnp.int32)  # free
        return w.reshape(n_tiles, SUBLANES, LANES, W2).transpose(3, 0, 1, 2)

    def r3(src):
        h = src.astype(jnp.int16)
        ht = h.reshape(n_tiles, SUBLANES, LANES, T).transpose(3, 0, 1, 2)
        # pack on the (now major) time axis: rows 2t / 2t+1
        w = lax.bitcast_convert_type(
            ht.reshape(W2, 2, n_tiles, SUBLANES, LANES).transpose(0, 2, 3, 4, 1),
            jnp.int32,
        )
        return w

    print(json.dumps({"config": {"L": L, "T": T, "samples": total,
                                 "platform": jax.devices()[0].platform}}))
    want = np.asarray(to_timemajor(jnp.asarray(x)))
    timed("R1_shipped_to_timemajor", lambda s: to_timemajor(s))
    for name, fn in (("R2_i16_bitcast_pack_then_transpose", r2),
                     ("R3_i16_transpose_then_major_pack", r3)):
        o = timed(name, fn)
        if o is not None:
            got = np.asarray(fn(jnp.asarray(x)))
            ok = bool((got.reshape(want.shape)[1:] == want[1:]).all())
            print(json.dumps({"probe": name + "_correct", "ok": ok}))


if __name__ == "__main__":
    main()
