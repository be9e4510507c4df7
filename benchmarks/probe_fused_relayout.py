#!/usr/bin/env python
"""TPU probes for the FUSED encode kernel's input relayout at bench shapes.

probe_encode_relayout.py races to_timemajor at (L=32768, T=1024) where
W2=512 needs no padding. The real bench geometry is T=992 (stereo 4-bit
1024-byte blocks): pack gives W2=496 words, and the streaming kernel pads
to a STREAM_CHUNK=128 multiple (512) — a full extra 65 MB pad copy — then
runs a 5-D transpose. Variants:

  F1  shipped pack_lane_words (pack, pad 496->512, 5-D reshape+transpose)
  F2  no pad: W2 stays 496 (STREAM_CHUNK would become a 496 divisor)
  F3  no pad + 2-D transpose formulation (L, W2) -> (W2, L), then view
  F4  pad folded into the pack output via concat of a zero tail

Usage: python benchmarks/probe_fused_relayout.py [iters]
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
    from aad_tpu.ops.pallas_decode import LANES, SUBLANES

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    L = 32768          # 16384 stereo blocks on the lane axis
    T = 992            # samples per channel block minus FILTER_ORDER is 988;
                       # the fused path packs nspb-4=988 -> W2=494? (see note)
    # pack_lane_words packs T-FILTER_ORDER samples; with nspb=992 that is
    # 988 samples -> ceil(988/8)*4 = 496 words. Model that directly:
    Tp = 988
    R = 4
    RS = R * SUBLANES
    n_tiles = L // (RS * LANES // SUBLANES * 8 // 8)  # L / (R*1024)
    n_tiles = L // (R * SUBLANES * LANES)
    W2 = -(-Tp // 8) * 4          # 494 -> 496? ceil(988/8)=124 *4 = 496
    W2_pad = -(-W2 // 128) * 128  # 512

    total = L * Tp
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, (1, L, Tp), dtype=np.int64).astype(np.int32)

    def timed(label, fn, n=iters):
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def run(src, tok, n):
            def body(_, carry):
                src, tok, out = carry
                src = src.at[0, 0, 0].set(tok)
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
            }), flush=True)
            return out
        except Exception as e:
            print(json.dumps({"probe": label, "error": str(e)[:250]}),
                  flush=True)
            return None

    def pack(src):
        Te = Tp & ~1
        lo = src[..., 0:Te:2] & jnp.int32(0xFFFF)
        hi = src[..., 1:Te:2] << 16
        return hi | lo  # (1, L, Te//2 = 494)

    def f1(src):  # shipped: pack, pad to 496.. wait pack gives 494; the
        # shipped code then pads 494 -> W2(496) -> chunked 512 in one pad
        w = pack(src)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, W2_pad - w.shape[-1])))
        return w.reshape(1, n_tiles, RS, LANES, W2_pad).transpose(0, 4, 1, 2, 3)

    def f2(src):  # no chunk pad: keep natural 496-multiple-of-4 width
        w = pack(src)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, W2 - w.shape[-1])))
        return w.reshape(1, n_tiles, RS, LANES, W2).transpose(0, 4, 1, 2, 3)

    def f3(src):  # no chunk pad + 2-D transpose formulation
        w = pack(src)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, W2 - w.shape[-1])))
        wt = w.reshape(L, W2).T  # (W2, L)
        return wt.reshape(1, W2, n_tiles, RS, LANES)

    def f4(src):  # pad via zero-tail concat instead of jnp.pad
        w = pack(src)
        z = jnp.zeros((1, L, W2_pad - w.shape[-1]), jnp.int32)
        w = jnp.concatenate([w, z], axis=-1)
        return w.reshape(1, n_tiles, RS, LANES, W2_pad).transpose(0, 4, 1, 2, 3)

    print(json.dumps({"config": {
        "L": L, "Tp": Tp, "W2": W2, "W2_pad": W2_pad, "n_tiles": n_tiles,
        "samples": total, "platform": jax.devices()[0].platform,
    }}), flush=True)
    o1 = timed("F1_shipped_pad512_5d", f1)
    o2 = timed("F2_nopad_496_5d", f2)
    o3 = timed("F3_nopad_496_2d", f3)
    timed("F4_pad512_concat", f4)
    if o2 is not None and o3 is not None:
        ok = bool((np.asarray(o2) == np.asarray(o3)).all())
        print(json.dumps({"probe": "F2_eq_F3", "ok": ok}), flush=True)


if __name__ == "__main__":
    main()
