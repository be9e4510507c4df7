#!/usr/bin/env python
"""Can a Pallas kernel beat XLA's 330 GB/s on the decode detile transpose?

The detile is (W4, nt, 8, 128) i32 -> (nt, 8, 128, W4): per lane tile a
(W4, 1024) -> (1024, W4) transpose, 0.82 ms at headline scale where the
HBM roofline is ~0.33 ms. Variants:

  T1  in-kernel jnp.transpose of the whole (tc, 8, 128) block
  T2  8x (tc, 128) 2-D transposes (one per sublane row)
  T3  XLA baseline

Usage: python benchmarks/probe_transpose.py [iters]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aad_tpu.ops.pallas_common import interpret_mode


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    W4 = 512
    nt = 64
    TC = 128  # t-chunk per grid step
    rng = np.random.default_rng(0)
    x = rng.integers(
        -2**31, 2**31, (W4, nt, 8, 128), dtype=np.int64
    ).astype(np.int32)  # numpy: each probe uploads its own (donated) copy
    total_bytes = x.size * 4

    def timed(label, fn, n=iters):
        # the source must be perturbed per iteration or XLA hoists a pure
        # transpose out of the loop (measured an impossible 2.1 TB/s)
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def run(src, tok, n):
            def body(_, carry):
                src, tok, out = carry
                src = src.at[0, 0, 0, 0].set(tok)
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
                "gbps_rw": round(2 * total_bytes / dt / 1e9, 1),
            }))
            return out
        except Exception as e:
            print(json.dumps({"probe": label, "error": str(e)[:250]}))
            return None

    def t1_kernel(x_ref, o_ref):
        v = x_ref[:, 0]  # (TC, 8, 128)
        o_ref[0] = jnp.transpose(v, (1, 2, 0))

    def t1(src):
        return pl.pallas_call(
            t1_kernel,
            grid=(nt, W4 // TC),
            in_specs=[pl.BlockSpec((TC, 1, 8, 128), lambda i, j: (j, i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128, TC), lambda i, j: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, 8, 128, W4), jnp.int32),
            interpret=interpret_mode(),
        )(src)

    def t2_kernel(x_ref, o_ref):
        for s in range(8):
            o_ref[0, s] = jnp.transpose(x_ref[:, 0, s, :], (1, 0))

    def t2(src):
        return pl.pallas_call(
            t2_kernel,
            grid=(nt, W4 // TC),
            in_specs=[pl.BlockSpec((TC, 1, 8, 128), lambda i, j: (j, i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128, TC), lambda i, j: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, 8, 128, W4), jnp.int32),
            interpret=interpret_mode(),
        )(src)

    def t3(src):
        return src.transpose(1, 2, 3, 0)

    print(json.dumps({"config": {"shape": list(x.shape),
                                 "platform": jax.devices()[0].platform}}))
    want = np.asarray(jnp.asarray(x).transpose(1, 2, 3, 0))
    timed("T3_xla", lambda s_: t3(s_).reshape(-1))
    for name, launch in (("T1_block_transpose", t1), ("T2_rowwise_2d", t2)):
        o = timed(name, lambda s_, launch=launch: launch(s_).reshape(-1))
        if o is not None:
            got = np.asarray(launch(jnp.asarray(x)))
            # the perturbed element differs; compare away from [0,0,0,0]
            ok = bool((got[1:] == want[1:]).all())
            print(json.dumps({"probe": name + "_correct", "ok": ok}))


if __name__ == "__main__":
    main()
