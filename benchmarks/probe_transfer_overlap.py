"""Measure whether tunnel H2D and D2H transfers overlap (duplex test).

``decode_e2e_device`` is transport-bound (68% of wall is pure byte motion,
benchmarks/probe_tunnel_transport.py). The shipped one-shot path is strictly
serial: upload payload -> decode -> download samples. If the link moves the
two directions concurrently, a chunked pipeline (dispatch chunk i+1's upload
and decode while chunk i's samples stream back via ``copy_to_host_async``)
hides the upload (~20% of bytes) and the compute under the download stream.
This probe answers the prerequisite question with no codec in the loop:

* ``h2d``      — upload X MB, wall.
* ``d2h``      — download Y MB (``copy_to_host_async`` + materialise), wall.
  A *fresh* device buffer is produced (off the clock) every round: jax
  caches the host copy of an already-fetched array, so re-fetching the same
  buffer measures the cache, not the link.
* ``both``     — start the D2H async, immediately run the H2D, wait for
  both. ``both ~= max(h2d, d2h)`` => full duplex; ``~= h2d + d2h`` =>
  serialised link.
* ``chunked``  — K-chunk software pipeline of upload->touch->download over
  the same total volumes, the schedule the decoder would use (also exposes
  the per-chunk dispatch tax through the tunnel).

Byte volumes default to the bench one-shot workload (29.7 MB up /
115.2 MB down). Rounds interleave all variants (the tunnel drifts ~2x over
minutes — same rule as probe_tunnel_transport.py).

Usage: python benchmarks/probe_transfer_overlap.py [iters] [chunks]
Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _best_interleaved(fns, iters):
    """Best-of-N per self-timing fn, alternated per round (tunnel drift)."""
    best = [float("inf")] * len(fns)
    for _ in range(iters):
        for i, fn in enumerate(fns):
            best[i] = min(best[i], fn())
    return best


def main():
    import jax
    import jax.numpy as jnp

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    UP_MB, DOWN_MB = 29.7, 115.2  # bench.py one-shot decode byte volumes
    up_words = (int(UP_MB * 1e6) // 4) & ~(chunks * 2 - 1)
    down_words = (int(DOWN_MB * 1e6) // 4) & ~(chunks * 2 - 1)
    host_up = np.arange(up_words, dtype=np.uint32)

    @jax.jit
    def make_down(seed):
        # Fresh buffer per call (seed-dependent, nothing constant-folds).
        return jnp.full((down_words,), seed, jnp.uint32)

    @jax.jit
    def touch_chunk(w, seed):
        return jnp.zeros((down_words // chunks,), jnp.uint32) + w[0] + seed

    seed_box = [0]

    def fresh_down():
        seed_box[0] += 1
        o = make_down(jnp.uint32(seed_box[0]))
        o.block_until_ready()
        return o

    # Warm every jit + one real fetch of each shape.
    np.asarray(fresh_down())
    np.asarray(touch_chunk(jax.device_put(host_up[: up_words // chunks]),
                           jnp.uint32(0)))

    def h2d():
        t0 = time.time()
        jax.device_put(host_up).block_until_ready()
        return time.time() - t0

    def d2h():
        o = fresh_down()
        t0 = time.time()
        o.copy_to_host_async()
        _ = np.asarray(o)
        return time.time() - t0

    def both():
        o = fresh_down()
        t0 = time.time()
        o.copy_to_host_async()
        w = jax.device_put(host_up)
        _ = np.asarray(o)
        w.block_until_ready()
        return time.time() - t0

    def chunked():
        per_up = up_words // chunks
        t0 = time.time()
        seed_box[0] += 1
        s = jnp.uint32(seed_box[0])
        outs = []
        for i in range(chunks):
            w = jax.device_put(host_up[i * per_up:(i + 1) * per_up])
            o = touch_chunk(w, s)
            o.copy_to_host_async()
            outs.append(o)
        for o in outs:
            _ = np.asarray(o)
        return time.time() - t0

    t_h2d, t_d2h, t_both, t_chunk = _best_interleaved(
        [h2d, d2h, both, chunked], iters
    )
    serial = t_h2d + t_d2h
    print(json.dumps({
        "upload_mb": round(up_words * 4 / 1e6, 1),
        "download_mb": round(down_words * 4 / 1e6, 1),
        "chunks": chunks,
        "h2d_ms": round(t_h2d * 1e3, 1),
        "d2h_ms": round(t_d2h * 1e3, 1),
        "both_ms": round(t_both * 1e3, 1),
        "chunked_ms": round(t_chunk * 1e3, 1),
        "serial_sum_ms": round(serial * 1e3, 1),
        "duplex_gain": round(serial / t_both, 3),
        "chunked_gain": round(serial / t_chunk, 3),
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
