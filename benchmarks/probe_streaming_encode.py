"""Attribute the streaming-encode push path's wall (VERDICT r4, item 7).

``encode_streaming_samples_per_sec`` (bench.py) pushes a one-minute
stereo stream in 1-second chunks through StreamingEncoder (auto -> the
native chunk entry aadx_encode_chunk) and records ~13.8 M samples/s,
while the one-shot native encode of the same stream runs ~17 M — a ~19%
streaming tax. This probe splits that tax:

* ``oneshot``    — native.encode of the whole stream (the floor: the
                   irreducible per-sample chain).
* ``chunks_raw`` — the same stream as pre-sliced C-contiguous
                   whole-block chunks through native.encode_chunk (no
                   FIFO, no Python-side copies): adds only the per-chunk
                   native entry cost (bound calc, state write-back,
                   output alloc + trim).
* ``shipped``    — the bench's actual StreamingEncoder push loop: adds
                   the wrapper (buffer concatenate, block slicing —
                   non-contiguous views that _check_pcm must copy —
                   geometry recompute, ctypes glue).

All three are interleaved per round so host scheduling noise lands on
every variant equally. Prints one JSON line with per-variant samples/s
and the two marginal costs.

Usage: python benchmarks/probe_streaming_encode.py [rounds]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("AAD_TPU_PLATFORM", "cpu")

RATE, NCH = 48000, 2


def main(rounds: int = 5) -> None:
    from aad_tpu import native
    from aad_tpu.codec.encoder import EncodeConfig
    from aad_tpu.codec.streaming import StreamingEncoder

    assert native.available()
    cfg = EncodeConfig(num_channels=NCH, sampling_rate=RATE)
    nspb = cfg.geometry().num_samples_per_block
    n = RATE * 60
    t = np.arange(n) / RATE
    sig = (0.4 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int32)
    pcm = np.stack([sig, np.roll(sig, 11)])
    samples = pcm.size

    def oneshot():
        return native.encode(pcm, cfg)

    # pre-sliced whole-block chunks at the bench's 1 s cadence
    chunk = RATE
    whole = []
    carried = 0
    for i in range(0, n, chunk):
        avail = carried + min(chunk, n - i)
        nblk = avail // nspb
        whole.append(nblk * nspb)
        carried = avail - nblk * nspb
    cuts = np.cumsum([0] + whole)
    pieces = [
        np.ascontiguousarray(pcm[:, a:b]) for a, b in zip(cuts[:-1], cuts[1:])
    ]
    tail = np.ascontiguousarray(pcm[:, cuts[-1]:])

    def chunks_raw():
        state, prev = native.stream_state(cfg)
        parts = []
        bi = 0
        for p in pieces:
            if p.shape[1]:
                parts.append(
                    native.encode_chunk(p, cfg, state, prev, bi)
                )
                bi += p.shape[1] // nspb
        if tail.shape[1]:
            parts.append(native.encode_chunk(tail, cfg, state, prev, bi))
        return b"".join(parts)

    def shipped():
        enc = StreamingEncoder(cfg, total_samples=n)
        parts = [enc.header()]
        for i in range(0, n, chunk):
            parts.append(enc.push(pcm[:, i : i + chunk]))
        parts.append(enc.finish())
        return b"".join(parts)

    # correctness first: all three must emit the identical stream
    want = oneshot()
    from aad_tpu.constants import FILE_HEADER_SIZE

    assert chunks_raw() == want[FILE_HEADER_SIZE:], "chunks_raw diverged"
    assert shipped() == want, "shipped StreamingEncoder diverged"

    fns = [("oneshot", oneshot), ("chunks_raw", chunks_raw),
           ("shipped", shipped)]
    best = {k: float("inf") for k, _ in fns}
    for _ in range(rounds):
        for name, fn in fns:
            t0 = time.time()
            fn()
            best[name] = min(best[name], time.time() - t0)

    out = {
        "workload": f"60s stereo {RATE} Hz, 1s pushes ({samples} samples)",
        **{f"{k}_ms": round(v * 1e3, 2) for k, v in best.items()},
        **{f"{k}_samples_per_sec": round(samples / v)
           for k, v in best.items()},
        "native_entry_tax_ms": round(
            (best["chunks_raw"] - best["oneshot"]) * 1e3, 2),
        "wrapper_tax_ms": round(
            (best["shipped"] - best["chunks_raw"]) * 1e3, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
