#!/usr/bin/env python
"""Streaming round trip: chunked encode feeding a push-based decoder.

Demonstrates the bit-exact state carry — arbitrary chunk boundaries on
both sides, output identical to a one-shot round trip.
"""
import sys

import numpy as np

try:
    import aad_tpu
except ModuleNotFoundError:  # running from a source checkout without install
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import aad_tpu

rng = np.random.default_rng(0)
pcm = (9000 * np.sin(np.arange(40000) / 23)).astype(np.int32)[None]

cfg = aad_tpu.EncodeConfig(num_channels=1, sampling_rate=16000)
enc = aad_tpu.StreamingEncoder(cfg, total_samples=pcm.shape[1])
dec = aad_tpu.StreamingDecoder()

out = [dec.push(enc.header())]                    # header flows first
for off in range(0, pcm.shape[1], 1111):          # odd chunk size on purpose
    out.append(dec.push(enc.push(pcm[:, off : off + 1111])))
out.append(dec.push(enc.finish()))

decoded = np.concatenate([o for o in out if o.size], axis=1)
err = np.sqrt(np.mean(((pcm - decoded) / 32768.0) ** 2))
print(f"streamed {pcm.shape[1]} samples, reconstruction RMSE {err:.4f}")
