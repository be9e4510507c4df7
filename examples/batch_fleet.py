#!/usr/bin/env python
"""Batch transcoding: many streams in single device computations."""
import sys

import numpy as np

try:
    import aad_tpu
except ModuleNotFoundError:  # running from a source checkout without install
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import aad_tpu

rng = np.random.default_rng(0)
streams = [
    (6000 * np.sin(np.arange(n) / f)).astype(np.int32)[None]
    for n, f in [(30000, 11.0), (12345, 7.0), (47000, 29.0)]
]

cfg = aad_tpu.EncodeConfig(num_channels=1, sampling_rate=22050)
encoded = aad_tpu.encode_batch(streams, cfg)
decoded = aad_tpu.decode_batch(encoded)
for pcm, data, (hdr, out) in zip(streams, encoded, decoded):
    ratio = pcm.size * 2 / len(data)
    err = np.sqrt(np.mean(((pcm - out) / 32768.0) ** 2))
    print(f"{hdr.num_samples:6d} samples: {ratio:.2f}x compression, RMSE {err:.4f}")
