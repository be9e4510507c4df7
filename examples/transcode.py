#!/usr/bin/env python
"""Transcode WAV <-> .aad with one call each way."""
import sys

import aad_tpu

if len(sys.argv) != 3:
    sys.exit("usage: transcode.py in.wav out.aad | in.aad out.wav")

src, dst = sys.argv[1], sys.argv[2]
if src.endswith(".wav"):
    header = aad_tpu.encode_file(src, dst)
else:
    header = aad_tpu.decode_file(src, dst)
print(f"{src} -> {dst}: {header.num_channels} ch, "
      f"{header.num_samples} samples @ {header.sampling_rate} Hz")
