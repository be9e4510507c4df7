#!/usr/bin/env python
"""Convert WAV <-> .aad, or re-encode .aad -> .aad at a new bit depth.

usage: transcode.py in.wav out.aad
       transcode.py in.aad out.wav
       transcode.py in.aad out.aad [bits_per_sample]
"""
import sys

try:
    import aad_tpu
except ModuleNotFoundError:  # running from a source checkout without install
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import aad_tpu

if len(sys.argv) not in (3, 4):
    sys.exit(__doc__.strip())

src, dst = sys.argv[1], sys.argv[2]
if src.endswith(".wav"):
    header = aad_tpu.encode_file(src, dst)
elif dst.endswith(".aad"):
    bps = int(sys.argv[3]) if len(sys.argv) == 4 else None
    data = aad_tpu.transcode(open(src, "rb").read(), bits_per_sample=bps)
    open(dst, "wb").write(data)
    header = aad_tpu.decode_header(data)
else:
    header = aad_tpu.decode_file(src, dst)
print(f"{src} -> {dst}: {header.num_channels} ch, "
      f"{header.num_samples} samples @ {header.sampling_rate} Hz, "
      f"{header.bits_per_sample} bit")
