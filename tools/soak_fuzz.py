"""Extended differential soak: our engines vs the reference binary, direct.

Random geometries (odd block sizes, mono/stereo, LR/MS, trials 0-2), both
directions, N seeds (default 400, ~6 min). Scales up the suite's
tests/test_native.py::TestGeometryFuzz (6 seeds per run) for pre-release
confidence sweeps. Most seeds run the fast native engine; every
``JAX_EVERY``-th seed ALSO puts the JAX scan engines face-to-face with the
reference binary (encode bytes and decoded samples, no native
transitivity), and every ``FUSED_EVERY``-th seed additionally decodes
through the fused engine (Pallas interpret on CPU — slow, so sparse). The
final line reports per-engine seed counts.

Usage: python tools/soak_fuzz.py [num_seeds] [--record PATH]

``--record`` writes a JSON artifact ({seeds, divergences, per-engine seed
counts, seconds}) so a round's soak run is auditable from the repo, not
just from the progress log.

Exit 0 iff every compared byte/sample matches the reference binary
(reference: src/aad_encoder.c:85-131 interleave geometry,
src/aad_encoder.c:470-562 trial search, src/aad_decoder.c:394-455 block
data walk). Seed space (50_000+) is disjoint from the suite's (1000+).
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))
os.environ.setdefault("AAD_TPU_PLATFORM", "cpu")

import numpy as np
from util import reference_decode, reference_encode, write_pcm16_wav

from aad_tpu import native
from aad_tpu.codec.decoder import decode as jax_decode
from aad_tpu.codec.encoder import EncodeConfig
from aad_tpu.codec.encoder import encode as jax_encode
from aad_tpu.format.wav import read_wav

REFERENCE_DIR = Path(os.environ.get("AAD_TPU_REFERENCE_DIR", "/root/reference"))

# Direct JAX-engine seeds: every Nth seed compares the scan engines (and,
# sparser, fused-interpret decode) straight against the reference binary —
# a shared native+JAX misreading of the geometry helpers cannot pass.
JAX_EVERY = 8
FUSED_EVERY = 64


def main(n_seeds: int = 400, record: str | None = None) -> int:
    t_start = time.time()
    if not REFERENCE_DIR.is_dir() or shutil.which("gcc") is None:
        print("reference sources or gcc unavailable; nothing to soak against")
        return 2
    build = Path(tempfile.mkdtemp(prefix="refsoak"))
    shutil.copytree(REFERENCE_DIR / "src", build / "src")
    shutil.copy(REFERENCE_DIR / "Makefile", build / "Makefile")
    subprocess.run(["make", "-s"], cwd=build, check=True, timeout=120)
    binary = build / "aad"
    work = build / "work"
    work.mkdir()

    def _shed_jit_maps() -> None:
        # Random geometries mean every JAX oracle seed compiles fresh shapes;
        # live JIT code mappings accumulate and a long soak in one process
        # can hit the kernel vm.max_map_count ceiling (65530 — the same
        # failure mode tests/conftest.py guards against). Shed executables
        # periodically; functools-cached probe results survive.
        try:
            with open("/proc/self/maps") as f:
                high = sum(1 for _ in f) > 40_000
        except OSError:
            return
        if high:
            import gc

            import jax

            jax.clear_caches()
            gc.collect()

    bad = 0
    counts = {"native": 0, "scan": 0, "fused": 0}
    for seed in range(n_seeds):
        if seed % JAX_EVERY == 0:
            _shed_jit_maps()
        rng = np.random.default_rng(50_000 + seed)
        nch = int(rng.integers(1, 3))
        bps = int(rng.integers(2, 5))
        mbs = int(rng.integers(40 * nch, 1200))
        ms = int(rng.integers(0, 2)) if nch == 2 else 0
        trials = int(rng.integers(0, 3))
        cfg = EncodeConfig(
            num_channels=nch, sampling_rate=8000, bits_per_sample=bps,
            max_block_size=mbs, ch_process_method=ms,
            num_encode_trials=trials,
        )
        nspb = cfg.geometry().num_samples_per_block
        n = int(rng.integers(1, 5 * nspb + 2))
        # mix full-scale noise (the wrapped-square accumulator regime —
        # docs/DESIGN.md §3 exact-RMSE selection) with quieter signals
        scale = [32768, 32768, 8192, 512][seed % 4]
        pcm = rng.integers(-scale, scale, (nch, n)).astype(np.int32)

        ours = native.encode(pcm, cfg)
        counts["native"] += 1
        wav = work / f"s{seed}.wav"
        write_pcm16_wav(wav, pcm, 8000)
        ref = reference_encode(binary, wav, work / f"s{seed}.aad", bps=bps,
                               block=mbs, trials=trials, ms=ms == 1)
        if ours != ref:
            bad += 1
            print(f"ENCODE DIVERGENCE seed={seed} cfg={cfg}")
            continue
        _, dec = native.decode(ours)
        ref_wav = reference_decode(binary, work / f"s{seed}.aad",
                                   work / f"s{seed}_dec.wav")
        _, ref_pcm = read_wav(str(ref_wav))
        if not np.array_equal(np.asarray(dec), ref_pcm >> 16):
            bad += 1
            print(f"DECODE DIVERGENCE seed={seed} cfg={cfg}")
            continue

        # direct JAX-engine oracle seeds: reference binary on one side,
        # the scan engines (no native in the loop) on the other
        if seed % JAX_EVERY == 0:
            counts["scan"] += 1
            jenc = jax_encode(pcm, cfg, engine="scan")
            if jenc != ref:
                bad += 1
                print(f"JAX-ENCODE DIVERGENCE seed={seed} cfg={cfg}")
                continue
            _, jdec = jax_decode(ref, engine="scan")
            if not np.array_equal(np.asarray(jdec), ref_pcm >> 16):
                bad += 1
                print(f"JAX-DECODE DIVERGENCE seed={seed} cfg={cfg}")
                continue
        if seed % FUSED_EVERY == 0:
            counts["fused"] += 1
            _, fdec = jax_decode(ref, engine="fused")
            if not np.array_equal(np.asarray(fdec), ref_pcm >> 16):
                bad += 1
                print(f"FUSED-DECODE DIVERGENCE seed={seed} cfg={cfg}")
                continue

        # block-parallel conformance: the framework's own mode must emit a
        # stream the REFERENCE decoder accepts and that our decoder reads
        # identically (the "every block a stream head" validity claim,
        # reference: src/aad_decoder.c:363-380 per-block state load)
        cb = int(rng.integers(1, 4))
        wp = int(rng.integers(0, 3))
        par = native.encode_parallel(pcm, cfg, chunk_blocks=cb,
                                     warm_passes=wp)
        (work / f"p{seed}.aad").write_bytes(par)
        ref_pwav = reference_decode(binary, work / f"p{seed}.aad",
                                    work / f"p{seed}_dec.wav")
        _, ref_ppcm = read_wav(str(ref_pwav))
        _, pdec = native.decode(par)
        if not np.array_equal(np.asarray(pdec), ref_ppcm >> 16):
            bad += 1
            print(f"PARALLEL-STREAM DIVERGENCE seed={seed} c={cb} wp={wp} "
                  f"cfg={cfg}")
        for f in work.iterdir():
            f.unlink()
        if (seed + 1) % 50 == 0:
            print(f"{seed + 1}/{n_seeds} ok so far (divergences: {bad})",
                  flush=True)

    print(
        f"soak done: {n_seeds} seeds, {bad} divergences; per-engine seeds: "
        f"native={counts['native']} scan={counts['scan']} "
        f"fused={counts['fused']} (scan/fused compared DIRECTLY against the "
        f"reference binary)"
    )
    if record:
        Path(record).write_text(json.dumps({
            "seeds": n_seeds,
            "divergences": bad,
            "engine_seeds": counts,
            "seconds": round(time.time() - t_start, 1),
            "ok": bad == 0,
        }, indent=1) + "\n")
    return 1 if bad else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    rec = None
    if "--record" in argv:
        i = argv.index("--record")
        rec = argv[i + 1]
        del argv[i : i + 2]
    sys.exit(main(int(argv[0]) if argv else 400, record=rec))
