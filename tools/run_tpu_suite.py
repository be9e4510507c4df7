"""Run the TPU hardware test suites and record the result per round.

Runs tests/test_engines_tpu.py and tests/test_encode_engine_tpu.py with
AAD_TPU_TEST_PLATFORM=tpu (each file in its own pytest process — the
tunnel-attached chip serialises poorly across modules) and writes
TPUSUITE_r{N}.json ``{"round", "passed", "failed", "seconds", "files",
"ok"}`` at the repo root, closing the audit gap the round-3 review flagged:
BENCH/MULTICHIP artifacts exercise the pipelines but not the hardware test
assertions. Mirrors the reference CI's `make run` discipline (reference:
.github/workflows/c-cpp.yml).

Usage: python tools/run_tpu_suite.py [round_number]
"""
import json
import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO / "tools"))

from run_full_grid import current_round, run_pytest  # noqa: E402

FILES = [
    "tests/test_engines_tpu.py",
    "tests/test_encode_engine_tpu.py",
]


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else current_round()
    env = dict(os.environ)
    env["AAD_TPU_TEST_PLATFORM"] = "tpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aad_tpu_hw_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    # Count the compiled random-geometry differential cases so the record
    # carries an explicit fuzz-seed number (VERDICT r4 item 4).
    import subprocess

    col = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_engines_tpu.py",
         "-k", "TestCompiledRandomGeometry", "--collect-only", "-q"],
        cwd=_REPO, env=env, capture_output=True, text=True,
    )
    # null in the record = collection itself failed (the count would be a
    # silent 0 misstating coverage); the suite run below still decides ok.
    fuzz_seeds = (
        col.stdout.count("::TestCompiledRandomGeometry::")
        if col.returncode == 0 else None
    )
    total_p = total_f = 0
    total_s = 0.0
    per_file = {}
    for f in FILES:
        passed, failed, secs, tail = run_pytest([f], env)
        per_file[f] = {"passed": passed, "failed": failed,
                       "seconds": round(secs, 1)}
        total_p += passed
        total_f += failed if failed > 0 else (0 if failed == 0 else 1)
        total_s += secs
        print(f"{f}: {passed} passed, {failed} failed in {secs:.0f}s")
        if failed:
            print(tail)
    record = {
        "round": rnd,
        "passed": total_p,
        "failed": total_f,
        "fuzz_seeds": fuzz_seeds,
        "seconds": round(total_s, 1),
        "files": per_file,
        "ok": total_f == 0 and total_p > 0,
    }
    (_REPO / f"TPUSUITE_r{rnd:02d}.json").write_text(
        json.dumps(record, indent=1) + "\n"
    )
    print(json.dumps(record))
    return 0 if record["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
