"""CLI conformance: our six modes vs the reference binary's behaviour."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from aad_tpu.format.wav import read_wav

from util import sine, write_pcm16_wav

_CACHE_DIR = os.path.join(tempfile.gettempdir(), "aad_tpu_test_jit_cache")


def run_cli(args, **kw):
    env = dict(os.environ)
    # Share compiled executables across CLI subprocesses.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    return subprocess.run(
        [sys.executable, "-m", "aad_tpu.cli", *args],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo", env=env, **kw,
    )


@pytest.fixture(scope="module")
def short_wav(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "in.wav"
    write_pcm16_wav(p, sine(2500, 1, rate=44100), 44100)
    return p


class TestModes:
    def test_encode_decode_roundtrip(self, short_wav, tmp_path, reference_cli):
        aad = tmp_path / "out.aad"
        r = run_cli(["-e", "-s", "256", str(short_wav), str(aad)])
        assert r.returncode == 0, r.stderr
        # byte-exact vs reference encoder
        ref_aad = tmp_path / "ref.aad"
        subprocess.run([str(reference_cli), "-e", "-s", "256",
                        str(short_wav), str(ref_aad)], check=True)
        assert aad.read_bytes() == ref_aad.read_bytes()

        wav_out = tmp_path / "out.wav"
        r = run_cli(["-d", str(aad), str(wav_out)])
        assert r.returncode == 0, r.stderr
        ref_wav = tmp_path / "ref.wav"
        subprocess.run([str(reference_cli), "-d", str(ref_aad), str(ref_wav)],
                       check=True)
        _, ours = read_wav(str(wav_out))
        _, refs = read_wav(str(ref_wav))
        np.testing.assert_array_equal(ours, refs)

    def test_reconstruct(self, short_wav, tmp_path, reference_cli):
        out = tmp_path / "rec.wav"
        assert run_cli(["-r", "-s", "256", str(short_wav), str(out)]).returncode == 0
        ref = tmp_path / "rec_ref.wav"
        subprocess.run([str(reference_cli), "-r", "-s", "256",
                        str(short_wav), str(ref)], check=True)
        _, ours = read_wav(str(out))
        _, refs = read_wav(str(ref))
        np.testing.assert_array_equal(ours, refs)

    def test_gap(self, short_wav, tmp_path, reference_cli):
        out = tmp_path / "gap.wav"
        assert run_cli(["-g", "-s", "256", str(short_wav), str(out)]).returncode == 0
        ref = tmp_path / "gap_ref.wav"
        subprocess.run([str(reference_cli), "-g", "-s", "256",
                        str(short_wav), str(ref)], check=True)
        _, ours = read_wav(str(out))
        _, refs = read_wav(str(ref))
        np.testing.assert_array_equal(ours, refs)

    def test_calculate(self, short_wav, reference_cli):
        r = run_cli(["-c", "-s", "256", str(short_wav)])
        assert r.returncode == 0, r.stderr
        ref = subprocess.run([str(reference_cli), "-c", "-s", "256",
                              str(short_wav)], capture_output=True, text=True)
        # identical statistics line (both print %f-formatted doubles)
        assert r.stdout.strip() == ref.stdout.strip()

    def test_information(self, short_wav, tmp_path, reference_cli):
        aad = tmp_path / "i.aad"
        subprocess.run([str(reference_cli), "-e", str(short_wav), str(aad)],
                       check=True)
        r = run_cli(["-i", str(aad)])
        ref = subprocess.run([str(reference_cli), "-i", str(aad)],
                             capture_output=True, text=True)
        assert r.returncode == 0
        assert r.stdout == ref.stdout


def _norm(text: str, prog: str) -> str:
    return text.replace(prog, "PROG")


def _compare_to_reference(reference_cli, argv):
    """Run both CLIs; stdout/stderr/rc must match after argv0 rewriting."""
    ref = subprocess.run(
        [str(reference_cli), *argv], capture_output=True, text=True
    )
    ours = run_cli(argv)
    prog_ours = os.path.join("/root/repo", "aad_tpu", "cli.py")
    assert ours.returncode == ref.returncode, (argv, ours.stderr, ref.stderr)
    assert _norm(ours.stdout, prog_ours) == _norm(ref.stdout, str(reference_cli))
    assert _norm(ours.stderr, prog_ours) == _norm(ref.stderr, str(reference_cli))


class TestErrors:
    """Error paths and metadata output, byte-compared to the reference
    binary (reference: src/main.c:518-626, src/command_line_parser.c)."""

    @pytest.mark.parametrize("argv", [
        [],                      # bare usage + hint
        ["-h"],                  # full help listing
        ["--help"],
        ["-v"],                  # version line
        ["in.wav", "x"],         # no mode
        ["-e", "-d", "in.wav", "x"],   # two modes
        ["-e"],                  # missing input
        ["-e", "in.wav"],        # missing output (file-open comes later)
        ["-e", "-e", "a", "b"],  # duplicate short option
        ["--encode", "--encode", "a", "b"],  # duplicate long option
        ["-z", "a", "b"],        # unknown short
        ["--zzz", "a", "b"],     # unknown long
        ["-e", "-b"],            # option needs argument (at end)
        ["-e", "-b", "-m", "a", "b"],  # option argument looks like a flag
        ["-be", "4", "a", "b"],  # arg option not at cluster tail
        ["a", "b", "c", "-e"],   # too many strings
    ])
    def test_matches_reference(self, reference_cli, argv):
        _compare_to_reference(reference_cli, argv)

    def test_missing_input_file(self, tmp_path):
        r = run_cli(["-d", str(tmp_path / "none.aad"), str(tmp_path / "o.wav")])
        assert r.returncode == 1
        assert r.stderr.startswith("Failed to open ")

    def test_bad_input_files_match_reference(
        self, reference_cli, short_wav, tmp_path
    ):
        """Per-site file diagnostics: WAV open/parse failures, short reads,
        header-parse and body-decode failures, each with the reference's
        exact message and API result value (reference: src/main.c:76-78,
        :93-111, :156-160, :238-257, :359-363)."""
        import struct

        aad = tmp_path / "probe.aad"
        subprocess.run(
            [str(reference_cli), "-e", str(short_wav), str(aad)], check=True
        )
        good = aad.read_bytes()
        notwav = tmp_path / "notwav.bin"      # parses as neither WAV nor AAD
        notwav.write_bytes(b"\x01" * 64)
        shortf = tmp_path / "short.bin"       # < AAD header size
        shortf.write_bytes(b"XY")
        badver = tmp_path / "badver.aad"      # signature ok, version pinned out
        badver.write_bytes(
            good[:8] + struct.pack(">I", 99) + good[12:]
        )
        out = str(tmp_path / "o.tmp")
        cases = [
            ["-e", str(notwav), out],          # Failed to open (WAV parse)
            ["-r", str(notwav), out],
            ["-g", str(notwav), out],
            ["-c", str(notwav)],
            ["-d", str(notwav), out],          # Failed to read header: 2
            ["-i", str(notwav)],               # Failed to read header: 2
            ["-d", str(shortf), out],          # Failed to read header: 4
            ["-i", str(shortf)],               # Failed to read from
            ["-d", str(badver), out],          # Failed to decode: 2
            ["-i", str(badver)],               # info ignores versions: rc 0
            ["-e", str(tmp_path / "none.wav"), out],   # Failed to open
            ["-d", str(tmp_path / "none.aad"), out],
            ["-i", str(tmp_path / "none.aad")],
            ["-e", "-b", "9", str(short_wav), out],    # encode parameter
            ["-c", "-s", "17", str(short_wav)],
            # output fopen failure (no period in this one, src/main.c:208)
            ["-e", str(short_wav), "/nonexistent_dir/x.aad"],
        ]
        for argv in cases:
            _compare_to_reference(reference_cli, argv)

    def test_unwritable_wav_output_fails_loudly(self, reference_cli,
                                                short_wav, tmp_path):
        """Intentional divergence (PARITY.md): the reference ignores
        WAV_WriteToFile's result and exits 0 having written nothing
        (src/main.c:129, :400); we fail with the open diagnostic."""
        aad = tmp_path / "w.aad"
        subprocess.run(
            [str(reference_cli), "-e", str(short_wav), str(aad)], check=True
        )
        r = run_cli(["-d", str(aad), "/nonexistent_dir/x.wav"])
        assert r.returncode == 1
        assert r.stderr == "Failed to open /nonexistent_dir/x.wav. \n"
        # every OSError class gets the diagnostic, not a traceback
        # (IsADirectoryError here — permission errors don't bite as root)
        r = run_cli(["-d", str(aad), str(tmp_path)])
        assert r.returncode == 1
        assert r.stderr == f"Failed to open {tmp_path}. \n"

    @pytest.mark.skipif(not os.path.exists("/dev/full"),
                        reason="/dev/full unavailable")
    def test_midwrite_failure_reports_write_not_open(self, reference_cli,
                                                     short_wav, tmp_path):
        """A failure AFTER a successful open (ENOSPC on /dev/full) must
        report a write failure with the errno text, not 'Failed to open'."""
        aad = tmp_path / "w.aad"
        subprocess.run(
            [str(reference_cli), "-e", str(short_wav), str(aad)], check=True
        )
        r = run_cli(["-d", str(aad), "/dev/full"])
        assert r.returncode == 1
        assert r.stderr.startswith("Failed to write /dev/full: ")
        assert "No space left" in r.stderr

    def test_lenient_decode_env_var(self, reference_cli, short_wav, tmp_path):
        """AAD_TPU_STRICT=0 reproduces the reference's decode-what's-there
        CLI behaviour on a truncated stream (reference: src/main.c:102-111
        writes the full-length buffer regardless)."""
        aad = tmp_path / "full.aad"
        subprocess.run(
            [str(reference_cli), "-e", "-s", "256", str(short_wav), str(aad)],
            check=True,
        )
        data = aad.read_bytes()
        trunc = tmp_path / "trunc.aad"
        trunc.write_bytes(data[: 31 + 3 * 256 + 40])  # 3 whole blocks + a cut
        out = tmp_path / "lenient.wav"
        # strict default: typed failure, reference message
        r = run_cli(["-d", str(trunc), str(out)])
        assert r.returncode == 1
        assert r.stderr == "Failed to decode. API result: 4 \n"
        # lenient: full-length output, decoded prefix matches the full decode
        env = dict(os.environ, AAD_TPU_STRICT="0")
        r = subprocess.run(
            [sys.executable, "-m", "aad_tpu.cli", "-d", str(trunc), str(out)],
            capture_output=True, text=True, timeout=600, cwd="/root/repo",
            env=env,
        )
        assert r.returncode == 0, r.stderr
        full = tmp_path / "full.wav"
        assert run_cli(["-d", str(aad), str(full)]).returncode == 0
        _, lenient_pcm = read_wav(str(out))
        _, full_pcm = read_wav(str(full))
        assert lenient_pcm.shape == full_pcm.shape
        # whole blocks decode exactly; the cut block decodes its present
        # prefix with zero codes thereafter (documented lenient semantics),
        # and fully-missing blocks are zero
        from aad_tpu.format.header import decode_header

        nspb = decode_header(data[:31]).num_samples_per_block
        np.testing.assert_array_equal(
            lenient_pcm[:, : 3 * nspb], full_pcm[:, : 3 * nspb]
        )
        assert np.any(lenient_pcm[:, : 3 * nspb] != 0)
        assert np.all(lenient_pcm[:, 5 * nspb :] == 0)

    def test_version(self):
        r = run_cli(["-v"])
        assert r.returncode == 0 and "Version" in r.stdout

    def test_uint8_trials_truncation(self, reference_cli, short_wav, tmp_path):
        """-t 300 must behave as -t 44 (uint8 cast, reference:
        src/main.c:586-588 via src/aad_encoder.h:14)."""
        a = tmp_path / "t300.aad"
        b = tmp_path / "t44.aad"
        assert run_cli(["-e", "-t", "300", str(short_wav), str(a)]).returncode == 0
        assert run_cli(["-e", "-t", "44", str(short_wav), str(b)]).returncode == 0
        assert a.read_bytes() == b.read_bytes()
        ref = tmp_path / "ref300.aad"
        subprocess.run([str(reference_cli), "-e", "-t", "300",
                        str(short_wav), str(ref)], check=True)
        assert a.read_bytes() == ref.read_bytes()
