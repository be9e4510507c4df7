"""Cross-engine equivalence tests (TPU hardware only).

The scan engine is the portable reference implementation (itself pinned
bit-exact to the C reference by the golden suite); these tests pin the Pallas
engines to it. Skipped on the CPU test mesh — run on a TPU host with
JAX_PLATFORMS unset.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs TPU hardware"
)


@requires_tpu
class TestFusedEngine:
    @pytest.mark.parametrize("bps", [2, 3, 4])
    def test_fused_matches_scan(self, bps):
        from aad_tpu.ops.decode import compute_qdiffs, lms_scan
        from aad_tpu.ops.pallas_decode import decode_fused

        rng = np.random.default_rng(0)
        L, T = 1100, 988
        codes = jnp.asarray(rng.integers(0, 2**bps, (L, T)).astype(np.int32))
        si = jnp.asarray(rng.integers(0, 4081, L).astype(np.int32))
        h = jnp.asarray(rng.integers(-32768, 32768, (L, 4)).astype(np.int32))
        w = jnp.asarray(rng.integers(-40000, 40000, (L, 4)).astype(np.int32))
        out_f = np.asarray(decode_fused(codes, si, h, w, bits_per_sample=bps))
        out_s = np.asarray(lms_scan(compute_qdiffs(codes, si, bps), h, w))
        np.testing.assert_array_equal(out_f, out_s)

    def test_lms_pallas_matches_scan(self):
        from aad_tpu.ops.decode import lms_scan
        from aad_tpu.ops.pallas_lms import lms_pallas

        rng = np.random.default_rng(1)
        L, T = 2500, 700
        qd = jnp.asarray(rng.integers(-60000, 60000, (L, T)).astype(np.int32))
        h = jnp.asarray(rng.integers(-32768, 32768, (L, 4)).astype(np.int32))
        w = jnp.asarray(rng.integers(-40000, 40000, (L, 4)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(lms_pallas(qd, h, w)), np.asarray(lms_scan(qd, h, w))
        )

    def test_stepsize_formula_exhaustive(self):
        """The corrected formula equals the table on every possible slot."""
        from aad_tpu.ops.pallas_decode import stepsize_corrections

        # stepsize_corrections() itself diffs the probe against the table;
        # here we assert the correction set is small and well-formed.
        corr = stepsize_corrections()
        assert len(corr) <= 8
        for slot, delta in corr:
            assert 0 <= slot < 256 and abs(delta) <= 2

    def test_golden_decode_fused(self, fixture_dir):
        """Bit-exact fused-engine decode of the stereo golden fixture."""
        from aad_tpu import decode
        from aad_tpu.format.wav import read_wav

        data = (fixture_dir / "sin300Hz.aad").read_bytes()
        _, pcm = decode(data, engine="fused")
        _, golden = read_wav(str(fixture_dir / "sin300Hz_decoded.wav"))
        np.testing.assert_array_equal(pcm, golden >> 16)


@requires_tpu
@pytest.mark.parametrize("bps", [2, 3, 4])
def test_real_audio_grid_pallas_engines(fixture_dir, bps):
    """Real audio through the hardware Pallas engines, byte-exact vs native.

    Encode via the Pallas trial-search kernel and decode via the fused
    wire32 kernel on the real chip; both must match the native engine
    (itself byte-exact vs the reference binary). Mirrors the reference's
    corpus grid (reference: test/test_aad_encode_decode.c:492-636).
    """
    from aad_tpu import decode, native
    from aad_tpu.codec.encoder import EncodeConfig, encode
    from aad_tpu.format.wav import read_wav

    fmt, pcm32 = read_wav(str(fixture_dir / "bunny1.wav"))
    pcm = (pcm32 >> 16).astype(np.int32)
    cfg = EncodeConfig(
        num_channels=fmt.num_channels,
        sampling_rate=fmt.sampling_rate,
        bits_per_sample=bps,
        max_block_size=1024,
    )
    want = native.encode(pcm, cfg)
    got = encode(pcm, cfg, engine="pallas")
    assert got == want, f"bps={bps}: pallas-encode bytes differ"

    _, out_native = native.decode(want)
    _, out = decode(want, engine="fused")
    np.testing.assert_array_equal(out_native, np.asarray(out))


@requires_tpu
def test_scale_smoke():
    """A 10-minute stereo stream decodes in one device program."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import bench as B_mod  # repo-root bench module doubles as a generator
    from aad_tpu import FILE_HEADER_SIZE, decode_header
    from aad_tpu.codec.decoder import Decoder

    data, _ = B_mod.build_synthetic_stream(48000 * 600)
    header = decode_header(data)
    dec = Decoder.from_header(header, engine="fused")
    payload = np.frombuffer(data, dtype=np.uint8)[FILE_HEADER_SIZE:]
    pcm = np.asarray(dec.decode_payload_ondevice(payload))
    assert pcm.shape == (2, header.num_samples)
    assert pcm.min() >= -32768 and pcm.max() <= 32767


@requires_tpu
def test_overlap_pipeline_bit_exact_on_hardware():
    """The chunked transfer-overlap schedule (docs/DESIGN.md §2b) must be
    bit-identical to the single-dispatch whole-stream path on real hardware,
    where copy_to_host_async actually streams through the tunnel (the CPU
    suite pins the same property in interpret mode:
    tests/test_decode_golden.py::TestOverlapPipeline). Block independence
    is what makes chunk boundaries free (reference: src/aad_decoder.c:363-380).
    """
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import bench as B_mod
    from aad_tpu import FILE_HEADER_SIZE, decode_header
    from aad_tpu.codec.decoder import Decoder

    data, _ = B_mod.build_synthetic_stream(48000 * 40)
    header = decode_header(data)
    dec = Decoder.from_header(header, engine="fused")
    payload = np.frombuffer(data, dtype=np.uint8)[FILE_HEADER_SIZE:]
    whole = np.asarray(dec.decode_payload_ondevice(payload, overlap_blocks=0))
    auto = np.asarray(dec.decode_payload_ondevice(payload))
    np.testing.assert_array_equal(whole, auto)
    ragged = np.asarray(
        dec.decode_payload_ondevice(payload, overlap_blocks=512)
    )
    np.testing.assert_array_equal(whole, ragged)


@requires_tpu
class TestCompiledRandomGeometry:
    """Random soak-style geometries through the COMPILED kernels on the
    chip, with the reference binary as oracle (VERDICT round 4, item 4).

    The CPU soak drives the fused engines in interpret mode only, and the
    hardware suites pin fixed geometries — a Mosaic compilation quirk at
    an odd nspb / W_CHUNK combination would slip past both. Seeds are
    FIXED so the persistent compilation cache keeps reruns cheap; the
    seed base (70_000) is disjoint from the suite's (1000+) and the
    soak's (50_000+).
    """

    @pytest.mark.parametrize("seed", range(6))
    def test_fuzz_both_directions_vs_reference(
        self, seed, reference_cli, tmp_path
    ):
        import sys
        import pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).parent))
        from util import reference_decode, reference_encode, write_pcm16_wav

        from aad_tpu import decode
        from aad_tpu.codec.encoder import EncodeConfig, encode
        from aad_tpu.format.wav import read_wav

        rng = np.random.default_rng(70_000 + seed)
        nch = int(rng.integers(1, 3))
        bps = int(rng.integers(2, 5))
        mbs = int(rng.integers(40 * nch, 1500))
        ms = int(rng.integers(0, 2)) if nch == 2 else 0
        trials = int(rng.integers(0, 5))
        cfg = EncodeConfig(
            num_channels=nch, sampling_rate=8000, bits_per_sample=bps,
            max_block_size=mbs, ch_process_method=ms,
            num_encode_trials=trials,
        )
        nspb = cfg.geometry().num_samples_per_block
        n = int(rng.integers(1, 5 * nspb + 2))
        pcm = rng.integers(-32768, 32768, (nch, n)).astype(np.int32)

        wav = tmp_path / "in.wav"
        write_pcm16_wav(wav, pcm, 8000)
        ref = reference_encode(
            reference_cli, wav, tmp_path / "ref.aad", bps=bps, block=mbs,
            trials=trials, ms=ms == 1,
        )
        # compiled pallas encode == reference bytes
        assert encode(pcm, cfg, engine="pallas") == ref, (
            f"compiled encode diverged: seed={seed} cfg={cfg}"
        )
        # compiled fused decode == reference binary's decode
        _, got = decode(ref, engine="fused")
        ref_wav = reference_decode(
            reference_cli, tmp_path / "ref.aad", tmp_path / "dec.wav"
        )
        _, want = read_wav(str(ref_wav))
        np.testing.assert_array_equal(np.asarray(got), want >> 16)


@requires_tpu
def test_hour_scale_stream_device_decode():
    """A ~1-hour stereo stream decodes through the chunked-overlap device
    path, bit-identical to the native host engine (VERDICT round 4,
    item 8; SURVEY §7.3's motivating scale: >= 3x10^8 samples, ~350k
    blocks, reference block loop src/aad_decoder.c:514-534). The overlap
    schedule's paste arithmetic, the shape bucketing and the wire-word
    row slicing all cross the 2^31-byte-index neighbourhood here, which
    no smaller case exercises.
    """
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import bench as B_mod
    from aad_tpu import FILE_HEADER_SIZE, decode_header, native
    from aad_tpu.codec.decoder import Decoder

    data, _ = B_mod.build_synthetic_stream(48000 * 3600)
    header = decode_header(data)
    assert header.num_samples * header.num_channels >= 3 * 10**8
    dec = Decoder.from_header(header, engine="fused")
    payload = np.frombuffer(data, dtype=np.uint8)[FILE_HEADER_SIZE:]
    pcm = np.asarray(dec.decode_payload_ondevice(payload))
    assert pcm.shape == (2, header.num_samples)
    if native.available():
        _, want = native.decode(data)
        np.testing.assert_array_equal(pcm, want.astype(np.int16))


@requires_tpu
def test_fused_compiled_u16_ceiling_geometry():
    """The compiled fused decoder at the block-size wire field's u16
    ceiling (65535 -> stereo block_size 65534, nspb 65502): the chunked
    HBM-streaming DMA path at a six-figure nspb no grid cell reaches.
    Oracle: the native engine (itself pinned to the reference binary at
    this exact geometry by tests/test_native.py::TestWireCeilingGeometry).
    """
    from aad_tpu import decode, native
    from aad_tpu.codec.encoder import EncodeConfig

    if not native.available():
        pytest.skip("native oracle unavailable")
    cfg = EncodeConfig(
        num_channels=2, sampling_rate=8000, bits_per_sample=4,
        max_block_size=65535,
    )
    nspb = cfg.geometry().num_samples_per_block
    rng = np.random.default_rng(1)
    pcm = rng.integers(-32768, 32768, (2, nspb + nspb // 2)).astype(np.int32)
    data = native.encode(pcm, cfg)
    _, want = native.decode(data)
    _, got = decode(data, engine="fused")
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int16))
