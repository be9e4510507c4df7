"""Pallas encode engine equivalence (TPU hardware only).

Run with AAD_TPU_TEST_PLATFORM=tpu on a TPU host.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs TPU hardware"
)


@requires_tpu
class TestPallasEncode:
    @pytest.mark.parametrize("bps", [2, 3, 4])
    def test_matches_scan_with_trials_and_ragged_tail(self, bps):
        from aad_tpu.ops.encode import encode_stream_blocks

        rng = np.random.default_rng(0)
        B, C, nspb = 4, 2, 252
        n = B * C * nspb
        sig = (9000 * np.sin(np.arange(n) / 17)
               + rng.integers(-2000, 2000, n)).astype(np.int32)
        blocks = jnp.asarray(sig.reshape(B, C, nspb))
        valid = np.full(B, nspb, dtype=np.int32)
        valid[-1] = nspb - 9
        jv = jnp.asarray(valid)
        h_s, c_s = encode_stream_blocks(blocks, jv, bps, 2, engine="scan")
        h_p, c_p = encode_stream_blocks(blocks, jv, bps, 2, engine="pallas")
        np.testing.assert_array_equal(np.asarray(c_s), np.asarray(c_p))
        for a, b in zip(h_s, h_p):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_full_encoder_golden_fixture(self, fixture_dir):
        """Device Pallas encode of the mono fixture == checked-in golden."""
        from aad_tpu.codec.encoder import EncodeConfig, Encoder
        from aad_tpu.format.wav import read_wav

        fmt, pcm32 = read_wav(str(fixture_dir / "sin300Hz_mono.wav"))
        pcm = (pcm32 >> 16).astype(np.int32)
        enc = Encoder.from_config(
            EncodeConfig(num_channels=1, sampling_rate=fmt.sampling_rate),
            engine="pallas",
        )
        assert enc.encode(pcm) == (fixture_dir / "sin300Hz_mono.aad").read_bytes()

    def test_stream_batch_lanes(self):
        """Lockstep multi-stream lanes encode identically to per-stream."""
        from aad_tpu.ops.encode import encode_stream_blocks

        rng = np.random.default_rng(1)
        S, B, C, nspb = 3, 3, 2, 124
        blocks = jnp.asarray(
            rng.integers(-20000, 20000, (B, S, C, nspb)).astype(np.int32)
        )
        valid = jnp.full(B, nspb, dtype=jnp.int32)
        h_all, c_all = encode_stream_blocks(blocks, valid, 4, 1, engine="pallas")
        for s in range(S):
            h_one, c_one = encode_stream_blocks(
                blocks[:, s], valid, 4, 1, engine="scan"
            )
            np.testing.assert_array_equal(np.asarray(c_all[:, s]), np.asarray(c_one))
            np.testing.assert_array_equal(
                np.asarray(h_all.step_index[:, s]), np.asarray(h_one.step_index)
            )


@requires_tpu
class TestFusedEncodeKernel:
    """Single-execution whole-stream encode kernel (ops/pallas_encode_fused)."""

    @pytest.mark.parametrize(
        "bps,trials",
        [(4, 2), (3, 1), (2, 2), (4, 0),
         # deep searches: the 2N-slot schedule compiled on the chip at
         # N>2 (the interpret suite pins 4/8 on CPU; VERDICT r4 item 2)
         (4, 8)],
    )
    def test_matches_scan(self, bps, trials):
        from aad_tpu.ops.encode import encode_stream_blocks_carry
        from aad_tpu.ops.pallas_encode_fused import encode_stream_fused

        rng = np.random.default_rng(0)
        B, C, nspb = 4, 2, 252
        n = B * C * nspb
        sig = (9000 * np.sin(np.arange(n) / 17)
               + rng.integers(-2000, 2000, n)).astype(np.int32)
        blocks = jnp.asarray(sig.reshape(B, C, nspb))
        valid = np.full(B, nspb, dtype=np.int32)
        valid[-1] = nspb - 9
        jv = jnp.asarray(valid)
        h_s, c_s, k_s = encode_stream_blocks_carry(blocks, jv, bps, trials,
                                                   engine="scan")
        h_f, c_f, k_f = encode_stream_fused(blocks, jv, bps, trials)
        np.testing.assert_array_equal(np.asarray(c_s), np.asarray(c_f))
        for a, b in zip(h_s, h_f):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(k_s[0], k_f[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_streaming_carry_chains(self):
        """Two fused chunks == one fused whole (carry round trip)."""
        from aad_tpu.ops.pallas_encode_fused import encode_stream_fused

        rng = np.random.default_rng(1)
        B, C, nspb = 6, 2, 124
        blocks = jnp.asarray(
            rng.integers(-20000, 20000, (B, C, nspb)).astype(np.int32)
        )
        valid = jnp.full(B, nspb, dtype=jnp.int32)
        h_all, c_all, _ = encode_stream_fused(blocks, valid, 4, 2)
        h1, c1, carry = encode_stream_fused(blocks[:3], valid[:3], 4, 2)
        h2, c2, _ = encode_stream_fused(
            blocks[3:], valid[3:], 4, 2, carry=carry, blocks_before=3
        )
        np.testing.assert_array_equal(
            np.asarray(c_all), np.concatenate([np.asarray(c1), np.asarray(c2)])
        )
        np.testing.assert_array_equal(
            np.asarray(h_all.step_index),
            np.concatenate([np.asarray(h1.step_index), np.asarray(h2.step_index)]),
        )


@requires_tpu
class TestParallelEncodeTPU:
    """Block-independent parallel mode on hardware (warm_on_prev=False
    kernel specialisation: prev-block inputs dropped, trial-1 reuse)."""

    @pytest.mark.parametrize("bps,trials", [(4, 2), (3, 1), (2, 0)])
    def test_matches_scan(self, bps, trials):
        from aad_tpu.ops.encode import encode_blocks_parallel
        from aad_tpu.ops.wire32 import kernel_words_to_codes

        rng = np.random.default_rng(3)
        B, C, nspb = 5, 2, 252
        n = B * C * nspb
        sig = (9000 * np.sin(np.arange(n) / 17)
               + rng.integers(-2000, 2000, n)).astype(np.int32)
        blocks = jnp.asarray(sig.reshape(B, C, nspb))
        valid = np.full(B, nspb, dtype=np.int32)
        valid[-1] = nspb - 9
        jv = jnp.asarray(valid)
        h_s, w_s = encode_blocks_parallel(blocks, jv, bps, trials,
                                          engine="scan")
        h_p, w_p = encode_blocks_parallel(blocks, jv, bps, trials,
                                          engine="pallas")
        T = nspb - 4
        np.testing.assert_array_equal(
            np.asarray(kernel_words_to_codes(w_s, T)),
            np.asarray(kernel_words_to_codes(w_p, T)),
        )
        for a, b in zip(h_s, h_p):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_full_parallel_encoder_bytes(self):
        """End-to-end parallel Encoder bytes: hardware Pallas == scan."""
        from aad_tpu.codec.encoder import EncodeConfig, encode

        cfg = EncodeConfig(num_channels=2, sampling_rate=48000)
        nspb = cfg.geometry().num_samples_per_block
        n = 5 * nspb + 133
        rng = np.random.default_rng(7)
        t = np.arange(n)
        pcm = np.clip(
            8000 * np.sin(t / 9.0)[None, :] + rng.integers(-400, 400, (2, n)),
            -32768, 32767,
        ).astype(np.int32)
        a = encode(pcm, cfg, engine="pallas", parallel_blocks=True)
        b = encode(pcm, cfg, engine="scan", parallel_blocks=True)
        assert a == b

    def test_chunked_warm_parallel_bytes(self):
        """Chunked + Jacobi-warm parallel encode bytes: hardware == scan."""
        from aad_tpu.codec.encoder import EncodeConfig, encode

        cfg = EncodeConfig(num_channels=2, sampling_rate=48000)
        nspb = cfg.geometry().num_samples_per_block
        n = 6 * nspb + 200
        rng = np.random.default_rng(13)
        t = np.arange(n)
        pcm = np.clip(
            9000 * np.sin(t / 11.0)[None, :] + rng.integers(-300, 300, (2, n)),
            -32768, 32767,
        ).astype(np.int32)
        for kwargs in (
            {"parallel_chunk_blocks": 2, "parallel_warm_passes": 1},
            {"parallel_chunk_blocks": 1, "parallel_warm_passes": 1},
        ):
            a = encode(pcm, cfg, engine="pallas", parallel_blocks=True, **kwargs)
            b = encode(pcm, cfg, engine="scan", parallel_blocks=True, **kwargs)
            assert a == b


@requires_tpu
def test_sequential_overlap_encode_bit_exact_on_hardware(monkeypatch):
    """The round-5 chunked transfer-overlap sequential encode
    (codec/encoder.py::Encoder._encode_sequential_overlap) must emit bytes
    identical to the one-shot pallas path on real hardware, where
    copy_to_host_async and the async carry chain actually pipeline through
    the tunnel (the CPU suite pins the same property in interpret mode:
    test_pallas_interpret.py::test_sequential_overlap_encode_matches_scan).
    Cross-checked against the native host engine so the pallas pair cannot
    share a bug.
    """
    import aad_tpu.codec.encoder as enc_mod
    from aad_tpu import native
    from aad_tpu.codec.encoder import EncodeConfig, encode

    cfg = EncodeConfig(num_channels=2, sampling_rate=48000)
    nspb = cfg.geometry().num_samples_per_block
    n = 900 * nspb - 123  # > _OVERLAP_MIN_BLOCKS blocks, ragged tail
    rng = np.random.default_rng(11)
    pcm = rng.integers(-32768, 32768, (2, n)).astype(np.int32)

    overlapped = encode(pcm, cfg, engine="pallas")
    monkeypatch.setattr(enc_mod, "_OVERLAP_MIN_BLOCKS", 10**9)
    oneshot = encode(pcm, cfg, engine="pallas")
    assert overlapped == oneshot
    if native.available():
        assert native.encode(pcm, cfg) == oneshot


@requires_tpu
class TestOverlapEncodeRandomGeometry:
    """The round-5 overlap encode path at random compiled geometries on
    the chip, native engine as oracle (the compiled random-geometry fuzz
    in test_engines_tpu.py stays below the overlap threshold, so this is
    the only randomized coverage of the chunk-carry chain + on-device
    relayout at production chunking). Fixed seeds keep the compilation
    cache warm; seed base 80_000 is disjoint from every other suite."""

    @pytest.mark.parametrize("seed", range(4))
    def test_overlap_matches_native(self, seed):
        import aad_tpu.codec.encoder as enc_mod
        from aad_tpu import native
        from aad_tpu.codec.encoder import EncodeConfig, encode

        if not native.available():
            pytest.skip("native oracle unavailable")
        rng = np.random.default_rng(80_000 + seed)
        nch = int(rng.integers(1, 3))
        bps = int(rng.integers(2, 5))
        mbs = int(rng.integers(40 * nch, 700))
        ms = int(rng.integers(0, 2)) if nch == 2 else 0
        trials = int(rng.integers(0, 3))
        cfg = EncodeConfig(
            num_channels=nch, sampling_rate=8000, bits_per_sample=bps,
            max_block_size=mbs, ch_process_method=ms,
            num_encode_trials=trials,
        )
        nspb = cfg.geometry().num_samples_per_block
        lo = enc_mod._OVERLAP_MIN_BLOCKS
        n = int(rng.integers(lo, 3 * lo)) * nspb - int(rng.integers(0, nspb))
        pcm = rng.integers(-32768, 32768, (nch, n)).astype(np.int32)
        assert encode(pcm, cfg, engine="pallas") == native.encode(pcm, cfg)
