"""Property tests for the functional core (ops/transitions.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aad_tpu.constants import STEP_INDEX_MAX
from aad_tpu.ops.transitions import (
    CodecState,
    decode_sample,
    encode_sample,
    step_index_prefix,
)
from aad_tpu.tables import INDEX_TABLES


class TestStepIndexMonoid:
    """The associative-scan decomposition must equal the sequential
    clipped-add recurrence for any code sequence (SURVEY.md §7.3)."""

    @pytest.mark.parametrize("bps", [2, 3, 4])
    @pytest.mark.parametrize("seed", range(3))
    def test_matches_sequential(self, bps, seed):
        rng = np.random.default_rng(seed)
        T = 257  # odd length exercises unbalanced scan trees
        codes = rng.integers(0, 2**bps, (5, T))
        init = rng.integers(0, STEP_INDEX_MAX + 1, 5)

        got = np.asarray(
            step_index_prefix(jnp.asarray(codes), jnp.asarray(init), bps)
        )

        tab = INDEX_TABLES[bps]
        want = np.zeros_like(got)
        for lane in range(5):
            idx = init[lane]
            for t in range(T):
                want[lane, t] = idx  # index *used by* step t
                idx = min(max(idx + int(tab[codes[lane, t]]), 0), STEP_INDEX_MAX)
        np.testing.assert_array_equal(got, want)

    def test_saturation_extremes(self):
        """Long runs of max-positive / max-negative deltas saturate exactly."""
        bps = 4
        up = np.full((1, 100), 7)     # +256 per step: saturates in 16 steps
        down = np.full((1, 400), 2)   # -14 per step: saturates in 292 steps
        got_up = np.asarray(step_index_prefix(jnp.asarray(up), jnp.asarray([0]), bps))
        assert got_up[0, -1] == STEP_INDEX_MAX  # pinned at ceiling
        got_dn = np.asarray(
            step_index_prefix(jnp.asarray(down), jnp.asarray([STEP_INDEX_MAX]), bps)
        )
        assert got_dn[0, -1] == 0  # pinned at floor


class TestTransitionLockstep:
    """Encoding a sample then decoding its code reproduces the identical
    state trajectory — the property that makes blocks round-trip bit-exactly
    (reference: src/aad_encoder.c:379-407 vs src/aad_decoder.c:284-315)."""

    @pytest.mark.parametrize("bps", [2, 3, 4])
    def test_encode_decode_state_lockstep(self, bps):
        rng = np.random.default_rng(0)
        enc = CodecState.zeros(())
        dec = CodecState.zeros(())
        for sample in rng.integers(-32768, 32768, 200):
            enc, code, _ = encode_sample(enc, jnp.int32(sample), bps)
            dec, out = decode_sample(dec, code, bps)
            np.testing.assert_array_equal(np.asarray(enc.history), np.asarray(dec.history))
            np.testing.assert_array_equal(np.asarray(enc.weight), np.asarray(dec.weight))
            assert int(enc.step_index) == int(dec.step_index)
            # the decoded sample equals the encoder's quantised history head
            assert int(out) == int(enc.history[0])
