"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aad_tpu.parallel.sharded import (
    decode_blocks_sharded,
    encode_streams_sharded,
    make_mesh,
)
from aad_tpu.ops.decode import decode_blocks
from aad_tpu.ops.encode import encode_stream_blocks


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


class TestShardedDecode:
    def test_matches_unsharded(self, mesh):
        rng = np.random.default_rng(0)
        L, T = 100, 236  # deliberately not a multiple of mesh size
        codes = jnp.asarray(rng.integers(0, 16, (L, T)).astype(np.int32))
        si = jnp.asarray(rng.integers(0, 4081, L).astype(np.int32))
        w = jnp.asarray(rng.integers(-20000, 20000, (L, 4)).astype(np.int32))
        h = jnp.asarray(rng.integers(-32768, 32768, (L, 4)).astype(np.int32))

        sharded = decode_blocks_sharded(
            codes, si, w, h, bits_per_sample=4, mesh=mesh, engine="scan"
        )
        local = decode_blocks(codes, si, w, h, bits_per_sample=4, engine="scan")
        np.testing.assert_array_equal(np.asarray(sharded), np.asarray(local))

    def test_output_sharding(self, mesh):
        rng = np.random.default_rng(1)
        L, T = 64, 60
        codes = jnp.asarray(rng.integers(0, 16, (L, T)).astype(np.int32))
        si = jnp.zeros(L, jnp.int32)
        w = jnp.zeros((L, 4), jnp.int32)
        h = jnp.zeros((L, 4), jnp.int32)
        out = decode_blocks_sharded(
            codes, si, w, h, bits_per_sample=4, mesh=mesh, engine="scan"
        )
        assert len(out.sharding.device_set) == 8


class TestShardedEncode:
    def test_matches_unsharded(self, mesh):
        rng = np.random.default_rng(2)
        S, B, C, nspb = 5, 3, 2, 60
        blocks = jnp.asarray(rng.integers(-20000, 20000, (S, B, C, nspb)).astype(np.int32))
        valid = jnp.full((S, B), nspb, dtype=jnp.int32)

        headers, codes, stat = encode_streams_sharded(
            blocks, valid, bits_per_sample=4, num_trials=1, mesh=mesh
        )
        for s in range(S):
            h_ref, c_ref = encode_stream_blocks(blocks[s], valid[s], 4, 1)
            np.testing.assert_array_equal(np.asarray(codes[s]), np.asarray(c_ref))
            np.testing.assert_array_equal(
                np.asarray(headers.step_index[s]), np.asarray(h_ref.step_index)
            )
            np.testing.assert_array_equal(
                np.asarray(headers.weight[s]), np.asarray(h_ref.weight)
            )
        assert np.isfinite(float(stat))


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == args[0].shape[-1] + 4
    if len(jax.devices()) >= 8:
        g.dryrun_multichip(8)
