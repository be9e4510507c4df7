"""Shared Pallas launch helpers.

Interpret mode lets every fused TPU kernel execute (slowly, op-by-op) on
the CPU backend, giving the driver-run CPU suite real coverage of the
kernel logic instead of skipping it — the reference's bit-exactness bar
(reference: test/test_aad_decoder.c:256-338) applied to the kernels
themselves. Auto-detected off the default backend; override with
``AAD_TPU_PALLAS_INTERPRET=0/1``.
"""

from __future__ import annotations

import os

import jax


def interpret_mode() -> bool:
    """True when pallas_call must run interpreted (non-TPU backend)."""
    env = os.environ.get("AAD_TPU_PALLAS_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return True
