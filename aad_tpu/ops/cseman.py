"""C-integer semantics on int32 tensors.

The wire format is defined by a C89 implementation compiled on a
two's-complement machine, so bit-exactness requires reproducing C's integer
behaviour precisely (reference hot loops: src/aad_decoder.c:269-318,
src/aad_encoder.c:343-410). The rules this module pins down:

* all arithmetic is int32 with two's-complement wraparound — XLA int ops wrap,
  matching the compiled reference;
* ``>>`` on signed values is an *arithmetic* shift (jnp.right_shift on signed
  dtypes is arithmetic);
* ``/`` truncates toward zero (``lax.div``), unlike Python's floor division;
* clips use the MAX(min, MIN(max, v)) composition (reference:
  src/aad_internal.h:28) — order is irrelevant for ints but kept for clarity.

Everything here is shape-polymorphic and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import INT16_MAX, INT16_MIN

Array = jax.Array

_I32 = jnp.int32


def i32(x) -> Array:
    return jnp.asarray(x, dtype=_I32)


def asr(x: Array, n) -> Array:
    """Arithmetic shift right (C ``>>`` on int32)."""
    return jnp.right_shift(x.astype(_I32), i32(n))


def shl(x: Array, n) -> Array:
    """Left shift with int32 wraparound (C ``<<`` on int32)."""
    return jnp.left_shift(x.astype(_I32), i32(n))


def trunc_div(a: Array, b: Array) -> Array:
    """C integer division: truncates toward zero."""
    return lax.div(a.astype(_I32), b.astype(_I32))


def clip16(x: Array) -> Array:
    """Clip to the int16 sample range (reference: src/aad_internal.h:28)."""
    return jnp.maximum(i32(INT16_MIN), jnp.minimum(i32(INT16_MAX), x.astype(_I32)))


def clip(x: Array, lo, hi) -> Array:
    """AAD_INNER_VAL: max(lo, min(hi, x))."""
    return jnp.maximum(i32(lo), jnp.minimum(i32(hi), x.astype(_I32)))


def sign_extend16(x: Array) -> Array:
    """Reinterpret the low 16 bits as an int16, result int32.

    Mirrors the C ``(int16_t)u16`` casts used when loading block headers
    (reference: src/aad_decoder.c:370-378).
    """
    x = jnp.bitwise_and(x.astype(_I32), i32(0xFFFF))
    return jnp.where(x >= i32(0x8000), x - i32(0x10000), x)


# --- 64-bit unsigned accumulation as two uint32 limbs ----------------------
# Trial-search RMSE selection needs exact sums of squared quantisation errors
# (up to ~1e13). Rather than relying on x64 mode, accumulate as (hi, lo)
# uint32 limbs; comparisons are lexicographic. See codec/encoder.py for why
# integer comparison reproduces the reference's double comparison exactly.

_U32 = jnp.uint32


def u64_zero(shape=()) -> tuple[Array, Array]:
    z = jnp.zeros(shape, dtype=_U32)
    return z, z


def u64_add_u32(acc: tuple[Array, Array], value: Array) -> tuple[Array, Array]:
    """acc += value, where value is a non-negative int32/uint32."""
    hi, lo = acc
    v = value.astype(_U32)
    new_lo = lo + v
    carry = (new_lo < lo).astype(_U32)
    return hi + carry, new_lo


def square_u32(x: Array) -> Array:
    """Exact x*x as uint32 for |x| < 2**16.

    The int32 product may wrap negative; bitcasting recovers the true value
    mod 2**32, which equals the true square when it fits in 32 bits.
    """
    sq = x.astype(_I32) * x.astype(_I32)
    return lax.bitcast_convert_type(sq, _U32)


def u64_less(a: tuple[Array, Array], b: tuple[Array, Array]) -> Array:
    """a < b lexicographically."""
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def u64_select(pred: Array, a: tuple[Array, Array], b: tuple[Array, Array]):
    return (jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1]))
