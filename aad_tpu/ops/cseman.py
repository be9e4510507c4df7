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


# --- 64-bit signed accumulation as two uint32 limbs ------------------------
# Trial-search selection must reproduce the reference's accumulator EXACTLY:
# ``sum_squared_error += processor->quantize_error * processor->quantize_error``
# multiplies two int32s (reference: src/aad_encoder.c:459-461), so the product
# WRAPS into a negative int32 whenever qdiff^2 >= 2^31 (|qdiff| > 46340 —
# reachable whenever the step size is near its table maximum: max qdiff is
# 61438 at 4 bps). The wrapped signed value is what enters the double
# accumulator, so the sum may go negative — then sqrt(sse/n) is NaN and every
# ``min_rmse > tmp_rmse`` comparison involving it is false. Each wrapped term
# has magnitude < 2^31 and block counts keep |sum| < 2^53, so the double adds
# are exact and selection reduces to exact signed-integer comparison with the
# NaN rule (see ops/encode.py module docstring). Accumulate as (hi, lo)
# uint32 limbs of the two's-complement i64 sum.

_U32 = jnp.uint32


def u64_zero(shape=()) -> tuple[Array, Array]:
    z = jnp.zeros(shape, dtype=_U32)
    return z, z


def wrapped_square(x: Array) -> Array:
    """(int32)(x * x): the reference's wrapping product, as int32."""
    return x.astype(_I32) * x.astype(_I32)


def s64_add_i32(acc: tuple[Array, Array], value: Array) -> tuple[Array, Array]:
    """acc += value with sign extension (value: int32, acc: i64 limb pair).

    The sign extension is derived from the MSB via an unsigned shift, NOT a
    ``value < 0`` compare: XLA's algebraic simplifier folds ``(x*x) < 0`` to
    false — unsound for the wrapping int32 squares this accumulates (jit
    and eager disagree; verified on the CPU backend) — while shifts of the
    same product lower correctly."""
    hi, lo = acc
    v = lax.bitcast_convert_type(value.astype(_I32), _U32)
    new_lo = lo + v
    carry = (new_lo < lo).astype(_U32)
    ext = _U32(0) - (v >> 31)  # 0 or 0xFFFFFFFF
    return hi + carry + ext, new_lo


def s64_nonneg(a: tuple[Array, Array]) -> Array:
    """a >= 0 for an i64 limb pair."""
    return lax.bitcast_convert_type(a[0], _I32) >= 0


def s64_less(a: tuple[Array, Array], b: tuple[Array, Array]) -> Array:
    """a < b as signed i64 limb pairs."""
    ahi = lax.bitcast_convert_type(a[0], _I32)
    bhi = lax.bitcast_convert_type(b[0], _I32)
    return (ahi < bhi) | ((ahi == bhi) & (a[1] < b[1]))


def sse_better(cand: tuple[Array, Array], best: tuple[Array, Array]) -> Array:
    """The reference's ``min_rmse > tmp_rmse`` in exact integer form.

    True iff sqrt(best/n) > sqrt(cand/n) in IEEE double: both sums
    non-negative (a negative sum means sqrt(NaN), and every comparison with
    NaN is false) and cand strictly smaller.
    """
    return s64_nonneg(cand) & s64_nonneg(best) & s64_less(cand, best)


def u64_select(pred: Array, a: tuple[Array, Array], b: tuple[Array, Array]):
    return (jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1]))
