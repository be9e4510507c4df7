"""Vectorised 2/3/4-bit code <-> byte packing.

The data region of a block is a sequence of channel-interleaved pack units
(reference: src/aad_encoder.c:661-722, src/aad_decoder.c:394-455):

* 4-bit: per unit, per channel, 1 byte  = 2 codes, high nibble first
* 3-bit: per unit, per channel, 3 bytes = 8 codes, MSB-first 24-bit word
* 2-bit: per unit, per channel, 1 byte  = 4 codes, MSB-first pairs

Unlike the reference's pointer-walking loops, these are pure reshape /
shift / mask tensor ops: they run on device under jit (no per-sample host
round-trips) and vectorise over an arbitrary batch of blocks. Both jnp and
numpy inputs are supported (the module functions dispatch on the array
namespace) so host-side tools can reuse the same code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..format.geometry import BlockGeometry

__all__ = ["unpack_codes", "pack_codes"]


def _xp(*arrays):
    """Pick numpy or jax.numpy based on the input arrays."""
    return np if all(isinstance(a, np.ndarray) for a in arrays) else jnp


def unpack_codes(data: "np.ndarray", geo: BlockGeometry):
    """Data-region bytes -> codes.

    Args:
      data: (..., data_bytes) uint8 block data regions.
    Returns:
      (..., num_channels, codes_per_block) uint8 codes in decode order.
    """
    xp = _xp(data)
    nch, bps = geo.num_channels, geo.bits_per_sample
    units = data.reshape(*data.shape[:-1], geo.num_units, nch, geo.unit_bytes // nch)

    if bps == 4:
        b = units[..., 0].astype(xp.uint8)
        codes = xp.stack([(b >> 4) & 0xF, b & 0xF], axis=-1)
    elif bps == 2:
        b = units[..., 0].astype(xp.uint8)
        codes = xp.stack(
            [(b >> 6) & 0x3, (b >> 4) & 0x3, (b >> 2) & 0x3, b & 0x3], axis=-1
        )
    elif bps == 3:
        u = units.astype(xp.uint32)
        word = (u[..., 0] << 16) | (u[..., 1] << 8) | u[..., 2]
        shifts = np.arange(21, -1, -3, dtype=np.uint32)  # 21,18,...,0
        codes = ((word[..., None] >> shifts) & 0x7).astype(xp.uint8)
    else:  # pragma: no cover - geometry construction rejects this
        raise ValueError(f"unsupported bits_per_sample: {bps}")

    # (..., units, nch, samples_per_unit) -> (..., nch, units*samples_per_unit)
    codes = xp.swapaxes(codes, -2, -3)
    return codes.reshape(*codes.shape[:-2], geo.num_units * geo.samples_per_unit)


def pack_codes(codes: "np.ndarray", geo: BlockGeometry):
    """Codes -> data-region bytes (inverse of :func:`unpack_codes`).

    Args:
      codes: (..., num_channels, codes_per_block) integer codes.
    Returns:
      (..., data_bytes) uint8.
    """
    xp = _xp(codes)
    nch, bps = geo.num_channels, geo.bits_per_sample
    spu = geo.samples_per_unit
    # (..., nch, units, spu) -> (..., units, nch, spu)
    c = codes.reshape(*codes.shape[:-1], geo.num_units, spu)
    c = xp.swapaxes(c, -2, -3).astype(xp.uint32)

    if bps == 4:
        data = ((c[..., 0] << 4) | c[..., 1]).astype(xp.uint8)[..., None]
    elif bps == 2:
        data = (
            (c[..., 0] << 6) | (c[..., 1] << 4) | (c[..., 2] << 2) | c[..., 3]
        ).astype(xp.uint8)[..., None]
    else:  # bps == 3
        shifts = np.arange(21, -1, -3, dtype=np.uint32)
        word = (c << shifts).sum(axis=-1).astype(xp.uint32)
        data = xp.stack(
            [(word >> 16) & 0xFF, (word >> 8) & 0xFF, word & 0xFF], axis=-1
        ).astype(xp.uint8)

    return data.reshape(*data.shape[:-3], geo.data_bytes)
