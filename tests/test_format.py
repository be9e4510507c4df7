"""Format-layer tests: tables, block geometry, file header, bit packing.

Golden values come from the reference's own unit tests
(reference: test/test_aad_encoder.c:33-63 for geometry).
"""

import numpy as np
import pytest

from aad_tpu import (
    HeaderInfo,
    InvalidFormatError,
    calculate_block_size,
    compute_block_geometry,
    decode_header,
    encode_header,
    validate_header,
)
from aad_tpu.constants import CH_PROCESS_MS, CH_PROCESS_NONE
from aad_tpu.format.geometry import (
    encoded_block_bytes,
    encoded_stream_size,
    geometry_from_header,
)
from aad_tpu.ops.bitpack import pack_codes, unpack_codes
from aad_tpu.tables import INDEX_TABLES, STEPSIZE_TABLE


class TestTables:
    def test_stepsize_table_anchors(self):
        # First row, mid-table and final entries of the format's table.
        assert list(STEPSIZE_TABLE[:8]) == [1, 2, 3, 4, 6, 7, 8, 10]
        assert STEPSIZE_TABLE[64] == 111
        assert STEPSIZE_TABLE[128] == 391
        assert STEPSIZE_TABLE[192] == 2810
        assert STEPSIZE_TABLE[255] == 32767

    def test_stepsize_monotonic(self):
        assert np.all(np.diff(STEPSIZE_TABLE) > 0)

    def test_index_tables(self):
        assert list(INDEX_TABLES[4][:8]) == [-18, -17, -14, 16, 32, 64, 128, 256]
        assert list(INDEX_TABLES[3][:4]) == [-16, -15, 32, 128]
        assert list(INDEX_TABLES[2][:2]) == [-14, 40]
        for bps, tab in INDEX_TABLES.items():
            assert len(tab) == 2 ** bps
            # sign bit of the code does not change the delta
            assert list(tab[: len(tab) // 2]) == list(tab[len(tab) // 2 :])


class TestBlockGeometry:
    # (max_block, nch, bps) -> (block_size, samples_per_block); golden values
    # pinned by the reference test suite (test/test_aad_encoder.c:33-57).
    GOLDEN = [
        ((32, 1, 4), (32, 32)),
        ((64, 2, 4), (64, 32)),
        ((64, 1, 3), (63, 124)),
        ((64, 2, 3), (60, 36)),
        ((128, 1, 3), (126, 292)),
        ((128, 2, 3), (126, 124)),
        ((1024, 1, 3), (1023, 2684)),
        ((1024, 2, 3), (1020, 1316)),
        ((32, 1, 2), (32, 60)),
        ((64, 1, 2), (64, 188)),
        ((64, 2, 2), (64, 60)),
        ((1024, 1, 4), (1024, 2016)),
        ((1024, 2, 4), (1024, 992)),
    ]

    @pytest.mark.parametrize("args,expected", GOLDEN)
    def test_golden(self, args, expected):
        assert calculate_block_size(*args) == expected

    def test_rejects_bad_params(self):
        with pytest.raises(InvalidFormatError):
            calculate_block_size(17, 1, 4)  # header (18B) does not fit
        with pytest.raises(InvalidFormatError):
            calculate_block_size(32, 0, 4)
        with pytest.raises(InvalidFormatError):
            calculate_block_size(32, 3, 4)
        with pytest.raises(InvalidFormatError):
            calculate_block_size(32, 1, 0)
        with pytest.raises(InvalidFormatError):
            calculate_block_size(32, 1, 5)

    def test_geometry_from_header_roundtrip(self):
        geo = compute_block_geometry(1024, 2, 4)
        geo2 = geometry_from_header(2, 4, geo.block_size)
        assert geo == geo2

    def test_encoded_sizes(self):
        geo = compute_block_geometry(1024, 2, 4)
        # full block
        assert encoded_block_bytes(geo, geo.num_samples_per_block) == geo.block_size
        # header-only tail
        assert encoded_block_bytes(geo, 4) == geo.header_bytes
        assert encoded_block_bytes(geo, 1) == geo.header_bytes
        # one unit beyond the header samples
        assert encoded_block_bytes(geo, 5) == geo.header_bytes + geo.unit_bytes
        # the stereo golden fixture: 24000 samples, 1024B blocks, 992 spb
        assert 31 + encoded_stream_size(geo, 24000) == 24831


class TestHeader:
    def _valid(self):
        return HeaderInfo(
            num_channels=2,
            num_samples=24000,
            sampling_rate=48000,
            bits_per_sample=4,
            block_size=1024,
            num_samples_per_block=992,
            ch_process_method=CH_PROCESS_NONE,
        )

    def test_roundtrip(self):
        h = self._valid()
        data = encode_header(h)
        assert len(data) == 31
        h2 = decode_header(data)
        validate_header(h2)
        assert (
            h2.num_channels,
            h2.num_samples,
            h2.sampling_rate,
            h2.bits_per_sample,
            h2.block_size,
            h2.num_samples_per_block,
            h2.ch_process_method,
        ) == (2, 24000, 48000, 4, 1024, 992, 0)
        assert h2.format_version == 4 and h2.codec_version == 18

    def test_golden_fixture_header(self, fixture_dir):
        data = (fixture_dir / "sin300Hz.aad").read_bytes()
        h = decode_header(data)
        validate_header(h)
        assert h.num_channels == 2
        assert h.num_samples == 24000
        assert h.sampling_rate == 48000
        assert h.bits_per_sample == 4
        assert h.block_size == 1024
        assert h.num_samples_per_block == 992
        assert h.ch_process_method == CH_PROCESS_NONE

    # Byte-offset corruption matrix (reference: test/test_aad_decoder.c:92-186).
    @pytest.mark.parametrize(
        "offset,value",
        [
            (4, 0xFF),   # format_version
            (8, 0xFF),   # codec_version
            (12, 0xFF),  # num_channels
            (14, 0x00),  # num_samples == 0
            (18, 0x00),  # sampling_rate == 0
            (22, 0x00),  # bits_per_sample == 0
            (24, 0x00),  # block_size == 0
            (26, 0x00),  # num_samples_per_block == 0
            (30, 0xFF),  # ch_process_method invalid
        ],
    )
    def test_corrupt_field_rejected(self, offset, value):
        data = bytearray(encode_header(self._valid()))
        width = {12: 2, 22: 2, 24: 2, 30: 1}.get(offset, 4)
        data[offset : offset + width] = bytes([value]) * width
        h = decode_header(bytes(data))
        with pytest.raises(InvalidFormatError):
            validate_header(h)

    def test_ms_mono_rejected(self):
        h = self._valid()
        h.num_channels = 1
        h.ch_process_method = CH_PROCESS_MS
        with pytest.raises(InvalidFormatError):
            encode_header(h)

    def test_versions_pinned_on_encode(self):
        h = self._valid()
        h.format_version = 99
        h.codec_version = 99
        out = decode_header(encode_header(h))
        assert out.format_version == 4 and out.codec_version == 18


class TestBitpack:
    @pytest.mark.parametrize("nch", [1, 2])
    @pytest.mark.parametrize("bps", [2, 3, 4])
    def test_roundtrip_numpy(self, nch, bps):
        geo = compute_block_geometry(256, nch, bps)
        rng = np.random.default_rng(0)
        codes = rng.integers(
            0, 2 ** bps, size=(5, nch, geo.codes_per_block), dtype=np.uint8
        )
        data = pack_codes(codes, geo)
        assert data.shape == (5, geo.data_bytes)
        back = unpack_codes(data, geo)
        np.testing.assert_array_equal(back, codes)

    def test_roundtrip_jnp(self):
        import jax.numpy as jnp

        geo = compute_block_geometry(128, 2, 3)
        rng = np.random.default_rng(1)
        codes = rng.integers(0, 8, size=(3, 2, geo.codes_per_block), dtype=np.uint8)
        data = pack_codes(jnp.asarray(codes), geo)
        back = np.asarray(unpack_codes(data, geo))
        np.testing.assert_array_equal(back, codes)

    def test_4bit_nibble_order(self):
        # high nibble first (reference: src/aad_encoder.c:671)
        geo = compute_block_geometry(19, 1, 4)  # header 18 + 1 unit of 1 byte
        codes = np.array([[[0xA, 0x3]]], dtype=np.uint8)
        data = pack_codes(codes, geo)
        assert data[0, 0] == 0xA3


def test_wire32_encode_decode_permutations_inverse():
    """kernel_words_to_wire is the exact inverse of wire_to_kernel_words
    for every conforming geometry (the encode wire pipeline's core)."""
    import jax.numpy as jnp
    import numpy as np

    from aad_tpu.format.geometry import compute_block_geometry
    from aad_tpu.ops.wire32 import (
        kernel_words_needed,
        kernel_words_to_wire,
        wire_to_kernel_words,
        words_per_block,
    )

    rng = np.random.default_rng(11)
    for nch in (1, 2):
        for bps in (2, 3, 4):
            geo = compute_block_geometry(1024, nch, bps)
            B = 6
            wk = kernel_words_needed(geo)
            mask = (1 << (4 * 8)) - 1  # full word; slots limited below
            # random codes valid for bps: each 4-bit slot < 2**bps
            slot_max = (1 << bps) - 1
            kw = np.zeros((B, nch, wk), dtype=np.uint32)
            for k in range(8):
                kw |= rng.integers(
                    0, slot_max + 1, (B, nch, wk), dtype=np.uint32
                ) << np.uint32(4 * k)
            dw = kernel_words_to_wire(jnp.asarray(kw), geo)  # (B, Wd)
            # decode direction wants full wire rows; splice the data words
            # into zero header rows
            wpb = words_per_block(geo)
            base, rem = divmod(geo.header_bytes, 4)
            rows = np.zeros((B, wpb), dtype=np.uint32)
            dwn = np.asarray(dw)
            if rem == 0:
                rows[:, base : base + dwn.shape[1]] = dwn
            else:
                s = 8 * rem
                rows[:, base] |= (dwn[:, 0] << s) & 0xFFFFFFFF
                for i in range(1, dwn.shape[1]):
                    rows[:, base + i] = (
                        (dwn[:, i - 1] >> (32 - s)) | (dwn[:, i] << s)
                    ) & 0xFFFFFFFF
                rows[:, base + dwn.shape[1]] = dwn[:, -1] >> (32 - s)
            back = wire_to_kernel_words(jnp.asarray(rows), geo)  # (Wk, C*B)
            back = np.asarray(back).T.reshape(nch, B, -1).swapaxes(0, 1)
            n = min(wk, back.shape[-1])
            np.testing.assert_array_equal(back[..., :n], kw[..., :n])
