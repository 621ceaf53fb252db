"""StringEncoder / IntegerEncoder — parity with string_encoder_test.cpp."""

import numpy as np
import pytest

from pir_tpu.pir.encoders import IntegerEncoder, StringEncoder


def test_capacity_goldens():
    # N=4096, 20-bit t (bits_per_coeff 19) -> 9728 bytes max
    # (string_encoder_test.cpp:64-71)
    enc = StringEncoder(4096, 0xFC001)
    assert enc.bits_per_coeff == 19
    assert enc.max_bytes_per_plaintext() == 9728
    assert enc.num_items_per_plaintext(256) == 38


@pytest.mark.parametrize("bpc", [19, 16, 10, 8, 6, 3])
def test_roundtrip_random(bpc, rng):
    enc = StringEncoder(4096, 0xFC001, bits_per_coeff=bpc)
    data = rng.integers(0, 256, size=537, dtype=np.uint8).tobytes()
    pt = enc.encode(data)
    assert (pt < (1 << bpc)).all()
    assert enc.decode(pt, len(data)) == data


def test_multi_item_packing_and_offsets(rng):
    enc = StringEncoder(4096, 0xFC001)
    items = [rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
             for _ in range(5)]
    pt = enc.encode_many(items)
    for i, item in enumerate(items):
        assert enc.decode(pt, 64, byte_offset=i * 64) == item, i


def test_unaligned_offset_decode(rng):
    # offsets that land mid-coefficient (19-bit coeffs vs 8-bit bytes)
    enc = StringEncoder(4096, 0xFC001)
    data = rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()
    pt = enc.encode(data)
    for off in [1, 2, 3, 5, 7, 19, 37, 100]:
        assert enc.decode(pt, 13, byte_offset=off) == data[off : off + 13], off


def test_too_large_rejected():
    enc = StringEncoder(64, 0xFC1)  # tiny ring
    with pytest.raises(ValueError):
        enc.encode(b"x" * 10000)
    pt = enc.encode(b"abcd")
    with pytest.raises(ValueError):
        enc.decode(pt, 100000, 0)


def test_empty_encode():
    enc = StringEncoder(64, 0xFC1)
    pt = enc.encode(b"")
    assert (pt == 0).all()


def test_bits_per_coeff_cap():
    with pytest.raises(ValueError):
        StringEncoder(4096, 0xFC001, bits_per_coeff=25)


@pytest.mark.parametrize("value", [0, 1, 42, -1, -42, 123456789, -987654321,
                                   (1 << 47) - 1])
def test_integer_encoder_roundtrip(value):
    enc = IntegerEncoder(4096, 0xFC001)
    assert enc.decode_int64(enc.encode(value)) == value


def test_integer_encoder_scaled_coeffs():
    # decode handles coefficients that grew under homomorphic scaling as
    # long as they stay centered-correct (the DB int test relies on this)
    enc = IntegerEncoder(64, 0xFC1)
    pt = enc.encode(5)  # 101 in binary
    assert enc.decode_int64(pt) == 5


@pytest.mark.parametrize(
    "n,t,expected_max",
    [
        # parameterized max-bytes table (string_encoder_test.cpp:202-211 role)
        (4096, 0xFC001, 9728),      # 19 bits/coeff
        (8192, 0xFC001, 19456),
        (4096, (1 << 16) + 1, 8192),  # 16 bits/coeff
        (2048, 0xFC001, 4864),
    ],
)
def test_max_bytes_table(n, t, expected_max):
    assert StringEncoder(n, t).max_bytes_per_plaintext() == expected_max
