"""Parameter derivation goldens — parity with pir/cpp/parameters_test.cpp."""

import pytest

from pir_tpu.core.params import (
    EncryptionParams,
    generate_encryption_params,
    create_pir_parameters,
    calculate_dimensions,
)


def test_sanity_check_defaults():
    # Golden: parameters_test.cpp:47-62 (N=4096, 20-bit t, 256-byte items)
    p = create_pir_parameters(1026, 256)
    assert p.num_items == 1026
    assert p.num_pt == 27
    assert p.bytes_per_item == 256
    assert p.items_per_plaintext == 38
    assert p.dimensions == (27,)
    p.encryption_params.validate()


def test_create_multi_dim():
    # Golden: parameters_test.cpp:64-78
    p = create_pir_parameters(19011, 500, 3)
    assert p.num_pt == 1001
    assert p.items_per_plaintext == 19
    assert p.dimensions == (11, 10, 10)


def test_create_all_params():
    # Golden: parameters_test.cpp:80-98 (N=8192, bits_per_coeff=12)
    p = create_pir_parameters(
        77412,
        777,
        2,
        generate_encryption_params(8192),
        use_ciphertext_multiplication=True,
        bits_per_coeff=12,
    )
    assert p.num_pt == 5161
    assert p.items_per_plaintext == 15
    assert p.dimensions == (72, 72)
    assert p.use_ciphertext_multiplication
    assert p.bits_per_coeff == 12


def test_bytes_per_item_zero_gives_whole_pt_items():
    p = create_pir_parameters(100, 0)
    assert p.items_per_plaintext == 1
    assert p.num_pt == 100
    # N * bits_per_coeff / 8 with default 20-bit t (floor log2 = 19)
    assert p.bytes_per_item == 4096 * 19 // 8


def test_item_too_big_rejected():
    with pytest.raises(ValueError):
        create_pir_parameters(10, 100000, 1)


def test_bits_per_coeff_too_big_rejected():
    with pytest.raises(ValueError):
        create_pir_parameters(10, 256, 1, bits_per_coeff=30)


def test_calculate_dimensions_goldens():
    # parity with database_test.cpp golden tables (d-th-root shaping)
    assert calculate_dimensions(100, 1) == [100]
    assert calculate_dimensions(100, 2) == [10, 10]
    assert calculate_dimensions(1000, 3) == [10, 10, 10]
    assert calculate_dimensions(1001, 3) == [11, 10, 10]
    assert calculate_dimensions(16, 2) == [4, 4]
    assert calculate_dimensions(17, 2) == [5, 4]


def test_ct_modulus_split():
    ep = generate_encryption_params(4096, 20)
    assert len(ep.coeff_modulus) == 3
    assert len(ep.ct_modulus) == 2
    assert ep.special_modulus == ep.coeff_modulus[-1]
    assert ep.bits_per_coeff_max == 19


def test_validation_rejects_bad_params():
    ep = generate_encryption_params(4096, 20)
    bad = EncryptionParams(4096, ep.plain_modulus, (15,))  # not ≡ 1 mod 2N / tiny
    with pytest.raises(ValueError):
        bad.validate()
    bad2 = EncryptionParams(4095, ep.plain_modulus, ep.coeff_modulus)
    with pytest.raises(ValueError):
        bad2.validate()


def test_roundtrip_dict():
    ep = generate_encryption_params(4096, 20)
    assert EncryptionParams.from_dict(ep.to_dict()) == ep
