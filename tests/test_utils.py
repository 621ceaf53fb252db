"""Unit tests for scalar helpers — mirrors the reference's utils_test.cpp
exact-table style (pir/cpp/utils_test.cpp:24-63)."""

from pir_tpu.utils.math import (
    next_power_two,
    ceil_log2,
    floor_log2,
    invert_mod,
    generate_galois_elts,
)


def test_next_power_two():
    table = {
        0: 1,
        1: 1,
        2: 2,
        3: 4,
        4: 4,
        5: 8,
        15: 16,
        16: 16,
        17: 32,
        1000: 1024,
        4096: 4096,
        4097: 8192,
    }
    for k, v in table.items():
        assert next_power_two(k) == v, k


def test_ceil_log2():
    table = {0: 0, 1: 0, 2: 1, 3: 2, 4: 2, 5: 3, 1023: 10, 1024: 10, 1025: 11}
    for k, v in table.items():
        assert ceil_log2(k) == v, k


def test_floor_log2():
    table = {1: 0, 2: 1, 3: 1, 4: 2, 1023: 9, 1024: 10, 0xFC001: 19}
    for k, v in table.items():
        assert floor_log2(k) == v, k


def test_invert_mod():
    t = 0xFC001
    for m in [1, 2, 128, 4096]:
        assert invert_mod(m, t) * m % t == 1


def test_generate_galois_elts():
    # {N/2^i + 1 : i < log2 N}, parity with pir/cpp/utils.cpp:7-14
    assert generate_galois_elts(16) == [17, 9, 5, 3]
    elts = generate_galois_elts(4096)
    assert len(elts) == 12
    assert elts[0] == 4097 and elts[-1] == 3
