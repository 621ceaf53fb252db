"""Native C++ encoder vs the Python StringEncoder — bit-identical."""

import numpy as np
import pytest

from pir_tpu import native
from pir_tpu.pir.database import PirDatabase
from pir_tpu.pir.encoders import StringEncoder
from pir_tpu.testing.fixtures import generate_test_db
from pir_tpu.testing.params import tiny_pir_params


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native encoder unavailable"
)


def test_pack_db_matches_python(rng):
    n, t = 256, 0xFC001
    enc = StringEncoder(n, t)
    bytes_per_pt = 200
    num_pt = 7
    buf = rng.integers(0, 256, size=num_pt * bytes_per_pt, dtype=np.uint8).tobytes()
    got = native.pack_db(buf, num_pt, bytes_per_pt, enc.bits_per_coeff, n)
    for i in range(num_pt):
        expect = enc.encode(buf[i * bytes_per_pt : (i + 1) * bytes_per_pt])
        assert (got[i] == expect).all(), i


def test_pack_db_rejects_oversize():
    with pytest.raises(ValueError):
        native.pack_db(b"\0" * 1000, 1, 1000, 19, 16)


def test_database_populate_uses_native_path():
    params = tiny_pir_params(dbsize=23, bytes_per_item=8, n=64)
    raw = generate_test_db(23, 8)
    db_native = PirDatabase(params)
    db_native.populate_strings(raw)

    # force the python path and compare
    db_py = PirDatabase(params)
    orig = db_py._native_pack
    db_py._native_pack = lambda *a, **k: None
    db_py.populate_strings(raw)
    db_py._native_pack = orig

    assert (db_native.db_pts == db_py.db_pts).all()
