"""Best-effort SEAL 3.5 binary stream compatibility layer.

The reference serializes `EncryptionParameters` with SEAL's stream format
into the `PIRParameters.encryption_parameters` proto field
(pir/cpp/parameters.cpp:99-100); full interop therefore needs this codec.

Layout implemented (SEAL 3.5.x, compression mode "none"):

  SEALHeader (16 bytes, seal/serialization.h):
      u16  magic          = 0xA15E
      u8   header_size    = 0x10
      u8   version_major  = 3
      u8   version_minor  = 5
      u8   compr_mode     = 0 (none)
      u16  reserved       = 0
      u64  size           (total stream size incl. header)
  EncryptionParameters payload (save_members):
      u8   scheme         (1 = BFV)
      u64  poly_modulus_degree
      u64  coeff_modulus_count
      u64  coeff_modulus values ×count
      u64  plain_modulus value

**Validation caveat**: this container has zero egress and the reference
(and SEAL) cannot be built here, so this codec is checked for
self-consistency and structure, not against live SEAL streams.  The
protocol does not depend on it: `pir_tpu.pir.wire` uses the native PTP1
codec by default, and `deserialize_encryption_params_any` accepts either
format, so a SEAL-generated PIRParameters proto parses if this layout is
right, while everything else keeps working if it is not.
"""

from __future__ import annotations

import struct

from pir_tpu.core.params import EncryptionParams

SEAL_MAGIC = 0xA15E
COMPR_NONE = 0
SCHEME_BFV = 1


def save_encryption_params(ep: EncryptionParams) -> bytes:
    payload = struct.pack("<B", SCHEME_BFV)
    payload += struct.pack("<Q", ep.poly_modulus_degree)
    payload += struct.pack("<Q", len(ep.coeff_modulus))
    for m in ep.coeff_modulus:
        payload += struct.pack("<Q", m)
    payload += struct.pack("<Q", ep.plain_modulus)
    total = 16 + len(payload)
    header = struct.pack("<HBBBBHQ", SEAL_MAGIC, 0x10, 3, 5, COMPR_NONE, 0, total)
    return header + payload


def parse_header(b: bytes) -> dict:
    if len(b) < 16:
        raise ValueError("stream shorter than a SEAL header")
    magic, hsize, major, minor, compr, _res, size = struct.unpack_from(
        "<HBBBBHQ", b, 0
    )
    if magic != SEAL_MAGIC:
        raise ValueError(f"bad SEAL magic 0x{magic:04x}")
    if hsize != 0x10:
        raise ValueError(f"unsupported SEAL header size {hsize}")
    if compr != COMPR_NONE:
        raise ValueError(
            "compressed SEAL streams are not supported (compr_mode="
            f"{compr}); re-serialize with compr_mode none"
        )
    return {
        "version": (major, minor),
        "compr_mode": compr,
        "size": size,
    }


def load_encryption_params(b: bytes) -> EncryptionParams:
    try:
        return _load_encryption_params(b)
    except struct.error as e:
        raise ValueError(f"truncated SEAL stream: {e}") from e


def _load_encryption_params(b: bytes) -> EncryptionParams:
    parse_header(b)
    off = 16
    (scheme,) = struct.unpack_from("<B", b, off)
    off += 1
    if scheme != SCHEME_BFV:
        raise ValueError(f"unsupported SEAL scheme {scheme} (only BFV)")
    (degree,) = struct.unpack_from("<Q", b, off)
    off += 8
    (count,) = struct.unpack_from("<Q", b, off)
    off += 8
    moduli = struct.unpack_from(f"<{count}Q", b, off)
    off += 8 * count
    (plain,) = struct.unpack_from("<Q", b, off)
    params = EncryptionParams(
        poly_modulus_degree=int(degree),
        plain_modulus=int(plain),
        coeff_modulus=tuple(int(m) for m in moduli),
    )
    params.validate()
    return params


def looks_like_seal_stream(b: bytes) -> bool:
    return len(b) >= 2 and struct.unpack_from("<H", b, 0)[0] == SEAL_MAGIC
