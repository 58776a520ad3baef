"""UInt128 vertex-id helpers.

The reference uses 128-bit vertex ids stored big-endian as two longs with
unsigned comparison semantics (reference UInt128.java:34-41, 191-194,
compareTo :297-334, hex toString :285-292, decode :203-231). In Spark we
represent an id as ``BINARY(16)``: byte-wise binary comparison equals the
reference's unsigned big-endian order, so sorts/joins/range predicates behave
identically with zero custom Catalyst work.

Python-side helpers mirror ``UInt128.decode`` (accepts int, decimal string,
``0x`` hex string, bytes) and ``UInt128.toString`` (hex). Column-side helpers
build ids from (tag, key) pairs — the fixture graph packs a per-label tag in
the upper long and the business key in the lower long, replicating the
reference's (upper, lower) two-long packing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASK64 = (1 << 64) - 1
_MASK128 = (1 << 128) - 1


def uint128(value) -> bytes:
    """Decode a value into a 16-byte big-endian id (UInt128.java:203-231).

    Accepts every form the reference's decode does: any-width integer
    (Byte/Short/Integer/Long/BigInteger are all Python ``int``), decimal or
    ``0x`` hex string, ``uuid.UUID`` (most-significant bits → upper long,
    UInt128.java:224-227), and raw bytes (≤16, left-padded like the
    reference's byte[] branch)."""
    import uuid

    if isinstance(value, bool):
        raise TypeError("cannot decode bool as UInt128")
    if isinstance(value, uuid.UUID):
        return value.int.to_bytes(16, "big")
    if isinstance(value, (bytes, bytearray)):
        if len(value) > 16:
            raise ValueError(f"byte id longer than 16 bytes: {len(value)}")
        return bytes(value).rjust(16, b"\x00")
    if isinstance(value, str):
        v = int(value, 16) if value.lower().startswith("0x") else int(value)
        return (v & _MASK128).to_bytes(16, "big")
    if isinstance(value, int):
        return (value & _MASK128).to_bytes(16, "big")
    raise TypeError(f"cannot decode {type(value).__name__} as UInt128")


def uint128_pair(upper: int, lower: int) -> bytes:
    """Pack (upper, lower) longs — UInt128.java:191-194 constructor."""
    return (((upper & _MASK64) << 64) | (lower & _MASK64)).to_bytes(16, "big")


def uint128_hex(value: bytes) -> str:
    """Hex rendering matching ``UInt128.toString`` (UInt128.java:285-292)."""
    return "0x" + value.hex()


def to_uint128(value: bytes) -> int:
    return int.from_bytes(value, "big")


# ---------------------------------------------------------------------------
# Column expressions (JVM-side, no UDFs)
# ---------------------------------------------------------------------------


def id_col(tag: int, key: Column) -> Column:
    """BINARY(16) id column from a constant label tag + bigint key column.

    upper long = tag, lower long = key; built with JVM-side functions only so
    it stays inside whole-stage codegen.
    """
    upper = F.lit(tag).cast("long")
    return F.concat(
        _long_be_bytes(upper), _long_be_bytes(key.cast("long"))
    ).alias("id")


def _long_be_bytes(c: Column) -> Column:
    """Big-endian 8-byte encoding of a long column.

    ``unhex(lpad(hex(x),16,'0'))`` — hex() of a long is its big-endian
    two's-complement representation, which matches the reference's
    ByteBuffer.putLong layout (UInt128.java:249-260).
    """
    return F.unhex(F.lpad(F.hex(c), 16, "0"))


def id_hex(c: Column) -> Column:
    """Column form of ``uint128_hex``."""
    return F.concat(F.lit("0x"), F.lower(F.hex(c)))


def id_lower(c: Column) -> Column:
    """Extract the lower long of a BINARY(16) id as bigint (business key)."""
    return F.conv(F.hex(F.substring(c, 9, 8)), 16, 10).cast("long")


def id_upper(c: Column) -> Column:
    """Extract the upper long of a BINARY(16) id as bigint (label tag)."""
    return F.conv(F.hex(F.substring(c, 1, 8)), 16, 10).cast("long")
