"""UInt128 helper unit tests — mirrors the reference's UInt128Test
(src/test/java/net/ellitron/torc/util/UInt128Test.java): constructor/decode
round-trips, ordering, hex rendering."""

import pytest

from torcdb_spark.ids import (
    id_col,
    id_hex,
    id_lower,
    to_uint128,
    uint128,
    uint128_hex,
    uint128_pair,
)


def test_decode_int():
    assert uint128(1) == b"\x00" * 15 + b"\x01"
    assert to_uint128(uint128(2**70 + 5)) == 2**70 + 5


def test_decode_str():
    assert uint128("255") == uint128(255)
    assert uint128("0xff") == uint128(255)
    assert uint128("0xFF") == uint128(255)


def test_decode_bytes_right_justified():
    assert uint128(b"\x01\x02") == b"\x00" * 14 + b"\x01\x02"


def test_pair_packing():
    v = uint128_pair(3, 7)
    assert to_uint128(v) == (3 << 64) | 7


def test_negative_key_wraps_like_twos_complement():
    # UInt128 is unsigned; a negative long packs as its two's complement,
    # matching ByteBuffer.putLong in the reference.
    v = uint128_pair(0, -1)
    assert v[8:] == b"\xff" * 8


def test_hex_roundtrip():
    v = uint128_pair(1, 16)
    assert uint128_hex(v) == "0x" + "00" * 7 + "01" + "00" * 7 + "10"
    assert uint128(uint128_hex(v)) == v


def test_unsigned_order_is_bytewise():
    vals = [0, 1, 2**63 - 1, 2**63, 2**64 - 1, 2**127, 2**128 - 1]
    enc = [uint128(v) for v in vals]
    assert enc == sorted(enc)  # python bytes compare == unsigned big-endian


def test_decode_rejects_bad_types():
    with pytest.raises(TypeError):
        uint128(3.14)
    with pytest.raises(ValueError):
        uint128(b"x" * 17)
    with pytest.raises(TypeError):
        uint128(True)


def test_decode_uuid():
    # UInt128.decode's UUID branch packs (mostSigBits, leastSigBits)
    # (UInt128.java:224-227) — identical to the UUID's 128-bit integer form.
    import uuid

    u = uuid.UUID("0123456789abcdef0123456789abcdef")
    assert uint128(u) == uint128_pair(0x0123456789ABCDEF, 0x0123456789ABCDEF)
    assert to_uint128(uint128(u)) == u.int


def test_decode_biginteger_and_bytearray():
    # Python int covers the reference's Byte/Short/Integer/Long/BigInteger
    # decode branches (UInt128.java:205-222) — spot-check each width.
    for v in (7, 300, 2**31 - 1, 2**63 - 1, 2**100):
        assert to_uint128(uint128(v)) == v
    assert uint128(bytearray(b"\x01\x02")) == uint128(b"\x01\x02")


def test_id_col_matches_python(spark):
    import pyspark.sql.functions as F

    df = spark.range(5).select(
        id_col(3, F.col("id")).alias("bid"), F.col("id").alias("k")
    )
    rows = df.collect()
    for r in rows:
        assert bytes(r.bid) == uint128_pair(3, r.k)

    # lower-long extraction + hex rendering round-trip, column-side
    back = df.select(id_lower(F.col("bid")).alias("lo"), id_hex(F.col("bid")).alias("h"), "k").collect()
    for r in back:
        assert r.lo == r.k
        assert r.h == uint128_hex(uint128_pair(3, r.k))
