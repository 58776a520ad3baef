"""Five-type property serde round-trips — mirrors the reference's
ObjectSerializationTest (int/long/string/nested list/map round-trips,
src/test/java/net/ellitron/torc/ObjectSerializationTest.java:40-96)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from torcdb_spark.serde import decode_value, encode_value

CASES = [
    0,
    42,
    -1,
    2**31 - 1,
    -(2**31),
    2**31,  # promotes to long
    2**63 - 1,
    -(2**63),
    "",
    "hello",
    "with:colon|and|bars,commas",
    "unicode ✓ ümlaut",
    [],
    [1, 2, 3],
    ["a", "b"],
    [1, "mixed", [2, "nested"]],
    {},
    {"k": "v"},
    {"a": 1, "b": [1, 2], "c": {"d": "e"}},
    [{"x": [1, {"y": "z"}]}],
]


@pytest.mark.parametrize("v", CASES, ids=[repr(c)[:40] for c in CASES])
def test_roundtrip(v):
    assert decode_value(encode_value(v)) == v


def test_int_vs_long_tag():
    assert encode_value(7).startswith("i:")
    assert encode_value(2**40).startswith("l:")


def test_as_value_unparseable_tagged_string_falls_back_raw():
    from torcdb_spark.serde import as_value

    # raw user data that LOOKS tagged but does not parse must not fail the
    # Arrow batch — it stays a plain string
    assert as_value("i:hello") == "i:hello"
    assert as_value("i:5") == 5
    assert as_value("plain") == "plain"


def test_rejects_non_reference_types():
    with pytest.raises(TypeError):
        encode_value(3.14)
    with pytest.raises(TypeError):
        encode_value(True)
    with pytest.raises(TypeError):
        encode_value(b"bytes")
    with pytest.raises(ValueError):
        encode_value(2**70)


json_scalars = st.integers(min_value=-(2**63), max_value=2**63 - 1) | st.text(
    max_size=40
)
nested = st.recursive(
    json_scalars,
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(nested)
def test_roundtrip_property(v):
    assert decode_value(encode_value(v)) == v


# ---------------------------------------------------------------------------
# Property-based round-trip coverage (hypothesis): arbitrary nested values
# through the tagged codec — the serde analogue of the reference's
# exhaustive UInt128Test decode cases.
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _scalar = st.one_of(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        st.text(max_size=40),
    )
    _value = st.recursive(
        _scalar,
        lambda children: st.one_of(
            st.lists(children, max_size=5),
            st.dictionaries(st.text(max_size=10), children, max_size=5),
        ),
        max_leaves=12,
    )

    @given(_value)
    @settings(max_examples=300, deadline=None)
    def test_serde_roundtrip_arbitrary_nested(v):
        from torcdb_spark.serde import decode_value, encode_value

        got = decode_value(encode_value(v))
        # tuples normalize to lists through the codec; compare structurally
        def norm(x):
            if isinstance(x, tuple):
                return [norm(e) for e in x]
            if isinstance(x, list):
                return [norm(e) for e in x]
            if isinstance(x, dict):
                return {norm(k): norm(val) for k, val in x.items()}
            return x

        assert got == norm(v)

    @given(st.integers(min_value=0, max_value=(1 << 128) - 1))
    @settings(max_examples=300, deadline=None)
    def test_uint128_roundtrip_any_width(v):
        from torcdb_spark.ids import to_uint128, uint128, uint128_hex

        assert to_uint128(uint128(v)) == v
        assert uint128(uint128_hex(uint128(v))) == uint128(v)
        assert uint128(str(v)) == uint128(v)
