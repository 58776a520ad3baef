"""Property-value serde for the reference's five-type system.

TorcDB serializes property values with a 1-byte type tag over exactly five
types — INTEGER, LONG, STRING, LIST, MAP (TorcHelper.java:92-127, encode
:138-215, decode :252-299). The Spark engine stores properties either as
typed columns (preferred, per-label layout) or as a generic
MAP<STRING,STRING> with tagged string values; this module provides the
tagged-string codec and guarantees round-trip fidelity for the five
reference types, including arbitrary nesting (list<map<...>> etc.).

Wire format (printable, sortable on type tag):
    i:<decimal>            INTEGER  (32-bit, range-checked)
    l:<decimal>            LONG
    s:<raw string>         STRING
    L:<n>:<e1>,<e2>,...    LIST  — elements length-prefixed recursively
    M:<n>:<k1>,<v1>,...    MAP   — alternating key/value, length-prefixed

Length-prefixing uses ``<len>|<payload>`` per element so values containing
delimiters round-trip exactly.
"""

from __future__ import annotations

INT_MIN, INT_MAX = -(1 << 31), (1 << 31) - 1
LONG_MIN, LONG_MAX = -(1 << 63), (1 << 63) - 1


def encode_value(v) -> str:
    """Encode one of the five reference types to the tagged string form."""
    if isinstance(v, bool):
        raise TypeError("boolean is not a reference property type "
                        "(TorcHelper.java:92-127)")
    if isinstance(v, int):
        if INT_MIN <= v <= INT_MAX:
            return f"i:{v}"
        if LONG_MIN <= v <= LONG_MAX:
            return f"l:{v}"
        raise ValueError(f"integer out of 64-bit range: {v}")
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, (list, tuple)):
        parts = [_prefixed(encode_value(e)) for e in v]
        return f"L:{len(parts)}:" + "".join(parts)
    if isinstance(v, dict):
        parts = []
        for k, val in v.items():
            parts.append(_prefixed(encode_value(k)))
            parts.append(_prefixed(encode_value(val)))
        return f"M:{len(v)}:" + "".join(parts)
    raise TypeError(
        f"unsupported property type {type(v).__name__}; reference types are "
        "int/long/string/list/map (TorcHelper.java:92-127)"
    )


def decode_value(s: str):
    v, rest = _decode_prefixless(s)
    if rest:
        raise ValueError(f"trailing bytes after value: {rest!r}")
    return v


def encode_long_as_int_preference(v: int) -> str:
    """Force LONG encoding regardless of magnitude (the reference keeps the
    writer's declared type; use this when a schema says long)."""
    if not (LONG_MIN <= v <= LONG_MAX):
        raise ValueError(f"out of 64-bit range: {v}")
    return f"l:{v}"


def _prefixed(payload: str) -> str:
    return f"{len(payload)}|{payload}"


def _take_prefixed(s: str) -> tuple[str, str]:
    bar = s.index("|")
    n = int(s[:bar])
    start = bar + 1
    return s[start : start + n], s[start + n :]


def _decode_prefixless(s: str):
    tag, rest = s[0], s[2:]
    if s[1] != ":":
        raise ValueError(f"malformed tagged value: {s[:16]!r}")
    if tag == "i":
        v = int(rest)
        if not (INT_MIN <= v <= INT_MAX):
            raise ValueError(f"INTEGER out of range: {v}")
        return v, ""
    if tag == "l":
        return int(rest), ""
    if tag == "s":
        return rest, ""
    if tag in ("L", "M"):
        colon = rest.index(":")
        n = int(rest[:colon])
        body = rest[colon + 1 :]
        items = []
        count = n * 2 if tag == "M" else n
        for _ in range(count):
            payload, body = _take_prefixed(body)
            item, extra = _decode_prefixless(payload)
            if extra:
                raise ValueError("nested value with trailing bytes")
            items.append(item)
        if tag == "L":
            return items, body
        return dict(zip(items[0::2], items[1::2])), body
    raise ValueError(f"unknown type tag {tag!r}")
