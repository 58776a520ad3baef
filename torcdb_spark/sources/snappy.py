"""Pure-Python Snappy (raw format) codec — stdlib-only.

Snappy is the compression real-world Avro OCF predominantly ships with
(and the historical default of Parquet v1 data pages), so an ingestion
path that only speaks null/deflate dies on the most common wire form it
will actually meet.  The raw block format is public
(github.com/google/snappy, format_description.txt): a little-endian
varint preamble holding the UNCOMPRESSED length, then a sequence of
tagged elements — tag low 2 bits select literal (00), copy with 1-byte
offset (01), 2-byte offset (10), or 4-byte offset (11); literals carry
len-1 in the upper 6 bits (60..63 escape to 1..4 extra little-endian
length bytes), copy-1 packs len-4 (3 bits) + offset bits 8..10 into the
tag with one trailing offset byte, copy-2/copy-4 carry len-1 in the
upper 6 bits with a 2-/4-byte little-endian offset.  Copies may overlap
their own output (offset < length repeats the pattern) — that is the
RLE path and must be byte-serial, not a single slice.

:func:`snappy_decompress` is the strict decoder (ValueError on a bad
preamble, an element overrunning the input, an offset reaching before
the output start, or a final length that disagrees with the preamble —
a corrupt block in a lake-scale corpus must surface as an error row,
not silent truncation).  :func:`snappy_compress` is the fixture-writer
mirror: a greedy 4-byte-hash matcher in the classic snappy style
emitting 2-byte-offset copies, so round-trip fixtures exercise the
literal, copy, and overlap paths with real back-references rather than
an all-literal degenerate stream.
"""

from __future__ import annotations


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated snappy varint preamble")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7
        if shift > 35:  # spec caps uncompressed length at 2^32-1
            raise ValueError("snappy length varint exceeds 32 bits")


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def snappy_decompress(buf: bytes) -> bytes:
    """Raw-format snappy block → uncompressed bytes (strict)."""
    expected, pos = _read_uvarint(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 -> that many extra length bytes
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy literal length overruns input")
                ln = int.from_bytes(buf[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy literal overruns input")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset: len 4..11, offset 11 bits
            if pos >= n:
                raise ValueError("snappy copy-1 overruns input")
            ln = ((tag >> 2) & 0x07) + 4
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte little-endian offset
            if pos + 2 > n:
                raise ValueError("snappy copy-2 overruns input")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte little-endian offset
            if pos + 4 > n:
                raise ValueError("snappy copy-4 overruns input")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy copy offset outside produced output")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy: byte-serial repeat (the RLE path)
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != expected:
        raise ValueError(
            f"snappy output length {len(out)} != preamble {expected}"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Greedy hash-match snappy encoder (fixture mirror of the
    decoder).  Emits literals plus 2-byte-offset copies found via a
    4-byte rolling hash table, splitting elements at the format's
    64-byte copy / 2^16-1 offset limits; always round-trips through
    :func:`snappy_decompress`."""
    out = bytearray(_uvarint(len(data)))
    n = len(data)

    def emit_literal(chunk: bytes) -> None:
        i = 0
        while i < len(chunk):
            piece = chunk[i : i + 65536]
            ln = len(piece) - 1
            if ln < 60:
                out.append(ln << 2)
            elif ln < 256:
                out.append(60 << 2)
                out.append(ln)
            else:
                out.append(61 << 2)
                out.extend(ln.to_bytes(2, "little"))
            out.extend(piece)
            i += len(piece)

    def emit_copy(off: int, ln: int) -> None:
        while ln > 0:
            piece = min(ln, 64)
            # the format forbids copy-2 len<1; piece>=4 by construction
            out.append(((piece - 1) << 2) | 0x02)
            out.extend(off.to_bytes(2, "little"))
            ln -= piece

    table: dict[int, int] = {}
    pos = 0
    lit_start = 0
    while pos + 4 <= n:
        key = int.from_bytes(data[pos : pos + 4], "little")
        cand = table.get(key)
        table[key] = pos
        if (
            cand is not None
            and pos - cand <= 0xFFFF
            and data[cand : cand + 4] == data[pos : pos + 4]
        ):
            ln = 4
            while pos + ln < n and data[cand + ln] == data[pos + ln]:
                ln += 1
            if lit_start < pos:
                emit_literal(data[lit_start:pos])
            emit_copy(pos - cand, ln)
            pos += ln
            lit_start = pos
        else:
            pos += 1
    if lit_start < n:
        emit_literal(data[lit_start:])
    return bytes(out)
