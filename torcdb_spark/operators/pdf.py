"""Minimal PDF text extraction — the pdf→text stage of a training-data
pipeline, pure stdlib (zlib for FlateDecode).

`extract_pdf_text` handles the text-bearing subset of PDF a corpus
pipeline meets: stream-object scanning with /Length-bounded slicing,
optional ``/FlateDecode``, page content streams in document order,
and the text-showing operators inside BT…ET blocks — ``Tj``, the
``TJ`` array form (kerning numbers skipped), and the ``'``/``\"``
next-line forms — with full literal-string unescaping (``\\(``, ``\\)``,
``\\\\``, ``\\n/\\r/\\t/\\b/\\f``, octal ``\\ddd``, and
backslash-newline continuation). Td/TD/T*/'/" line moves emit newlines
so multi-line pages extract in reading order. Hex strings ``<…>`` are
decoded bytewise. Everything latin-1; CID/Type0 composite fonts and
encrypted documents are out of scope and extract as empty (a deployment
plugs in a real PDF library behind the same column contract).

`encode_pdf_text` is the matching fixture writer (catalog → pages →
page → content stream per page, correct xref + trailer, optional
FlateDecode), so extraction round-trips are testable end-to-end in a
container without a PDF library.

At 100 TB: payloads ride a binary column through Arrow-batched
``mapInPandas`` (`pdf_text_udf`-style kernels in queries.py) exactly
like the image/audio codecs — no driver round-trips, parallelism from
partitions.
"""

from __future__ import annotations

import re
import zlib


def encode_pdf_text(
    pages: list[list[str]], compress: bool = False
) -> bytes:
    """Write a minimal well-formed PDF: one content stream per page,
    each inner list being that page's text lines (latin-1). With
    ``compress`` the content streams are FlateDecode."""
    objects: list[bytes] = []  # 1-indexed

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("latin-1")

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page:
    # page object, content object
    page_obj_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{i} 0 R" for i in page_obj_ids)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, lines in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for j, line in enumerate(lines):
            if j:
                content += b"T*\n"
            content += b"(" + esc(line) + b") Tj\n"
        content += b"ET"
        body = bytes(content)
        if compress:
            body = zlib.compress(body)
            hdr = (
                f"<< /Length {len(body)} /Filter /FlateDecode >>".encode()
            )
        else:
            hdr = f"<< /Length {len(body)} >>".encode()
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {page_obj_ids[i] + 1} 0 R >>".encode()
        )
        objects.append(hdr + b"\nstream\n" + body + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


_STREAM_HDR_RE = re.compile(rb"<<(.*?)>>\s*stream(\r\n|\n|\r)", re.S)


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    simple = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8,
        ord("f"): 12, ord("("): 40, ord(")"): 41, ord("\\"): 92,
    }
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i]
        if c in simple:
            out.append(simple[c])
            i += 1
        elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
            val = 0
            k = 0
            while i < n and k < 3 and 0x30 <= raw[i] <= 0x37:
                val = val * 8 + (raw[i] - 0x30)
                i += 1
                k += 1
            out.append(val & 0xFF)
        elif c in (0x0A, 0x0D):  # line continuation
            i += 1
            if c == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:  # unknown escape: the char itself (PDF 32000 7.3.4.2)
            out.append(c)
            i += 1
    return bytes(out)


def _read_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """data[i] == '(' → (string bytes, index past ')'), balancing
    nested unescaped parens per the spec."""
    depth = 1
    i += 1
    start = i
    out = bytearray()
    while i < len(data) and depth:
        c = data[i]
        if c == 0x5C:
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                break
        i += 1
    out += data[start:i]
    return _unescape(bytes(out)), i + 1


def _extract_content_text(content: bytes) -> str:
    """Text-showing operators from one content stream."""
    parts: list[str] = []
    i = 0
    n = len(content)
    in_text = False
    pending: list[str] = []

    def flush_line():
        if pending:
            parts.append("".join(pending))
            pending.clear()

    while i < n:
        c = content[i]
        if c == 0x28 and in_text:  # literal string
            s, i = _read_literal(content, i)
            pending.append(s.decode("latin-1"))
            continue
        if c == 0x3C and in_text and i + 1 < n and content[i + 1] != 0x3C:
            j = content.find(b">", i)
            if j != -1:
                hx = re.sub(rb"\s", b"", content[i + 1 : j])
                if len(hx) % 2:
                    hx += b"0"
                pending.append(bytes.fromhex(hx.decode()).decode("latin-1"))
                i = j + 1
                continue
        if content.startswith(b"BT", i):
            in_text = True
            i += 2
            continue
        if content.startswith(b"ET", i):
            flush_line()
            in_text = False
            i += 2
            continue
        if in_text and (
            content.startswith(b"T*", i)
            or content.startswith(b"Td", i)
            or content.startswith(b"TD", i)
        ):
            flush_line()
            i += 2
            continue
        if in_text and c in (0x27, 0x22):  # ' and " show-next-line ops
            # the operand STRING precedes the operator, so it is already
            # in pending: the line break belongs before it, not after
            last = pending.pop() if pending else None
            flush_line()
            if last is not None:
                pending.append(last)
            i += 1
            continue
        i += 1
    flush_line()
    return "\n".join(parts)


def extract_pdf_text(payload: bytes) -> str:
    """Whole-document text, pages in document order, lines joined with
    newlines (see module docstring for the supported subset)."""
    if not payload.startswith(b"%PDF"):
        raise ValueError("not a PDF payload")
    texts: list[str] = []
    for m in _STREAM_HDR_RE.finditer(payload):
        hdr = m.group(1)
        start = m.end()
        # direct /Length bounds the stream data exactly — compressed
        # bytes can contain 'endstream' or end in \r/\n, so neither a
        # regex body capture nor EOL-stripping is reliable; indirect
        # (N 0 R) lengths fall back to the endstream scan
        lm = re.search(rb"/Length\s+(\d+)(\s+\d+\s+R)?", hdr)
        if lm and not lm.group(2):
            body = payload[start : start + int(lm.group(1))]
        else:
            j = payload.find(b"endstream", start)
            if j == -1:
                continue
            body = payload[start:j]
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith((b"\n", b"\r")):
                body = body[:-1]
        if b"/FlateDecode" in hdr:
            try:
                body = zlib.decompress(body)
            except zlib.error as exc:
                raise ValueError(f"bad FlateDecode stream: {exc}") from exc
        if b"BT" in body:
            t = _extract_content_text(body)
            if t:
                texts.append(t)
    return "\n".join(texts)
