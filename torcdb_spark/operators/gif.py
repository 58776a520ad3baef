"""Pure-stdlib GIF87a/89a codec: LZW decompression/compression + palette
mapping, no imaging libraries — the GIF sibling of operators/jpeg.py,
giving the multimodal decode path (operators/multimodal.decode_image) real
coverage of the last common legacy raster format.

Scope: single-image GIFs, global or local color table, interlaced or
not (de-interlacing is an inverse row scatter); animated/multi-frame
GIFs raise a documented NotImplementedError — same contract as
progressive JPEG. The encoder writes an 8-bit global
palette and a correct variable-code-width LZW stream with CLEAR handling,
so encode→decode round-trips are bit-exact and testable with no codec
libs.

Reference parity note: TorcDB has no media path at all (SURVEY §2.5) —
this module is extension surface for the multimodal training-data
pipeline.
"""

from __future__ import annotations

import struct


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Decode a GIF LZW code stream (already de-blocked) into index bytes."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader, LSB-first per GIF spec
    bitpos = 0
    nbits = len(data) * 8

    def read_code(size: int) -> int:
        nonlocal bitpos
        if bitpos + size > nbits:
            return end  # truncated stream: treat as END
        byte_i = bitpos >> 3
        v = int.from_bytes(data[byte_i:byte_i + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << size) - 1)
        bitpos += size
        return v

    def fresh_table() -> dict[int, bytes]:
        return {i: bytes([i]) for i in range(clear)}

    table = fresh_table()
    code_size = min_code_size + 1
    prev: bytes | None = None
    next_code = end + 1
    while len(out) < n_pixels:
        code = read_code(code_size)
        if code == clear:
            table = fresh_table()
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out[:n_pixels])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Encode index bytes as a GIF LZW code stream (not yet de-blocked)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    cur = 0
    curbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal cur, curbits
        cur |= code << curbits
        curbits += size
        while curbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            curbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        table[wc] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if curbits:
        out.append(cur & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes):
    """Decode a single-image GIF (interlaced or not) → (h, w, 3) uint8
    RGB numpy array. Raises ValueError on malformed data and
    NotImplementedError for multi-frame/animated inputs."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        palette = np.frombuffer(
            payload, dtype=np.uint8, count=gct_size * 3, offset=pos
        ).reshape(gct_size, 3)
        pos += gct_size * 3
    img = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if img is not None:
            raise NotImplementedError("multi-frame/animated GIF")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        interlaced = bool(iflags & 0x40)
        pal = palette
        if iflags & 0x80:
            lct_size = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=lct_size * 3, offset=pos
            ).reshape(lct_size, 3)
            pos += lct_size * 3
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code_size = payload[pos]
        pos += 1
        stream = bytearray()
        while payload[pos] != 0:
            n = payload[pos]
            stream += payload[pos + 1:pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = _lzw_decode(bytes(stream), min_code_size, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("truncated GIF pixel data")
        arr = np.frombuffer(idx, dtype=np.uint8).reshape(ih, iw)
        if interlaced:
            # GIF89a appendix E: rows stored in four passes
            # (0::8, 4::8, 2::4, 1::2) — de-interlace by inverse scatter
            order = np.concatenate(
                [
                    np.arange(0, ih, 8),
                    np.arange(4, ih, 8),
                    np.arange(2, ih, 4),
                    np.arange(1, ih, 2),
                ]
            )
            out_rows = np.empty_like(arr)
            out_rows[order] = arr
            arr = out_rows
        if int(arr.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        frame = pal[arr]
        if (ix, iy, iw, ih) != (0, 0, w, h):
            canvas = np.zeros((h, w, 3), dtype=np.uint8)
            canvas[iy:iy + ih, ix:ix + iw] = frame
            frame = canvas
        img = frame
    if img is None:
        raise ValueError("GIF contains no image block")
    return img


def encode_gif(img, palette=None) -> bytes:
    """Encode an (h, w) palette-index array or an (h, w, 3) RGB array as a
    single-image GIF89a. RGB inputs are quantized to a 256-entry 6-7-6ish
    uniform palette unless an explicit (n, 3) palette plus index image is
    given; round-trips of paletted inputs are bit-exact."""
    import numpy as np

    arr = np.asarray(img)
    if arr.ndim == 3:
        # uniform quantization to the NEAREST level (rounding, not
        # truncation — halves the worst-case error): 8 levels R, 8 G,
        # 4 B = 256 entries
        r = np.rint(arr[:, :, 0].astype(np.float64) * 7 / 255).astype(np.uint16)
        g = np.rint(arr[:, :, 1].astype(np.float64) * 7 / 255).astype(np.uint16)
        b = np.rint(arr[:, :, 2].astype(np.float64) * 3 / 255).astype(np.uint16)
        idx = (r << 5 | g << 2 | b).astype(np.uint8)
        levels_r = (np.arange(8) * 255 // 7).astype(np.uint8)
        levels_b = (np.arange(4) * 255 // 3).astype(np.uint8)
        palette = np.zeros((256, 3), dtype=np.uint8)
        codes = np.arange(256)
        palette[:, 0] = levels_r[(codes >> 5) & 7]
        palette[:, 1] = levels_r[(codes >> 2) & 7]
        palette[:, 2] = levels_b[codes & 3]
    else:
        idx = arr.astype(np.uint8)
        if palette is None:
            raise ValueError("index input requires an explicit palette")
        palette = np.asarray(palette, dtype=np.uint8)
        if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
            raise ValueError("palette must be (n<=256, 3)")
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
    h, w = idx.shape
    # pad palette to a power of two >= 2
    n = 2
    while n < len(palette):
        n *= 2
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[:len(palette)] = palette
    depth = max(n.bit_length() - 1, 1)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = max(depth, 2)
    out.append(min_code_size)
    stream = _lzw_encode(idx.tobytes(), min_code_size)
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animated(frames, palette, delay_cs: int = 10) -> bytes:
    """Encode a list of (h, w) palette-index arrays as an animated GIF89a
    (NETSCAPE2.0 loop extension + per-frame Graphic Control Extension
    with ``delay_cs`` centiseconds). All frames share the global palette
    and full-frame geometry — the layout synthetic/test animations use;
    per-frame sub-rectangles are an encoder extension."""
    import numpy as np

    if not frames:
        raise ValueError("need at least one frame")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("palette must be (n<=256, 3)")
    h, w = np.asarray(frames[0]).shape
    n = 2
    while n < len(pal):
        n *= 2
    padded = np.zeros((n, 3), dtype=np.uint8)
    padded[:len(pal)] = pal
    depth = max(n.bit_length() - 1, 1)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += padded.tobytes()
    # NETSCAPE looping application extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code_size = max(depth, 2)
    for f in frames:
        idx = np.asarray(f, dtype=np.uint8)
        if idx.shape != (h, w):
            raise ValueError("all frames must share the logical screen size")
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code_size)
        stream = _lzw_encode(idx.tobytes(), min_code_size)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes):
    """Decode EVERY frame of a (possibly animated) GIF → list of
    (h, w, 3) uint8 RGB arrays, composited with do-not-dispose semantics
    (each image block drawn onto a copy of the previous canvas at its
    declared sub-rectangle — the common case for synthetic/optimized
    animations; transparency indices are treated as opaque, documented).
    Single-image GIFs return a one-element list."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        palette = np.frombuffer(
            payload, dtype=np.uint8, count=gct_size * 3, offset=pos
        ).reshape(gct_size, 3)
        pos += gct_size * 3
    frames = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        interlaced = bool(iflags & 0x40)
        pal = palette
        if iflags & 0x80:
            lct_size = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=lct_size * 3, offset=pos
            ).reshape(lct_size, 3)
            pos += lct_size * 3
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code_size = payload[pos]
        pos += 1
        stream = bytearray()
        while payload[pos] != 0:
            nb = payload[pos]
            stream += payload[pos + 1:pos + 1 + nb]
            pos += 1 + nb
        pos += 1
        idx = _lzw_decode(bytes(stream), min_code_size, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("truncated GIF pixel data")
        arr = np.frombuffer(idx, dtype=np.uint8).reshape(ih, iw)
        if interlaced:
            order = np.concatenate(
                [np.arange(0, ih, 8), np.arange(4, ih, 8),
                 np.arange(2, ih, 4), np.arange(1, ih, 2)]
            )
            out_rows = np.empty_like(arr)
            out_rows[order] = arr
            arr = out_rows
        if int(arr.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        canvas = canvas.copy()
        canvas[iy:iy + ih, ix:ix + iw] = pal[arr]
        frames.append(canvas)
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames
