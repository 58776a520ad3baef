"""Pure-numpy baseline JPEG (ITU-T T.81) codec — closes the multimodal
decode surface's last documented NotImplementedError without any codec
library.

Decoder: baseline sequential DCT (SOF0), extended sequential DCT
(SOF1), AND progressive DCT (SOF2), 8-bit or 12-bit sample precision,
1 or 3 components, sampling factors 1 or 2 (4:4:4 / 4:2:2 / 4:2:0),
DHT-defined canonical Huffman tables (8-bit and 16-bit DQT entries),
byte-stuffing (FF 00) and restart markers (DRI/RSTn). Progressive
covers the full T.81 Annex G.2 successive-approximation surface:
interleaved/non-interleaved DC first + refinement scans, per-component
AC band scans with EOB-run coding, and AC refinement with buffered
correction bits. 12-bit frames level-shift by 2048 and rescale to the
engine's uint8 pixel contract with round-half-up (the same rule the
16-bit PPM/TIFF paths use). The LOSSLESS process (SOF3, T.81 Annex H)
also decodes: per-sample Huffman-coded prediction differences over
predictors 1..7, mod-2^16 reconstruction, point transform, 2..16-bit
precision, restart markers — bit-exact round trips with
``encode_jpeg_lossless``. Arithmetic coding and hierarchical remain
NotImplementedError by design.

Encoders (`encode_jpeg_baseline`, `encode_jpeg_progressive`): matching
writers — Annex-K quantization tables scaled by the IJG quality formula,
spec-standard Huffman tables, optional 4:2:0 subsampling and restart
intervals (baseline); the progressive writer emits a DC-first(Al=1) /
per-component AC band scans(Al=1) / DC-refine / AC-refine scan script so
every G.2 decode path is exercised. Their purpose here is the same as
``encode_png``/``encode_wav_pcm``: produce real compressed bytes so the
decoder is testable end-to-end in a container with no imaging libraries
(round-trip error is bounded by the quantization tables — and baseline
vs progressive of the same image must decode BIT-IDENTICALLY, since the
quantized coefficients are the same).

The entropy loop is scalar Python per 8×8 block: fine for the kernel's
role (it runs INSIDE an Arrow-batched ``mapInPandas`` over a binary
column — parallelism comes from partitions, operators/multimodal.py). The
DCT/IDCT, quantization, color transforms, and upsampling are vectorized
numpy over whole planes.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex-K quantization tables (luminance / chrominance)
QT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
])
QT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
])

# Annex-K Huffman table specs: (bits[1..16] counts, symbol values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Extended-sequential (12-bit) Huffman specs. Annex K's tables stop at
# SSSS 11 (DC) / 10 (AC) — enough for 8-bit samples only. At 12-bit
# precision T.81 Tables F.1/F.7 allow DC difference categories 0..15 and
# AC magnitude categories 1..14, so the writer installs its own complete
# canonical codes: DC = fifteen 4-bit codes + one 5-bit (Kraft 31/32,
# all-ones codeword unassigned as K.2 requires); AC = all 226 reachable
# symbols (EOB, ZRL, RRRRSSSS for SSSS 1..14) at 8 bits (226/256).
DC_EXT_BITS = [0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_EXT_VALS = list(range(16))
AC_EXT_BITS = [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0]
AC_EXT_VALS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)]
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: FDCT = D·b·Dᵀ, IDCT = Dᵀ·F·D
    (matches T.81's 1/4·C(u)C(v)·Σ form exactly)."""
    u = np.arange(8).reshape(-1, 1)
    x = np.arange(8).reshape(1, -1)
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    d[0, :] /= np.sqrt(2)
    return d

_D = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) under JPEG's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # marker reached mid-entropy (e.g. padded tail): feed 0s
                self.pos -= 1
                b = 0
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align, then consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0x00:
            self.pos += 2
        if self.data[self.pos] != 0xFF or (self.data[self.pos + 1] & 0xF8) != 0xD0:
            raise ValueError("expected restart marker")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the raw ``size``-bit magnitude to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _size_of(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_jpeg_baseline(
    img: np.ndarray,
    quality: int = 90,
    subsample_420: bool = False,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale array as a sequential
    JPEG (Annex-K quant tables). ``precision=8`` (uint8 samples) emits
    baseline SOF0 with the Annex-K Huffman tables; ``precision=12``
    (integer samples in 0..4095) emits extended-sequential SOF1 with the
    complete DC0..15/AC1..14 tables and 16-bit (Pq=1) DQT entries."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    shift = float(1 << (precision - 1))
    qt_l = _scaled_qt(QT_LUM, quality)
    qt_c = _scaled_qt(QT_CHROM, quality)

    if gray:
        planes = [img.astype(np.float64) - shift]
        samp = [(1, 1)]
        qts = [qt_l]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + shift
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + shift
        if subsample_420:
            def down2(p):
                ph, pw = p.shape
                p = np.pad(p, ((0, ph % 2), (0, pw % 2)), mode="edge")
                return (
                    p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )
            planes = [y - shift, down2(cb) - shift, down2(cr) - shift]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - shift, cb - shift, cr - shift]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad every plane to its MCU-aligned size (edge replication)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcus_y * 8 * sv, mcus_x * 8 * sh
        padded.append(
            np.pad(
                p,
                ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                mode="edge",
            )
        )

    if precision == 12:
        # one shared table pair: the extended specs cover every category
        # either channel class can produce
        dc_specs = [(DC_EXT_BITS, DC_EXT_VALS)] * 2
        ac_specs = [(AC_EXT_BITS, AC_EXT_VALS)] * 2
    else:
        dc_specs = [(DC_LUM_BITS, DC_LUM_VALS), (DC_CHROM_BITS, DC_CHROM_VALS)]
        ac_specs = [(AC_LUM_BITS, AC_LUM_VALS), (AC_CHROM_BITS, AC_CHROM_VALS)]
    dc_tabs = [_canonical_codes(*s) for s in dc_specs]
    ac_tabs = [_canonical_codes(*s) for s in ac_specs]

    # quantized coefficients per plane, vectorized: (blocks_y, blocks_x, 64)
    qcoef = []
    for p, qt in zip(padded, qts):
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,ybxv,wv->ybuw", _D, blocks, _D)
        q = np.round(coef / qt).astype(np.int64)
        qcoef.append(q)  # zigzag applied at emission time from the 8x8 grid
    bw = _BitWriter()
    dc_pred = [0] * len(planes)
    zz_r = ZIGZAG  # natural index order for flattened 8x8
    mcu_count = 0
    rst_idx = 0

    def emit_block(ci: int, block: np.ndarray) -> None:
        t = 0 if ci == 0 or gray else 1
        dct, act = dc_tabs[t], ac_tabs[t]
        flat = block.reshape(64)[zz_r]
        diff = int(flat[0]) - dc_pred[ci]
        dc_pred[ci] = int(flat[0])
        s = _size_of(diff)
        code, ln = dct[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = 0
        nz = np.nonzero(flat[1:])[0]
        last_nz = nz[-1] + 1 if len(nz) else 0
        for k in range(1, 64):
            v = int(flat[k])
            if k > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _size_of(v)
            sym = (run << 4) | s
            if sym not in act:
                raise ValueError(f"AC symbol {sym:#x} missing from table")
            code, ln = act[sym]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = act[0x00]  # EOB
            bw.write(code, ln)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                for i in range(len(dc_pred)):
                    dc_pred[i] = 0
            for ci, (q, (sh, sv)) in enumerate(zip(qcoef, samp)):
                for vy in range(sv):
                    for vx in range(sh):
                        emit_block(ci, q[my * sv + vy, mx * sh + vx])
            mcu_count += 1
    bw.flush()

    # ---- headers -------------------------------------------------------
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        zz = qt.reshape(64)[ZIGZAG]
        if precision == 12:  # Pq=1: 16-bit entries (T.81 B.2.4.1)
            return seg(0xDB, bytes([0x10 | tid]) + zz.astype(">u2").tobytes())
        return seg(0xDB, bytes([tid]) + bytes(zz.astype(np.uint8)))

    out += dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)
    ncomp = 1 if gray else 3
    sof = bytearray([precision])
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    # SOF0 baseline for 8-bit, SOF1 extended sequential for 12-bit
    out += seg(0xC0 if precision == 8 else 0xC1, bytes(sof))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, *dc_specs[0])
    out += dht(1, 0, *ac_specs[0])
    if not gray:
        out += dht(0, 1, *dc_specs[1])
        out += dht(1, 1, *ac_specs[1])
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG → (h, w, 3) RGB (or (h, w, 1)
    grayscale) uint8. Baseline decodes its single scan straight to
    pixels; progressive accumulates every scan's contribution into
    per-component coefficient arrays and reconstructs once at EOI."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart = 0
    comps: list[dict] = []
    progressive = False
    lossless = False
    sample_prec = 8
    coeffs: dict[int, np.ndarray] = {}
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        ln = int.from_bytes(payload[pos:pos + 2], "big")
        body = payload[pos + 2: pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            b = body
            while b:
                pq, tid = b[0] >> 4, b[0] & 0xF
                tbl = np.zeros(64, dtype=np.int64)
                if pq:  # Pq=1: 16-bit entries (12-bit frames)
                    tbl[ZIGZAG] = np.frombuffer(b[1:129], dtype=">u2")
                    b = b[129:]
                else:
                    tbl[ZIGZAG] = np.frombuffer(b[1:65], dtype=np.uint8)
                    b = b[65:]
                qts[tid] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0xF
                bits = list(b[1:17])
                nv = sum(bits)
                vals = list(b[17:17 + nv])
                table = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                b = b[17 + nv:]
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1 seq, SOF2 prog, SOF3 lossless
            sample_prec = body[0]
            lossless = marker == 0xC3
            if lossless:
                if not 2 <= sample_prec <= 16:
                    raise ValueError(f"bad lossless precision {sample_prec}")
            elif sample_prec not in (8, 12):
                raise NotImplementedError(f"{sample_prec}-bit JPEG")
            progressive = marker == 0xC2
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, sampb, qid = body[6 + 3 * i: 9 + 3 * i]
                comps.append({
                    "id": cid, "h": sampb >> 4, "v": sampb & 0xF, "q": qid,
                })
            frame = (fh, fw)
            if progressive:
                # per-component zigzag-order coefficient store, sized to
                # the MCU-padded grid (interleaved DC scans touch the
                # padding blocks; non-interleaved scans a sub-grid)
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcx = -(-fw // (8 * hmax))
                mcy = -(-fh // (8 * vmax))
                for c in comps:
                    coeffs[c["id"]] = np.zeros(
                        (mcy * c["v"], mcx * c["h"], 64), dtype=np.int64
                    )
        elif 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise NotImplementedError(
                "only sequential (SOF0/1), progressive (SOF2) and lossless "
                "(SOF3) JPEG are supported (hierarchical/arithmetic are not)"
            )
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cid)
                scan.append((comp, tt >> 4, tt & 0xF))
            data_start = pos + ln
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            if lossless:
                return _decode_lossless_scan(
                    payload, data_start, frame, scan, huff, restart,
                    sample_prec, ss, ah_al & 0xF,
                )
            if not progressive:
                return _decode_scan(
                    payload, data_start, frame, scan, qts, huff, restart,
                    sample_prec,
                )
            pos = _decode_progressive_scan(
                payload, data_start, frame, comps, scan,
                ss, se, ah_al >> 4, ah_al & 0xF, huff, restart, coeffs,
            )
            continue
        pos += ln
    if progressive and frame is not None and coeffs:
        return _reconstruct_progressive(frame, comps, coeffs, qts, sample_prec)
    raise ValueError("no SOS segment found")


def _read_symbol(br: "_BitReader", table) -> int:
    """Canonical-Huffman symbol decode shared by the sequential,
    lossless, and progressive scan loops."""
    length = 0
    code = 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _finish_planes(out_planes, prec):
    """Shared sequential/progressive tail: clip to the sample range,
    color-convert, and rescale 12-bit samples to the engine's uint8
    contract with round-half-up (the 16-bit PPM/TIFF rule)."""
    maxval = (1 << prec) - 1
    shift = float(1 << (prec - 1))

    def to_u8(x):
        v = np.clip(np.round(x), 0, maxval).astype(np.int64)
        if prec > 8:
            v = (v * 255 + maxval // 2) // maxval
        return v.astype(np.uint8)

    if len(out_planes) == 1:
        return to_u8(out_planes[0])[:, :, None]
    y, cb, cr = out_planes
    cb = cb - shift
    cr = cr - shift
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return to_u8(np.stack([r, g, b], axis=-1))


def _decode_scan(data, pos, frame, scan, qts, huff, restart, prec=8):
    fh, fw = frame
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    planes = []
    for c, _, _ in scan:
        planes.append(
            np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]))
        )
    br = _BitReader(data, pos)

    dc_pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                br.align_and_expect_rst(mcu_count // restart)
                for i in range(len(dc_pred)):
                    dc_pred[i] = 0
            for ci, (c, dct_id, act_id) in enumerate(scan):
                dct = huff[(0, dct_id)]
                act = huff[(1, act_id)]
                qt = qts[c["q"]]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _read_symbol(br, dct)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        dc_pred[ci] += diff
                        zz[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(br, act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = zz
                        block = block.reshape(8, 8) * qt
                        pix = _D.T @ block @ _D
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    # upsample to full frame grid, crop, color-convert
    out_planes = []
    for (c, _, _), p in zip(scan, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:fh, :fw] + float(1 << (prec - 1)))
    return _finish_planes(out_planes, prec)


def _lossless_predict(sel, a, b, c):
    """T.81 Table H.1 predictors (a=left, b=above, c=above-left)."""
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"bad lossless predictor {sel}")


def _decode_lossless_scan(data, pos, frame, scan, huff, restart, prec,
                          psel, pt):
    """Lossless-process scan (T.81 Annex H): per-sample Huffman-coded
    prediction differences, mod-2^16 reconstruction, predictors 1..7,
    default prediction 2^(P-Pt-1) at scan/restart starts. 1x1 sampling
    only (the overwhelmingly common lossless layout)."""
    fh, fw = frame
    if any(c["h"] != 1 or c["v"] != 1 for c, _, _ in scan):
        raise NotImplementedError("lossless JPEG with subsampling")
    br = _BitReader(data, pos)

    default = 1 << (prec - pt - 1)
    planes = [np.zeros((fh, fw), dtype=np.int64) for _ in scan]
    tabs = [huff[(0, dct_id)] for _, dct_id, _ in scan]
    count = 0
    fresh = True  # scan start / just after a restart: default prediction
    # T.81 H.1.1: each restart interval starts like a scan — the first
    # sample predicts from the default, and the REMAINDER of that sample
    # line uses the 1-D predictor Ra (no 2-D prediction across the
    # restart boundary); the selected predictor resumes on later lines.
    first_line = True
    for y in range(fh):
        for x in range(fw):
            if restart and count and count % restart == 0:
                br.align_and_expect_rst(count // restart)
                fresh = True
                first_line = True
            for p, tab in zip(planes, tabs):
                s = _read_symbol(br, tab)
                if s == 16:  # SSSS 16: diff is 32768, no extra bits
                    diff = 32768
                else:
                    diff = _extend(br.read_bits(s), s) if s else 0
                if fresh:
                    pred = default
                elif first_line:
                    pred = int(p[y, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, 0])
                else:
                    pred = _lossless_predict(
                        psel,
                        int(p[y, x - 1]),
                        int(p[y - 1, x]),
                        int(p[y - 1, x - 1]),
                    )
                p[y, x] = (pred + diff) & 0xFFFF
            fresh = False
            count += 1
        first_line = False

    maxval = (1 << prec) - 1
    out = np.stack(planes, axis=-1) << pt
    out = np.clip(out, 0, maxval)
    if prec > 8:
        out = (out * 255 + maxval // 2) // maxval
    return out.astype(np.uint8)


# SSSS categories 0..16 for lossless diffs: fourteen 4-bit + three 5-bit
# codes (Kraft 14/16 + 3/32 = 31/32; the all-ones codeword stays
# unassigned as K.2 requires)
DC_LL_BITS = [0, 0, 0, 14, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_LL_VALS = list(range(17))


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 4,
    precision: int = 8,
    pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) integer samples as a
    lossless-process JPEG (SOF3): predictor ``predictor`` (1..7),
    ``precision``-bit samples (2..16), point transform ``pt`` (samples
    are shifted right by pt before prediction — pt=0 is bit-exact).
    Matching writer for `_decode_lossless_scan`, same role as the other
    encoders here: real bytes so the decoder tests end-to-end."""
    img = np.asarray(img)
    if not 2 <= precision <= 16:
        raise ValueError(f"precision must be 2..16, got {precision}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor must be 1..7, got {predictor}")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    planes = (
        [img.astype(np.int64) >> pt]
        if gray
        else [img[:, :, i].astype(np.int64) >> pt for i in range(3)]
    )
    tab = _canonical_codes(DC_LL_BITS, DC_LL_VALS)
    bw = _BitWriter()
    default = 1 << (precision - pt - 1)
    count = 0
    rst_idx = 0
    fresh = True
    first_line = True  # mirrors _decode_lossless_scan's H.1.1 handling
    for y in range(h):
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                fresh = True
                first_line = True
            for p in planes:
                if fresh:
                    pred = default
                elif first_line:
                    pred = int(p[y, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, 0])
                else:
                    pred = _lossless_predict(
                        predictor,
                        int(p[y, x - 1]),
                        int(p[y - 1, x]),
                        int(p[y - 1, x - 1]),
                    )
                v = (int(p[y, x]) - pred) & 0xFFFF
                if v == 32768:  # SSSS 16, no extra bits
                    code, ln = tab[16]
                    bw.write(code, ln)
                    continue
                diff = v if v <= 32767 else v - 65536
                s = _size_of(diff)
                code, ln = tab[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            fresh = False
            count += 1
        first_line = False
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + (len(payload) + 2).to_bytes(2, "big")
            + payload
        )

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xC4, bytes([0x00]) + bytes(DC_LL_BITS) + bytes(DC_LL_VALS)
    )
    ncomp = 1 if gray else 3
    sof = bytearray([precision])
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, Tq ignored
    out += seg(0xC3, bytes(sof))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0
    sos += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, Ah=0/Al=Pt
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _decode_progressive_scan(
    payload, pos, frame, comps, scan, ss, se, ah, al, huff, restart, coeffs
):
    """Decode ONE progressive scan (T.81 Annex G.2) into the zigzag-order
    coefficient arrays; returns the offset of the next marker.

    Four unit kinds, selected by (ss, ah): DC first (ss=0, ah=0 — the
    only kind that may be interleaved across components), DC refinement
    (ss=0, ah>0: one bit per block ORed at weight 2^al), AC first
    (ss>0, ah=0: band run-length coding with EOB-run counts shared
    across blocks), and AC refinement (ss>0, ah>0: libjpeg's
    correction-bit walk — a history-nonzero coefficient consumes one
    bit whenever the walk passes it, zero-history runs count toward the
    next newly-nonzero ±2^al placement). Restart markers reset both the
    DC predictors and the EOB run."""
    fh, fw = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    br = _BitReader(payload, pos)

    state = {"eobrun": 0}
    dc_pred = [0] * len(scan)
    p1 = 1 << al
    m1 = -p1

    def dc_first(blk, si, dct):
        s = _read_symbol(br, dct)
        diff = _extend(br.read_bits(s), s) if s else 0
        dc_pred[si] += diff
        blk[0] = dc_pred[si] << al

    def dc_refine(blk):
        if br.read_bit():
            blk[0] = int(blk[0]) | p1

    def ac_first(blk, act):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            sym = _read_symbol(br, act)
            r, s = sym >> 4, sym & 0xF
            if s:
                k += r
                if k > se:
                    raise ValueError("AC band index overflow")
                blk[k] = _extend(br.read_bits(s), s) << al
                k += 1
            else:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                k += 16  # ZRL

    def ac_refine(blk, act):
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                sym = _read_symbol(br, act)
                r, s = sym >> 4, sym & 0xF
                newval = 0
                if s:
                    # spec: s is always 1 in a refinement scan
                    newval = p1 if br.read_bit() else m1
                elif r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                # walk forward: correction bits at history-nonzero
                # positions, zero-history positions consume the run
                while k <= se:
                    cur = int(blk[k])
                    if cur != 0:
                        if br.read_bit() and (cur & p1) == 0:
                            blk[k] = cur + (p1 if cur >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                cur = int(blk[k])
                if cur != 0:
                    if br.read_bit() and (cur & p1) == 0:
                        blk[k] = cur + (p1 if cur >= 0 else m1)
                k += 1
            state["eobrun"] -= 1

    def do_unit(blk, si, dct_id, act_id):
        if ss == 0:
            if ah == 0:
                dc_first(blk, si, huff[(0, dct_id)])
            else:
                dc_refine(blk)
        else:
            if ah == 0:
                ac_first(blk, huff[(1, act_id)])
            else:
                ac_refine(blk, huff[(1, act_id)])

    def at_restart(unit):
        if restart and unit and unit % restart == 0:
            br.align_and_expect_rst(unit // restart)
            for i in range(len(dc_pred)):
                dc_pred[i] = 0
            state["eobrun"] = 0

    if len(scan) > 1:
        if ss != 0:
            raise ValueError("interleaved progressive AC scan is illegal")
        mcx = -(-fw // (8 * hmax))
        mcy = -(-fh // (8 * vmax))
        unit = 0
        for my in range(mcy):
            for mx in range(mcx):
                at_restart(unit)
                for si, (c, dct_id, act_id) in enumerate(scan):
                    arr = coeffs[c["id"]]
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            do_unit(
                                arr[my * c["v"] + vy, mx * c["h"] + vx],
                                si, dct_id, act_id,
                            )
                unit += 1
    else:
        c, dct_id, act_id = scan[0]
        arr = coeffs[c["id"]]
        # non-interleaved scans cover the component's OWN block grid
        # (ceil of its scaled dimensions), not the MCU-padded grid
        bw_ = -(-(-(-fw * c["h"] // hmax)) // 8)
        bh_ = -(-(-(-fh * c["v"] // vmax)) // 8)
        unit = 0
        for by in range(bh_):
            for bx in range(bw_):
                at_restart(unit)
                do_unit(arr[by, bx], 0, dct_id, act_id)
                unit += 1

    # the scan's entropy bytes end at the next true marker (skip any
    # stuffed FF00 and stray restarts the bit reader did not consume)
    p = br.pos
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00 and not (
            0xD0 <= payload[p + 1] <= 0xD7
        ):
            break
        p += 1
    return p


def _reconstruct_progressive(frame, comps, coeffs, qts, prec=8):
    """Dequantize + IDCT every accumulated coefficient block (vectorized
    over the whole plane), then upsample/crop/color-convert exactly like
    the baseline path."""
    fh, fw = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c in comps:
        arr = coeffs[c["id"]]  # (bh, bw, 64) zigzag order
        bh, bw_ = arr.shape[:2]
        nat = np.zeros((bh, bw_, 64))
        nat[:, :, ZIGZAG] = arr
        deq = nat.reshape(bh, bw_, 8, 8) * qts[c["q"]]
        # pix = D^T @ block @ D for every block at once
        pix = np.einsum("ux,ybuw,wv->ybxv", _D, deq, _D)
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:fh, :fw] + float(1 << (prec - 1)))
    return _finish_planes(out_planes, prec)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode as a progressive (SOF2) JPEG with a scan script that
    exercises every T.81 G.2 decode path: interleaved DC first (Al=1),
    per-component AC band first scans split at k=5 (Al=1, EOB-run path
    included via EOB0), interleaved DC refinement, then per-component
    AC refinements (correction bits + new-coefficient placements).

    Same Annex-K tables, DCT, and quantizer as ``encode_jpeg_baseline``
    (4:4:4 only), so the quantized coefficients — and therefore the
    decoded pixels — are bit-identical between the two encodings: the
    round-trip test asserts exactly that."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l = _scaled_qt(QT_LUM, quality)
    qt_c = _scaled_qt(QT_CHROM, quality)
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        qts = [qt_l]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y - 128.0, cb, cr]
        qts = [qt_l, qt_c, qt_c]
    ncomp = len(planes)
    mcx, mcy = -(-w // 8), -(-h // 8)

    # quantized zigzag-order coefficients per component: (by, bx, 64)
    qcoef = []
    for p, qt in zip(planes, qts):
        pp = np.pad(
            p, ((0, mcy * 8 - p.shape[0]), (0, mcx * 8 - p.shape[1])),
            mode="edge",
        )
        blocks = pp.reshape(mcy, 8, mcx, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,ybxv,wv->ybuw", _D, blocks, _D)
        q = np.round(coef / qt).astype(np.int64)
        qcoef.append(q.reshape(mcy, mcx, 64)[..., ZIGZAG])
    dc_tabs = [
        _canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
        _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS),
    ]
    ac_tabs = [
        _canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
        _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS),
    ]

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            t = 0 if cid == 1 or gray else 1
            body += bytes([cid, (t << 4) | t])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(body))

    def emit_dc_first(al: int) -> bytes:
        bw = _BitWriter()
        pred = [0] * ncomp
        for by in range(mcy):
            for bx in range(mcx):
                for ci in range(ncomp):
                    t = 0 if ci == 0 else 1
                    v = int(qcoef[ci][by, bx, 0]) >> al
                    diff = v - pred[ci]
                    pred[ci] = v
                    s = _size_of(diff)
                    code, ln = dc_tabs[t][s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        bw.flush()
        return bytes(bw.out)

    def emit_dc_refine(al: int) -> bytes:
        bw = _BitWriter()
        for by in range(mcy):
            for bx in range(mcx):
                for ci in range(ncomp):
                    bw.write((int(qcoef[ci][by, bx, 0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def emit_ac_first(ci: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        act = ac_tabs[0 if ci == 0 else 1]
        for by in range(mcy):
            for bx in range(mcx):
                blk = qcoef[ci][by, bx]
                run = 0
                emitted = False
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    t = (v if v >= 0 else -v) >> al
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _size_of(t)
                    code, ln = act[(run << 4) | s]
                    bw.write(code, ln)
                    sv = t if v >= 0 else -t
                    bw.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
                    run = 0
                    emitted = True
                if run > 0 or not emitted:
                    code, ln = act[0x00]  # EOB0
                    bw.write(code, ln)
        bw.flush()
        return bytes(bw.out)

    def emit_ac_refine(ci: int, ss: int, se: int, al: int) -> bytes:
        # libjpeg jcphuff-style: a ZRL is emitted AT the first nonzero
        # coefficient once the zero-history run exceeds 15 — provided a
        # newly-nonzero coefficient still lies ahead (k <= eob_idx);
        # trailing runs fold into the EOB symbol. Buffered correction
        # bits flush after every emitted symbol, so the decoder's walk
        # consumes them exactly at the history positions it passes.
        bw = _BitWriter()
        act = ac_tabs[0 if ci == 0 else 1]
        for by in range(mcy):
            for bx in range(mcx):
                blk = qcoef[ci][by, bx]
                eob_idx = -1
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    if ((v if v >= 0 else -v) >> al) == 1:
                        eob_idx = k
                run = 0
                pending: list[int] = []  # buffered correction bits
                any_symbol = False
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    t = (v if v >= 0 else -v) >> al
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob_idx:
                        code, ln = act[0xF0]
                        bw.write(code, ln)
                        for bit in pending:
                            bw.write(bit, 1)
                        pending = []
                        run -= 16
                        any_symbol = True
                    if t > 1:
                        # history-nonzero: buffer its correction bit
                        pending.append(t & 1)
                        continue
                    # newly nonzero (t == 1)
                    code, ln = act[(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if v >= 0 else 0, 1)
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                    run = 0
                    any_symbol = True
                if run > 0 or pending or not any_symbol:
                    code, ln = act[0x00]  # EOB0
                    bw.write(code, ln)
                    for bit in pending:
                        bw.write(bit, 1)
        bw.flush()
        return bytes(bw.out)

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qt_l.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qt_c.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = bytearray([8])
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, bytes(sof))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01]) + bytes(DC_CHROM_BITS) + bytes(DC_CHROM_VALS))
        out += seg(0xC4, bytes([0x11]) + bytes(AC_CHROM_BITS) + bytes(AC_CHROM_VALS))

    all_ids = [ci + 1 for ci in range(ncomp)]
    # scan script
    out += sos_header(all_ids, 0, 0, 0, 1) + emit_dc_first(1)
    for ci in range(ncomp):
        if ci == 0:
            # split comp0's band to exercise multi-band accumulation
            out += sos_header([1], 1, 5, 0, 1) + emit_ac_first(0, 1, 5, 1)
            out += sos_header([1], 6, 63, 0, 1) + emit_ac_first(0, 6, 63, 1)
        else:
            out += sos_header([ci + 1], 1, 63, 0, 1) + emit_ac_first(ci, 1, 63, 1)
    out += sos_header(all_ids, 0, 0, 1, 0) + emit_dc_refine(0)
    for ci in range(ncomp):
        out += sos_header([ci + 1], 1, 63, 1, 0) + emit_ac_refine(ci, 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)
