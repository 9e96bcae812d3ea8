"""Pure-stdlib+numpy baseline JPEG codec (ITU-T T.81 / JFIF).

Closes the last "entropy-coded formats are md5 stubs" gap
(r08 VERDICT "What's missing" item 2): baseline sequential DCT JPEG —
the Huffman entropy coder, byte stuffing, differential DC, zigzag,
quantization and the 8×8 DCT/IDCT — implemented from the public spec
with the Annex K example tables. Scope mirrors the repo's PNG codec
philosophy (`multimodal._parse_png`): strict marker detection so a
random blob cannot false-positive, 8-bit baseline SOF0 only, 4:4:4
(no chroma subsampling) or single-component grayscale; progressive
(SOF2), subsampled, arithmetic-coded and 12-bit streams return None
rather than decoding wrongly. Restart markers (DRI/RSTn) are handled
on the decode side.

Cross-engine determinism (the registry's oracle discipline): every
rounding site uses an explicit rule shared with the DuckDB oracle —
`floor(x + 0.5)` half-up for pixel reconstruction,
`sign(x)·floor(|x|/Q + 0.5)` for quantization — and DCT/IDCT outputs
are snapped to the 1e-6 grid (`_snap6`) before any such boundary, so
the ~1e-13 float noise of the numpy matrix transform can never flip a
round at an exact .5 boundary (constant blocks put DC/Q exactly on
x.5 whenever the level-shifted value is odd). On block-constant
images the whole encode→decode pipeline is then a closed-form integer
map, which is what `plans/mmstream.q_media_jpeg_channel_stats`'s SQL
oracle replays.
"""

from __future__ import annotations

import struct

#: Hard cap on decoded frame size (width*height from the SOF header).
#: 64 Mpx = an 8K x 8K frame; the decoder's padded float64 planes cost
#: ~8 B/px/component, so this bounds the worst-case allocation at
#: ~0.5 GB/plane instead of the 34 GB a crafted 65535x65535 SOF could
#: demand.  Frames above the cap return None (degrade-to-stub), never
#: raise.
MAX_PIXELS = 64_000_000

#: Annex K.1 example quantization tables (natural row-major order).
QUANT_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
QUANT_CHROMA = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)

#: Zigzag scan order: ZIGZAG[k] = natural index of the k-th scanned coef.
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

#: Annex K.3 example Huffman tables: (bits[1..16], huffval).
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))
DC_CHROMA_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_CHROMA_VALS = tuple(range(12))
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)
AC_CHROMA_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_CHROMA_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _dct_matrix():
    """Orthonormal 8×8 DCT-II matrix C: dct(B) = C @ B @ C.T."""
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for k in range(8):
        scale = math.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            c[k, n] = scale * math.cos(math.pi * k * (2 * n + 1) / 16.0)
    return c


_DCT_C = None


def _dct_c():
    global _DCT_C
    if _DCT_C is None:
        _DCT_C = _dct_matrix()
    return _DCT_C


def _snap6(a):
    """Snap an array (or scalar) to the 1e-6 decimal grid with explicit
    half-up: floor(x·1e6 + 0.5)/1e6. Kills the ~1e-13 noise of the numpy
    matrix DCT before any rounding boundary, so encoder, decoder, and SQL
    oracle agree bit-for-bit on boundary cases."""
    import numpy as np

    return np.floor(a * 1e6 + 0.5) / 1e6


def _canonical_codes(bits, vals):
    """(symbol → (code, length)) for a canonical JPEG Huffman table."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """((length, code) → symbol) decoder map for the same table."""
    enc = _canonical_codes(bits, vals)
    return {(length, code): sym for sym, (code, length) in enc.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 §F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _category(v: int) -> int:
    """SSSS magnitude category: number of bits of |v|."""
    return 0 if v == 0 else abs(v).bit_length()


def _magnitude_bits(v: int, ssss: int) -> int:
    """T.81 table F.1: positive values verbatim, negative values as
    v - 1 + 2^SSSS (one's-complement style)."""
    return v if v >= 0 else v - 1 + (1 << ssss)


def _quantize(coefs, quant):
    """sign(x)·floor(|x|/Q + 0.5), vectorized — the explicit rule the SQL
    oracle replays. `coefs` must already be snapped (`_snap6`)."""
    import numpy as np

    q = np.asarray(quant, dtype=float).reshape(8, 8)
    return (np.sign(coefs) * np.floor(np.abs(coefs) / q + 0.5)).astype(int)


def _rgb_to_ycbcr_planes(width, height, rgb_rows):
    """JFIF color transform with explicit half-up rounding:
    floor(x + 0.5), clamped to 0..255. Returns three height×width int
    arrays."""
    import numpy as np

    rgb = np.frombuffer(b"".join(rgb_rows), dtype=np.uint8).reshape(
        height, width, 3
    ).astype(float)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b + 0.5)
    cr = np.floor(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b + 0.5)
    clip = lambda p: np.clip(p, 0.0, 255.0).astype(int)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _pad_to_blocks(plane):
    """Edge-replicate a plane to multiples of 8 in both dimensions."""
    import numpy as np

    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) == (h, w):
        return plane
    out = np.empty((ph, pw), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :w]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _encode_block(coefs_q, prev_dc, dc_codes, ac_codes, writer):
    """Huffman-encode one quantized block (zigzag order, differential DC,
    AC run-length with ZRL/EOB). Returns the block's DC for the chain."""
    flat = coefs_q.reshape(64)
    dc = int(flat[0])
    diff = dc - prev_dc
    ssss = _category(diff)
    code, length = dc_codes[ssss]
    writer.write(code, length)
    if ssss:
        writer.write(_magnitude_bits(diff, ssss), ssss)
    zz = [int(flat[ZIGZAG[k]]) for k in range(1, 64)]
    last_nz = -1
    for i, v in enumerate(zz):
        if v:
            last_nz = i
    run = 0
    for i in range(last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        ssss = _category(v)
        code, length = ac_codes[(run << 4) | ssss]
        writer.write(code, length)
        writer.write(_magnitude_bits(v, ssss), ssss)
        run = 0
    if last_nz != 62:  # trailing zeros remain → EOB
        code, length = ac_codes[0x00]
        writer.write(code, length)


def jpeg_encode(
    width: int, height: int, rgb_rows: list[bytes], restart_interval: int = 0
) -> bytes:
    """Baseline JFIF encode of 8-bit RGB rows (len(row) == 3·width), 4:4:4,
    Annex K tables. Deterministic: every rounding site uses the explicit
    rules documented at module top. `restart_interval` > 0 emits a DRI
    segment and RSTn markers every that-many MCUs (byte-aligned, DC
    predictors reset) — the resync mechanism a parallel decoder shards
    on."""
    import numpy as np

    y, cb, cr = _rgb_to_ycbcr_planes(width, height, rgb_rows)
    planes = [_pad_to_blocks(p) for p in (y, cb, cr)]
    quants = (QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA)
    dc_tabs = (
        _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
        _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    )
    ac_tabs = (
        _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
        _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    )
    c = _dct_c()
    ph, pw = planes[0].shape
    writer = _BitWriter()
    scan = bytearray()
    prev_dc = [0, 0, 0]
    mcu = 0
    rst = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                scan += writer.flush()
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                prev_dc = [0, 0, 0]
            for comp in range(3):
                block = planes[comp][
                    by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                ].astype(float) - 128.0
                coefs = _snap6(c @ block @ c.T)
                q = _quantize(coefs, quants[comp])
                _encode_block(
                    q, prev_dc[comp], dc_tabs[comp], ac_tabs[comp], writer
                )
                prev_dc[comp] = int(q.reshape(64)[0])
            mcu += 1
    scan += writer.flush()
    scan = bytes(scan)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dht(tc_th: int, bits, vals) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(vals)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xDB,
        b"\x00" + bytes(QUANT_LUMA[ZIGZAG[k]] for k in range(64))
        + b"\x01" + bytes(QUANT_CHROMA[ZIGZAG[k]] for k in range(64)),
    )
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(
        0xC4,
        dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(
        0xDA, struct.pack(">B", 3) + bytes([1, 0x00, 2, 0x11, 3, 0x11])
        + bytes([0, 63, 0])
    )
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        """Load one entropy byte, consuming stuffing; False at a marker or
        end of data."""
        while True:
            if self.pos >= len(self.data):
                return False
            b = self.data[self.pos]
            if b == 0xFF:
                if self.pos + 1 < len(self.data) and self.data[self.pos + 1] == 0x00:
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    return True
                return False  # real marker: stop
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
            return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            bit = self.read_bit()
            if bit is None:
                return None
            v = (v << 1) | bit
        return v

    def align_to_marker(self) -> None:
        """Drop partial-byte bits (restart-interval byte alignment)."""
        self.nbits = 0
        self.acc = 0


def _read_huffman(reader: _BitReader, table) -> int | None:
    code = 0
    for length in range(1, 17):
        bit = reader.read_bit()
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, ssss: int) -> int:
    """T.81 F.2.2.1 EXTEND: map SSSS magnitude bits back to a signed
    value."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def parse_jpeg(data: bytes) -> dict | None:
    """Strict baseline JPEG decode. Returns
    {"width","height","channels","rows"} (rows = interleaved RGB or gray
    bytes, top-down) or None when the payload is not a baseline 8-bit
    4:4:4/grayscale JPEG this codec speaks."""
    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    quant: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            return None
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0 or i + 65 > len(body):
                    return None  # 16-bit tables out of scope
                zz = body[i + 1 : i + 65]
                tab = [0] * 64
                for k in range(64):
                    tab[ZIGZAG[k]] = zz[k]
                quant[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = tuple(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    return None
                vals = tuple(body[i + 17 : i + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _decode_table(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                return None
            precision, height, width, ncomp = struct.unpack_from(
                ">BHHB", body, 0
            )
            if precision != 8 or ncomp not in (1, 3):
                return None
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    return None  # subsampling out of scope
                comps.append((cid, tq))
            sof = (width, height, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                return None
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS
            if sof is None or len(body) < 1:
                return None
            ns = body[0]
            if ns != len(sof[2]) or len(body) < 1 + 2 * ns + 3:
                return None
            scan_comps = []
            for ci in range(ns):
                cs, tdta = body[1 + 2 * ci : 3 + 2 * ci]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            scan_start = pos + 2 + seglen
            break
        # APPn/COM/unknown: skip
        pos += 2 + seglen
    if sof is None or scan_comps is None:
        return None
    width, height, comps = sof
    if width <= 0 or height <= 0:
        return None
    # SOF dimensions are attacker-controlled; a 65535x65535 header would
    # otherwise allocate ~34 GB per plane below BEFORE any entropy data is
    # validated.  Reject oversized frames up front so a crafted blob
    # degrades (None -> stub) instead of taking down the executor.
    if width * height > MAX_PIXELS:
        return None
    comp_q = dict(comps)
    ncomp = len(comps)
    bw, bh = -(-width // 8), -(-height // 8)
    c = _dct_c()
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(ncomp)]
    reader = _BitReader(data[scan_start:])
    prev_dc = [0] * ncomp
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.align_to_marker()
                # expect RSTn in the raw stream
                p = reader.pos
                if (
                    p + 2 <= len(reader.data)
                    and reader.data[p] == 0xFF
                    and 0xD0 <= reader.data[p + 1] <= 0xD7
                ):
                    reader.pos = p + 2
                    prev_dc = [0] * ncomp
                else:
                    return None
            for ci, (cs, td, ta) in enumerate(scan_comps):
                dc_t = dc_tables.get(td)
                ac_t = ac_tables.get(ta)
                q = quant.get(comp_q.get(cs))
                if dc_t is None or ac_t is None or q is None:
                    return None
                ssss = _read_huffman(reader, dc_t)
                if ssss is None:
                    return None
                bits = reader.read_bits(ssss) if ssss else 0
                if bits is None:
                    return None
                prev_dc[ci] += _extend(bits, ssss)
                coefs = np.zeros(64)
                coefs[0] = prev_dc[ci] * q[0]
                k = 1
                while k < 64:
                    rs = _read_huffman(reader, ac_t)
                    if rs is None:
                        return None
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, ssss = rs >> 4, rs & 0x0F
                    k += run
                    if k > 63:
                        return None
                    bits = reader.read_bits(ssss)
                    if bits is None:
                        return None
                    coefs[ZIGZAG[k]] = _extend(bits, ssss) * q[ZIGZAG[k]]
                    k += 1
                block = _snap6(c.T @ coefs.reshape(8, 8) @ c) + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            mcu += 1
    planes = [p[:height, :width] for p in planes]
    clip = lambda p: np.clip(np.floor(p + 0.5), 0.0, 255.0)  # noqa: E731
    if ncomp == 1:
        gray = clip(planes[0]).astype(np.uint8)
        rows = [gray[yy].tobytes() for yy in range(height)]
        return {"width": width, "height": height, "channels": 1, "rows": rows}
    y, cb, cr = planes
    r = clip(y + 1.402 * (cr - 128.0))
    g = clip(y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0))
    b = clip(y + 1.772 * (cb - 128.0))
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    rows = [rgb[yy].tobytes() for yy in range(height)]
    return {"width": width, "height": height, "channels": 3, "rows": rows}
