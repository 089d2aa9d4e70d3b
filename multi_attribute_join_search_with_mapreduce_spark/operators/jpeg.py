"""Baseline JPEG (ITU-T T.81) grayscale codec — pure Python + numpy.

The multimodal tier decodes REAL containers (BMP, PNG incl. all five
scanline filters, WAV) rather than stubbing; JPEG is the first
container a production multimodal pipeline actually meets (VERDICT r10
#7), so it gets the same treatment: a from-the-spec baseline-DCT
decoder used as the engine's Arrow kernel, plus a matching encoder
that generates the gate's fixtures. Everything here derives from the
public T.81 spec — the Annex K.3 typical Huffman tables, the zigzag
order, and the baseline entropy coding (DC difference categories, AC
run/size with EOB and ZRL, 0xFF00 byte stuffing).

Scope is deliberately the baseline SUBSET the fixtures exercise, with
everything else rejected LOUDLY (the multimodal tier's
unsupported-container discipline): SOF0 8-bit single-component
(grayscale, no chroma subsampling), one scan, no restart markers.
Progressive (SOF2), multi-component, and 12-bit streams raise.

Exact-roundtrip construction for the differential gate: JPEG is lossy
in general, but a constant 8×8 block has energy only in the DC
coefficient (AC terms of the float DCT are ~1e-14 and quantize to 0),
and DC = 8·(c−128) after the level shift. With a DC quantizer that
divides 8·(c−128) for every byte value c — any q00 dividing 8, here 4
— the quantize→dequantize→IDCT chain reproduces c EXACTLY, so the
DuckDB oracle can recompute the decoded pixel sums in closed form from
the block-value sequence: a green hash proves the whole container walk
(marker parse, Huffman decode, DC prediction, dezigzag, dequantize,
IDCT, level shift) and not a passthrough. The general AC path is
covered by property tests with a known quantization-error bound
(tests/test_multimodal.py).
"""

from __future__ import annotations

import numpy as np

# --- tables (ITU-T T.81, public spec) --------------------------------------

# zigzag index of each (row-major) coefficient position
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3.1 "typical" luminance DC table: BITS (counts per code
# length 1..16) + HUFFVAL (symbols in code order).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.3.2 typical luminance AC table.
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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

# The gate's quantization table in ZIGZAG order: DC quantizer 4 divides
# 8·(c−128) for every c (exact constant-block roundtrip, see module
# docstring); AC quantizers are the conventional mid-strength values —
# irrelevant for constant blocks, exercised by the property tests.
GATE_QTABLE = np.array([4] + [16] * 63, dtype=np.int64)


def _dct_basis() -> np.ndarray:
    """8×8 DCT-II orthonormal basis matrix T: dct2(B) = T @ B @ T.T."""
    k = np.arange(8)
    t = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    t[0, :] = np.sqrt(1.0 / 8.0)
    return t


_T = _dct_basis()


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG code assignment."""
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


_DC_ENC = _build_codes(DC_BITS, DC_VALS)
_AC_ENC = _build_codes(AC_BITS, AC_VALS)


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decode walk."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, vals).items()}


class JpegFormatError(ValueError):
    """Unsupported or corrupt JPEG stream — rejected loudly, never
    silently decoded as garbage (the multimodal tier's contract)."""


# --- encoder (fixture generator) -------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-bits padding per spec


def _category(v: int) -> int:
    """DC/AC magnitude category (number of bits of |v|)."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, cat: int) -> int:
    """One's-complement style magnitude encoding of a signed value."""
    return v if v >= 0 else v + (1 << cat) - 1


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_gray_jpeg(
    pixels: np.ndarray, qtable_zz: np.ndarray = GATE_QTABLE
) -> bytes:
    """Encode an (h, w) uint8 array (h, w multiples of 8) as a baseline
    grayscale JPEG with the Annex-K typical luminance Huffman tables."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("fixture encoder: dimensions must be multiples of 8")
    q2d = np.empty(64, dtype=np.int64)
    q2d[ZIGZAG] = qtable_zz  # zigzag -> row-major
    q2d = q2d.reshape(8, 8)

    bw = _BitWriter()
    pred = 0
    shifted = pixels.astype(np.float64) - 128.0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = shifted[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            coef = _T @ block @ _T.T
            qc = np.rint(coef / q2d).astype(np.int64)
            # row-major -> zigzag order: zz[k] = qc.flat[ZIGZAG[k]]
            zz = qc.reshape(-1)[ZIGZAG]
            dc = int(zz[0])
            diff = dc - pred
            pred = dc
            cat = _category(diff)
            code, ln = _DC_ENC[cat]
            bw.put(code, ln)
            bw.put(_magnitude_bits(diff, cat), cat)
            # AC: run/size with ZRL (16 zeros) and EOB
            run = 0
            last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                cat = _category(v)
                code, ln = _AC_ENC[(run << 4) | cat]
                bw.put(code, ln)
                bw.put(_magnitude_bits(v, cat), cat)
                run = 0
            if last_nz < 63:
                code, ln = _AC_ENC[0x00]  # EOB
                bw.put(code, ln)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qtable_zz))
    out += _seg(
        0xC0,
        bytes([8])  # precision
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),  # 1 component, no subsampling, qtable 0
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder (the engine's Arrow-kernel core) ------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegFormatError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JpegFormatError("truncated after 0xFF in scan")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise JpegFormatError(
                    f"unexpected marker 0xFF{nxt:02X} inside scan "
                    "(restart markers are out of scope)"
                )
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid Huffman code in scan")


def _extend(v: int, cat: int) -> int:
    """Inverse of the magnitude encoding (T.81 EXTEND)."""
    return v if cat == 0 or v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_gray_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG into an (h, w) uint8 array.

    Walks the real container: marker segments (rejecting progressive /
    multi-component / 12-bit / restart-interval streams loudly),
    DQT/DHT tables from the stream itself (NOT assumed equal to the
    encoder's), the Huffman-coded scan with byte unstuffing, DC
    prediction, dezigzag, dequantization, and a vectorized IDCT over
    all blocks at once (one einsum, not per-pixel Python).
    """
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG stream (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = -1
    comp_q = 0
    scan_dc_tbl = scan_ac_tbl = 0
    scan_start = -1
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at offset {pos}")
        if pos + 1 >= len(payload):
            raise JpegFormatError("truncated at a marker boundary")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise JpegFormatError("truncated marker segment")
        seglen = int.from_bytes(payload[pos + 2:pos + 4], "big")
        body = payload[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegFormatError("truncated marker segment body")
        if marker == 0xC2:
            raise JpegFormatError("progressive JPEG (SOF2) not supported")
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise JpegFormatError(f"SOF marker 0x{marker:02X} not supported")
        if marker == 0xDD:
            raise JpegFormatError("restart intervals not supported")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise JpegFormatError("16-bit quantization tables not supported")
                if i + 65 > len(body):
                    raise JpegFormatError("truncated quantization table")
                qtables[tq] = np.frombuffer(
                    body[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 9:
                raise JpegFormatError("truncated frame header")
            if body[0] != 8:
                raise JpegFormatError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp != 1:
                raise JpegFormatError(
                    f"{ncomp}-component JPEG not supported (grayscale only)"
                )
            if body[7] != 0x11:
                raise JpegFormatError("subsampling not supported")
            comp_q = body[8]
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                if i + 17 > len(body):
                    raise JpegFormatError("truncated Huffman table header")
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise JpegFormatError("truncated Huffman table values")
                vals = list(body[i + 17:i + 17 + n])
                htables[(tc, th)] = _build_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xDA:  # SOS
            if len(body) < 6:
                raise JpegFormatError("truncated scan header")
            if body[0] != 1:
                raise JpegFormatError("multi-component scan not supported")
            scan_dc_tbl, scan_ac_tbl = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if h < 0 or scan_start < 0:
        raise JpegFormatError("missing SOF0 or SOS")
    if comp_q not in qtables:
        raise JpegFormatError("scan references a missing quantization table")
    dc_tbl = htables.get((0, scan_dc_tbl))
    ac_tbl = htables.get((1, scan_ac_tbl))
    if dc_tbl is None or ac_tbl is None:
        raise JpegFormatError("scan references a missing Huffman table")

    bw, bh = (w + 7) // 8, (h + 7) // 8
    br = _BitReader(payload[scan_start:])
    coefs = np.zeros((bh * bw, 64), dtype=np.int64)
    pred = 0
    for b in range(bh * bw):
        cat = _read_symbol(br, dc_tbl)
        diff = _extend(br.bits(cat), cat)
        pred += diff
        coefs[b, 0] = pred
        k = 1
        while k < 64:
            sym = _read_symbol(br, ac_tbl)
            if sym == 0x00:  # EOB
                break
            run, cat = sym >> 4, sym & 0x0F
            if cat == 0:
                if run != 15:
                    raise JpegFormatError("invalid AC run/size symbol")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise JpegFormatError("AC coefficient index out of range")
            coefs[b, k] = _extend(br.bits(cat), cat)
            k += 1

    # dequantize (zigzag order), dezigzag, vectorized IDCT per block
    deq = coefs * qtables[comp_q][None, :]
    blocks = np.zeros((bh * bw, 64), dtype=np.float64)
    blocks[:, ZIGZAG] = deq  # zigzag -> row-major
    blocks = blocks.reshape(-1, 8, 8)
    spatial = np.einsum("ij,bjk,lk->bil", _T.T, blocks, _T.T)
    pix = np.clip(np.rint(spatial + 128.0), 0, 255).astype(np.uint8)
    out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for b in range(bh * bw):
        by, bx = divmod(b, bw)
        out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = pix[b]
    return out[:h, :w]
