"""Baseline JFIF (JPEG) codec in pure numpy + stdlib — the DCT half
of the multimodal tier's compressed-image support (the PNG half
landed in round 12; this closes `decode_image`'s last "needs an
external codec" branch, round-12 verdict item #10).

Everything here is the PUBLIC baseline process of ITU-T T.81 /
ISO 10918-1: level shift, 8x8 forward/inverse DCT (orthonormal
matrix form), Annex-K quantization tables with IJG quality scaling,
zigzag ordering, Annex-K Huffman tables, DC differential + AC
run-length entropy coding with 0xFF byte stuffing, and the JFIF
segment layout (SOI / APP0 / DQT / SOF0 / DHT / SOS / EOI).

Scope (encoder and decoder symmetric): 8-bit baseline sequential,
interleaved single scan, grayscale or YCbCr RGB with sampling factors
1 or 2 per axis — 4:4:4, 4:2:2, 4:4:0 and 4:2:0 (the common camera
layout; chroma box-averaged down on encode, nearest-neighbor
upsampled on decode) — no restart markers, no progressive/arithmetic
modes. Anything outside that class raises ValueError naming the
feature — never garbage pixels. The entropy loops are plain Python over 8x8 blocks:
right for the executor-side feature probes this ships in (small
assets inside Arrow batches), not a throughput library — a real
100-TB decode stage would plug libjpeg-turbo into
``extract_features(decode=...)``; the FORMAT handling is what this
module makes real.

JPEG is lossy by construction: round-trips are judged by bounded
reconstruction error, not byte equality (see tests), and the stream
has no CRC — integrity failures surface as truncation/marker errors.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# Annex K tables (ITU-T T.81 K.1/K.2: quantization; K.3: Huffman)
# ---------------------------------------------------------------------------

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# zigzag scan order: ZIGZAG[i] = natural (row-major) index of the
# i-th zigzag coefficient
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Huffman table specs: (BITS[1..16] code-length counts, HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = list(bytes.fromhex(
    "01020300041105122131410613516107227114328191a108"
    "2342b1c11552d1f02433627282090a161718191a25262728"
    "292a3435363738393a434445464748494a53545556575859"
    "5a636465666768696a737475767778797a83848586878889"
    "8a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6"
    "b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2"
    "e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9fa"))
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = list(bytes.fromhex(
    "000102031104052131061241510761711322328108144291"
    "a1b1c109233352f0156272d10a162434e125f11718191a26"
    "2728292a35363738393a434445464748494a535455565758"
    "595a636465666768696a737475767778797a828384858687"
    "88898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4"
    "b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9da"
    "e2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9fa"))


def _dct_matrix():
    """Orthonormal 8-point DCT-II matrix C: forward = C @ b @ C.T,
    inverse = C.T @ B @ C."""
    import numpy as np

    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    C[0, :] *= 1 / np.sqrt(2)
    return C


def _scaled_quant(base: list[int], quality: int):
    """IJG quality scaling (the public libjpeg recipe): 1..100 ->
    per-coefficient divisors clipped to [1, 255] (8-bit DQT)."""
    import numpy as np

    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (np.asarray(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).reshape(8, 8)


def _build_huffman_codes(bits: list[int], vals: list[int]):
    """{symbol: (code, length)} canonical Huffman assignment (T.81
    C.2: codes of each length assigned in HUFFVAL order)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits (T.81 F.1.2.3)
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient: category
    is the bit length of |v|; negative values store v-1's low bits
    (one's-complement convention, T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


_SUBSAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _box_down(p, fx: int, fy: int):
    """Box-average downsample by (fx, fy) with edge padding to whole
    boxes — the JFIF chroma downsample."""
    import numpy as np

    if fx == 1 and fy == 1:
        return p
    h, w = p.shape
    H, W = -(-h // fy) * fy, -(-w // fx) * fx
    pad = np.pad(p, ((0, H - h), (0, W - w)), mode="edge")
    return pad.reshape(H // fy, fy, W // fx, fx).mean(axis=(1, 3))


def _encode_block(bw: "_BitWriter", blk, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-code one zigzagged quantized block; returns the new DC
    predictor (T.81 F.1.2: DC differential + AC run/size with
    ZRL/EOB)."""
    dc = int(blk[0])
    s, bits_v = _magnitude(dc - pred)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(bits_v, s)
    nz = [k for k in range(1, 64) if blk[k]]
    last_nz = nz[-1] if nz else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]           # ZRL
            bw.put(code, ln)
            run -= 16
        s, bits_v = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(bits_v, s)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]               # EOB
        bw.put(code, ln)
    return dc


def encode_jpeg(arr, quality: int = 90,
                subsampling: str = "4:4:4") -> bytes:
    """uint8 array of shape (h, w, 3) RGB or (h, w) grayscale ->
    standard baseline JFIF bytes (single interleaved scan, Annex-K
    Huffman tables). ``subsampling`` picks the chroma layout:
    "4:4:4" (default, full-resolution chroma), "4:2:2" (chroma
    halved horizontally), or "4:2:0" (halved both ways — the common
    camera layout); luma carries the matching 2x1/2x2 sampling
    factors and the scan interleaves h*v luma blocks per MCU.
    Decodable by any JPEG decoder."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"need (h,w,3) RGB or (h,w) gray, got {a.shape}")
    h, w = a.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError(
            f"image {w}x{h} exceeds the JPEG 16-bit dimension limit "
            f"(65535)")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(
            f"subsampling must be one of {sorted(_SUBSAMPLING)}, "
            f"got {subsampling!r}")
    sx, sy = _SUBSAMPLING[subsampling]

    # components: (level-shifted plane, h-factor, v-factor, quant tbl,
    # huffman tbl)
    if gray:
        comps = [(a.astype(np.float64) - 128.0, 1, 1, 0, 0)]
    else:
        r = a[:, :, 0].astype(np.float64)
        g = a[:, :, 1].astype(np.float64)
        b = a[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [(y - 128.0, sx, sy, 0, 0),
                 (_box_down(cb, sx, sy), 1, 1, 1, 1),
                 (_box_down(cr, sx, sy), 1, 1, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qt = [_scaled_quant(QUANT_LUMA, quality),
          _scaled_quant(QUANT_CHROMA, quality)]
    C = _dct_matrix()
    dc_codes = [_build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # per component: pad the plane to its MCU-aligned block grid by
    # edge replication, block, DCT, quantize, zigzag — vectorized;
    # only entropy coding loops
    zz = np.asarray(ZIGZAG)
    comp_zz = []
    for p, hi, vi, tq, _th in comps:
        by, bx = mcuy * vi, mcux * hi
        ph, pw_ = by * 8, bx * 8
        pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw_ - p.shape[1])),
                     mode="edge")
        blocks = (pad.reshape(by, 8, bx, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        coef = np.einsum("ij,njk,lk->nil", C, blocks, C)
        quant = np.round(coef / qt[tq].astype(np.float64)).astype(np.int64)
        comp_zz.append(quant.reshape(by, bx, 64)[:, :, zz])

    bw = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_p, hi, vi, _tq, th) in enumerate(comps):
                for byy in range(vi):
                    for bxx in range(hi):
                        preds[ci] = _encode_block(
                            bw, comp_zz[ci][my * vi + byy, mx * hi + bxx],
                            preds[ci], dc_codes[th], ac_codes[th])
    scan = bw.flush()

    # segments
    out = bytearray(b"\xff\xd8")                       # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti in range(1 if gray else 2):
        out += _seg(0xFFDB, bytes([ti]) + bytes(
            int(qt[ti].reshape(-1)[z]) for z in ZIGZAG))
    nf = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci, (_p, hi, vi, tq, _th) in enumerate(comps):
        sof += bytes([ci + 1, (hi << 4) | vi, tq])
    out += _seg(0xFFC0, sof)                           # SOF0 baseline
    for tc, th, bits, vals in (
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))[:2 if gray else 4]:
        out += _seg(0xFFC4, bytes([(tc << 4) | th]) + bytes(bits)
                    + bytes(vals))
    sos = bytes([nf])
    for ci in range(nf):
        td = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | td])
    sos += b"\x00\x3f\x00"                             # Ss/Se/Ah-Al
    out += _seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00
    unstuffing; raises on truncation or an unexpected marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            m = d[self.pos]
            if m == 0x00:
                self.pos += 1                 # stuffed 0xFF data byte
            else:
                raise ValueError(
                    f"unexpected marker 0xff{m:02x} inside scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        v = (self.acc >> self.n) & 1
        # mask consumed bits NOW: an unmasked accumulator grows by 8
        # bits per scan byte and turns every shift into bignum work —
        # O(scan^2) decode (the writer's put() masks for the same
        # reason)
        self.acc &= (1 << self.n) - 1
        return v

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _build_huffman_decoder(bits: list[int], vals: list[int]):
    """{(code, length): symbol} for the simple read-a-bit decode loop
    (tables are tiny; lookup-tree speed is irrelevant here)."""
    return {cl: sym
            for sym, cl in _build_huffman_codes(bits, vals).items()}


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, s: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(blob: bytes):
    """Standard baseline JFIF bytes -> (w, h, uint8 array): (h, w, 3)
    RGB for 3-component images, (h, w) for grayscale. Supports the
    baseline sequential class with sampling factors 1 or 2 per axis —
    4:4:4, 4:2:2, 4:4:0 and 4:2:0 (the common camera layout; chroma
    upsampled nearest-neighbor) — single interleaved scan, no restart
    markers. Raises ValueError naming any feature outside that class
    (progressive, arithmetic, 16-bit DQT, factors > 2, 2/4-component
    color transforms), never garbage pixels."""
    import numpy as np

    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    scan_comps = None
    while True:
        if pos + 2 > len(blob):
            raise ValueError("truncated JPEG (no SOS/EOI)")
        if blob[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xFF:
            pos -= 1                       # fill byte (T.81 B.1.1.2)
            continue
        if marker == 0xD9:
            raise ValueError("EOI before SOS (no image data)")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                       # standalone markers
        if pos + 2 > len(blob):
            raise ValueError("truncated JPEG segment")
        seg_len = struct.unpack(">H", blob[pos:pos + 2])[0]
        seg = blob[pos + 2:pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        pos += seg_len
        if marker == 0xDB:                 # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit DQT not supported "
                                     "(baseline is 8-bit)")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[np.asarray(ZIGZAG)] = np.frombuffer(
                    seg[i + 1:i + 65], dtype=np.uint8).astype(np.int64)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:               # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                huff[(tc, th)] = _build_huffman_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:               # SOF0 baseline
            prec, fh, fw, nf = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision not supported")
            if nf not in (1, 3):
                raise ValueError(
                    f"{nf}-component JPEG not supported (grayscale or "
                    f"YCbCr only; CMYK/YCCK need a 4-plane transform)")
            comps = []
            for ci in range(nf):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"sampling factors {hi}x{vi} not supported "
                        f"(1 or 2 per axis: 4:4:4/4:2:2/4:4:0/4:2:0)")
                comps.append((cid, hi, vi, tq))
            if nf == 1:
                # a single component is never subsampled relative to
                # itself — normalize so the MCU grid is 8x8
                cid, _hi, _vi, tq = comps[0]
                comps = [(cid, 1, 1, tq)]
            frame = (fw, fh, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xff{marker:02x}: "
                f"progressive/extended/arithmetic) not supported")
        elif marker == 0xDD:               # DRI
            if struct.unpack(">H", seg[:2])[0] != 0:
                raise ValueError("restart intervals not supported")
        elif marker == 0xDA:               # SOS
            ns = seg[0]
            scan_comps = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                           seg[2 + 2 * i] & 0xF) for i in range(ns)]
            break
        # APPn/COM/others: skipped
    if frame is None:
        raise ValueError("SOS before SOF0 (no frame header)")
    fw, fh, comps = frame
    if scan_comps is None or len(scan_comps) != len(comps):
        raise ValueError("scan does not cover every frame component")

    C = _dct_matrix()
    zz = np.asarray(ZIGZAG)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    br = _BitReader(blob, pos)
    coefs = []
    grids = []
    for cid, hi, vi, tq in comps:
        by, bx = mcuy * vi, mcux * hi
        grids.append((by, bx))
        coefs.append(np.zeros((by * bx, 64), dtype=np.int64))
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                scid, td, ta = scan_comps[ci]
                if scid != cid:
                    raise ValueError(
                        "scan/frame component order mismatch")
                dc_tab = huff.get((0, td))
                ac_tab = huff.get((1, ta))
                if dc_tab is None or ac_tab is None or tq not in qt:
                    raise ValueError("missing Huffman/quant table")
                _by, bx = grids[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        bi = (my * vi + byy) * bx + (mx * hi + bxx)
                        blk = coefs[ci][bi]
                        s = _huff_decode(br, dc_tab)
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16    # ZRL
                                    continue
                                break          # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[k] = _extend(br.bits(s), s)
                            k += 1
    # the stream must close with EOI — tolerate any number of 0xFF
    # fill bytes (T.81 B.1.1.2) and trailing COM/APPn segments
    p = br.pos
    while True:
        while p < len(blob) and blob[p] == 0xFF \
                and p + 1 < len(blob) and blob[p + 1] == 0xFF:
            p += 1                        # fill byte run
        if p + 2 > len(blob) or blob[p] != 0xFF:
            raise ValueError("missing EOI after scan")
        m = blob[p + 1]
        if m == 0xD9:
            break                          # EOI
        if 0xE0 <= m <= 0xEF or m == 0xFE:  # trailing APPn/COM
            if p + 4 > len(blob):
                raise ValueError("truncated trailing segment")
            p += 2 + struct.unpack(">H", blob[p + 2:p + 4])[0]
            continue
        raise ValueError(f"unexpected marker 0xff{m:02x} after scan")

    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        by, bx = grids[ci]
        deq = np.zeros((by * bx, 64), dtype=np.float64)
        deq[:, zz] = coefs[ci] * qt[tq].reshape(-1)[zz][None, :]
        blocks = deq.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", C, blocks, C)
        plane = (pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(by * 8, bx * 8))
        # crop to the component's own dimensions, then upsample
        # nearest-neighbor to full frame resolution
        ch = -(-fh * vi // vmax)
        cw = -(-fw * hi // hmax)
        plane = plane[:ch, :cw] + 128.0
        if vi != vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi != hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return fw, fh, out
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return fw, fh, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
