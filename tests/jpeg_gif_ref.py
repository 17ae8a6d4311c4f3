"""Test-side reference ENCODERS for the stdlib image decoders.

Pixel-exactness against a foreign codec is not a meaningful contract
(libjpeg builds differ by ±1 LSB), so the decode tests roundtrip:
encode a known image with these minimal spec-shaped writers, decode with
the package's pure-stdlib decoders, and bound the reconstruction error.
Encoders live in tests only — the engine never needs to WRITE media."""

from __future__ import annotations

import struct

import numpy as np

from cpt_database_sync_spark.operators.jpegcodec import ZIGZAG, _IDCT_BASIS

# ---------------------------------------------------------------- JPEG

# flat quant table (identity dequant) keeps the roundtrip error at pure
# DCT/IDCT float rounding; simple fixed-length huffman tables: DC
# categories 0-11 at 8 bits, every AC run/size byte at 9 bits
_DC_SYMS = list(range(12))
# 255 symbols (a DHT length-count is one byte): rs=0xFF (run 15, size 15)
# is unreachable — size caps at 11 bits for 8-bit samples with flat quant
_AC_SYMS = list(range(255))


def _fixed_table(symbols, length):
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    code = {}
    c = 0 << 0
    # canonical: first code at this length is 0 shifted in from length 1
    c = 0
    for ln in range(1, length):
        c <<= 1
    for s in symbols:
        code[s] = (c, length)
        c += 1
    return counts, symbols, code


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _fdct(block):
    # inverse of jpegcodec's IDCT: coef = B · pixels · B^T
    return _IDCT_BASIS @ block @ _IDCT_BASIS.T


def _cat(v):
    """DC/AC magnitude category + the value bits (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _encode_block(w, block, pred, dc_code, ac_code):
    coef = np.rint(_fdct(block - 128.0)).astype(int)
    zz = [int(coef.flat[ZIGZAG[k]]) for k in range(64)]
    diff = zz[0] - pred
    n, bits = _cat(diff)
    c, ln = dc_code[n]
    w.put(c, ln)
    w.put(bits, n)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, 64):
        if k > last_nz:
            c, ln = ac_code[0x00]  # EOB
            w.put(c, ln)
            break
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_code[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        n, bits = _cat(zz[k])
        c, ln = ac_code[(run << 4) | n]
        w.put(c, ln)
        w.put(bits, n)
        run = 0
    return zz[0]


def _dht_segment(tc, th, counts, symbols):
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment():
    table = bytes([1] * 64)
    body = bytes([0]) + table
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    """Grayscale baseline JPEG (1 component, flat quant)."""
    h, w = pixels.shape
    dc_counts, dc_syms, dc_code = _fixed_table(_DC_SYMS, 8)
    ac_counts, ac_syms, ac_code = _fixed_table(_AC_SYMS, 9)
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment()
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_counts, dc_syms)
    out += _dht_segment(1, 0, ac_counts, ac_syms)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw = _BitWriter()
    pred = 0
    padded = np.pad(
        pixels.astype(float),
        ((0, -h % 8), (0, -w % 8)),
        mode="edge",
    )
    for y0 in range(0, padded.shape[0], 8):
        for x0 in range(0, padded.shape[1], 8):
            pred = _encode_block(
                bw, padded[y0 : y0 + 8, x0 : x0 + 8], pred, dc_code, ac_code
            )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_420(rgb: np.ndarray, dri: int = 0) -> bytes:
    """Color baseline JPEG: YCbCr, Y at full res (h=v=2), chroma 2×2
    box-downsampled (h=v=1) — the standard 4:2:0 MCU interleave; optional
    restart interval exercises the RSTn path."""
    h, w, _ = rgb.shape
    assert h % 16 == 0 and w % 16 == 0, "keep the fixture MCU-aligned"
    r, g, b = (rgb[..., i].astype(float) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    cb_d = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr_d = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    dc_counts, dc_syms, dc_code = _fixed_table(_DC_SYMS, 8)
    ac_counts, ac_syms, ac_code = _fixed_table(_AC_SYMS, 9)
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment()
    sof = (
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_counts, dc_syms)
    out += _dht_segment(1, 0, ac_counts, ac_syms)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    mcu = 0
    rst = 0
    for my in range(h // 16):
        for mx in range(w // 16):
            if dri and mcu and mcu % dri == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                pred = {1: 0, 2: 0, 3: 0}
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    pred[1] = _encode_block(
                        bw, y[y0 : y0 + 8, x0 : x0 + 8], pred[1],
                        dc_code, ac_code,
                    )
            cy, cx = my * 8, mx * 8
            pred[2] = _encode_block(
                bw, cb_d[cy : cy + 8, cx : cx + 8], pred[2], dc_code, ac_code
            )
            pred[3] = _encode_block(
                bw, cr_d[cy : cy + 8, cx : cx + 8], pred[3], dc_code, ac_code
            )
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------- GIF


def encode_gif(
    indices: np.ndarray,
    palette: bytes,
    interlace: bool = False,
    screen: tuple | None = None,
    offset: tuple = (0, 0),
    local_palette: bytes | None = None,
    bg_index: int = 0,
) -> bytes:
    """Minimal GIF89a writer: global color table + one frame, LZW stream
    written as literal codes with a CLEAR whenever the table would force
    a width change (valid per spec, trivially correct). ``screen`` larger
    than the frame plus ``offset``/``local_palette``/``bg_index`` express
    the background-compositing cases the decoder regression-tests pin."""
    h, w = indices.shape
    sw, sh = screen if screen else (w, h)
    left, top = offset
    # depth / size fields / LZW min-code all derive from the GLOBAL
    # palette; a differently-sized local table would be written with the
    # wrong declared size and padding
    assert local_palette is None or len(local_palette) == len(palette), (
        "local_palette must have the same entry count as palette"
    )
    npal = len(palette) // 3
    depth = max(2, (npal - 1).bit_length())
    pal = palette + b"\x00" * (3 * ((1 << depth) - npal))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (depth - 1), bg_index, 0])
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
    lct_flag = 0x80 if local_palette is not None else 0x00
    out += bytes([lct_flag | (0x40 if interlace else 0x00) | ((depth - 1) if local_palette is not None else 0)])
    if local_palette is not None:
        out += local_palette + b"\x00" * (3 * (1 << depth) - len(local_palette))
    min_code = depth
    clear, eoi = 1 << depth, (1 << depth) + 1
    width = depth + 1
    acc = nbits = 0
    data = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    rows = list(range(h))
    if interlace:
        rows = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
    put(clear)
    budget = (1 << width) - clear - 2  # literals before width would grow
    n = 0
    for y in rows:
        for x in range(w):
            if n == budget:
                put(clear)
                n = 0
            put(int(indices[y, x]))
            n += 1
    put(eoi)
    if nbits:
        data.append(acc & 0xFF)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ------------------------------------------------------- progressive JPEG

def _zz_coefs(block) -> list:
    """Signed zigzag-order DCT coefficients of one 8x8 pixel block."""
    coef = np.rint(_fdct(block - 128.0)).astype(int)
    return [int(coef.flat[ZIGZAG[k]]) for k in range(64)]


def _sos_segment(comps, ss, se, ah, al) -> bytes:
    body = bytes([len(comps)])
    for cid, tables in comps:
        body += bytes([cid, tables])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def _emit_dc_first(bw, zz0, pred, al, dc_code):
    v = zz0 >> al  # arithmetic shift: the spec's DC point transform
    diff = v - pred
    n, bits = _cat(diff)
    c, ln = dc_code[n]
    bw.put(c, ln)
    bw.put(bits, n)
    return v


def _emit_ac_first_block(bw, zz, ss, se, al, ac_code):
    """AC first scan, one block, per-block EOB (EOBRUN length 1)."""
    vals = [
        (1 if zz[k] > 0 else -1) * (abs(zz[k]) >> al) for k in range(64)
    ]
    last_nz = max((k for k in range(ss, se + 1) if vals[k]), default=None)
    run = 0
    if last_nz is not None:
        for k in range(ss, last_nz + 1):
            if vals[k] == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_code[0xF0]
                bw.put(c, ln)
                run -= 16
            n, bits = _cat(vals[k])
            c, ln = ac_code[(run << 4) | n]
            bw.put(c, ln)
            bw.put(bits, n)
            run = 0
    if last_nz is None or last_nz < se:
        c, ln = ac_code[0x00]  # EOB (run length 1)
        bw.put(c, ln)


def _emit_ac_refine_block(bw, zz, ss, se, al, ac_code):
    """AC refinement scan, one block — the exact mirror of the decoder's
    walk (jpegcodec._make_ac_refine): symbols for newly-significant
    coefficients, correction bits interleaved in POSITION order at
    nonzero-history coefficients, per-block EOB."""
    hist = lambda k: (abs(zz[k]) >> (al + 1)) != 0  # noqa: E731
    newly = lambda k: not hist(k) and (abs(zz[k]) >> al) == 1  # noqa: E731
    corr = lambda k: (abs(zz[k]) >> al) & 1  # noqa: E731
    k = ss
    while k <= se:
        # locate the next newly-significant coefficient and the number
        # of zero-history zeros before it
        qpos = None
        run = 0
        j = k
        while j <= se:
            if newly(j):
                qpos = j
                break
            if not hist(j):
                run += 1
            j += 1
        if qpos is None:
            c, ln = ac_code[0x00]  # EOB, then trailing correction bits
            bw.put(c, ln)
            for t in range(k, se + 1):
                if hist(t):
                    bw.put(corr(t), 1)
            return
        while run > 15:
            c, ln = ac_code[0xF0]  # ZRL: consumes 16 zero-history zeros
            bw.put(c, ln)
            cnt = 16
            while cnt > 0:
                if hist(k):
                    bw.put(corr(k), 1)
                else:
                    cnt -= 1
                k += 1
            run -= 16
        c, ln = ac_code[(run << 4) | 1]
        bw.put(c, ln)
        bw.put(1 if zz[qpos] > 0 else 0, 1)  # sign of the new coefficient
        while k < qpos:
            if hist(k):
                bw.put(corr(k), 1)
            k += 1
        k = qpos + 1
    # ended exactly at se with a placement: no EOB needed


def encode_jpeg_progressive_gray(pixels: np.ndarray) -> bytes:
    """Grayscale progressive JPEG: DC first (Al=1) + DC refine, then AC
    spectral bands 1-5 / 6-63 each at Al=1 followed by their Al=0
    refinement — six scans exercising spectral selection AND both
    successive-approximation passes."""
    h, w = pixels.shape
    dc_counts, dc_syms, dc_code = _fixed_table(_DC_SYMS, 8)
    ac_counts, ac_syms, ac_code = _fixed_table(_AC_SYMS, 9)
    padded = np.pad(
        pixels.astype(float), ((0, -h % 8), (0, -w % 8)), mode="edge"
    )
    blocks = [
        _zz_coefs(padded[y0 : y0 + 8, x0 : x0 + 8])
        for y0 in range(0, padded.shape[0], 8)
        for x0 in range(0, padded.shape[1], 8)
    ]
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment()
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_counts, dc_syms)
    out += _dht_segment(1, 0, ac_counts, ac_syms)

    def scan(ss, se, ah, al, emit):
        nonlocal out
        out += _sos_segment([(1, 0x00)], ss, se, ah, al)
        bw = _BitWriter()
        emit(bw)
        bw.flush()
        out += bw.out

    def dc_first(bw):
        pred = 0
        for zz in blocks:
            pred = _emit_dc_first(bw, zz[0], pred, 1, dc_code)

    scan(0, 0, 0, 1, dc_first)
    scan(0, 0, 1, 0, lambda bw: [bw.put(zz[0] & 1, 1) for zz in blocks])
    for lo, hi in ((1, 5), (6, 63)):
        scan(
            lo, hi, 0, 1,
            lambda bw, lo=lo, hi=hi: [
                _emit_ac_first_block(bw, zz, lo, hi, 1, ac_code)
                for zz in blocks
            ],
        )
    for lo, hi in ((1, 5), (6, 63)):
        scan(
            lo, hi, 1, 0,
            lambda bw, lo=lo, hi=hi: [
                _emit_ac_refine_block(bw, zz, lo, hi, 0, ac_code)
                for zz in blocks
            ],
        )
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_color_420(rgb: np.ndarray) -> bytes:
    """4:2:0 color progressive JPEG: interleaved DC first/refine scans
    (MCU order over all three components), then per-component AC band
    1-63 first (Al=1) and refinement (Al=0) scans."""
    h, w, _ = rgb.shape
    assert h % 16 == 0 and w % 16 == 0, "keep the fixture MCU-aligned"
    r, g, b = (rgb[..., i].astype(float) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    cb_d = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr_d = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    dc_counts, dc_syms, dc_code = _fixed_table(_DC_SYMS, 8)
    ac_counts, ac_syms, ac_code = _fixed_table(_AC_SYMS, 9)

    def grid(plane):
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        return [
            [
                _zz_coefs(plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
                for bx in range(bw_)
            ]
            for by in range(bh)
        ]

    gy, gcb, gcr = grid(y), grid(cb_d), grid(cr_d)
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment()
    sof = (
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_counts, dc_syms)
    out += _dht_segment(1, 0, ac_counts, ac_syms)

    # interleaved DC first (Al=1): MCU order, 4 Y blocks + Cb + Cr
    out += _sos_segment([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 0, 1)
    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    pred[1] = _emit_dc_first(
                        bw, gy[my * 2 + by][mx * 2 + bx][0], pred[1], 1,
                        dc_code,
                    )
            pred[2] = _emit_dc_first(bw, gcb[my][mx][0], pred[2], 1, dc_code)
            pred[3] = _emit_dc_first(bw, gcr[my][mx][0], pred[3], 1, dc_code)
    bw.flush()
    out += bw.out

    # interleaved DC refine (Ah=1, Al=0): one bit per block, same order
    out += _sos_segment([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    bw.put(gy[my * 2 + by][mx * 2 + bx][0] & 1, 1)
            bw.put(gcb[my][mx][0] & 1, 1)
            bw.put(gcr[my][mx][0] & 1, 1)
    bw.flush()
    out += bw.out

    # per-component AC first then refinement over the full 1-63 band
    for cid, g_ in ((1, gy), (2, gcb), (3, gcr)):
        out += _sos_segment([(cid, 0x00)], 1, 63, 0, 1)
        bw = _BitWriter()
        for row in g_:
            for zz in row:
                _emit_ac_first_block(bw, zz, 1, 63, 1, ac_code)
        bw.flush()
        out += bw.out
    for cid, g_ in ((1, gy), (2, gcb), (3, gcr)):
        out += _sos_segment([(cid, 0x00)], 1, 63, 1, 0)
        bw = _BitWriter()
        for row in g_:
            for zz in row:
                _emit_ac_refine_block(bw, zz, 1, 63, 0, ac_code)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
