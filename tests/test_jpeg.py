"""Baseline JPEG decoder (sources/jpeg.py) against hand-assembled
bitstreams: a minimal in-test encoder builds real JFIF files byte by
byte (spec Annex B segment layout + Annex K example Huffman tables),
independent of the decoder's internals — same fixture strategy as
test_doc.py's CFB files."""

import struct

import numpy as np
import pytest

from ferenda_spark.sources.jpeg import decode_jpeg

# ----- Annex K.3 example Huffman tables (public JPEG spec constants)

DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
AC_LUMA_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_SYMS = bytes([
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
])


def _canonical_codes(counts, symbols):
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for b in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> b) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)


ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


def _magnitude(v):
    """(size, bits) per spec F.1.2.1.1."""
    if v == 0:
        return 0, 0
    t = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_block(w, zz_coeffs, dc_pred, dc_codes, ac_codes):
    dc = zz_coeffs[0]
    t, bits = _magnitude(dc - dc_pred)
    length, code = dc_codes[t]
    w.put(code, length)
    if t:
        w.put(bits, t)
    k = 1
    run = 0
    last = max((i for i in range(1, 64) if zz_coeffs[i]), default=0)
    while k <= last:
        v = zz_coeffs[k]
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            w.put(code, length)
            run -= 16
        s, bits = _magnitude(v)
        length, code = ac_codes[(run << 4) | s]
        w.put(code, length)
        w.put(bits, s)
        run = 0
        k += 1
    if last < 63:
        length, code = ac_codes[0x00]
        w.put(code, length)
    return dc


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def make_gray_jpeg(block_rows, q=16, dri=0):
    """Grayscale baseline JPEG from a list of rows of 8×8 zigzag
    coefficient lists (one entry per 8×8 block)."""
    h = len(block_rows) * 8
    w = len(block_rows[0]) * 8
    dqt = _seg(0xDB, bytes([0x00]) + bytes([q] * 64))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA[0]) + DC_LUMA[1]) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_COUNTS) + AC_LUMA_SYMS
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc_codes = _canonical_codes(*DC_LUMA)
    ac_codes = _canonical_codes(AC_LUMA_COUNTS, AC_LUMA_SYMS)
    bw = _BitWriter()
    pred = 0
    mcu = 0
    body = bytearray()
    rst = 0
    for row in block_rows:
        for zz in row:
            if dri and mcu and mcu % dri == 0:
                bw.pad()
                body += bw.out
                bw = _BitWriter()
                body += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = 0
            pred = _encode_block(bw, zz, pred, dc_codes, ac_codes)
            mcu += 1
    bw.pad()
    body += bw.out
    head = b"\xff\xd8" + dqt + sof + dht
    if dri:
        head += _seg(0xDD, struct.pack(">H", dri))
    return head + sos + bytes(body) + b"\xff\xd9"


def _zz_of(dense):
    return [dense[r][c] for r, c in ZZ]


def _ref_idct(coeff_q):
    B = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            B[u, x] = (c / 2) * np.cos((2 * x + 1) * u * np.pi / 16)
    return B.T @ coeff_q @ B


def test_flat_gray_block():
    """DC-only block: pixel = q·DC/8 + 128 everywhere."""
    zz = [0] * 64
    zz[0] = 4  # dequant 4*16=64 -> 64/8=8 -> 136
    img = decode_jpeg(make_gray_jpeg([[zz]]))
    assert img.shape == (8, 8, 3)
    assert np.all(img == 136)


def test_ac_coefficients_match_reference_idct():
    dense = [[0] * 8 for _ in range(8)]
    dense[0][0] = 5
    dense[0][1] = -3
    dense[1][0] = 2
    dense[2][3] = 7
    zz = _zz_of(dense)
    img = decode_jpeg(make_gray_jpeg([[zz]], q=16))
    want = np.clip(
        np.round(_ref_idct(np.array(dense) * 16.0) + 128), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(img[:, :, 0], want)


def test_multi_block_dc_prediction():
    """Two blocks: second DC is coded as a DIFF from the first."""
    z1 = [0] * 64
    z1[0] = 4
    z2 = [0] * 64
    z2[0] = 8  # diff +4
    img = decode_jpeg(make_gray_jpeg([[z1, z2]]))
    assert img.shape == (8, 16, 3)
    assert np.all(img[:, :8, 0] == 136)
    assert np.all(img[:, 8:, 0] == 144)


def test_restart_markers_reset_prediction():
    z1 = [0] * 64
    z1[0] = 4
    z2 = [0] * 64
    z2[0] = 4  # absolute again after RST reset
    img = decode_jpeg(make_gray_jpeg([[z1, z2]], dri=1))
    assert np.all(img[:, :, 0] == 136)


def test_zrl_long_zero_run():
    zz = [0] * 64
    zz[0] = 4
    zz[40] = 3  # forces a ZRL (16-zero) code
    dense = [[0] * 8 for _ in range(8)]
    for i, (r, c) in enumerate(ZZ):
        dense[r][c] = zz[i]
    img = decode_jpeg(make_gray_jpeg([[zz]]))
    want = np.clip(
        np.round(_ref_idct(np.array(dense) * 16.0) + 128), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(img[:, :, 0], want)


def make_color_jpeg(y_dc, cb_dc, cr_dc):
    """8×8 4:4:4 color JPEG, flat DC per channel, shared tables."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA[0]) + DC_LUMA[1]) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_COUNTS) + AC_LUMA_SYMS
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    dc_codes = _canonical_codes(*DC_LUMA)
    ac_codes = _canonical_codes(AC_LUMA_COUNTS, AC_LUMA_SYMS)
    bw = _BitWriter()
    for dc in (y_dc, cb_dc, cr_dc):
        zz = [0] * 64
        zz[0] = dc
        _encode_block(bw, zz, 0, dc_codes, ac_codes)
    bw.pad()
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"


def test_color_ycbcr_to_rgb():
    # Y=136, Cb=128+16=144, Cr=128-16=112 after +128 level shift
    img = decode_jpeg(make_color_jpeg(4, 8, -8))
    y, cb, cr = 136.0, 16.0, -16.0
    want = np.clip(
        np.round(
            np.array([y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb])
        ),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(img[0, 0], want)
    assert np.all(img == img[0, 0])


def test_rejects_out_of_scope():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # SOF2 with a sequential-style single scan: Ss=0 but Se=63 is an
    # invalid progressive DC scan header
    prog = make_gray_jpeg([[[0] * 64]])
    prog = prog.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # arithmetic coding stays out of scope
    arith = make_gray_jpeg([[[0] * 64]]).replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError):
        decode_jpeg(arith)
    # truncated entropy data must not loop forever
    trunc = make_gray_jpeg([[[4] + [0] * 63]])[:-12]
    with pytest.raises(ValueError):
        decode_jpeg(trunc)


# ------------------------------------------------ progressive (SOF2)


def _trunc_shift(v, al):
    """Successive-approximation point transform: v / 2^al truncated
    toward zero (spec G.1.2.1)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


DC_CODES = _canonical_codes(*DC_LUMA)
AC_CODES = _canonical_codes(AC_LUMA_COUNTS, AC_LUMA_SYMS)


def _prog_sos(comps_tda, ss, se, ah, al):
    body = bytes([len(comps_tda)])
    for cid, tda in comps_tda:
        body += bytes([cid, tda])
    return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def _dc_first_scan(dcs, al, cid=1):
    """Single-component progressive DC first scan over `dcs` blocks."""
    w = _BitWriter()
    pred = 0
    for dc in dcs:
        v = _trunc_shift(dc, al)
        t, bits = _magnitude(v - pred)
        ln, code = DC_CODES[t]
        w.put(code, ln)
        if t:
            w.put(bits, t)
        pred = v
    w.pad()
    return _prog_sos([(cid, 0x00)], 0, 0, 0, al) + bytes(w.out)


def _dc_refine_scan(dcs, al, cid=1):
    w = _BitWriter()
    for dc in dcs:
        w.put((abs(dc) >> al) & 1, 1)
    w.pad()
    return _prog_sos([(cid, 0x00)], 0, 0, al + 1, al) + bytes(w.out)


def _ac_first_scan(blocks_zz, ss, se, al, cid=1):
    """AC first pass: per-block run/size of the [ss..se] band at
    approximation `al` (EOB run of 1 per trailing-zero block)."""
    w = _BitWriter()
    for zz in blocks_zz:
        band = [_trunc_shift(zz[k], al) for k in range(ss, se + 1)]
        last = max((i for i, v in enumerate(band) if v), default=-1)
        run = 0
        for v in band[: last + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = AC_CODES[0xF0]
                w.put(code, ln)
                run -= 16
            s, bits = _magnitude(v)
            ln, code = AC_CODES[(run << 4) | s]
            w.put(code, ln)
            w.put(bits, s)
            run = 0
        if last < len(band) - 1:
            ln, code = AC_CODES[0x00]
            w.put(code, ln)
    w.pad()
    return _prog_sos([(cid, 0x00)], ss, se, 0, al) + bytes(w.out)


def _ac_refine_scan(blocks_zz, ss, se, al, cid=1):
    """AC refinement from approximation al+1 down to al: correction
    bits for already-significant coefficients, ±1<<al insertions for
    newly-significant ones (spec G.1.2.3 encoder side)."""
    w = _BitWriter()
    for zz in blocks_zz:
        corr = []
        run = 0
        for k in range(ss, se + 1):
            hist = _trunc_shift(zz[k], al + 1)
            if hist != 0:
                corr.append((abs(zz[k]) >> al) & 1)
                continue
            v = _trunc_shift(zz[k], al)
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = AC_CODES[0xF0]
                w.put(code, ln)
                for b in corr:
                    w.put(b, 1)
                corr = []
                run -= 16
            ln, code = AC_CODES[(run << 4) | 1]
            w.put(code, ln)
            w.put(1 if v > 0 else 0, 1)
            for b in corr:
                w.put(b, 1)
            corr = []
            run = 0
        ln, code = AC_CODES[0x00]  # EOB run of 1
        w.put(code, ln)
        for b in corr:
            w.put(b, 1)
    w.pad()
    return _prog_sos([(cid, 0x00)], ss, se, al + 1, al) + bytes(w.out)


def _prog_gray_head(h, w, q=16):
    dqt = _seg(0xDB, bytes([0x00]) + bytes([q] * 64))
    sof = _seg(
        0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    )
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA[0]) + DC_LUMA[1]) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_COUNTS) + AC_LUMA_SYMS
    )
    return b"\xff\xd8" + dqt + sof + dht


def test_progressive_gray_equals_baseline():
    """Full successive-approximation ladder (DC first Al=1 + DC
    refine, AC first Al=1 + AC refine) reconstructs the exact
    coefficients of the equivalent baseline file."""
    z1 = [0] * 64
    z1[0], z1[1], z1[5], z1[40] = 6, 4, -2, 2
    z2 = [0] * 64
    z2[0], z2[2], z2[10] = 8, 1, 3  # odd values force refinement bits
    blocks = [z1, z2]
    dcs = [z[0] for z in blocks]
    prog = (
        _prog_gray_head(8, 16)
        + _dc_first_scan(dcs, 1)
        + _ac_first_scan(blocks, 1, 63, 1)
        + _dc_refine_scan(dcs, 0)
        + _ac_refine_scan(blocks, 1, 63, 0)
        + b"\xff\xd9"
    )
    base = make_gray_jpeg([blocks])
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(base))


def test_progressive_spectral_bands():
    """AC band split across two scans (1..5, 6..63) plus a ZRL-range
    coefficient decodes identically to baseline."""
    zz = [0] * 64
    zz[0], zz[3], zz[20], zz[45] = 4, 5, -7, 3
    prog = (
        _prog_gray_head(8, 8)
        + _dc_first_scan([zz[0]], 0)
        + _ac_first_scan([zz], 1, 5, 0)
        + _ac_first_scan([zz], 6, 63, 0)
        + b"\xff\xd9"
    )
    assert np.array_equal(
        decode_jpeg(prog), decode_jpeg(make_gray_jpeg([[zz]]))
    )


def test_progressive_newly_significant_in_refinement():
    """A magnitude-1 coefficient invisible at Al=1 must be inserted
    by the refinement scan's ±1 path (G.1.2.3)."""
    zz = [0] * 64
    zz[0], zz[2], zz[10] = 4, 1, 3
    prog = (
        _prog_gray_head(8, 8)
        + _dc_first_scan([4], 0)
        + _ac_first_scan([zz], 1, 63, 1)
        + _ac_refine_scan([zz], 1, 63, 0)
        + b"\xff\xd9"
    )
    assert np.array_equal(
        decode_jpeg(prog), decode_jpeg(make_gray_jpeg([[zz]]))
    )


def test_progressive_color_interleaved_dc():
    """3-component interleaved DC scan (the standard progressive
    opener) against the flat baseline color file."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA[0]) + DC_LUMA[1])
    w = _BitWriter()
    for dc in (4, 8, -8):  # Y, Cb, Cr — each its own predictor
        t, bits = _magnitude(dc)
        ln, code = DC_CODES[t]
        w.put(code, ln)
        if t:
            w.put(bits, t)
    w.pad()
    sos = _prog_sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 0, 0)
    prog = b"\xff\xd8" + dqt + sof + dht + sos + bytes(w.out) + b"\xff\xd9"
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(make_color_jpeg(4, 8, -8)))


def test_progressive_420_noninterleaved_ac_grid():
    """8×8 image with 4:2:0 sampling: the luma AC scan iterates the
    component's TRUE 1×1 block grid, not the 2×2 padded MCU grid."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA[0]) + DC_LUMA[1]) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_COUNTS) + AC_LUMA_SYMS
    )
    # interleaved DC: 4 padded Y blocks + Cb + Cr
    w = _BitWriter()
    pred = 0
    for dc in (4, 4, 4, 4):  # Y blocks share a predictor chain
        t, bits = _magnitude(dc - pred)
        ln, code = DC_CODES[t]
        w.put(code, ln)
        if t:
            w.put(bits, t)
        pred = dc
    for dc in (8, -8):  # Cb, Cr fresh predictors
        t, bits = _magnitude(dc)
        ln, code = DC_CODES[t]
        w.put(code, ln)
        if t:
            w.put(bits, t)
    w.pad()
    dc_scan = _prog_sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 0, 0) + bytes(w.out)
    # luma AC over the true 1-block grid
    zz_y = [0] * 64
    zz_y[1] = 3
    ac_scan = _ac_first_scan([zz_y], 1, 63, 0, cid=1)
    prog = b"\xff\xd8" + dqt + sof + dht + dc_scan + ac_scan + b"\xff\xd9"
    img = decode_jpeg(prog)
    assert img.shape == (8, 8, 3)
    # baseline equivalent: one MCU, luma block 0 carries the AC term
    zz_pad = [0] * 64
    zz_pad[0] = 4
    zz0 = list(zz_pad)
    zz0[1] = 3
    base = make_420_jpeg([4, 4, 4, 4], 8, -8)
    # patch not practical — assert against reference IDCT directly
    dense = [[0] * 8 for _ in range(8)]
    dense[0][0], dense[ZZ[1][0]][ZZ[1][1]] = 4, 3
    # mirror the decoder's two-stage rounding: planes quantize to
    # uint8 BEFORE the color transform
    y = np.clip(np.round(_ref_idct(np.array(dense) * 16.0) + 128), 0, 255)
    cb, cr = 16.0, -16.0
    want = np.clip(np.round(np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)), 0, 255).astype(np.uint8)
    assert np.array_equal(img, want)
    del base


def test_odd_dimensions_crop():
    """Image smaller than the MCU grid: SOF dims crop the padded
    decode (12×12 from four 8×8 blocks)."""
    z = [0] * 64
    z[0] = 4
    pdf = make_gray_jpeg([[z, z], [z, z]])
    # patch SOF dims to 12x12
    i = pdf.index(b"\xff\xc0")
    pdf = pdf[: i + 5] + struct.pack(">HH", 12, 12) + pdf[i + 9 :]
    img = decode_jpeg(pdf)
    assert img.shape == (12, 12, 3)
    assert np.all(img == 136)


def make_420_jpeg(y_dcs, cb_dc, cr_dc):
    """16×16 4:2:0 JPEG: one MCU = 4 Y blocks (given DCs, raster
    order) + 1 Cb + 1 Cr."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 16, 16)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA[0]) + DC_LUMA[1]) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_COUNTS) + AC_LUMA_SYMS
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    dc_codes = _canonical_codes(*DC_LUMA)
    ac_codes = _canonical_codes(AC_LUMA_COUNTS, AC_LUMA_SYMS)
    bw = _BitWriter()
    pred = 0
    for dc in y_dcs:  # luma blocks share one DC predictor chain
        zz = [0] * 64
        zz[0] = dc
        pred = _encode_block(bw, zz, pred, dc_codes, ac_codes)
    for dc in (cb_dc, cr_dc):
        zz = [0] * 64
        zz[0] = dc
        _encode_block(bw, zz, 0, dc_codes, ac_codes)
    bw.pad()
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"


def test_420_subsampling():
    """Distinct luma per quadrant + flat chroma upsampled 2×."""
    img = decode_jpeg(make_420_jpeg([2, 4, 6, 8], 8, -8))
    ys = {
        (0, 0): 2 * 16 / 8 + 128, (0, 8): 4 * 16 / 8 + 128,
        (8, 0): 6 * 16 / 8 + 128, (8, 8): 8 * 16 / 8 + 128,
    }
    cb, cr = 16.0, -16.0
    for (r, c), y in ys.items():
        want = np.clip(
            np.round(np.array([
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ])), 0, 255,
        ).astype(np.uint8)
        quad = img[r : r + 8, c : c + 8]
        assert np.all(quad == want), (r, c, quad[0, 0], want)


def test_resize_images_real_jpeg_path(spark):
    """End-to-end: a REAL JPEG payload through the default codec —
    byte→pixels is sources/jpeg.py, not the fake — flat 8×8 gray
    survives the 2×2 nearest-neighbor downsample; a corrupt JPEG
    (magic ok, body garbage) is dropped, not crashed."""
    from ferenda_spark.operators import multimodal as M
    from ferenda_spark.sources.jpeg import JPEG_MAGIC

    zz = [0] * 64
    zz[0] = 4
    payload = make_gray_jpeg([[zz]])
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(payload), ("image/jpeg", 8, 8, None)),
            (2, "image", bytearray(JPEG_MAGIC + b"\x00" * 16), ("image/jpeg", 8, 8, None)),
        ],
        M.MEDIA_SCHEMA,
    )
    rows = {r["id"]: r for r in M.resize_images(media, 2, 2).collect()}
    assert set(rows) == {1}
    got = np.frombuffer(bytes(rows[1]["rgb"]), np.uint8).reshape(2, 2, 3)
    assert np.all(got == 136)


def test_truncated_headers_raise_valueerror_only():
    """Truncated/garbled segment bodies must surface as ValueError,
    never IndexError/struct.error (the drop-the-row contract)."""
    base = make_gray_jpeg([[[4] + [0] * 63]])
    i = base.index(b"\xff\xc0")
    # SOF body chopped mid-struct but length field intact
    broken_sof = base[: i + 6] + base[i + 9 :]
    for bad in [broken_sof, base[:i + 4], base[:30]]:
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_non_interleaved_multi_scan_rejected():
    """A color SOF whose single SOS lists only one component (the
    non-interleaved shape) raises ValueError instead of KeyError."""
    full = make_color_jpeg(4, 8, -8)
    i = full.index(b"\xff\xda")
    one_comp_sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    seg_len = struct.unpack(">H", full[i + 2 : i + 4])[0]
    patched = full[:i] + one_comp_sos + full[i + 2 + seg_len :]
    with pytest.raises(ValueError):
        decode_jpeg(patched)


def test_scan_order_differs_from_sof_order():
    """Entropy data follows SOS component order (spec B.2.3): a file
    whose scan lists Cr,Cb,Y must decode identically to the Y,Cb,Cr
    layout of the same pixel values."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA[0]) + DC_LUMA[1]) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_COUNTS) + AC_LUMA_SYMS
    )
    # SOS order: 3 (Cr), 2 (Cb), 1 (Y)
    sos = _seg(0xDA, bytes([3, 3, 0x00, 2, 0x00, 1, 0x00, 0, 63, 0]))
    dc_codes = _canonical_codes(*DC_LUMA)
    ac_codes = _canonical_codes(AC_LUMA_COUNTS, AC_LUMA_SYMS)
    bw = _BitWriter()
    for dc in (-8, 8, 4):  # Cr, Cb, Y in scan order
        zz = [0] * 64
        zz[0] = dc
        _encode_block(bw, zz, 0, dc_codes, ac_codes)
    bw.pad()
    img = decode_jpeg(
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    )
    assert np.array_equal(img, decode_jpeg(make_color_jpeg(4, 8, -8)))
