"""Baseline JPEG (JFIF) decoder — stdlib + numpy, no libjpeg.

Reference parity: the reference shells image handling out to
external tools/libraries; the multimodal analog here keeps decode
hermetic (like sources/png.py / wav.py / avi.py) so the default
`resize_images` codec can decode real photographic payloads without
a native dependency.  Scope: baseline sequential DCT (SOF0) and
extended sequential (SOF1), 8-bit, grayscale or YCbCr with any
standard sampling (4:4:4, 4:2:2, 4:2:0 — general H/V factors),
restart markers, 8/16-bit quantization tables.  Out of scope, all
raising ValueError (the callers' drop-the-row contract):
progressive (SOF2), arithmetic coding (SOF9+), CMYK/Adobe 4-comp,
12-bit precision, hierarchical.

Decode path: marker walk → canonical Huffman tables (count/symbol
lists per Annex C) → MCU scan with 0xFF00 unstuffing and RSTn DC
resets → dequant → de-zigzag → separable IDCT as two 8×8 numpy
matmuls per block batch → nearest-neighbor chroma upsample →
BT.601 YCbCr→RGB.  Per-block work is vectorized across each
component's full block set, so the Python overhead is O(symbols),
not O(pixels).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

#: zigzag order: zz[i] = (row, col) of the i-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

#: IDCT-II basis: B[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_B = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _B[_u, _x] = (_c / 2.0) * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _Huff:
    """Canonical Huffman decode table (Annex C code assignment):
    (length, code) -> symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.map: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.map[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        self.max_len = max((l for l, _ in self.map), default=0)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> bool:
        if self.i >= len(self.d):
            return False
        b = self.d[self.i]
        if b == 0xFF:
            nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else None
            if nxt == 0x00:
                self.i += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                return False  # caller handles RST via sync()
            else:
                return False  # real marker: scan over
        else:
            self.i += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # spec: pad with 1-bits at the end of scan
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        return v

    def huff(self, table: _Huff) -> int:
        length, code = 0, 0
        for _ in range(table.max_len):
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def sync_restart(self, n: int) -> None:
        """Consume the expected RSTn marker and reset bit state."""
        self.bits = self.nbits = 0
        # skip pad 0xFF bytes then the marker
        while self.i + 1 < len(self.d) and self.d[self.i] == 0xFF:
            m = self.d[self.i + 1]
            if 0xD0 <= m <= 0xD7:
                if m != 0xD0 + n:
                    raise ValueError("jpeg: restart marker out of sequence")
                self.i += 2
                return
            if m == 0xFF:
                self.i += 1
                continue
            break
        raise ValueError("jpeg: expected restart marker")


def _extend(v: int, t: int) -> int:
    """DC/AC value extension (spec F.2.2.1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, 3) uint8 RGB.  ValueError outside the
    documented baseline scope (callers drop the row) — including
    truncated/garbled streams, which must never leak IndexError /
    KeyError / struct.error past this boundary."""
    try:
        return _decode(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, OverflowError) as e:
        raise ValueError(f"jpeg: malformed stream ({type(e).__name__})") from e


def _decode(payload: bytes) -> np.ndarray:
    if not payload or not payload.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG")
    d = payload
    i = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    frame = None  # (H, W, comps) comps = [(id, h, v, tq)]
    restart_interval = 0
    scan = None

    while i + 4 <= len(d):
        if d[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = d[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        seg_len = struct.unpack(">H", d[i + 2 : i + 4])[0]
        seg = d[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq:
                    vals = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                else:
                    vals = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
                tab = np.zeros((8, 8), dtype=np.int32)
                tab[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = tab
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                syms = seg[j + 17 : j + 17 + n]
                (dc_tabs if tc == 0 else ac_tabs)[th] = _Huff(counts, syms)
                j += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline+extended seq
            prec = seg[0]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError("jpeg: only grayscale/YCbCr supported")
            comps = []
            for k in range(ncomp):
                cid = seg[6 + 3 * k]
                hv = seg[7 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * k]))
            if ncomp == 1:
                # spec B.2.3: a one-component scan is non-interleaved
                # (one 8x8 unit per MCU, ceil(W/8)*ceil(H/8) blocks)
                # regardless of declared sampling factors, so h=v=1
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline/extended-sequential Huffman supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for k in range(ns):
                cid = seg[1 + 2 * k]
                tda = seg[2 + 2 * k]
                scan.append((cid, tda >> 4, tda & 0xF))
            i = i + 2 + seg_len
            break
        i += 2 + seg_len

    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")
    H, W, comps = frame
    if H == 0 or W == 0:
        raise ValueError("jpeg: empty image")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    # per-component coefficient stores (vectorized IDCT afterwards)
    blocks: dict[int, np.ndarray] = {}
    bw: dict[int, int] = {}
    for cid, ch, cv, _tq in comps:
        bw[cid] = mcux * ch
        blocks[cid] = np.zeros((mcuy * cv * bw[cid], 64), dtype=np.int32)

    tab_for = {cid: (td, ta) for cid, td, ta in scan}
    comp_by_id = {c[0]: c for c in comps}
    if set(tab_for) != set(comp_by_id):
        # a legal non-interleaved file has one SOS per component;
        # only the single interleaved scan is in scope
        raise ValueError("jpeg: non-interleaved (multi-scan) not supported")
    # the entropy stream follows SCAN-header component order
    # (spec B.2.3), which may differ from SOF order
    scan_comps = [comp_by_id[cid] for cid, _td, _ta in scan]
    br = _BitReader(d, i)
    pred = {cid: 0 for cid, *_ in comps}
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart(rst)
                rst = (rst + 1) & 7
                pred = {cid: 0 for cid in pred}
            for cid, ch, cv, _tq in scan_comps:
                td, ta = tab_for[cid]
                if td not in dc_tabs or ta not in ac_tabs:
                    raise ValueError("jpeg: missing Huffman table")
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int32)
                        t = br.huff(dc_tabs[td])
                        diff = _extend(br.read(t), t) if t else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_tabs[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        row = (my * cv + by) * bw[cid] + (mx * ch + bx)
                        blocks[cid][row] = zz
            mcu_count += 1

    # vectorized dequant + de-zigzag + IDCT per component
    planes: dict[int, np.ndarray] = {}
    for cid, ch, cv, tq in comps:
        if tq not in qt:
            raise ValueError("jpeg: missing quantization table")
        n = blocks[cid].shape[0]
        coeff = np.zeros((n, 8, 8), dtype=np.float64)
        coeff[:, _ZZ_ROWS, _ZZ_COLS] = blocks[cid]
        coeff *= qt[tq][None, :, :]
        spatial = np.einsum("ux,nuv,vy->nxy", _B, coeff, _B)
        spatial = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
        rows = mcuy * cv
        cols = bw[cid]
        plane = (
            spatial.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        # upsample to full image grid (nearest), crop to H×W
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes[cid] = plane[:H, :W]

    if len(comps) == 1:
        g = planes[comps[0][0]].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y = planes[comps[0][0]].astype(np.float64)
    cb = planes[comps[1][0]].astype(np.float64) - 128.0
    cr = planes[comps[2][0]].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)
