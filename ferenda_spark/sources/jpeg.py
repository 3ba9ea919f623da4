"""Baseline JPEG (JFIF) decoder — stdlib + numpy, no libjpeg.

Reference parity: the reference shells image handling out to
external tools/libraries; the multimodal analog here keeps decode
hermetic (like sources/png.py / wav.py / avi.py) so the default
`resize_images` codec can decode real photographic payloads without
a native dependency.  Scope: baseline sequential DCT (SOF0),
extended sequential (SOF1) AND progressive (SOF2 — spectral
selection + successive approximation, the encoding most large web
JPEGs use), 8-bit, grayscale or YCbCr with any standard sampling
(4:4:4, 4:2:2, 4:2:0 — general H/V factors), restart markers,
8/16-bit quantization tables, inter-scan table redefinition.  Out
of scope, all raising ValueError (the callers' drop-the-row
contract): arithmetic coding (SOF9+), CMYK/Adobe 4-comp, 12-bit
precision, lossless, hierarchical.

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


def _ac_first(br: "_BitReader", tab: "_Huff", coef, Ss: int, Se: int,
              Al: int, eobrun: int) -> int:
    """Progressive AC first-pass scan for one block (spec G.1.2.2):
    run/size coding of the [Ss..Se] band at approximation Al, with
    EOB runs spanning whole blocks.  Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = br.huff(tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += br.read(r)
            return eobrun - 1
        k += r
        if k > Se:
            raise ValueError("jpeg: AC index overflow")
        coef[k] = _extend(br.read(s), s) << Al
        k += 1
    return 0


def _ac_refine(br: "_BitReader", tab: "_Huff", coef, Ss: int, Se: int,
               Al: int, eobrun: int) -> int:
    """Progressive AC refinement for one block (spec G.1.2.3):
    correction bits for coefficients already nonzero, new ±1<<Al
    insertions for newly-significant ones.  Returns remaining EOB
    run."""
    p1 = 1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = br.huff(tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("jpeg: invalid AC refinement size")
                newval = p1 if br.read(1) else -p1
            while k <= Se:
                if coef[k] != 0:
                    # correction bit for an already-nonzero coefficient
                    if br.read(1) and (abs(int(coef[k])) & p1) == 0:
                        coef[k] += p1 if coef[k] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= Se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:
            if coef[k] != 0:
                if br.read(1) and (abs(int(coef[k])) & p1) == 0:
                    coef[k] += p1 if coef[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


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
    progressive = False
    coefs: dict[int, np.ndarray] | None = None  # progressive store
    geo = None  # (hmax, vmax, mcux, mcuy, bw, cbw, cbh)

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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 seq, SOF2 progressive
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only sequential/progressive Huffman supported "
                "(no arithmetic, 12-bit, lossless or hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for k in range(ns):
                cid = seg[1 + 2 * k]
                tda = seg[2 + 2 * k]
                scan.append((cid, tda >> 4, tda & 0xF))
            if not progressive:
                i = i + 2 + seg_len
                break
            # ---- progressive: decode this scan in place and keep
            # walking (tables may be redefined between scans, so
            # scans must be processed in stream order)
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if geo is None:
                geo = _geometry(frame)
                coefs = {
                    cid_: np.zeros(
                        (geo[5][cid_] * geo[4][cid_], 64), dtype=np.int32
                    )
                    for cid_, *_ in frame[2]
                }
            _hm, _vm, mcux_, mcuy_, bwd, _rowsd, cbw_, cbh_ = geo
            Ss = seg[1 + 2 * ns]
            Se = seg[2 + 2 * ns]
            A = seg[3 + 2 * ns]
            comp_by_id_p = {c[0]: c for c in frame[2]}
            for cid_, _td, _ta in scan:
                if cid_ not in comp_by_id_p:
                    raise ValueError("jpeg: scan component not in frame")
            br = _BitReader(d, i + 2 + seg_len)
            _prog_scan(
                br, scan, comp_by_id_p, mcux_, mcuy_, bwd, cbw_, cbh_,
                dc_tabs, ac_tabs, coefs, Ss, Se, A >> 4, A & 0xF,
                restart_interval,
            )
            # realign the walk to the next true marker (skip entropy
            # remnants, stuffed 0x00, RSTn and 0xFF fill bytes)
            i = br.i
            n_ = len(d)
            while i < n_:
                if d[i] != 0xFF:
                    i += 1
                    continue
                if i + 1 >= n_:
                    break
                nxt = d[i + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    i += 2
                elif nxt == 0xFF:
                    i += 1
                else:
                    break
            continue
        i += 2 + seg_len

    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")
    H, W, comps = frame
    if H == 0 or W == 0:
        raise ValueError("jpeg: empty image")
    if progressive:
        # all scans already decoded into coefs; share the IDCT tail
        hmax, vmax, mcux, mcuy, bw, _rowsd, _cbw, _cbh = geo
        blocks = coefs
        return _reconstruct(H, W, comps, blocks, bw, qt, mcuy, hmax, vmax)
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

    return _reconstruct(H, W, comps, blocks, bw, qt, mcuy, hmax, vmax)


def _geometry(frame):
    """(hmax, vmax, mcux, mcuy, bw, rows, cbw, cbh): padded MCU-grid
    block dims (bw×rows, the coefficient-array layout) plus each
    component's TRUE block dims (cbw×cbh — what a non-interleaved
    progressive scan iterates, spec A.2.2)."""
    H, W, comps = frame
    if H == 0 or W == 0:
        raise ValueError("jpeg: empty image")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    bw, rows, cbw, cbh = {}, {}, {}, {}
    for cid, ch, cv, _tq in comps:
        bw[cid] = mcux * ch
        rows[cid] = mcuy * cv
        compw = -(-(W * ch) // hmax)
        comph = -(-(H * cv) // vmax)
        cbw[cid] = -(-compw // 8)
        cbh[cid] = -(-comph // 8)
    return hmax, vmax, mcux, mcuy, bw, rows, cbw, cbh


def _dc_unit(br, dc_tabs, td, arr, row, pred, cid, Ah, Al):
    """One data unit of a progressive DC scan (first pass: Huffman
    diff at approximation Al; refinement: one raw bit into bit Al)."""
    if Ah == 0:
        if td not in dc_tabs:
            raise ValueError("jpeg: missing Huffman table")
        t = br.huff(dc_tabs[td])
        diff = _extend(br.read(t), t) if t else 0
        pred[cid] += diff
        arr[row, 0] = pred[cid] << Al
    else:
        if br.read(1):
            arr[row, 0] |= 1 << Al


def _prog_scan(br, scan, comp_by_id, mcux, mcuy, bwd, cbw, cbh,
               dc_tabs, ac_tabs, coefs, Ss, Se, Ah, Al,
               restart_interval):
    """One progressive scan (spec G.1): DC scans may interleave all
    frame components over the MCU grid; AC scans are one component
    over its true block grid.  Restart markers reset predictors and
    the EOB run."""
    if Ss == 0:
        if Se != 0:
            raise ValueError("jpeg: progressive DC scan with Se != 0")
        pred = {cid: 0 for cid, *_ in scan}
        rstn = 0
        unit = 0
        if len(scan) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        br.sync_restart(rstn)
                        rstn = (rstn + 1) & 7
                        pred = {cid: 0 for cid in pred}
                    for cid, td, _ta in scan:
                        _, ch, cv, _tq = comp_by_id[cid]
                        for by in range(cv):
                            for bx in range(ch):
                                row = (my * cv + by) * bwd[cid] + (
                                    mx * ch + bx
                                )
                                _dc_unit(
                                    br, dc_tabs, td, coefs[cid], row,
                                    pred, cid, Ah, Al,
                                )
                    unit += 1
        else:
            cid, td, _ta = scan[0]
            for by in range(cbh[cid]):
                for bx in range(cbw[cid]):
                    if restart_interval and unit and unit % restart_interval == 0:
                        br.sync_restart(rstn)
                        rstn = (rstn + 1) & 7
                        pred = {cid: 0}
                    _dc_unit(
                        br, dc_tabs, td, coefs[cid],
                        by * bwd[cid] + bx, pred, cid, Ah, Al,
                    )
                    unit += 1
        return
    # AC scan: exactly one component, non-interleaved (spec G.1.1)
    if len(scan) != 1:
        raise ValueError("jpeg: progressive AC scan must be one component")
    if Se > 63 or Ss > Se:
        raise ValueError("jpeg: bad spectral selection")
    cid, _td, ta = scan[0]
    if ta not in ac_tabs:
        raise ValueError("jpeg: missing Huffman table")
    tab = ac_tabs[ta]
    fn = _ac_first if Ah == 0 else _ac_refine
    eobrun = 0
    rstn = 0
    unit = 0
    for by in range(cbh[cid]):
        for bx in range(cbw[cid]):
            if restart_interval and unit and unit % restart_interval == 0:
                br.sync_restart(rstn)
                rstn = (rstn + 1) & 7
                eobrun = 0
            eobrun = fn(
                br, tab, coefs[cid][by * bwd[cid] + bx], Ss, Se, Al, eobrun
            )
            unit += 1


def _reconstruct(H, W, comps, blocks, bw, qt, mcuy, hmax, vmax):
    """Shared tail: vectorized dequant + de-zigzag + IDCT per
    component, chroma upsample, level shift, YCbCr→RGB."""
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
