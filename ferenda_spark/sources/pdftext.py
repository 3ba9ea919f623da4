"""Positional PDF text extraction: reading order + ToUnicode CMaps.

Reference behavior being restated (NOT ported): ferenda's PDFReader
builds a page/textbox model with coordinates from `pdftohtml -xml`
(/root/reference/ferenda/pdfreader.py ~1661 LoC textbox model) and
pdfanalyze.py (1-773) derives margins/columns from coordinate
histograms so multi-column layouts read in column order.  Here the
same two capabilities are built directly on the PDF content stream,
dependency-free:

- a tiny text-operator machine tracks the text/line matrices
  (BT Tm Td TD T* TL Tf ' " Tj TJ), so every shown string gets a
  device-space (x, y) anchor and an estimated width;
- per-font ToUnicode CMaps (bfchar/bfrange, 1- and 2-byte
  codespaces) decode hex and literal strings to Unicode — without
  one, bytes decode latin-1 (the old behavior, right for most
  Western machine-generated PDFs);
- reading order = column detection (widest x-coverage gutter, the
  pdfanalyze histogram idea) then top-to-bottom lines per column,
  left-to-right runs per line.

Scale note: everything here is per-document byte work inside an
Arrow-batched mapInPandas stage (sources/office.py read_office) —
no shuffle, no driver involvement; the layout model never leaves
the executor.

The CTM (`cm`, q/Q) is threaded through the text machine, so
rotated/scaled text gets DEVICE-space anchors and a quantized
baseline direction; order_runs maps the page-dominant rotation back
into reading space before ordering.  Image-only (scanned) PDFs are
detected and routed through a pluggable OCR seam
(extract_pdf_text_ocr — default raises, like the multimodal
decode_fn contract; reference: pdfreader.py:213-330).

Honest seams kept: glyph widths estimated as 0.5 em (real width
arrays add little for ordering), OCR itself needs a deployment-
supplied engine.
"""

from __future__ import annotations

import math
import re
import zlib
from dataclasses import dataclass

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_STREAM_IN_OBJ_RE = re.compile(
    rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", re.DOTALL
)
_FONTMAP_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONTREF_RE = re.compile(rb"/([A-Za-z0-9.+_-]+)\s+(\d+)\s+\d+\s+R")
_TOUNI_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)"
)

# content-stream token scanner: strings, hex strings, names, numbers,
# array/dict delimiters, operators
_CS_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"
    rb"|<<|>>"
    rb"|<[0-9A-Fa-f\s]*>"
    rb"|\[|\]"
    rb"|/[^\s/<>\[\]()]*"
    rb"|[-+]?(?:\d+\.?\d*|\.\d+)"
    rb"|[A-Za-z'\"*][A-Za-z0-9'\"*]*"
)

_CSR_RE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
    re.DOTALL,
)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_HEX_OR_ARR_RE = re.compile(rb"<([0-9A-Fa-f]+)>|\[((?:<[0-9A-Fa-f]+>|\s)*)\]")


def _u16(hexs: bytes) -> str:
    """CMap destination hex -> text (UTF-16BE, surrogate-aware)."""
    raw = bytes.fromhex(hexs.decode("ascii"))
    if len(raw) % 2:
        raw += b"\x00"
    return raw.decode("utf-16-be", errors="replace")


@dataclass
class CMap:
    width: int  # code width in bytes (1 or 2)
    table: dict  # code int -> str

    def decode(self, raw: bytes) -> str:
        w, out = self.width, []
        for i in range(0, len(raw) - w + 1, w):
            code = int.from_bytes(raw[i : i + w], "big")
            out.append(self.table.get(code, "�"))
        return "".join(out)


def parse_tounicode(stream: bytes) -> CMap:
    """bfchar + bfrange (scalar and array destination forms);
    codespace range fixes the code byte-width (2 for CID/UTF-16
    fonts, 1 for simple fonts)."""
    m = _CSR_RE.search(stream)
    width = len(m.group(2)) // 2 if m else 2
    width = 2 if width >= 2 else 1
    table: dict[int, str] = {}
    for blk in _BFCHAR_RE.finditer(stream):
        hexes = _HEX_RE.findall(blk.group(1))
        for src, dst in zip(hexes[0::2], hexes[1::2]):
            table[int(src, 16)] = _u16(dst)
    for blk in _BFRANGE_RE.finditer(stream):
        toks = _HEX_OR_ARR_RE.findall(blk.group(1))
        i = 0
        while i + 3 <= len(toks):
            lo_h, _ = toks[i]
            hi_h, _ = toks[i + 1]
            dst_h, dst_arr = toks[i + 2]
            if not lo_h or not hi_h:
                break  # malformed triple: stop, keep what parsed
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            if dst_arr:
                dsts = _HEX_RE.findall(dst_arr)
                for k, code in enumerate(range(lo, hi + 1)):
                    if k < len(dsts):
                        table[code] = _u16(dsts[k])
            elif dst_h:
                # scalar form increments the LAST code point
                prefix = _u16(dst_h)
                for k, code in enumerate(range(lo, hi + 1)):
                    table[code] = prefix[:-1] + chr(
                        (ord(prefix[-1]) + k) & 0x10FFFF
                    )
            i += 3
    return CMap(width, table)


def _inflate(sdict: bytes, body: bytes) -> bytes | None:
    if b"FlateDecode" in sdict:
        try:
            return zlib.decompress(body)
        except zlib.error:
            return None
    if b"Filter" in sdict:
        return None  # unsupported filter (DCT, LZW, ...)
    return body


def document_fonts(payload: bytes) -> dict[str, CMap]:
    """Resource-name -> ToUnicode CMap for every font in the file.

    The map is document-global (resource names are page-scoped in
    the spec; a file reusing /F1 for different fonts on different
    pages keeps the LAST one — an accepted approximation, noted in
    the module doc) — resolving per-page /Resources adds an object
    walk for a case machine-generated corpora essentially never
    hit."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(payload):
        objs[int(m.group(1))] = m.group(2)
    # font obj num -> cmap
    by_obj: dict[int, CMap | None] = {}

    def cmap_for(font_obj: int) -> CMap | None:
        if font_obj in by_obj:
            return by_obj[font_obj]
        out = None
        body = objs.get(font_obj, b"")
        tu = _TOUNI_RE.search(body)
        if tu:
            tbody = objs.get(int(tu.group(1)), b"")
            sm = _STREAM_IN_OBJ_RE.search(tbody)
            if sm:
                data = _inflate(sm.group(1), sm.group(2))
                if data is not None:
                    out = parse_tounicode(data)
        by_obj[font_obj] = out
        return out

    fonts: dict[str, CMap] = {}
    for body in objs.values():
        for fm in _FONTMAP_RE.finditer(body):
            for name, num in _FONTREF_RE.findall(fm.group(1)):
                cm = cmap_for(int(num))
                if cm is not None:
                    fonts[name.decode("latin-1")] = cm
    return fonts


def page_width(payload: bytes) -> float:
    m = _MEDIABOX_RE.search(payload)
    if not m:
        return 612.0  # US Letter default
    try:
        return float(m.group(3)) - float(m.group(1))
    except ValueError:
        return 612.0


def page_height(payload: bytes) -> float:
    m = _MEDIABOX_RE.search(payload)
    if not m:
        return 792.0
    try:
        return float(m.group(4)) - float(m.group(2))
    except ValueError:
        return 792.0


# ------------------------------------------------- margin analysis

#: char-share thresholds for the header/footer zones — the
#: reference's defaults (pdfanalyze.py:38,47: at most 0.2% of the
#: document's characters may sit in each zone)
HEADER_THRESHOLD = 0.002
FOOTER_THRESHOLD = 0.002


def margin_metrics(
    pages: list[list["Run"]], page_w: float, page_h: float
) -> dict:
    """pdfanalyze.metrics() analog over the positional runs:
    char-count-weighted coordinate histograms -> probable header /
    footer zones (cumulate from each vertical extreme until the
    char share passes the significance threshold —
    analyze_vertical_margins, pdfanalyze.py:400-424) and the
    most-common left/right text edges (analyze_horizontal_margins,
    :427-446).  Coordinates top-down like the reference's; PDF y is
    flipped via the page height."""
    from collections import Counter

    top: Counter = Counter()
    left: Counter = Counter()
    right: Counter = Counter()
    total = 0
    for runs in pages:
        for r in runs:
            n = len(r.text.strip())
            if not n:
                continue
            total += n
            # clamp slightly out-of-MediaBox coordinates into the
            # scannable range so they participate in zone detection
            # (and survive strip_marginalia) instead of inflating
            # thresholds from unreachable bins
            top[min(max(int(page_h - r.y), 0), int(page_h))] += n
            left[int(r.x)] += n
            right[int(_est_end(r))] += n
    out = {"pagewidth": page_w, "pageheight": page_h,
           "topmargin": 0, "bottommargin": int(page_h)}
    if not total:
        return out
    acc, thr = 0, HEADER_THRESHOLD * total
    for i in range(int(page_h) + 1):
        acc += top.get(i, 0)
        if acc > thr:
            out["topmargin"] = i - 1
            break
    acc, thr = 0, FOOTER_THRESHOLD * total
    for i in range(int(page_h), -1, -1):
        acc += top.get(i, 0)
        if acc > thr:
            out["bottommargin"] = i + 1
            break
    mid = page_w / 2
    lc = Counter({k: v for k, v in left.items() if k < mid})
    rc = Counter({k: v for k, v in right.items() if k > mid})
    if lc:
        out["leftmargin"] = lc.most_common(1)[0][0]
    if rc:
        out["rightmargin"] = rc.most_common(1)[0][0]
    return out


def strip_marginalia(
    pages: list[list["Run"]], metrics: dict
) -> list[list["Run"]]:
    """Drop runs inside the detected header/footer zones (repeating
    running heads and page numbers) — the consumption side of the
    reference's topmargin/bottommargin metrics (its pdfreader drops
    textboxes outside the body zone when metrics are supplied)."""
    ph = metrics["pageheight"]
    t, b = metrics["topmargin"], metrics["bottommargin"]
    # clamp like margin_metrics so slightly out-of-MediaBox runs are
    # judged against the real zones instead of being dropped
    return [
        [r for r in runs if t <= min(max(ph - r.y, 0), int(ph)) <= b]
        for runs in pages
    ]


# --------------------------------------------------- operator machine

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def pdf_unescape(s: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i : i + 1]
        if c == b"\\" and i + 1 < len(s):
            nxt = s[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":
                j = i + 1
                while j < min(i + 4, len(s)) and s[j : j + 1] in b"01234567":
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out += c
        i += 1
    return bytes(out)


@dataclass
class Run:
    x: float
    y: float
    size: float
    text: str
    seq: int  # emission order, the tie-break
    #: baseline direction quantized to quarter turns (0=normal,
    #: 1=rotated 90° CCW, 2=upside down, 3=90° CW) — from the
    #: combined Tm·CTM, so both text-matrix and `cm` rotations land
    #: here; order_runs uses the page-dominant value to map anchors
    #: into reading space
    rot: int = 0


#: average glyph advance as a fraction of the font size — the
#: half-em estimate; real width arrays change ordering decisions
#: essentially never (they matter for exact justification, not for
#: which column/line a run belongs to)
_EM = 0.5


def interpret_text_ops(
    body: bytes, fonts: dict[str, CMap]
) -> tuple[list[Run], bool]:
    """Run the text-positioning subset of the content-stream machine;
    return (runs, positioned) where positioned says whether any
    explicit positioning operator appeared (if none did, the stream
    is pure flow and callers should keep emission order)."""
    runs: list[Run] = []
    stack: list = []  # operand stack; arrays collected inline
    arr: list | None = None
    # text state
    a, b, c, d, e, f = 1.0, 0.0, 0.0, 1.0, 0.0, 0.0  # Tm
    la, lb, lc, ld, le, lf = 1.0, 0.0, 0.0, 1.0, 0.0, 0.0  # Tlm
    # graphics state: the current transformation matrix (`cm`
    # premultiplies; q/Q save/restore) — anchors are emitted in
    # DEVICE space, Tm·CTM, so rotated/scaled text (pdftohtml hands
    # the reference transformed coordinates the same way,
    # pdfreader.py) keeps meaningful layout positions
    ca, cb, cc, cd, ce, cf = 1.0, 0.0, 0.0, 1.0, 0.0, 0.0  # CTM
    gs_stack: list[tuple] = []
    size, leading = 12.0, 0.0
    cmap: CMap | None = None
    positioned = False
    seq = 0

    def decode(tok: bytes) -> str:
        if tok.startswith(b"("):
            raw = pdf_unescape(tok[1:-1])
        else:  # hex string
            h = re.sub(rb"\s", b"", tok[1:-1])
            if len(h) % 2:
                h += b"0"
            raw = bytes.fromhex(h.decode("ascii"))
        if cmap is not None:
            return cmap.decode(raw)
        return raw.decode("latin-1")

    def emit(text: str):
        nonlocal e, f, seq
        if text:
            # device-space anchor + effective size + quantized
            # baseline direction from the combined Tm·CTM
            x_dev = e * ca + f * cc + ce
            y_dev = e * cb + f * cd + cf
            bx = a * ca + b * cc  # baseline direction (unit text x)
            by = a * cb + b * cd
            vx = c * ca + d * cc  # glyph-up direction (unit text y)
            vy = c * cb + d * cd
            size_dev = size * math.hypot(vx, vy) or size
            rot = round(math.atan2(by, bx) / (math.pi / 2)) % 4 if (
                bx or by
            ) else 0
            runs.append(Run(x_dev, y_dev, size_dev, text, seq, rot))
            seq += 1
        # advance along the baseline: a text-space displacement w
        # updates the text matrix translation through (a, b)
        w = _EM * size * len(text)
        e += w * a
        f += w * b

    def tstar():
        nonlocal a, b, c, d, e, f, la, lb, lc, ld, le, lf
        tx, ty = 0.0, -leading
        le, lf = tx * la + ty * lc + le, tx * lb + ty * ld + lf
        a, b, c, d, e, f = la, lb, lc, ld, le, lf

    for m in _CS_TOKEN_RE.finditer(body):
        tok = m.group(0)
        k = tok[0:1]
        if k == b"(" or (k == b"<" and tok != b"<<"):
            (arr if arr is not None else stack).append(tok)
        elif tok == b"[":
            arr = []
        elif tok == b"]":
            stack.append(arr if arr is not None else [])
            arr = None
        elif k == b"/":
            (arr if arr is not None else stack).append(tok)
        elif k in b"+-.0123456789":
            try:
                v = float(tok)
            except ValueError:
                continue
            (arr if arr is not None else stack).append(v)
        elif tok == b"<<" or tok == b">>":
            continue
        else:  # operator
            op = tok
            try:
                if op == b"BT":
                    a, b, c, d, e, f = 1.0, 0.0, 0.0, 1.0, 0.0, 0.0
                    la, lb, lc, ld, le, lf = a, b, c, d, e, f
                elif op == b"Tf" and len(stack) >= 2:
                    size = float(stack[-1])
                    name = stack[-2]
                    if isinstance(name, bytes) and name.startswith(b"/"):
                        cmap = fonts.get(name[1:].decode("latin-1"))
                elif op == b"TL" and stack:
                    leading = float(stack[-1])
                elif op == b"Td" and len(stack) >= 2:
                    positioned = True
                    tx, ty = float(stack[-2]), float(stack[-1])
                    le, lf = tx * la + ty * lc + le, tx * lb + ty * ld + lf
                    a, b, c, d, e, f = la, lb, lc, ld, le, lf
                elif op == b"TD" and len(stack) >= 2:
                    positioned = True
                    leading = -float(stack[-1])
                    tx, ty = float(stack[-2]), float(stack[-1])
                    le, lf = tx * la + ty * lc + le, tx * lb + ty * ld + lf
                    a, b, c, d, e, f = la, lb, lc, ld, le, lf
                elif op == b"Tm" and len(stack) >= 6:
                    positioned = True
                    a, b, c, d, e, f = (float(v) for v in stack[-6:])
                    la, lb, lc, ld, le, lf = a, b, c, d, e, f
                elif op == b"cm" and len(stack) >= 6:
                    m0, m1, m2, m3, m4, m5 = (
                        float(v) for v in stack[-6:]
                    )
                    ca, cb, cc, cd, ce, cf = (
                        m0 * ca + m1 * cc,
                        m0 * cb + m1 * cd,
                        m2 * ca + m3 * cc,
                        m2 * cb + m3 * cd,
                        m4 * ca + m5 * cc + ce,
                        m4 * cb + m5 * cd + cf,
                    )
                elif op == b"q":
                    gs_stack.append((ca, cb, cc, cd, ce, cf))
                elif op == b"Q":
                    if gs_stack:
                        ca, cb, cc, cd, ce, cf = gs_stack.pop()
                elif op == b"T*":
                    positioned = positioned or leading != 0.0
                    tstar()
                elif op == b"Tj" and stack:
                    s = stack[-1]
                    if isinstance(s, bytes):
                        emit(decode(s))
                elif op == b"'" and stack:
                    tstar()
                    s = stack[-1]
                    if isinstance(s, bytes):
                        emit(decode(s))
                elif op == b'"' and stack:
                    tstar()
                    s = stack[-1]
                    if isinstance(s, bytes):
                        emit(decode(s))
                elif op == b"TJ" and stack:
                    parts = stack[-1]
                    if isinstance(parts, list):
                        for el in parts:
                            if isinstance(el, bytes) and el[0:1] in (
                                b"(",
                                b"<",
                            ):
                                emit(decode(el))
                            elif isinstance(el, (int, float)):
                                e -= el / 1000.0 * size * a
                                f -= el / 1000.0 * size * b
            except (ValueError, TypeError):
                pass  # malformed operands: skip the op, keep scanning
            stack.clear()
    return runs, positioned


# ------------------------------------------------------ reading order


def _est_end(r: Run) -> float:
    return r.x + _EM * r.size * len(r.text)


def find_gutter(runs: list[Run], page_w: float) -> float | None:
    """Column gutter via x-coverage (the pdfanalyze histogram idea):
    merge the runs' estimated x-spans, then the widest uncovered
    interval strictly inside the text block is the gutter iff it is
    wide enough (≥6% of the page) and both sides hold a meaningful
    share of the runs (≥20%) with vertically overlapping extents —
    otherwise the page is single-column."""
    if len(runs) < 8:
        return None
    spans = sorted((r.x, _est_end(r)) for r in runs)
    merged = [list(spans[0])]
    for lo, hi in spans[1:]:
        if lo <= merged[-1][1] + 1.0:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    if len(merged) < 2:
        return None
    gaps = [
        (merged[i + 1][0] - merged[i][1], (merged[i][1] + merged[i + 1][0]) / 2)
        for i in range(len(merged) - 1)
    ]
    width, mid = max(gaps)
    if width < 0.06 * page_w:
        return None
    left = [r for r in runs if r.x < mid]
    right = [r for r in runs if r.x >= mid]
    if min(len(left), len(right)) < 0.2 * len(runs):
        return None
    ly0, ly1 = min(r.y for r in left), max(r.y for r in left)
    ry0, ry1 = min(r.y for r in right), max(r.y for r in right)
    overlap = min(ly1, ry1) - max(ly0, ry0)
    span = max(ly1, ry1) - min(ly0, ry0)
    if span > 0 and overlap / span < 0.5:
        return None  # vertically stacked blocks, not columns
    return mid


def _lines(col: list[Run]) -> list[list[Run]]:
    """Cluster runs into baselines top-to-bottom: sort by descending
    y (stable on emission order), start a new line when the run's y
    falls more than ~0.4 em below the current baseline."""
    col = sorted(col, key=lambda r: (-r.y, r.seq))
    out: list[list[Run]] = []
    for r in col:
        if out and abs(out[-1][0].y - r.y) <= max(2.0, 0.4 * out[-1][0].size):
            out[-1].append(r)
        else:
            out.append([r])
    return out


def _join_line(line: list[Run]) -> str:
    line = sorted(line, key=lambda r: (r.x, r.seq))
    parts, prev_end = [], None
    for r in line:
        if prev_end is not None and r.x - prev_end > 0.3 * r.size:
            parts.append(" ")
        parts.append(r.text)
        prev_end = _est_end(r)
    return "".join(parts)


def _dominant_rot(runs: list[Run]) -> int:
    """Page-dominant baseline direction, weighted by glyph count."""
    from collections import Counter

    wt: Counter = Counter()
    for r in runs:
        wt[r.rot] += len(r.text)
    return wt.most_common(1)[0][0] if wt else 0


def _to_reading(runs: list[Run], rot: int) -> list[Run]:
    """Rotate device anchors by -rot·90° so the dominant baseline
    points +x and lines stack down -y — after which the standard
    ordering (y desc, x asc) IS reading order for rotated pages."""
    if rot == 0:
        return runs
    out = []
    for r in runs:
        if rot == 1:
            x, y = r.y, -r.x
        elif rot == 2:
            x, y = -r.x, -r.y
        else:
            x, y = -r.y, r.x
        out.append(Run(x, y, r.size, r.text, r.seq, 0))
    return out


def order_runs(runs: list[Run], page_w: float) -> str:
    rot = _dominant_rot(runs)
    runs = _to_reading(runs, rot)
    if rot in (1, 3) and runs:
        # rotated a quarter turn: the reading x axis is the device y
        # axis, so the gutter-width threshold must use the text
        # block's actual reading-space extent, not the device width
        page_w = max(_est_end(r) for r in runs) - min(r.x for r in runs)
    gutter = find_gutter(runs, page_w)
    cols = (
        [[r for r in runs if r.x < gutter], [r for r in runs if r.x >= gutter]]
        if gutter is not None
        else [runs]
    )
    out = []
    for col in cols:
        out.extend(_join_line(ln) for ln in _lines(col) if ln)
    return "\n".join(s for s in out if s.strip())


# ------------------------------------------------------------ facade


def extract_pdf_text_positional(
    payload: bytes, strip_margins: bool = False
) -> str | None:
    """Full positional extraction; None when nothing positional was
    found (caller falls back to the flat extractor).  Each content
    stream is one layout unit (≈ page for the dominant
    one-content-stream-per-page class).  With ``strip_margins``,
    document-level margin metrics (margin_metrics — the pdfanalyze
    header/footer analysis) are computed first and runs inside the
    header/footer zones (running heads, page numbers) are dropped
    before ordering."""
    fonts = document_fonts(payload)
    pw = page_width(payload)
    page_runs: list[tuple[list[Run], bool]] = []
    any_positioned = False
    for m in _STREAM_IN_OBJ_RE.finditer(payload):
        body = _inflate(m.group(1), m.group(2))
        if body is None:
            continue
        runs, positioned = interpret_text_ops(body, fonts)
        if not runs:
            continue
        any_positioned = any_positioned or positioned
        page_runs.append((runs, positioned))
    if strip_margins and any_positioned and len(page_runs) > 1:
        ph = page_height(payload)
        metrics = margin_metrics([rs for rs, _ in page_runs], pw, ph)
        stripped = strip_marginalia([rs for rs, _ in page_runs], metrics)
        page_runs = [
            (new, pos) for new, (_, pos) in zip(stripped, page_runs) if new
        ]
    pages = []
    for runs, positioned in page_runs:
        if positioned:
            pages.append(order_runs(runs, pw))
        else:
            # pure-flow stream: emission order, one line per run
            pages.append("\n".join(r.text for r in runs if r.text.strip()))
    if not pages or not any_positioned:
        return None if not pages else "\n".join(pages)
    return "\n".join(pages)


# ------------------------------------------------------------ OCR seam

#: image filters worth handing to an OCR engine, mapped to the media
#: type the payload bytes carry after stream extraction
_IMAGE_FILTERS = {
    b"DCTDecode": "image/jpeg",
    b"JPXDecode": "image/jp2",
    b"CCITTFaxDecode": "image/ccitt",
    b"FlateDecode": "image/raw",
}


def pdf_image_xobjects(payload: bytes) -> list[tuple[str, bytes]]:
    """(media_type, raw stream bytes) for every /Subtype /Image
    XObject in the file — the scanned-page payloads an OCR engine
    consumes.  Flate-wrapped raw bitmaps are inflated; compressed
    formats (DCT/JPX/CCITT) pass through byte-identical."""
    out: list[tuple[str, bytes]] = []
    for m in _STREAM_IN_OBJ_RE.finditer(payload):
        sdict, body = m.group(1), m.group(2)
        if b"/Image" not in sdict or b"/Subtype" not in sdict:
            continue
        mt = "image/raw"
        for flt, typ in _IMAGE_FILTERS.items():
            if flt in sdict:
                mt = typ
                break
        if mt == "image/raw" and b"FlateDecode" in sdict:
            inflated = _inflate(sdict, body)
            if inflated is None:
                continue
            body = inflated
        out.append((mt, body))
    return out


def is_image_only_pdf(payload: bytes, images=None) -> bool:
    """True when the file has at least one image XObject and NO
    text-showing operators in any parseable content stream — the
    scanned-document signature (reference capability: ferenda's
    pdfreader falls back to OCR exactly here, pdfreader.py:213-330
    convert_to_hocr).  A caller that already extracted the image
    list passes it in to skip the duplicate stream scan."""
    if not (pdf_image_xobjects(payload) if images is None else images):
        return False
    fonts = document_fonts(payload)
    for m in _STREAM_IN_OBJ_RE.finditer(payload):
        sdict = m.group(1)
        if b"/Image" in sdict and b"/Subtype" in sdict:
            continue
        body = _inflate(sdict, m.group(2))
        if body is None:
            continue
        runs, _pos = interpret_text_ops(body, fonts)
        if any(r.text.strip() for r in runs):
            return False
    return True


def _default_ocr(image_bytes: bytes, media_type: str) -> str:
    raise NotImplementedError(
        "image-only PDF: no OCR engine in this container — supply "
        "ocr_fn(image_bytes, media_type) -> str built on a real OCR "
        "stack (tesseract etc.) at deployment; the detection, stream "
        "extraction and Spark plumbing around this seam are real and "
        "tested (mirror of the multimodal decode_fn contract; "
        "reference capability: pdfreader.py:213-330 convert_to_hocr)"
    )


def extract_pdf_text_ocr(payload: bytes, ocr_fn=None) -> str | None:
    """Text for an image-only PDF via the pluggable OCR seam; None
    when the file is NOT image-only (callers use the normal text
    extractor).  The default ocr_fn raises NotImplementedError — the
    same contract as multimodal.decode_videos' ffmpeg seam."""
    images = pdf_image_xobjects(payload)
    if not is_image_only_pdf(payload, images=images):
        return None
    fn = ocr_fn or _default_ocr
    texts = [fn(body, mt) for mt, body in images]
    return "\n".join(t for t in texts if t and t.strip())


def ocr_pdf_pages(pdfs, ocr_fn, url_col: str = "url",
                  payload_col: str = "payload"):
    """Distributed OCR stage: (url, payload:binary) of scanned PDFs
    → pages-schema rows, text from the supplied OCR fn (an
    Arrow-batched mapInPandas, per-row byte work, no shuffle — the
    same plumbing shape as office.read_office).  Rows that are not
    image-only PDFs, or whose OCR fn fails, are dropped like any
    other corrupt payload in the codec family."""
    import pandas as pd

    from ferenda_spark.sources.pages import PAGES_SCHEMA

    src = pdfs.selectExpr(f"{url_col} as url", f"{payload_col} as payload")

    def run(batches):
        for pdf in batches:
            rows = []
            for url, p in zip(pdf["url"], pdf["payload"]):
                if p is None:
                    continue
                try:
                    text = extract_pdf_text_ocr(bytes(p), ocr_fn)
                except (ValueError, NotImplementedError):
                    continue
                if text:
                    rows.append((url, None, None, text, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGES_SCHEMA.fields]
            )

    return src.mapInPandas(run, PAGES_SCHEMA)
