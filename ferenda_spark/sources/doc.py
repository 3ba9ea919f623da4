"""Legacy binary Word (.doc) text extraction — dependency-free.

Reference behavior: WordReader shells out to the external `antiword`
binary for .doc files (/root/reference/ferenda/wordreader.py:72-110)
— an external-tool seam this container cannot ship.  This module
retires that seam for the dominant case (Word 97-2003 documents)
using only the two PUBLIC Microsoft specs:

- [MS-CFB]: the OLE compound file binary format — header, FAT
  chains, directory entries, mini-FAT/mini-stream for streams under
  the 4096-byte cutoff;
- [MS-DOC]: the Word binary format — the FIB in the WordDocument
  stream points (fcClx/lcbClx at FIB offset 0x1A2/0x1A6, table
  stream selected by FIB base flag fWhichTblStm) into the Clx in
  the 0Table/1Table stream, whose PlcPcd piece table maps character
  positions to text runs that are either UTF-16LE or "fCompressed"
  CP1252-with-substitutions bytes at fc/2.

Scope (checked, raised as ValueError on violation — the callers'
drop-the-row contract, same as the other codecs):
- text extraction only (no styles/tables/fields rendering; field
  instruction text between 0x13/0x14/0x15 markers is stripped);
- encrypted documents (FibBase.fEncrypted) raise;
- fast-saved piece tables are handled (that is exactly what the
  piece table exists for); embedded objects are ignored.

Per-document byte work — runs inside the same Arrow-batched
mapInPandas stage as docx/pdf (sources/office.py read_office), no
shuffle, nothing driver-side.
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC

#: chain-walk hard cap — a cyclic FAT must become ValueError, not a
#: spin; no real document has a million sectors of directory/FAT
_MAX_CHAIN = 1 << 20


class CfbFile:
    """Minimal [MS-CFB] reader: enough to resolve named streams."""

    def __init__(self, payload: bytes):
        if len(payload) < 512 or not payload.startswith(CFB_MAGIC):
            raise ValueError("not an OLE compound file")
        self.data = payload
        (sect_shift,) = struct.unpack_from("<H", payload, 30)
        (mini_shift,) = struct.unpack_from("<H", payload, 32)
        if sect_shift not in (9, 12) or mini_shift != 6:
            raise ValueError("unsupported CFB sector shape")
        self.ssz = 1 << sect_shift
        self.mssz = 1 << mini_shift
        (self.n_fat,) = struct.unpack_from("<I", payload, 44)
        (self.dir_start,) = struct.unpack_from("<I", payload, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", payload, 56)
        (self.minifat_start,) = struct.unpack_from("<I", payload, 60)
        (self.n_minifat,) = struct.unpack_from("<I", payload, 64)
        (self.difat_start,) = struct.unpack_from("<I", payload, 68)
        (self.n_difat,) = struct.unpack_from("<I", payload, 72)
        self.fat = self._load_fat()
        self.dirents = self._load_dir()
        root = next(
            (d for d in self.dirents if d["type"] == 5), None
        )
        if root is None:
            raise ValueError("CFB has no root entry")
        self.mini_container = self._read_chain(root["start"], root["size"])
        self.minifat = self._load_minifat()

    # -- sectors

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.ssz
        if off + self.ssz > len(self.data):
            raise ValueError("CFB sector out of range")
        return self.data[off : off + self.ssz]

    def _load_fat(self) -> list[int]:
        difat = list(
            struct.unpack_from("<109I", self.data, 76)
        )
        nxt, hops = self.difat_start, 0
        while nxt not in (_ENDOFCHAIN, _FREESECT):
            if hops > _MAX_CHAIN:
                raise ValueError("cyclic DIFAT chain")
            hops += 1
            sec = self._sector(nxt)
            ents = struct.unpack(f"<{self.ssz // 4}I", sec)
            difat.extend(ents[:-1])
            nxt = ents[-1]
        fat: list[int] = []
        for s in difat:
            if s in (_FREESECT, _ENDOFCHAIN):
                continue
            fat.extend(struct.unpack(f"<{self.ssz // 4}I", self._sector(s)))
        return fat

    def _read_chain(self, start: int, size: int) -> bytes:
        out, sec, hops = bytearray(), start, 0
        while sec != _ENDOFCHAIN:
            if sec >= len(self.fat) or hops > _MAX_CHAIN:
                raise ValueError("broken FAT chain")
            hops += 1
            out += self._sector(sec)
            sec = self.fat[sec]
        return bytes(out[:size])

    def _load_minifat(self) -> list[int]:
        if self.minifat_start in (_ENDOFCHAIN, _FREESECT) or not self.n_minifat:
            return []
        raw = self._read_chain(
            self.minifat_start, self.n_minifat * self.ssz
        )
        return list(struct.unpack(f"<{len(raw) // 4}I", raw[: len(raw) // 4 * 4]))

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out, sec, hops = bytearray(), start, 0
        while sec != _ENDOFCHAIN:
            if sec >= len(self.minifat) or hops > _MAX_CHAIN:
                raise ValueError("broken mini-FAT chain")
            hops += 1
            off = sec * self.mssz
            out += self.mini_container[off : off + self.mssz]
            sec = self.minifat[sec]
        return bytes(out[:size])

    # -- directory

    def _load_dir(self) -> list[dict]:
        # directory chains terminate via ENDOFCHAIN; the size cap is
        # nominal (the hop cap in _read_chain bounds the walk)
        raw = self._read_chain(self.dir_start, 1 << 31)
        ents = []
        for off in range(0, len(raw) - 127, 128):
            (name_len,) = struct.unpack_from("<H", raw, off + 64)
            etype = raw[off + 66]
            if etype == 0 or name_len < 2 or name_len > 64:
                continue
            name = raw[off : off + name_len - 2].decode(
                "utf-16-le", errors="replace"
            )
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<Q", raw, off + 120)
            ents.append(
                {"name": name, "type": etype, "start": start, "size": size}
            )
        return ents

    def stream(self, name: str) -> bytes:
        for d in self.dirents:
            if d["name"] == name and d["type"] == 2:
                if d["size"] < self.mini_cutoff:
                    return self._read_mini_chain(d["start"], d["size"])
                return self._read_chain(d["start"], d["size"])
        raise ValueError(f"CFB stream {name!r} not found")


#: C0 controls Word uses as structure marks -> text equivalents:
#: 0x0D paragraph, 0x0B hard line break, 0x07 cell/row mark (tab is
#: the closest flat rendering), 0x1E/0x1F hyphens, field markers
#: 0x13/0x14/0x15 handled separately (instruction text stripped)
_DOC_CTRL = {
    "\r": "\n",
    "\x0b": "\n",
    "\x07": "\t",
    "\x1e": "-",
    "\x1f": "",
    "\x0c": "\n",  # page break
    "\x01": "",  # embedded object marker
    "\x08": "",  # drawn object marker
}


def _clean_text(s: str) -> str:
    out = []
    in_field_instr = False
    for ch in s:
        if ch == "\x13":  # field begin: instruction text follows
            in_field_instr = True
            continue
        if ch == "\x14":  # field separator: result text follows
            in_field_instr = False
            continue
        if ch == "\x15":  # field end
            in_field_instr = False
            continue
        if in_field_instr:
            continue
        out.append(_DOC_CTRL.get(ch, ch))
    return "".join(out)


def extract_doc_text(payload: bytes) -> str:
    """Word 97-2003 .doc bytes -> text via the [MS-DOC] piece table.

    FIB (WordDocument stream): wIdent 0xA5EC; base flags select the
    0Table/1Table stream and flag encryption; fcClx/lcbClx (FIB
    offsets 0x1A2/0x1A6) locate the Clx in the table stream.  The
    Clx's Pcdt holds the PlcPcd: n+1 character positions and n PCDs;
    each PCD's fc has bit 30 = fCompressed (CP1252 bytes at fc/2)
    else UTF-16LE at fc.  Pieces concatenate in CP order — which is
    exactly how fast-saved documents scatter text physically."""
    cfb = CfbFile(payload)
    word = cfb.stream("WordDocument")
    if len(word) < 0x200:
        raise ValueError("WordDocument stream too short for a FIB")
    (w_ident,) = struct.unpack_from("<H", word, 0)
    if w_ident != 0xA5EC:
        raise ValueError(f"not a Word binary FIB (wIdent={w_ident:#x})")
    (flags,) = struct.unpack_from("<H", word, 0x0A)
    if flags & 0x0100:  # fEncrypted
        raise ValueError("encrypted .doc unsupported")
    which_tbl = 1 if flags & 0x0200 else 0  # fWhichTblStm
    table = cfb.stream(f"{which_tbl}Table")
    fc_clx, lcb_clx = struct.unpack_from("<II", word, 0x01A2)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise ValueError("missing or out-of-range Clx")
    clx = table[fc_clx : fc_clx + lcb_clx]
    # skip Prc entries (clxt=0x01: 2-byte grpprl size + data) to the
    # Pcdt (clxt=0x02)
    i = 0
    while i < len(clx) and clx[i] == 0x01:
        if i + 3 > len(clx):
            raise ValueError("truncated Prc in Clx")
        (cb,) = struct.unpack_from("<H", clx, i + 1)
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError("Clx has no Pcdt")
    (lcb_plc,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5 : i + 5 + lcb_plc]
    if len(plc) != lcb_plc or (lcb_plc - 4) % 12 != 0:
        raise ValueError("malformed PlcPcd")
    n = (lcb_plc - 4) // 12
    if n <= 0:
        return ""
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    pieces = []
    for k in range(n):
        pcd_off = 4 * (n + 1) + 8 * k
        (fc_raw,) = struct.unpack_from("<I", plc, pcd_off + 2)
        n_chars = cps[k + 1] - cps[k]
        if n_chars < 0:
            raise ValueError("non-monotonic piece CPs")
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            fc //= 2
            raw = word[fc : fc + n_chars]
            if len(raw) != n_chars:
                raise ValueError("piece text out of range")
            txt = raw.decode("cp1252", errors="replace")
        else:
            raw = word[fc : fc + 2 * n_chars]
            if len(raw) != 2 * n_chars:
                raise ValueError("piece text out of range")
            txt = raw.decode("utf-16-le", errors="replace")
        pieces.append(txt)
    return _clean_text("".join(pieces)).strip()
