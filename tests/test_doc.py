"""Legacy binary .doc reader (sources/doc.py): a hand-assembled
[MS-CFB] container holding a hand-assembled [MS-DOC] FIB + piece
table — built by the TEST, independent of the reader, so the
round-trip proves both layers (the reference delegated all of this
to antiword, wordreader.py:72-110)."""

from __future__ import annotations

import struct

import pytest

from ferenda_spark.sources.doc import CFB_MAGIC, CfbFile, extract_doc_text
from ferenda_spark.sources.office import decode_office

_END = 0xFFFFFFFE
_FREE = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD

SSZ = 512


def _direntry(name: str, etype: int, start: int, size: int) -> bytes:
    raw = bytearray(128)
    nm = name.encode("utf-16-le") + b"\x00\x00"
    raw[0 : len(nm)] = nm
    struct.pack_into("<H", raw, 64, len(nm))
    raw[66] = etype
    struct.pack_into("<I", raw, 116, start)
    struct.pack_into("<Q", raw, 120, size)
    return bytes(raw)


def make_cfb(streams: dict[str, bytes]) -> bytes:
    """Single-FAT-sector CFB: sector 0 = FAT, sector 1 = directory,
    then each stream's sectors in order.  Streams are padded to the
    4096-byte mini-cutoff so everything lives in regular sectors."""
    names = list(streams)
    padded = {
        n: b + b"\x00" * max(0, 4096 - len(b)) for n, b in streams.items()
    }
    fat = [_FATSECT, _END]  # FAT itself, directory chain
    starts = {}
    for n in names:
        nsec = -(-len(padded[n]) // SSZ)
        starts[n] = len(fat)
        fat.extend(list(range(len(fat) + 1, len(fat) + nsec)) + [_END])
    assert len(fat) <= SSZ // 4, "fixture outgrew one FAT sector"
    fat_sec = struct.pack(f"<{len(fat)}I", *fat) + b"\xff" * (
        SSZ - 4 * len(fat)
    )
    dirsec = _direntry("Root Entry", 5, _END, 0)
    for n in names:
        # report the PADDED size: streams under the 4096 cutoff would
        # belong in the mini-stream, which this fixture doesn't build
        dirsec += _direntry(n, 2, starts[n], len(padded[n]))
    dirsec += b"\x00" * (SSZ - len(dirsec))
    header = bytearray(512)
    header[0:8] = CFB_MAGIC
    struct.pack_into("<H", header, 26, 0x003E)  # minor
    struct.pack_into("<H", header, 28, 0x0003)  # major (512B sectors)
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini shift
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # dir start
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, _END)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _END)  # no extra DIFAT
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)  # DIFAT[0] -> FAT sector 0
    for k in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * k, _FREE)
    body = fat_sec + dirsec
    for n in names:
        body += padded[n] + b"\x00" * (-len(padded[n]) % SSZ)
    return bytes(header) + body


TEXT_A = "Hello legacy Word.\r"  # compressed cp1252 piece
TEXT_B = "Ünïcödé §1 — end\r"  # UTF-16LE piece


def make_doc(which_tbl: int = 0, encrypted: bool = False) -> bytes:
    word = bytearray(4096)
    struct.pack_into("<H", word, 0, 0xA5EC)  # wIdent
    struct.pack_into("<H", word, 2, 0x00C1)  # nFib (Word 97)
    flags = (0x0200 if which_tbl else 0) | (0x0100 if encrypted else 0)
    struct.pack_into("<H", word, 0x0A, flags)
    # piece texts inside WordDocument
    a_off, b_off = 0x800, 0x900
    word.extend(b"\x00" * (0xA00 - len(word) if len(word) < 0xA00 else 0))
    word = bytearray(word.ljust(0xA00, b"\x00"))
    word[a_off : a_off + len(TEXT_A)] = TEXT_A.encode("cp1252")
    b_bytes = TEXT_B.encode("utf-16-le")
    word[b_off : b_off + len(b_bytes)] = b_bytes
    # piece table in the table stream, with one Prc to skip
    n = 2
    cps = [0, len(TEXT_A), len(TEXT_A) + len(TEXT_B)]
    pcd_a = struct.pack("<HIH", 0, (a_off * 2) | 0x40000000, 0)
    pcd_b = struct.pack("<HIH", 0, b_off, 0)
    plc = struct.pack(f"<{n + 1}I", *cps) + pcd_a + pcd_b
    clx = (
        b"\x01" + struct.pack("<H", 2) + b"\xab\xcd"  # Prc (skipped)
        + b"\x02" + struct.pack("<I", len(plc)) + plc
    )
    table = bytearray(16) + clx  # Clx not at offset 0, on purpose
    fc_clx = 16
    struct.pack_into("<II", word, 0x01A2, fc_clx, len(clx))
    return make_cfb(
        {"WordDocument": bytes(word), f"{which_tbl}Table": bytes(table)}
    )


def test_doc_roundtrip_both_piece_encodings():
    text = extract_doc_text(make_doc())
    assert text == "Hello legacy Word.\nÜnïcödé §1 — end"


def test_doc_table_stream_selector():
    assert "legacy Word" in extract_doc_text(make_doc(which_tbl=1))


def test_doc_through_decode_office():
    ft, text = decode_office(make_doc())
    assert ft == "doc" and "Ünïcödé §1" in text


def test_doc_encrypted_raises():
    with pytest.raises(ValueError, match="encrypted"):
        extract_doc_text(make_doc(encrypted=True))


def test_doc_field_instruction_text_stripped():
    """0x13 <instr> 0x14 <result> 0x15: only the result survives."""
    word = bytearray(4096)
    struct.pack_into("<H", word, 0, 0xA5EC)
    raw = "a\x13HYPERLINK x\x14shown\x15b\r"
    word = bytearray(word.ljust(0xA00, b"\x00"))
    word[0x800 : 0x800 + len(raw)] = raw.encode("cp1252")
    cps = [0, len(raw)]
    plc = struct.pack("<2I", *cps) + struct.pack(
        "<HIH", 0, (0x800 * 2) | 0x40000000, 0
    )
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<II", word, 0x01A2, 0, len(clx))
    doc = make_cfb({"WordDocument": bytes(word), "0Table": clx})
    assert extract_doc_text(doc) == "ashownb"


def test_cfb_cycle_is_valueerror():
    """A FAT chain that loops must fail fast, not spin."""
    doc = bytearray(make_doc())
    # point the WordDocument chain's first sector back at itself:
    # FAT sector is at byte 512; entry k at 512+4k.  Find the
    # directory's WordDocument start sector and self-loop it.
    cfb = CfbFile(bytes(doc))
    start = next(
        d["start"] for d in cfb.dirents if d["name"] == "WordDocument"
    )
    struct.pack_into("<I", doc, 512 + 4 * start, start)
    with pytest.raises(ValueError):
        extract_doc_text(bytes(doc))


def test_doc_malformed_clx_is_valueerror():
    word = bytearray(4096)
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<II", word, 0x01A2, 0, 7)  # lcb > table junk
    doc = make_cfb({"WordDocument": bytes(word), "0Table": b"\x07" * 7})
    with pytest.raises(ValueError):
        extract_doc_text(doc)
