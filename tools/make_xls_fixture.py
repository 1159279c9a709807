#!/usr/bin/env python3
"""Generate BIFF8 .xls test fixtures (no external deps).

Writes two fixtures into src/test/resources/:
  sample_biff8.xls       - small workbook stored via the CFB MINI stream
                           (stream < 4096 B): SST with compressed and
                           UTF-16 strings, LABELSST, NUMBER, RK (int,
                           x100, float), MULRK, inline LABEL, BOOLERR
  sample_biff8_large.xls - workbook > 4096 B stored via the regular FAT,
                           with an SST spanning a CONTINUE record that
                           splits one string mid-way (the continuation
                           re-declares its high-byte flag)

Byte layouts follow the public [MS-XLS] and [MS-CFB] specifications.
"""
import struct
import sys
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src" / "test" / "resources"

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


def rec(rtype, data):
    return struct.pack("<HH", rtype, len(data)) + data


def unistr(s, force_wide=False):
    """XLUnicodeRichExtendedString, no rich runs / ext data."""
    wide = force_wide or any(ord(c) > 0xFF for c in s)
    flags = 1 if wide else 0
    payload = s.encode("utf-16-le") if wide else bytes(ord(c) for c in s)
    return struct.pack("<HB", len(s), flags) + payload


def sst_record(strings):
    body = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        body += unistr(s)
    return rec(0x00FC, body)


def sst_with_continue(strings, split_string, split_at):
    """SST whose last string continues into a CONTINUE record, split
    mid-string; the continuation starts with a fresh flags byte."""
    body = struct.pack("<II", len(strings) + 1, len(strings) + 1)
    for s in strings:
        body += unistr(s)
    head, tail = split_string[:split_at], split_string[split_at:]
    body += struct.pack("<HB", len(split_string), 0)
    body += bytes(ord(c) for c in head)
    cont = bytes([0]) + bytes(ord(c) for c in tail)  # re-declared flags
    return rec(0x00FC, body) + rec(0x003C, cont)


def bof(dt):
    return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


EOF_REC = rec(0x000A, b"")


def labelsst(rw, col, isst):
    return rec(0x00FD, struct.pack("<HHHI", rw, col, 0, isst))


def number(rw, col, v):
    return rec(0x0203, struct.pack("<HHHd", rw, col, 0, v))


def rk_int(v):
    return ((v << 2) | 2) & 0xFFFFFFFF


def rk_int100(v_times_100):
    return ((v_times_100 << 2) | 3) & 0xFFFFFFFF


def rk_float(v):
    bits = struct.unpack("<Q", struct.pack("<d", v))[0]
    return (bits >> 32) & 0xFFFFFFFC


def rk(rw, col, rkval):
    return rec(0x027E, struct.pack("<HHHI", rw, col, 0, rkval))


def mulrk(rw, col_first, rkvals):
    body = struct.pack("<HH", rw, col_first)
    for v in rkvals:
        body += struct.pack("<HI", 0, v)
    body += struct.pack("<H", col_first + len(rkvals) - 1)
    return rec(0x00BD, body)


def label_inline(rw, col, s):
    return rec(0x0204, struct.pack("<HHH", rw, col, 0) + unistr(s))


def boolerr(rw, col, val):
    return rec(0x0205, struct.pack("<HHHBB", rw, col, 0, 1 if val else 0, 0))


def workbook_stream(sst_bytes, sheet_records, pad_to=0):
    """globals substream + one sheet substream; BOUNDSHEET patched with
    the sheet BOF offset."""
    boundsheet_name = b"Sheet1"
    bs_body_len = 4 + 2 + 1 + 1 + len(boundsheet_name)
    globals_part = bof(0x0005) + sst_bytes
    sheet_off = len(globals_part) + 4 + bs_body_len + len(EOF_REC)
    boundsheet = rec(
        0x0085,
        struct.pack("<IHBB", sheet_off, 0, len(boundsheet_name), 0)
        + boundsheet_name,
    )
    sheet = bof(0x0010) + b"".join(sheet_records) + EOF_REC
    stream = globals_part + boundsheet + EOF_REC + sheet
    if pad_to and len(stream) < pad_to:
        stream += bytes(pad_to - len(stream))  # zero padding after EOF
    return stream


def dir_entry(name, etype, start, size, child=FREESECT):
    n = name.encode("utf-16-le") + b"\x00\x00"
    e = n + bytes(64 - len(n))
    e += struct.pack("<HBB", len(n), etype, 1)  # name len, type, black
    e += struct.pack("<III", FREESECT, FREESECT, child)  # left,right,child
    e += bytes(16) + bytes(4)  # clsid, state
    e += bytes(16)  # timestamps
    e += struct.pack("<I", start)
    e += struct.pack("<Q", size)
    return e


def cfb_header(num_fat, dir_start, minifat_start, num_minifat, difat0):
    h = struct.pack("<Q", 0xE11AB1A1E011CFD0)
    h += bytes(16)  # clsid
    h += struct.pack("<HH", 0x003E, 0x0003)  # minor, major
    h += struct.pack("<H", 0xFFFE)  # byte order
    h += struct.pack("<HH", 9, 6)  # sector shift 512, mini shift 64
    h += bytes(6)  # reserved
    h += struct.pack("<I", 0)  # num dir sectors (v3: 0)
    h += struct.pack("<I", num_fat)
    h += struct.pack("<I", dir_start)
    h += struct.pack("<I", 0)  # transaction
    h += struct.pack("<I", 4096)  # mini stream cutoff
    h += struct.pack("<I", minifat_start)
    h += struct.pack("<I", num_minifat)
    h += struct.pack("<I", ENDOFCHAIN)  # first DIFAT sector
    h += struct.pack("<I", 0)  # num DIFAT sectors
    difat = [difat0] + [FREESECT] * 108
    h += struct.pack("<109I", *difat)
    assert len(h) == 512
    return h


def pad_sector(b, size=512):
    return b + bytes((-len(b)) % size)


def cfb_with_normal_stream(stream):
    """header | FAT(0) | dir(1) | stream sectors(2..)"""
    n_stream = (len(stream) + 511) // 512
    fat = [FATSECT, ENDOFCHAIN]  # fat itself, dir
    for i in range(n_stream):
        fat.append(2 + i + 1 if i < n_stream - 1 else ENDOFCHAIN)
    fat += [FREESECT] * (128 - len(fat))
    fat_sector = struct.pack("<128I", *fat)
    d = dir_entry("Root Entry", 5, ENDOFCHAIN, 0, child=1)
    d += dir_entry("Workbook", 2, 2, len(stream))
    d += dir_entry("", 0, FREESECT, 0)
    d += dir_entry("", 0, FREESECT, 0)
    return (
        cfb_header(1, 1, ENDOFCHAIN, 0, 0)
        + fat_sector
        + pad_sector(d)
        + pad_sector(stream)
    )


def cfb_with_mini_stream(stream):
    """header | FAT(0) | dir(1) | miniFAT(2) | ministream sectors(3..)"""
    assert len(stream) < 4096
    mini = pad_sector(stream, 64)
    n_mini = len(mini) // 64
    ministream = pad_sector(mini)  # mini stream padded to full sectors
    n_ms_sectors = len(ministream) // 512
    fat = [FATSECT, ENDOFCHAIN, ENDOFCHAIN]  # fat, dir, minifat
    for i in range(n_ms_sectors):
        fat.append(3 + i + 1 if i < n_ms_sectors - 1 else ENDOFCHAIN)
    fat += [FREESECT] * (128 - len(fat))
    fat_sector = struct.pack("<128I", *fat)
    minifat = []
    for i in range(n_mini):
        minifat.append(i + 1 if i < n_mini - 1 else ENDOFCHAIN)
    minifat += [FREESECT] * (128 - len(minifat))
    minifat_sector = struct.pack("<128I", *minifat)
    d = dir_entry("Root Entry", 5, 3, len(ministream), child=1)
    d += dir_entry("Workbook", 2, 0, len(stream))  # start = MINI sector 0
    d += dir_entry("", 0, FREESECT, 0)
    d += dir_entry("", 0, FREESECT, 0)
    return (
        cfb_header(1, 1, 2, 1, 0)
        + fat_sector
        + pad_sector(d)
        + minifat_sector
        + ministream
    )


def small_fixture():
    strings = ["bbl", "address", "units", "423 Fake St", "unitΔwide"]
    sheet = [
        labelsst(0, 0, 0),  # header: bbl
        labelsst(0, 1, 1),  # header: address
        labelsst(0, 2, 2),  # header: units
        number(1, 0, 3012340001.0),
        labelsst(1, 1, 3),
        rk(1, 2, rk_int(42)),
        number(2, 0, 3012340002.0),
        label_inline(2, 1, "9 Inline Ave"),
        rk(2, 2, rk_int100(1250)),  # 12.5
        number(3, 0, 3012340003.0),
        labelsst(3, 1, 4),
        rk(3, 2, rk_float(6.25)),
        mulrk(4, 0, [rk_int(7), rk_int(8), rk_int(9)]),
        boolerr(5, 2, True),
    ]
    stream = workbook_stream(sst_record(strings), sheet)
    assert len(stream) < 4096, len(stream)
    return cfb_with_mini_stream(stream)


def large_fixture():
    strings = ["id", "name"] + [f"row name {i:04d}" for i in range(180)]
    split_string = "SPLIT-" + "x" * 40 + "-END"
    sst = sst_with_continue(strings, split_string, split_at=20)
    sheet = [labelsst(0, 0, 0), labelsst(0, 1, 1)]
    for i in range(180):
        sheet.append(number(i + 1, 0, float(i + 1)))
        sheet.append(labelsst(i + 1, 1, 2 + i))
    sheet.append(number(181, 0, 999.0))
    sheet.append(labelsst(181, 1, 2 + 180))  # the CONTINUE-split string
    stream = workbook_stream(sst, sheet)
    assert len(stream) >= 4096, len(stream)
    return cfb_with_normal_stream(stream)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "sample_biff8.xls").write_bytes(small_fixture())
    (OUT / "sample_biff8_large.xls").write_bytes(large_fixture())
    print(f"wrote fixtures to {OUT}")


if __name__ == "__main__":
    sys.exit(main())
