"""Minimal pure-Python XLS (OLE2 + BIFF8) reader — the P4 parser.

The reference's AMEX handler parses legacy ``.xls`` workbooks with the Go
``extrame/xls`` library (``/root/reference/contrib/handlers/amex.go:36-69``:
open workbook → first sheet → iterate rows → every cell as a string). No
Excel library ships in this container, so the engine implements the two
public, fully documented formats directly ([MS-CFB] compound file binary +
[MS-XLS] BIFF8):

- :func:`read_xls_rows` — bytes → ``list[list[str]]`` for the FIRST sheet,
  every cell stringified the way the Go library does (text cells verbatim;
  numeric cells via shortest round-trip formatting; blanks as ``""``).
  Supported records: SST (with CONTINUE splits), LABELSST, LABEL, NUMBER,
  RK, MULRK, BLANK/MULBLANK. Formula results and rich-text runs are out of
  scope (documented bound — the reference's statement files contain only
  text/number cells).
- :func:`write_xls` — ``list[list[str]]`` → a valid single-sheet BIFF8
  workbook in an OLE2 container. Exists so tests can fabricate
  deterministic fixtures (the reference's golden binary is not copied).
- :func:`read_xls_files` — the Spark integration: ``binaryFile`` scan →
  ``mapInPandas`` parse per file. The workbook payload is parsed inside
  the executor that read it and never shuffles; at 100 TB the unit of
  parallelism is the file, exactly like the engine's whole-file CSV path
  (``sources/csvlike.py``).
"""

from __future__ import annotations

import re
import struct
from collections.abc import Iterator

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


# --------------------------------------------------------------- OLE2 read
def _fat_chain(data: bytes, fat: list[int], start: int, ssz: int, base: int) -> bytes:
    out = []
    s = start
    seen = 0
    while s != ENDOFCHAIN and s != FREESECT:
        off = base + s * ssz
        out.append(data[off : off + ssz])
        s = fat[s]
        seen += 1
        if seen > len(fat) + 1:
            raise ValueError("corrupt OLE2: FAT chain cycle")
    return b"".join(out)


def _ole2_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name is in ``names``."""
    if data[:8] != _MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    # FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    fat_sectors = [
        s
        for (s,) in struct.iter_unpack("<I", data[76:512])
        if s not in (FREESECT, ENDOFCHAIN)
    ][:n_fat]
    s = difat_start
    for _ in range(n_difat):
        off = 512 + s * ssz
        entries = list(struct.unpack_from(f"<{ssz // 4}I", data, off))
        fat_sectors += [e for e in entries[:-1] if e not in (FREESECT, ENDOFCHAIN)]
        s = entries[-1]
    fat: list[int] = []
    for fs in fat_sectors[:n_fat]:
        off = 512 + fs * ssz
        fat += list(struct.unpack_from(f"<{ssz // 4}I", data, off))

    directory = _fat_chain(data, fat, dir_start, ssz, 512)
    root_start = root_size = None
    target = None
    for i in range(0, len(directory), 128):
        e = directory[i : i + 128]
        if len(e) < 128:
            break
        name_len = struct.unpack_from("<H", e, 64)[0]
        name = e[: max(0, name_len - 2)].decode("utf-16-le", "replace")
        etype = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<I", e, 120)[0]
        if etype == 5:  # root: holds the mini-stream
            root_start, root_size = start, size
        elif etype == 2 and name in names and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"no {names} stream in workbook")
    start, size = target
    if size >= mini_cutoff:
        return _fat_chain(data, fat, start, ssz, 512)[:size]
    # small stream: lives in the mini-stream, chained via the mini-FAT
    mini_container = _fat_chain(data, fat, root_start, ssz, 512)[:root_size]
    minifat: list[int] = []
    s = minifat_start
    while s not in (ENDOFCHAIN, FREESECT):
        off = 512 + s * ssz
        minifat += list(struct.unpack_from(f"<{ssz // 4}I", data, off))
        s = fat[s]
    out, s = [], start
    while s not in (ENDOFCHAIN, FREESECT):
        out.append(mini_container[s * mssz : (s + 1) * mssz])
        s = minifat[s]
    return b"".join(out)[:size]


# --------------------------------------------------------------- BIFF read
def _records(stream: bytes, start: int = 0) -> Iterator[tuple[int, bytes, int]]:
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        typ, ln = struct.unpack_from("<HH", stream, pos)
        yield typ, stream[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


def _read_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """Parse the shared-string table, honoring CONTINUE splits (each
    continuation fragment restarts with its own compression flag byte)."""
    frags = [payload] + continues
    fi, pos = 0, 8  # skip cstTotal/cstUnique
    out: list[str] = []

    def _take(n: int) -> bytes:
        nonlocal fi, pos
        buf = b""
        while n > 0:
            avail = len(frags[fi]) - pos
            if avail <= 0:
                fi += 1
                pos = 0
                continue
            got = min(avail, n)
            buf += frags[fi][pos : pos + got]
            pos += got
            n -= got
        return buf

    def _at_boundary() -> bool:
        return pos >= len(frags[fi]) and fi + 1 < len(frags)

    n_unique = struct.unpack_from("<I", payload, 4)[0]
    for _ in range(n_unique):
        if _at_boundary():
            fi += 1
            pos = 0
        cch = struct.unpack("<H", _take(2))[0]
        flags = _take(1)[0]
        n_runs = struct.unpack("<H", _take(2))[0] if flags & 0x08 else 0
        ext = struct.unpack("<I", _take(4))[0] if flags & 0x04 else 0
        chars = ""
        remaining = cch
        wide = bool(flags & 0x01)
        while remaining:
            if _at_boundary():
                # string body split across CONTINUE: fresh flag byte
                fi += 1
                pos = 0
                wide = bool(_take(1)[0] & 0x01)
            room = len(frags[fi]) - pos
            per = 2 if wide else 1
            take_n = min(remaining, max(1, room // per)) if room else remaining
            raw = _take(take_n * per)
            chars += raw.decode("utf-16-le" if wide else "latin-1", "replace")
            remaining -= take_n
        _take(n_runs * 4 + ext)
        out.append(chars)
    return out


def _fmt_num(v: float) -> str:
    """Numeric cell → string the way Go's FormatFloat(v,'f',-1,64) does:
    integral values without a trailing .0, else shortest round-trip."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _decode_rk(rk: int) -> float:
    cents = rk & 0x01
    if rk & 0x02:  # 30-bit signed integer
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
        val = float(v)
    else:  # IEEE double, low 34 bits zeroed
        val = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    return val / 100.0 if cents else val


def read_xls_rows(data: bytes) -> list[list[str]]:
    """Parse the first worksheet of a BIFF8 ``.xls`` into rows of strings.
    Each row is emitted from its FIRST POPULATED column through its last
    populated column — the Go library's ``row.FirstCol()..row.LastCol()``
    walk (``amex.go:55-61``), so a sheet whose data block starts at
    column >= 1 still puts the first real cell at ``row[0]`` and the
    ``first_col_pattern`` date filter sees it (ADVICE r3). Interior
    missing/blank cells become ``""``."""
    wb = _ole2_stream(data, ("Workbook", "Book"))
    sst: list[str] = []
    sheet_offsets: list[int] = []
    recs = list(_records(wb))
    for i, (typ, payload, _off) in enumerate(recs):
        if typ == 0x00FC:  # SST (+ CONTINUE)
            cont = []
            for t2, p2, _o2 in recs[i + 1 :]:
                if t2 != 0x003C:
                    break
                cont.append(p2)
            sst = _read_sst(payload, cont)
        elif typ == 0x0085:  # BOUNDSHEET
            sheet_offsets.append(struct.unpack_from("<I", payload, 0)[0])
        elif typ == 0x000A:  # EOF of the globals substream
            break
    if not sheet_offsets:
        raise ValueError("no sheet found")

    cells: dict[int, dict[int, str]] = {}

    def put(r: int, c: int, v: str) -> None:
        cells.setdefault(r, {})[c] = v

    for typ, payload, _off in _records(wb, sheet_offsets[0]):
        if typ == 0x000A:  # EOF of the sheet substream
            break
        if typ == 0x00FD:  # LABELSST
            r, c, _ixfe, isst = struct.unpack_from("<HHHI", payload)
            put(r, c, sst[isst] if isst < len(sst) else "")
        elif typ == 0x0204:  # LABEL (inline BIFF8 unicode string)
            r, c = struct.unpack_from("<HH", payload)
            cch, flags = struct.unpack_from("<HB", payload, 6)
            raw = payload[9 : 9 + cch * (2 if flags & 1 else 1)]
            put(r, c, raw.decode("utf-16-le" if flags & 1 else "latin-1", "replace"))
        elif typ == 0x0203:  # NUMBER
            r, c = struct.unpack_from("<HH", payload)
            put(r, c, _fmt_num(struct.unpack_from("<d", payload, 6)[0]))
        elif typ == 0x027E:  # RK
            r, c = struct.unpack_from("<HH", payload)
            put(r, c, _fmt_num(_decode_rk(struct.unpack_from("<I", payload, 6)[0])))
        elif typ == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from("<HH", payload)
            n = (len(payload) - 6) // 6
            for j in range(n):
                rk = struct.unpack_from("<I", payload, 4 + j * 6 + 2)[0]
                put(r, c0 + j, _fmt_num(_decode_rk(rk)))
    rows = []
    for r in sorted(cells):
        byc = cells[r]
        first, last = min(byc), max(byc)
        rows.append([byc.get(c, "") for c in range(first, last + 1)])
    return rows


# -------------------------------------------------------------- BIFF write
def _rec(typ: int, payload: bytes) -> bytes:
    return struct.pack("<HH", typ, len(payload)) + payload


def _ustr(s: str) -> bytes:
    """XLUnicodeRichExtendedString, no rich/ext data."""
    try:
        return struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    except UnicodeEncodeError:
        return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")


def write_xls(rows: list[list[str | None]], sheet_name: str = "Sheet1") -> bytes:
    """Serialize rows of strings as a single-sheet BIFF8 workbook inside a
    minimal OLE2 container (FAT-only layout: the workbook stream is padded
    past the 4096-byte mini-stream cutoff so no mini-FAT is needed).
    ``None`` cells are UNPOPULATED (no record emitted) — distinct from
    ``""`` (a populated empty string) — so fixtures can model real-world
    sheets whose data block starts at a column >= 1."""
    strings: list[str] = []
    index: dict[str, int] = {}
    cell_recs = b""
    n_cells = 0
    for r, row in enumerate(rows):
        for c, val in enumerate(row):
            if val is None:
                continue
            n_cells += 1
            if val not in index:
                index[val] = len(strings)
                strings.append(val)
            cell_recs += _rec(
                0x00FD, struct.pack("<HHHI", r, c, 0, index[val])
            )
    sst = _rec(
        0x00FC,
        struct.pack("<II", n_cells, len(strings))
        + b"".join(_ustr(s) for s in strings),
    )
    bof_g = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0))
    bof_s = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0))
    eof = _rec(0x000A, b"")
    sheet = bof_s + cell_recs + eof
    # BOUNDSHEET needs the sheet's stream offset: globals length is stable
    # because the placeholder offset is fixed-width
    name = sheet_name.encode("latin-1")
    bs_payload = struct.pack("<IHB", 0, 0, len(name)) + b"\x00" + name
    globals_len = len(bof_g) + len(_rec(0x0085, bs_payload)) + len(sst) + len(eof)
    bs = _rec(0x0085, struct.pack("<IHB", globals_len, 0, len(name)) + b"\x00" + name)
    stream = bof_g + bs + sst + eof + sheet
    if len(stream) < 4096:  # stay out of the mini-stream
        stream += b"\x00" * (4096 - len(stream))

    ssz = 512
    ns = -(-len(stream) // ssz)
    stream_padded = stream + b"\x00" * (ns * ssz - len(stream))
    # sectors: 0 = FAT, 1 = directory, 2.. = workbook stream
    total = 2 + ns
    if total > ssz // 4:
        raise ValueError("workbook too large for the single-FAT-sector writer")
    fat = [FATSECT, ENDOFCHAIN] + [2 + i + 1 for i in range(ns - 1)] + [ENDOFCHAIN]
    fat += [FREESECT] * (ssz // 4 - len(fat))
    fat_sector = struct.pack(f"<{ssz // 4}I", *fat)

    def dirent(name: str, etype: int, start: int, size: int, child: int = FREESECT) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        return (
            nm + b"\x00" * (64 - len(nm))
            + struct.pack("<HBB", len(nm), etype, 1)
            + struct.pack("<III", FREESECT, FREESECT, child)
            + b"\x00" * 16  # clsid
            + struct.pack("<I", 0)  # state bits
            + b"\x00" * 16  # timestamps
            + struct.pack("<II", start, size)
            + b"\x00" * 4
        )

    directory = (
        dirent("Root Entry", 5, ENDOFCHAIN, 0, child=1)
        + dirent("Workbook", 2, 2, len(stream))
        + b"\x00" * 64 + struct.pack("<HBB", 0, 0, 0) + struct.pack("<III", FREESECT, FREESECT, FREESECT) + b"\x00" * 48
        + b"\x00" * 64 + struct.pack("<HBB", 0, 0, 0) + struct.pack("<III", FREESECT, FREESECT, FREESECT) + b"\x00" * 48
    )
    header = (
        _MAGIC
        + b"\x00" * 16
        + struct.pack("<HHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6)
        + b"\x00" * 6
        + struct.pack("<IIIII", 0, 1, 1, 0, 4096)
        + struct.pack("<IIII", ENDOFCHAIN, 0, ENDOFCHAIN, 0)
        + struct.pack("<I", 0)
        + struct.pack("<108I", *([FREESECT] * 108))
    )
    assert len(header) == 512 and len(directory) == 512
    return header + fat_sector + directory + stream_padded


# ---------------------------------------------------------------- Spark IO
def read_xls_files(
    spark,
    path: str,
    cols: list[str],
    first_col_pattern: str | None = None,
    keep_path: bool = False,
):
    """Distributed XLS scan: ``binaryFile`` source → per-file BIFF parse in
    ``mapInPandas``. Rows are padded/truncated to ``len(cols)`` string
    columns. ``first_col_pattern`` keeps only rows whose first cell matches
    (the reference's dateRE row filter, ``amex.go:36,55-57``) — applied
    inside the parser so non-data rows never reach the DataFrame."""
    import pandas as pd

    n = len(cols)
    rx = re.compile(first_col_pattern) if first_col_pattern else None
    out_cols = (["path"] if keep_path else []) + cols
    schema = ", ".join(f"`{c}` string" for c in out_cols)

    def parse(batches):
        for pdf in batches:
            out = {c: [] for c in out_cols}
            for p, content in zip(pdf["path"], pdf["content"]):
                for row in read_xls_rows(bytes(content)):
                    if rx is not None and not (row and rx.match(row[0])):
                        continue
                    padded = (row + [""] * n)[:n]
                    if keep_path:
                        out["path"].append(p)
                    for c, v in zip(cols, padded):
                        out[c].append(v)
            yield pd.DataFrame(out, columns=out_cols)

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse, schema=schema)
