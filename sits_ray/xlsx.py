"""Minimal dependency-free XLSX sink (the reference's ``sits_to_xlsx``,
``R/sits_xlsx.R:47-60``: one worksheet per labelled accuracy/confusion
matrix).

An .xlsx file is a ZIP of SpreadsheetML XML parts; Python's stdlib
(``zipfile`` + string templates) writes a fully valid workbook — no
openpyxl in the container, and none needed. Numbers are written as
native numeric cells, everything else as inline strings (no shared-string
table, which is optional per ECMA-376). The writer is a driver-side sink
for SMALL result tables (accuracy matrices, summaries) — never for
datasets; big data goes to Parquet.
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheets}</Types>"""

_SHEET_CT = ('<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
             '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
             'worksheet+xml"/>\n')

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
{sheets}</sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}</Relationships>"""


def _col_ref(j: int) -> str:
    """0-based column index -> A1-style column letters."""
    out = ""
    j += 1
    while j:
        j, r = divmod(j - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _cell_xml(ref: str, v) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return ""
    if isinstance(v, (bool, np.bool_)):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float, np.integer, np.floating)):
        return f'<c r="{ref}" t="n"><v>{v!r}</v></c>'
    return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(v))}</t></is></c>")


def _sheet_xml(df: pd.DataFrame) -> str:
    rows = []
    header = "".join(
        _cell_xml(f"{_col_ref(j)}1", c) for j, c in enumerate(df.columns)
    )
    rows.append(f'<row r="1">{header}</row>')
    for i, rec in enumerate(df.itertuples(index=False), start=2):
        cells = "".join(
            _cell_xml(f"{_col_ref(j)}{i}", v) for j, v in enumerate(rec)
        )
        rows.append(f'<row r="{i}">{cells}</row>')
    body = "\n".join(rows)
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>\n'
            f"{body}\n</sheetData></worksheet>")


def _safe_name(name: str, taken: set) -> str:
    # Excel sheet-name rules: <=31 chars, no : \\ / ? * [ ]
    s = re.sub(r"[:\\/?*\[\]]", "_", str(name))[:31] or "Sheet"
    base, k = s, 1
    while s in taken:
        k += 1
        s = f"{base[:28]}_{k}"
    taken.add(s)
    return s


def write_xlsx(tables, path: str) -> str:
    """Write ``tables`` to a real .xlsx workbook at ``path``.

    ``tables``: a pandas DataFrame (one sheet) or a ``{sheet_name: df}``
    dict — the reference emits one sheet per accuracy matrix. Values may
    be numbers, bools, strings or None/NaN (blank cell). Returns ``path``.
    """
    if isinstance(tables, pd.DataFrame):
        tables = {"Sheet1": tables}
    if not tables:
        raise ValueError("write_xlsx: no tables to write")
    taken: set = set()
    names = [_safe_name(n, taken) for n in tables]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(
                sheets="".join(_SHEET_CT.format(i=i + 1)
                               for i in range(len(tables)))
            ),
        )
        z.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>\n'
            for i, n in enumerate(names)
        )
        z.writestr("xl/workbook.xml", _WORKBOOK.format(sheets=sheet_tags))
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>\n'
            for i in range(len(tables))
        )
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS.format(rels=rels))
        for i, df in enumerate(tables.values()):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(df))
    return path


def read_xlsx(path: str) -> dict:
    """Read back a workbook written by :func:`write_xlsx` (round-trip
    verification; handles the subset this writer emits). Returns
    ``{sheet_name: DataFrame}``."""
    import xml.etree.ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    out = {}
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = [(s.get("name"), i + 1)
                  for i, s in enumerate(wb.iter(f"{ns}sheet"))]
        for name, i in sheets:
            root = ET.fromstring(z.read(f"xl/worksheets/sheet{i}.xml"))
            grid: dict[int, dict[int, object]] = {}
            for row in root.iter(f"{ns}row"):
                r = int(row.get("r"))
                grid.setdefault(r, {})  # all-blank rows still exist
                for c in row.iter(f"{ns}c"):
                    ref = c.get("r")
                    col = 0
                    for ch in ref:
                        if ch.isalpha():
                            col = col * 26 + ord(ch) - ord("A") + 1
                    col -= 1
                    t = c.get("t", "n")
                    if t == "inlineStr":
                        el = c.find(f"{ns}is/{ns}t")
                        v = el.text if el is not None and el.text else ""
                    else:
                        el = c.find(f"{ns}v")
                        raw = el.text if el is not None else None
                        if raw is None:
                            v = None
                        elif t == "b":
                            v = bool(int(raw))
                        else:
                            fv = float(raw)
                            v = int(fv) if fv.is_integer() and "." not in raw \
                                and "e" not in raw.lower() else fv
                    grid.setdefault(r, {})[col] = v
            if not grid:
                out[name] = pd.DataFrame()
                continue
            hdr = grid.pop(1, {})
            ncol = (max(hdr) + 1) if hdr else 0
            cols = [hdr.get(j, f"c{j}") for j in range(ncol)]
            recs = []
            for r in sorted(grid):
                recs.append([grid[r].get(j) for j in range(ncol)])
            out[name] = pd.DataFrame(recs, columns=cols)
    return out
