"""Minimal deterministic .xlsx writer/reader on the stdlib only.

The reference emits its O5/O6 artifacts with ``pd.DataFrame(...)
.to_excel(...)`` (docrawl_core.py:942, :1007) — which needs openpyxl,
absent in this environment. An .xlsx file is just a zip of a few XML
parts, so this module writes one directly (same stdlib-codec approach
as the WARC sink and the PNG/BMP/WAV codecs, sources/warc.py,
datapipe/codecs.py):

- sheet layout matches ``DataFrame.to_excel`` defaults: header row
  (A1 blank over the index column, then the column labels), then one
  row per record with the index label in column A;
- strings are inline (``t="inlineStr"``) — no sharedStrings part, no
  cross-part offsets, nothing order-sensitive;
- ints/floats are numeric cells; None cells are omitted;
- the zip is byte-deterministic: fixed entry order, fixed 1980-01-01
  timestamps, fixed compression — same input, same bytes (the WARC
  sink's determinism contract).

The reader walks the same parts back (zipfile + xml.etree) so
round-trip tests run without openpyxl; files also open in Excel /
LibreOffice / openpyxl (the parts written are the required minimum of
ECMA-376: [Content_Types].xml, _rels/.rels, workbook, workbook rels,
one worksheet).
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<workbook xmlns="{_NS}" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
    "</workbook>"
)
_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _col_letter(idx: int) -> str:
    """0-based column index → A1-style letters (0→A, 25→Z, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):  # before int (bool is int)
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    # control chars are invalid in XML 1.0 — strip like openpyxl does
    text = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", text)
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{text}</t></is></c>'
    )


def sheet_rows(
    records: list[list],
    index: list | None = None,
    columns: list | None = None,
) -> list[list]:
    """The grid ``DataFrame.to_excel`` would write: a header row
    (blank corner + column labels) then index label + values per row.
    ``index``/``columns`` default to 0-based positions like pandas."""
    n_cols = max((len(r) for r in records), default=0)
    cols = list(columns) if columns is not None else list(range(n_cols))
    idx = list(index) if index is not None else list(range(len(records)))
    grid: list[list] = [[None, *cols]]
    for label, rec in zip(idx, records):
        grid.append([label, *rec, *([None] * (n_cols - len(rec)))])
    return grid


def xlsx_bytes(grid: list[list]) -> bytes:
    """Serialize a row grid (lists of str/int/float/bool/None) into a
    complete deterministic .xlsx byte string."""
    rows_xml = []
    for ri, row in enumerate(grid, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        rows_xml.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}"><sheetData>'
        + "".join(rows_xml)
        + "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, payload in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _ROOT_RELS),
            ("xl/workbook.xml", _WORKBOOK),
            ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
            ("xl/worksheets/sheet1.xml", sheet),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o600 << 16
            z.writestr(info, payload)
    return buf.getvalue()


def write_xlsx(
    path: str,
    records: list[list],
    index: list | None = None,
    columns: list | None = None,
) -> None:
    """``pd.DataFrame(records, index=…, columns=…).to_excel(path)``
    without pandas/openpyxl — same sheet shape, deterministic bytes."""
    with open(path, "wb") as f:
        f.write(xlsx_bytes(sheet_rows(records, index, columns)))


def _cell_value(c: ET.Element):
    t = c.get("t")
    if t == "inlineStr":
        parts = [e.text or "" for e in c.iter(f"{{{_NS}}}t")]
        return "".join(parts)
    v = c.find(f"{{{_NS}}}v")
    if v is None or v.text is None:
        return None
    if t == "b":
        return bool(int(v.text))
    text = v.text
    if re.fullmatch(r"-?\d+", text):
        return int(text)
    return float(text)


def read_xlsx(path_or_bytes) -> list[list]:
    """Sheet1's grid back as lists (None for absent cells) — the
    round-trip check and a minimal .xlsx ingest (works on this
    module's output and on standard single-sheet files using inline or
    numeric cells; sharedStrings-based files resolve via the string
    table)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        src = io.BytesIO(path_or_bytes)
    else:
        src = path_or_bytes
    with zipfile.ZipFile(src) as z:
        sheet_name = next(
            n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet1\.xml", n)
        )
        root = ET.fromstring(z.read(sheet_name))
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            s_root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in s_root.iter(f"{{{_NS}}}si"):
                shared.append("".join(e.text or "" for e in si.iter(f"{{{_NS}}}t")))
    grid: dict[int, dict[int, object]] = {}
    for row in root.iter(f"{{{_NS}}}row"):
        ri = int(row.get("r")) - 1
        for c in row.iter(f"{{{_NS}}}c"):
            ref = c.get("r") or "A1"
            m = re.fullmatch(r"([A-Z]+)(\d+)", ref)
            letters = m.group(1)
            ci = 0
            for ch in letters:
                ci = ci * 26 + (ord(ch) - ord("A") + 1)
            ci -= 1
            if c.get("t") == "s":  # sharedStrings reference
                v = c.find(f"{{{_NS}}}v")
                val = shared[int(v.text)] if v is not None else None
            else:
                val = _cell_value(c)
            grid.setdefault(ri, {})[ci] = val
    if not grid:
        return []
    n_rows = max(grid) + 1
    n_cols = 1 + max((ci for r in grid.values() for ci in r), default=-1)
    return [
        [grid.get(ri, {}).get(ci) for ci in range(n_cols)] for ri in range(n_rows)
    ]
