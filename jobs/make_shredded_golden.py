"""Materialize the golden ALTO/PAGE fixtures' shredded line rows.

Writes ``tests/resources/shredded_golden.parquet``: the expected output of
the S5/O2/F8 parse family over the reference's own XML fixtures
(``/root/reference/tests/resources``), produced by the pure-Python parser
(``parse_ocr_payload``) — no Spark involved — so the q48 driver oracle
compares the distributed ``shred_xml`` stage against an independently
stored expectation.  Every count in this table is separately golden-locked
in ``tests/test_golden_xml.py`` against the reference's published numbers
(510/33/35/24/23 lines per dialect, min_len=32 -> 225, bundle = 126,
words-without-line-text error), so the stored rows are not a tautology.

Run once (python jobs/make_shredded_golden.py) and commit the parquet.
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocrd_odem_spark.xmlparse import OcrParseError, parse_ocr_payload  # noqa: E402

RES = "/root/reference/tests/resources"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "resources", "shredded_golden.parquet",
)

DEFAULT_FILES = [
    "1667522809_J_0073_0512.xml",       # ALTO V3, 510 lines
    "288652.xml",                        # PAGE 2013, 33 lines (O2 order)
    "OCR-RESULT_0001.xml",               # PAGE 2019, 35 lines
    "ram110.xml",                        # PAGE 2013 CITlab, 24 lines
    "Lubab_alAlbab.pdf_000003.xml",      # ALTO V4, 23 lines
    "1123596.xml",                       # words-without-line-text -> error
]


def _read(path: str) -> bytes:
    with open(path, "rb") as fh:
        return fh.read()


def _shred(variant: str, doc_id: str, media_ref: str, payload: bytes,
           min_len: int) -> list[tuple]:
    try:
        dialect, lines = parse_ocr_payload(payload, min_len=min_len)
    except OcrParseError as exc:
        return [(variant, doc_id, media_ref, None, None, None, None, str(exc))]
    return [
        (variant, doc_id, media_ref, line_id, text, order, dialect, None)
        for order, (line_id, text) in enumerate(lines)
    ]


def main() -> None:
    rows: list[tuple] = []
    for name in DEFAULT_FILES:
        stem = os.path.splitext(name)[0]
        rows += _shred("default", name, stem, _read(os.path.join(RES, name)), 2)
    # F8: parse-time line min-length, newspaper fixture -> 225 lines
    rows += _shred(
        "minlen32", DEFAULT_FILES[0], os.path.splitext(DEFAULT_FILES[0])[0],
        _read(os.path.join(RES, DEFAULT_FILES[0])), 32,
    )
    # A7-adjacent: the 4-file FULLTEXT bundle at min_len=0 -> 126 lines
    for f in sorted(glob.glob(os.path.join(RES, "1981185920_42296_FULLTEXT", "*.xml"))):
        rows += _shred(
            "bundle", "1981185920_42296",
            os.path.splitext(os.path.basename(f))[0], _read(f), 0,
        )
    schema = pa.schema([
        ("variant", pa.string()), ("doc_id", pa.string()),
        ("media_ref", pa.string()), ("line_id", pa.string()),
        ("text", pa.string()), ("line_order", pa.int32()),
        ("dialect", pa.string()), ("error", pa.string()),
    ])
    table = pa.Table.from_pylist(
        [dict(zip(schema.names, r)) for r in rows], schema=schema
    )
    pq.write_table(table, OUT)
    by_variant: dict[str, int] = {}
    for r in rows:
        by_variant[r[0]] = by_variant.get(r[0], 0) + 1
    print(f"wrote {len(rows)} rows to {OUT}: {by_variant}")


if __name__ == "__main__":
    main()
