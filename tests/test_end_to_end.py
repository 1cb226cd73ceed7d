"""The reference user's journey, end to end in one plan chain:

METS metadata + per-page ALTO payloads
  -> metsparse (doc/page dimensions)        [S4, J1, J2]
  -> xmlparse (line spans in reading order) [S5, O1, O2]
  -> extract with blacklist + relevance     [F1-F6, T1]
  -> de-hyphenation                         [T4]
  -> text bundle + metrics                  [S7, A1, A7]

This is the switch-over scenario: a user of the reference runs exactly this
chain today as postprocess_ocr_file + link + create_text_bundle_data.
"""

from __future__ import annotations

from ocrd_odem_spark import metsparse, xmlparse
from ocrd_odem_spark.plans import pipeline

from test_metsparse import METS


def _alto(lines: list[list[str]]) -> str:
    blocks = []
    for i, words in enumerate(lines):
        strings = "".join(
            f'<String CONTENT="{w}" HPOS="{j*60}" VPOS="{i*30}" WIDTH="50" HEIGHT="20"/>'
            for j, w in enumerate(words)
        )
        blocks.append(
            f'<TextLine ID="l{i}" HPOS="0" VPOS="{i*30}" WIDTH="400" HEIGHT="20">'
            f"{strings}</TextLine>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">'
        "<Layout><Page ID='p1'><PrintSpace><TextBlock ID='b1'>"
        + "".join(blocks)
        + "</TextBlock></PrintSpace></Page></Layout></alto>"
    )


def test_reference_user_journey(spark):
    doc_id = "ppn058134433"

    # per-page OCR payloads: page 1 is the (blacklisted) cover, page 2 has a
    # hyphen wrap + trailing punctuation, page 3 has noise tokens
    pages = {
        "00000001": _alto([["Umschlag"]]),
        "00000002": _alto([["Der", "Anfang", "zusam-"], ["men", "gesetzt."]]),
        "00000003": _alto([["...", "x", "Ende!"], ["⸗", "A."]]),
    }
    xml_df = spark.createDataFrame(
        [(doc_id, ref, payload) for ref, payload in pages.items()],
        "doc_id string, media_ref string, xml string",
    )
    mets_df = spark.createDataFrame(
        [(doc_id, METS)], "doc_id string, mets_xml string"
    )

    doc_meta, page_meta = metsparse.shred_mets(mets_df)
    docs = xmlparse.parsed_to_spans(xmlparse.shred_xml(xml_df))

    out = pipeline.extract(
        docs,
        page_meta=page_meta.select(
            "doc_id", "media_ref", "phys_id", "label", "log_types"
        ),
        doc_meta=doc_meta.where(doc_meta.error.isNull()).select(
            "doc_id", "mets_type", "pica_type", "identifiers", "languages"
        ),
        dehyphenate=True,
        with_metrics=True,
    )
    row = out.collect()[0]

    seq = [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
    # page 1 (cover_front) and page 3's '[Colorchecker]' label are
    # blacklisted by the METS dimensions -> only page 2 survives.
    # 'zusam-' is first trailing-split into 'zusam -' (the split-off hyphen
    # survives as its own token, reference ocr_files.py:120-152), and the
    # wrap merge then strips that hyphen and pulls 'men' up — the composed
    # stage order produces 'zusam men', exactly as the reference stages
    # compose (postprocess_ocr_file then _sanitize_wraps).
    assert seq == [
        ("media", "", "00000002"),
        ("text", "Der Anfang zusam men", "00000002"),
        ("text", "gesetzt .", "00000002"),
    ]
    assert row["n_pages"] == 1
    assert row["n_dehyphenated"] == 1

    bundle = pipeline.text_bundle(out.select("doc_id", "spans")).collect()[0]
    assert bundle["bundle"] == "Der Anfang zusam men\ngesetzt ."
    assert bundle["n_text_lines"] == 2
