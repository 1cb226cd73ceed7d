"""ALTO/PAGE shredder coverage over hand-built fixtures of each dialect.

Fixture semantics mirror the reference's model tests
(tests/test_odem_ocr_model.py): per-dialect line counts, min_len filtering,
PAGE word reading order by x-center, RTL reorder, mark stripping,
words-without-line-text error, invalid-coords handling.
"""

from __future__ import annotations

import pytest

from ocrd_odem_spark import xmlparse

ALTO3 = """<?xml version="1.0" encoding="UTF-8"?>
<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
 <Layout><Page ID="p1"><PrintSpace>
  <TextBlock ID="b1">
   <TextLine ID="l1" HPOS="0" VPOS="0" WIDTH="100" HEIGHT="20">
    <String CONTENT="Guten" HPOS="0" VPOS="0" WIDTH="40" HEIGHT="20"/>
    <String CONTENT="Tag" HPOS="50" VPOS="0" WIDTH="30" HEIGHT="20"/>
   </TextLine>
   <TextLine ID="l2" HPOS="0" VPOS="30" WIDTH="100" HEIGHT="20">
    <String CONTENT="x" HPOS="0" VPOS="30" WIDTH="10" HEIGHT="20"/>
   </TextLine>
   <TextLine ID="l3" HPOS="0" VPOS="60" WIDTH="100" HEIGHT="20">
    <String CONTENT="Ende." HPOS="0" VPOS="60" WIDTH="50" HEIGHT="20"/>
   </TextLine>
  </TextBlock>
 </PrintSpace></Page></Layout>
</alto>"""

ALTO4 = ALTO3.replace("ns-v3#", "ns-v4#")

PAGE2013 = """<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
 <Page imageFilename="00000001.jpg">
  <TextRegion id="r1">
   <TextLine id="tl1">
    <Coords points="0,0 100,0 100,20 0,20"/>
    <Word id="w2"><Coords points="60,0 90,0 90,20 60,20"/>
      <TextEquiv><Unicode>Welt</Unicode></TextEquiv></Word>
    <Word id="w1"><Coords points="0,0 40,0 40,20 0,20"/>
      <TextEquiv><Unicode>Hallo</Unicode></TextEquiv></Word>
    <TextEquiv><Unicode>Hallo Welt</Unicode></TextEquiv>
   </TextLine>
   <TextLine id="tl2">
    <Coords points="0,30 100,30 100,50 0,50"/>
    <TextEquiv><Unicode>z</Unicode></TextEquiv>
   </TextLine>
   <TextLine id="tl3">
    <Coords points="0,60 100,60 100,80 0,80"/>
    <TextEquiv><Unicode>nur Zeile</Unicode></TextEquiv>
   </TextLine>
  </TextRegion>
 </Page>
</PcGts>"""

PAGE2019 = PAGE2013.replace("2013-07-15", "2019-07-15")

PAGE_WORDS_ONLY = """<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
 <Page><TextRegion id="r1">
  <TextLine id="bad1">
   <Coords points="0,0 10,0 10,5 0,5"/>
   <Word id="w1"><Coords points="0,0 5,0 5,5 0,5"/>
     <TextEquiv><Unicode>lost</Unicode></TextEquiv></Word>
   <TextEquiv><Unicode></Unicode></TextEquiv>
  </TextLine>
 </TextRegion></Page>
</PcGts>"""

PAGE_RTL = """<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15">
 <Page><TextRegion id="r1">
  <TextLine id="tl1">
   <Coords points="0,0 100,0 100,20 0,20"/>
   <Word id="w1"><Coords points="0,0 40,0 40,20 0,20"/>
     <TextEquiv><Unicode>‏alif</Unicode></TextEquiv></Word>
   <Word id="w2"><Coords points="60,0 90,0 90,20 60,20"/>
     <TextEquiv><Unicode>ba</Unicode></TextEquiv></Word>
   <TextEquiv><Unicode>alif ba</Unicode></TextEquiv>
  </TextLine>
 </TextRegion></Page>
</PcGts>"""


def test_parse_alto_v3_and_v4():
    for payload, dialect in ((ALTO3, "alto3"), (ALTO4, "alto4")):
        d, lines = xmlparse.parse_ocr_payload(payload)
        assert d == dialect
        # 'x' line (len 1) dropped by min_len=2
        assert [t for _, t in lines] == ["Guten Tag", "Ende."]
        assert [i for i, _ in lines] == ["l1", "l3"]


def test_parse_alto_min_len():
    _, lines = xmlparse.parse_ocr_payload(ALTO3, min_len=9)
    assert [t for _, t in lines] == ["Guten Tag"]


def test_parse_page_reading_order():
    for payload, dialect in ((PAGE2013, "page2013"), (PAGE2019, "page2019")):
        d, lines = xmlparse.parse_ocr_payload(payload)
        assert d == dialect
        # words sorted by x-center: Hallo (20) before Welt (75); tl2 dropped
        assert lines == [("tl1", "Hallo Welt"), ("tl3", "nur Zeile")]


def test_parse_page_words_without_line_text_errors():
    with pytest.raises(xmlparse.OcrParseError, match="just words"):
        xmlparse.parse_ocr_payload(PAGE_WORDS_ONLY)


def test_parse_page_rtl_reorder_and_marks():
    _, lines = xmlparse.parse_ocr_payload(PAGE_RTL, reorder=True)
    # tokens [alif, ba] folded right-to-left => "ba alif"; RTL mark stripped
    assert lines == [("tl1", "ba alif")]


def test_shred_xml_stage(spark):
    rows = [
        ("doc1", "00000001", ALTO3),
        ("doc1", "00000002", PAGE2013),
        ("doc2", "00000001", PAGE_WORDS_ONLY),
        ("doc2", "00000002", "<broken"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, media_ref string, xml string")
    parsed = xmlparse.shred_xml(df).collect()
    good = [r for r in parsed if r["error"] is None]
    errs = [r for r in parsed if r["error"] is not None]
    assert len(good) == 4  # 2 ALTO lines + 2 PAGE lines
    assert {(r["doc_id"], r["media_ref"]) for r in errs} == {
        ("doc2", "00000001"),
        ("doc2", "00000002"),
    }
    assert any("just words" in r["error"] for r in errs)
    assert any("malformed XML" in r["error"] for r in errs)

    nested = xmlparse.parsed_to_spans(xmlparse.shred_xml(df)).collect()
    by_doc = {r["doc_id"]: r["spans"] for r in nested}
    seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in by_doc["doc1"]]
    assert seq == [
        ("media", "", "00000001", 0),
        ("text", "Guten Tag", "00000001", 1),
        ("text", "Ende.", "00000001", 2),
        ("media", "", "00000002", 3),
        ("text", "Hallo Welt", "00000002", 4),
        ("text", "nur Zeile", "00000002", 5),
    ]
