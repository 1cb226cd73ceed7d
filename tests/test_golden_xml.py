"""Golden-fixture parity against the reference's REAL ALTO/PAGE XML.

Every number asserted here is an exact count from the reference's own test
suite, re-derived through this engine's shredder/operators over the same
fixture files (``/root/reference/tests/resources``):

* per-dialect line counts 510/33/35/24/23 and min_len=32 -> 225
  (``tests/test_odem_ocr_model.py:16-54``),
* words-without-line-text error (``:57-71``),
* text bundle over 1981185920_42296_FULLTEXT = 126 lines
  (``tests/test_odem_processing_mets.py:407-421``),
* textlines2data on 500_gray00003: 360 lines -> 346 dense, 2636 words
  (``tests/test_odem_ocr_pipeline.py:595-606,620-643``),
* quality ratio 548/2636 -> 79.211 / 20.789 (``:620-670``),
* estimation analyze: mean 42.723 bins [1,2,3,1,3]; 49.677 bins head 1/1/1
  (``:509-559``),
* StepPostprocessALTO empty-content cascade: 275 -> 254 Strings
  (16331011.xml) and 1854 -> 1673 + line_2 dropped (16331001.xml)
  (``:698-764``),
* regex J->I: 185 -> 172 'J' file lines, 9 distinct replacements
  (``:804-863``),
* postprocess_ocr_file drops on 123456789_27949 page 3 and trailing-punct
  isolation (``tests/test_odem_processing_ocr_files.py:44-75``).
"""

from __future__ import annotations

import glob
import os
import re
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import Row, functions as F

from ocrd_odem_spark import oracle
from ocrd_odem_spark.operators.quality import (
    estimation_bins,
    quality_ratio,
)
from ocrd_odem_spark.operators.replace import (
    media_file_name,
    normalize_page_ref,
    replace_regex,
)
from ocrd_odem_spark.operators.tokens import drop_blank_tokens, postprocess_line
from ocrd_odem_spark.xmlparse import OcrParseError, parse_ocr_payload, shred_xml

RES = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixtures not available"
)


def _read(name: str) -> bytes:
    with open(os.path.join(RES, name), "rb") as fh:
        return fh.read()


GOLDEN_LINE_COUNTS = [
    ("1667522809_J_0073_0512.xml", "alto3", 510),   # ALTO V3 ULB ZD1
    ("288652.xml", "page2013", 33),                 # PAGE 2013 FID GT 2021
    ("OCR-RESULT_0001.xml", "page2019", 35),        # PAGE 2019 OCR-D
    ("ram110.xml", "page2013", 24),                 # PAGE 2013 CITlab Rostock
    ("Lubab_alAlbab.pdf_000003.xml", "alto4", 23),  # ALTO V4
]


@pytest.mark.parametrize("name,dialect,expected", GOLDEN_LINE_COUNTS)
def test_golden_line_counts(name, dialect, expected):
    got_dialect, lines = parse_ocr_payload(_read(name))
    assert got_dialect == dialect
    assert len(lines) == expected


def test_golden_minlen_32_newspaper():
    _, lines = parse_ocr_payload(_read("1667522809_J_0073_0512.xml"), min_len=32)
    assert len(lines) == 225


def test_golden_words_only_line_is_error():
    with pytest.raises(OcrParseError) as exc:
        parse_ocr_payload(_read("1123596.xml"))
    assert "just words for line 'line_1617688885509_1198'" in str(exc.value)


def test_golden_spark_shred_all_dialects(spark):
    rows = [
        Row(doc_id=name, media_ref="p1", xml=_read(name).decode("utf-8"))
        for name, _, _ in GOLDEN_LINE_COUNTS
    ]
    parsed = shred_xml(spark.createDataFrame(rows))
    counts = {
        r["doc_id"]: (r["n"], r["dialect"])
        for r in parsed.groupBy("doc_id", "dialect").agg(F.count("*").alias("n")).collect()
    }
    for name, dialect, expected in GOLDEN_LINE_COUNTS:
        assert counts[name] == (expected, dialect)


def test_golden_text_bundle_126(spark):
    files = sorted(glob.glob(os.path.join(RES, "1981185920_42296_FULLTEXT", "*.xml")))
    assert len(files) == 4
    rows = [
        Row(
            doc_id="1981185920_42296",
            media_ref=os.path.splitext(os.path.basename(f))[0],
            xml=open(f, encoding="utf-8").read(),
        )
        for f in files
    ]
    # extract_text_content (mets.py:521-535) takes EVERY TextLine -> min_len=0
    parsed = shred_xml(spark.createDataFrame(rows), min_len=0)
    assert parsed.where(F.col("error").isNotNull()).count() == 0
    assert parsed.count() == 126


def test_golden_textlines2data_500_gray(spark):
    from ocrd_odem_spark.operators.quality import page_text_stats
    from ocrd_odem_spark.xmlparse import parsed_to_spans

    rows = [Row(doc_id="500_gray00003", media_ref="00000003",
                xml=_read("500_gray00003.xml").decode("utf-8"))]
    docs = parsed_to_spans(shred_xml(spark.createDataFrame(rows)))
    stats = page_text_stats(docs).collect()
    assert len(stats) == 1
    row = stats[0]
    # reference: n_lines == 360, n_lines_out == 346 (test_odem_ocr_pipeline.py:595-606)
    assert row["n_lines"] == 360
    assert row["n_dense"] == 346
    # reference: step.n_words == 2636 (:620-643)
    assert len(row["file_string"].split()) == 2636


def test_golden_quality_ratio_79_211(spark):
    # LanguageTool found 548 matches for the 2636-word 500_gray00003 text
    # (mocked response fixture in the reference suite, :620-670)
    df = spark.createDataFrame([Row(n_words=2636, n_errs=548)])
    got = df.select(
        quality_ratio(F.col("n_words"), F.col("n_errs")).alias("hit"),
        F.round(F.col("n_errs") / F.col("n_words") * 100, 3).alias("err"),
    ).collect()[0]
    assert got["hit"] == pytest.approx(79.211, rel=1e-3)
    assert got["err"] == pytest.approx(20.789, rel=1e-3)
    assert got["hit"] == pytest.approx(100 - got["err"], rel=1e-9)


def test_golden_estimation_analyze_bins(spark):
    # test_stepestimateocr_analyze (:509-530)
    vals = [14.123, 18.123, 28.123, 38.123, 40.123,
            41.123, 51.123, 60.123, 68.123, 68.123]
    df = spark.createDataFrame([Row(score=v) for v in vals])
    mean = df.select(F.round(F.avg("score"), 3).alias("m")).collect()[0]["m"]
    assert mean == pytest.approx(42.723, abs=1e-9)
    bins = {r["bin"]: r["n"] for r in estimation_bins(df).collect()}
    assert [bins.get(i, 0) for i in range(5)] == [1, 2, 3, 1, 3]

    # test_estimate_handle_large_wtr (:533-559) — values past 75 clamp to bin 4
    vals2 = [0.0, 28.123, 41.123, 50.123, 78.571, 100.123]
    df2 = spark.createDataFrame([Row(score=v) for v in vals2])
    mean2 = df2.select(F.round(F.avg("score"), 3).alias("m")).collect()[0]["m"]
    assert mean2 == pytest.approx(49.677, abs=1e-9)
    bins2 = {r["bin"]: r["n"] for r in estimation_bins(df2).collect()}
    assert [bins2.get(i, 0) for i in range(3)] == [1, 1, 1]


@pytest.mark.parametrize("name,n_raw,n_survive", [
    ("16331011.xml", 275, 254),
    ("16331001.xml", 1854, 1673),
])
def test_golden_empty_content_cascade(spark, name, n_raw, n_survive):
    """StepPostprocessALTO drop_empty_contents: blank Strings removed, lines
    emptied by the removal cascade away (:698-764)."""
    root = ET.fromstring(_read(name))
    uri = root.tag[1:].split("}", 1)[0]
    assert len(root.findall(f".//{{{uri}}}String")) == n_raw

    _, lines = parse_ocr_payload(_read(name), min_len=0)
    df = spark.createDataFrame(
        [Row(line_id=lid, text=t) for lid, t in lines]
    ).withColumn("text", drop_blank_tokens(F.col("text")))
    survived = df.where(F.col("text") != "")
    n_tokens = survived.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    assert n_tokens == n_survive
    # 16331001 line_2 holds only two blank Strings + SP -> dropped entirely
    if name == "16331001.xml":
        assert survived.where(F.col("line_id") == "line_2").count() == 0


def test_golden_regex_j_replacement(spark):
    """185 -> 172 file lines containing 'J' after (J[cdhmn]\\w*) J->I;
    9 distinct replacement patterns (:804-863)."""
    path = os.path.join(RES, "1516514412012_175762_00000003.xml")
    with open(path, encoding="utf-8") as fh:
        raw_lines = fh.readlines()
    assert sum(1 for l in raw_lines if "J" in l) == 185

    contents = []
    for i, line in enumerate(raw_lines):
        for m in re.finditer(r'CONTENT="([^"]*)"', line):
            contents.append(Row(line_no=i, start=m.start(1), content=m.group(1)))
    df = spark.createDataFrame(contents)
    pattern = r"(J[cdhmn]\w*)"
    out = df.select(
        "line_no", "start", "content",
        replace_regex(F.col("content"), pattern, "J", "I").alias("replaced"),
        F.regexp_extract(F.col("content"), pattern, 1).alias("matched"),
    )
    n_distinct = (
        out.where(F.col("matched") != "").select("matched").distinct().count()
    )
    assert n_distinct == 9

    by_line: dict[int, list] = {}
    for r in out.collect():
        by_line.setdefault(r["line_no"], []).append(r)
    rewritten = list(raw_lines)
    for line_no, repls in by_line.items():
        line = rewritten[line_no]
        for r in sorted(repls, key=lambda x: -x["start"]):
            line = (
                line[: r["start"]] + r["replaced"]
                + line[r["start"] + len(r["content"]):]
            )
        rewritten[line_no] = line
    assert sum(1 for l in rewritten if "J" in l) == 172


def test_golden_27949_postprocess_drops(spark):
    """postprocess_ocr_file on 123456789_27949 page 3: emptied lines are
    gone; trailing punctuation is isolated into its own token."""
    _, lines = parse_ocr_payload(_read("123456789_27949_FULLTEXT/00000003.xml"))
    df = spark.createDataFrame([Row(line_id=lid, text=t) for lid, t in lines])
    out = df.withColumn("text", postprocess_line(F.col("text"))).where(
        F.col("text") != ""
    )
    survivors = {r["line_id"]: r["text"] for r in out.collect()}
    # reference asserts exactly these two dropped (:58-63)
    assert "region0001_line0002" not in survivors
    assert "region0012_line0001" not in survivors
    # every surviving token ending in a punctuation is a lone punctuation char
    for text in survivors.values():
        for tok in text.split(" "):
            if tok and tok[-1] in oracle.ODEM_PUNCTUATIONS:
                assert len(tok) == 1, (tok, text)


def test_golden_filename_page_id_enrichment(spark):
    """StepPostprocessALTO fileIdentifier/fileName/Page@ID goldens
    (:698-734, :767-801)."""
    df = spark.createDataFrame(
        [Row(stem="16331011"), Row(stem="urn+nbn+de+gbv+3+1-121915-p0159-6_ger")]
    )
    got = {
        r["stem"]: r
        for r in df.select(
            "stem",
            media_file_name(F.col("stem"), ext=".xml").alias("file_name"),
            normalize_page_ref(F.col("stem"), prefix="").alias("page_id_bare"),
            normalize_page_ref(F.col("stem")).alias("page_id_p"),
        ).collect()
    }
    assert got["16331011"]["file_name"] == "16331011.xml"
    assert got["16331011"]["page_id_p"] == "p16331011"
    urn = "urn+nbn+de+gbv+3+1-121915-p0159-6_ger"
    assert got[urn]["page_id_bare"] == urn
    assert got[urn]["file_name"] == f"{urn}.xml"


def test_real_xml_end_to_end_extract_equals_oracle(spark):
    """Capstone: the reference's own Fraktur ALTO pages, shredded into the
    span contract and run through the full extract+dehyphenate pipeline in
    BOTH execution modes, are span-sequence-equal to the Python oracle."""
    from ocrd_odem_spark import oracle
    from ocrd_odem_spark.plans import pipeline
    from ocrd_odem_spark.xmlparse import parsed_to_spans

    files = sorted(glob.glob(os.path.join(RES, "1981185920_42296_FULLTEXT", "*.xml")))
    rows = [
        Row(
            doc_id="1981185920_42296",
            media_ref=os.path.splitext(os.path.basename(f))[0],
            xml=open(f, encoding="utf-8").read(),
        )
        for f in files
    ]
    docs = parsed_to_spans(shred_xml(spark.createDataFrame(rows))).cache()
    in_spans = docs.collect()[0]["spans"]
    golden = [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in oracle.extract_document_dehyphenated(
            [s.asDict() for s in in_spans]
        )
    ]
    assert len(golden) > 80  # real content survived
    for mode in ("hof", "arrow"):
        out = pipeline.extract(docs, dehyphenate=True, mode=mode).collect()
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in out[0]["spans"]
        ]
        assert got == golden, mode
