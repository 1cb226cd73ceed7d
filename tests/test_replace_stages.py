"""T2/T3/T6/T7/T10 replacement ops + the declarative stage registry (O4)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ocrd_odem_spark import oracle
from ocrd_odem_spark.operators import replace
from ocrd_odem_spark.plans import pipeline


def test_replace_chars_and_counts(spark):
    rows = [("ic) gut s< und ic)",), ("nichts",)]
    df = spark.createDataFrame(rows, "t string")
    d = {"ic)": "ich", "s<": "sc"}
    out = df.select(
        replace.replace_chars(F.col("t"), d).alias("r"),
        replace.replace_chars_with_counts(F.col("t"), d).alias("c"),
    ).collect()
    assert out[0]["r"] == "ich gut sc und ich"
    assert out[0]["c"]["text"] == "ich gut sc und ich"
    assert dict(out[0]["c"]["counts"]) == {"ic)": 1, "s<": 1}  # line-level hits
    assert dict(out[1]["c"]["counts"]) == {"ic)": 0, "s<": 0}


def test_replace_regex_j_to_i(spark):
    rows = [("Jch bin Jndeß hier Jn",), ("Januar bleibt Januar",)]
    df = spark.createDataFrame(rows, "t string")
    out = df.select(
        replace.replace_regex(F.col("t"), r"(J[cdhmn]\w*)", "J", "I").alias("r")
    ).collect()
    assert out[0]["r"] == "Ich bin Indeß hier In"
    assert out[1]["r"] == "Januar bleibt Januar"  # Ja not in [cdhmn]


def test_normalize_index_content(spark):
    rows = [("Wort",), ("Wort,",), ("1749;",), ("‒Zug‟",)]
    df = spark.createDataFrame(rows, "t string")
    out = [r["r"] for r in df.select(
        replace.normalize_index_content(F.col("t")).alias("r")).collect()]
    want = [oracle.normalize_index_content(t[0]) for t in rows]
    assert out == want
    assert out == ["Wort", "Wort", "1749", "Zug"]


def test_normalize_vocal_ligatures(spark):
    rows = [("Gluͤck",), ("Hoͤhe",), ("uͤber",), ("xͤy",)]
    df = spark.createDataFrame(rows, "t string")
    out = df.select(
        replace.normalize_vocal_ligatures(F.col("t")).alias("v")
    ).collect()
    assert [r["v"]["text"] for r in out[:3]] == ["Glück", "Höhe", "über"]
    assert out[3]["v"]["error"] is not None  # x-base is an error channel
    for t, r in zip(["Gluͤck", "Hoͤhe", "uͤber"], out[:3]):
        assert r["v"]["text"] == oracle.normalize_vocal_ligatures(t)
    with pytest.raises(ValueError):
        oracle.normalize_vocal_ligatures("xͤy")


def test_page_ref_normalization(spark):
    df = spark.createDataFrame([("00000003",)], "m string")
    r = df.select(
        replace.normalize_page_ref(F.col("m")).alias("pid"),
        replace.media_file_name(F.col("m")).alias("fn"),
    ).collect()[0]
    assert r["pid"] == "p00000003"
    assert r["fn"] == "00000003.jpg"


def test_stage_registry_composition(spark, docs_df, corpus):
    """A configured stage list reproduces extract() exactly."""
    run = pipeline.build_pipeline(["sort", "postprocess", "dehyphenate", "reoffset"])
    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]] for r in run(docs_df).collect()
    }
    want = {
        d["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle.extract_document_dehyphenated(d["spans"])
        ]
        for d in corpus
    }
    assert got == want


def test_stage_registry_with_replacements(spark):
    docs = spark.createDataFrame(
        [("d1", [{"kind": "media", "text": "", "media_ref": "00000001", "offset": 0},
                 {"kind": "text", "text": "Jch ſehe ic) gut", "media_ref": "00000001", "offset": 1}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    run = pipeline.build_pipeline([
        "sort",
        ("replace_chars", {"dict_chars": {"ic)": "ich"}}),
        ("replace_regex", {"pattern": r"(J[cdhmn]\w*)", "old": "J", "new": "I"}),
        "postprocess",
        "reoffset",
    ])
    spans = run(docs).collect()[0]["spans"]
    assert [s["text"] for s in spans if s["kind"] == "text"] == ["Ich ſehe ich gut"]


def test_unknown_stage_rejected():
    with pytest.raises(KeyError, match="unknown stage"):
        pipeline.build_pipeline(["sort", "nope"])


# ---------------------------------------------------------------------------
# INI pipeline loader (reference init_steps, ocr_pipeline.py:631-651)
# ---------------------------------------------------------------------------

REF_STEPS_INI = "/root/reference/resources/odem.ocr-pipeline.steps.ini"
REF_FULL_INI = "/root/reference/tests/resources/ocr_config_full.ini"


def test_ini_loader_default_steps():
    """The shipped default config yields Regex -> Postprocess in order,
    with the Tesseract step reported as environment-skipped."""
    from ocrd_odem_spark.plans.config import load_steps_ini

    stages, skipped = load_steps_ini(REF_STEPS_INI)
    assert stages == [
        ("replace_regex", {"pattern": r"(J[cdhmn]\w*)", "old": "J", "new": "I"}),
        ("postprocess", {}),
    ]
    assert skipped == [("step_01", "StepTesseract")]


def test_ini_loader_full_config_order_and_quirks():
    """The reference's full test config: 5 steps -> chars, regex kept
    VERBATIM (reference asserts pattern == 'r\\'(...)\"\\''), three
    environment steps skipped; parse_dict keeps quote chars (reference
    parse_dict, ocr_pipeline.py:184-194)."""
    from ocrd_odem_spark.plans.config import load_steps_ini, parse_dict

    stages, skipped = load_steps_ini(REF_FULL_INI)
    assert [s for s, _ in stages] == ["replace_chars", "replace_regex"]
    assert stages[0][1]["dict_chars"] == {
        "'ic)'": "'ich'", "'s&lt;'": "'sc'", "'&lt;'": "'c'"
    }
    assert stages[1][1]["pattern"] == "r'([aeioubcglnt]3[:-]*\")'"
    assert stages[1][1]["old"] == "'3'"
    assert [t for _, t in skipped] == [
        "StepTesseract", "StepEstimateOCR", "StepPostMoveAlto"
    ]
    # parse_dict single-pair guard (len(tkns) > 1), braces stripped
    assert parse_dict("{'a': 'b'}") == {}
    assert parse_dict({"x": "y"}) == {"x": "y"}


def test_ini_loader_unknown_type_rejected(tmp_path):
    from ocrd_odem_spark.plans.config import load_steps_ini

    bad = tmp_path / "steps.ini"
    bad.write_text("[step_01]\ntype = StepNope\n")
    with pytest.raises(KeyError, match="Unknown step 'StepNope'!"):
        load_steps_ini(str(bad))


def test_ini_loaded_pipeline_runs(spark):
    """End-to-end: the default INI's stage list drives build_pipeline and
    performs the J->I replacement + postprocess cascade."""
    from ocrd_odem_spark.plans.config import load_steps_ini

    stages, _ = load_steps_ini(REF_STEPS_INI)
    run = pipeline.build_pipeline(["sort", *stages, "reoffset"])
    docs = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "Jch bin hier", "media_ref": None,
                  "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    spans = run(docs).collect()[0]["spans"]
    assert [s["text"] for s in spans] == ["Ich bin hier"]
