"""S8 export packaging: deterministic zips, SAF layout, delivery step."""

from __future__ import annotations

import io
import zipfile

import pytest

from ocrd_odem_spark import oracle
from ocrd_odem_spark.plans import pipeline
from ocrd_odem_spark.sources.export import export_documents, materialize_zips


def _unzip(payload: bytes) -> dict[str, bytes]:
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        return {n: zf.read(n) for n in zf.namelist()}


def test_flat_export_roundtrip(spark, docs_df, corpus):
    out = pipeline.extract(docs_df)
    rows = {r["doc_id"]: r for r in export_documents(out, fmt="flat").collect()}
    assert len(rows) == len(corpus)
    checked = 0
    for doc in corpus[:10]:
        want = "\n".join(
            s["text"]
            for s in oracle.extract_document(doc["spans"])
            if s["kind"] == "text"
        )
        r = rows[doc["doc_id"]]
        files = _unzip(bytes(r["zip_bytes"]))
        assert set(files) == {f"{doc['doc_id']}.txt"}
        assert files[f"{doc['doc_id']}.txt"].decode("utf-8") == want
        assert r["bundle_chars"] == len(want)
        assert r["n_entries"] == 1
        assert r["zip_size"] == len(bytes(r["zip_bytes"]))
        checked += 1
    assert checked == 10


def test_saf_export_layout_and_determinism(spark, docs_df):
    out = pipeline.extract(docs_df.limit(3))
    kw = dict(fmt="saf", prefix="odem_", collection="123456789/11")
    a = {r["doc_id"]: bytes(r["zip_bytes"])
         for r in export_documents(out, **kw).collect()}
    b = {r["doc_id"]: bytes(r["zip_bytes"])
         for r in export_documents(out, **kw).collect()}
    assert a == b  # byte-deterministic across runs
    doc_id, payload = next(iter(a.items()))
    files = _unzip(payload)
    assert set(files) == {
        f"{doc_id}.txt", "dublin_core.xml", "collections", "contents"
    }
    assert files["collections"] == b"123456789/11\n"
    assert doc_id.encode() in files["dublin_core.xml"]
    # contents manifest lists the ingestable entries
    listed = files["contents"].decode().splitlines()
    assert f"{doc_id}.txt" in listed and "dublin_core.xml" in listed


def test_export_mets_mapping(spark, docs_df):
    """The reference's export_mets mapping: whatever the METS file is
    called, it exports as canonical 'mets.xml'."""
    from pyspark.sql import functions as F

    out = pipeline.extract(docs_df.limit(2)).withColumn(
        "mets_payload", F.concat(F.lit("<mets:mets/>"), F.col("doc_id"))
    )
    rows = export_documents(out, fmt="flat", mets_col="mets_payload").collect()
    for r in rows:
        files = _unzip(bytes(r["zip_bytes"]))
        assert "mets.xml" in files
        assert files["mets.xml"].decode().endswith(r["doc_id"])
        assert r["n_entries"] == 2


def test_materialize_zips(spark, docs_df, tmp_path):
    import os

    out = pipeline.extract(docs_df.limit(4))
    table = export_documents(out, fmt="flat", prefix="x_")
    n = materialize_zips(table, str(tmp_path / "share"))
    assert n == 4
    names = sorted(os.listdir(tmp_path / "share"))
    assert all(n.startswith("x_") and n.endswith(".zip") for n in names)
    with zipfile.ZipFile(tmp_path / "share" / names[0]) as zf:
        assert zf.namelist()


def test_unknown_format_rejected(spark, docs_df):
    with pytest.raises(ValueError, match="unknown export format"):
        export_documents(pipeline.extract(docs_df.limit(1)), fmt="tar")


def test_export_plan_single_exchange(spark, docs_df):
    """Packaging adds NO shuffle beyond the extraction's own per-doc
    regroup — scale-critical: 10^12 zips must not re-exchange."""
    out = export_documents(pipeline.extract(docs_df), fmt="saf")
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 1, final
    assert "MapInPandas" in final


def test_hostile_doc_ids_sanitized(spark, tmp_path):
    """OAI-style and adversarial ids (path separators, '..' segments)
    must not escape the export share or produce nested zip paths
    (ADVICE r4)."""
    import os

    from ocrd_odem_spark.schema import DOCS_SCHEMA

    hostile = [
        "oai:menadoc.bibliothek.uni-halle.de:dmg/123",
        "../../etc/passwd",
        "a/b\\c:d",
        "...",
    ]
    docs = spark.createDataFrame(
        [
            {
                "doc_id": d,
                "spans": [
                    {"kind": "text", "text": "inhalt", "media_ref": None,
                     "offset": 0}
                ],
            }
            for d in hostile
        ],
        DOCS_SCHEMA,
    )
    table = export_documents(pipeline.extract(docs), fmt="saf", prefix="p_")
    rows = table.collect()
    assert len(rows) == len(hostile)
    share = str(tmp_path / "share")
    n = materialize_zips(table, share)
    assert n == len(hostile)
    written = sorted(os.listdir(share))
    assert len(written) == len(hostile)  # no collisions among these ids
    for name in written:
        assert os.sep not in name and ".." not in name
        assert not name.startswith(".")
        with zipfile.ZipFile(os.path.join(share, name)) as zf:
            for entry in zf.namelist():
                assert "/" not in entry and ".." not in entry
    # the raw id is preserved where it is DATA, not a path: dublin_core
    by_id = {r["doc_id"]: r for r in rows}
    blob = bytes(by_id["../../etc/passwd"]["zip_bytes"])
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        dc = zf.read("dublin_core.xml").decode()
    assert "../../etc/passwd" in dc


def test_materialize_zips_rejects_stem_collision(spark, tmp_path):
    """Two distinct doc_ids sanitizing to one artifact stem must raise,
    not silently overwrite (ADVICE r5)."""
    import pytest

    from ocrd_odem_spark.sources.export import export_documents, materialize_zips

    docs = spark.createDataFrame(
        [
            ("oai:a/b", [{"kind": "text", "text": "x y", "media_ref": "1", "offset": 0}]),
            ("oai:a:b", [{"kind": "text", "text": "z w", "media_ref": "1", "offset": 0}]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    table = export_documents(docs, fmt="saf", prefix="p_")
    with pytest.raises(ValueError, match="collision"):
        materialize_zips(table, str(tmp_path / "share"))
