"""S2 parse layer: OAI envelope shredding against the reference's own
GetRecord fixtures, ListRecords paging, error/deleted channels, record
lists.  Transport (HTTP) is documented out of scope — these prove
everything after the bytes arrive."""

from __future__ import annotations

import os

import pytest

from ocrd_odem_spark.metsparse import validate_mets_schema
from ocrd_odem_spark.sources.oai import (
    oai_records,
    parse_oai_envelope,
    parse_record_list,
)

RES = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixtures not available"
)


def _read(name: str) -> str:
    with open(os.path.join(RES, name), encoding="utf-8") as fh:
        return fh.read()


def test_getrecord_fixture_unwraps_to_standalone_mets():
    rows = parse_oai_envelope(_read("320796.oai.xml"))
    assert len(rows) == 1
    r = rows[0]
    assert r["identifier"] == "oai:digital.bibliothek.uni-halle.de/hd:320796"
    assert r["datestamp"] == "2009-09-23T14:04:16Z"
    assert r["set_specs"] == ["ulbhaldod"]
    assert not r["deleted"] and r["oai_error"] is None
    # the unwrapped METS is a standalone document the validator accepts
    ok, findings = validate_mets_schema(r["mets_xml"])
    assert ok, findings


def test_oai_wrapped_33908_matches_direct_validation():
    """The loader-unwrap path and the validator's internal unwrap agree."""
    raw = _read("1981185920_33908.xml")
    rows = parse_oai_envelope(raw)
    assert len(rows) == 1 and rows[0]["mets_xml"]
    ok_a, f_a = validate_mets_schema(rows[0]["mets_xml"])
    ok_b, f_b = validate_mets_schema(raw)
    assert ok_a == ok_b
    assert {x["rule_id"] for x in f_a} == {x["rule_id"] for x in f_b}


LIST_PAGE = """<?xml version='1.0' encoding='UTF-8'?>
<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
  <responseDate>2024-01-01T00:00:00Z</responseDate>
  <request verb="ListRecords">http://example.test/oai</request>
  <ListRecords>
    <record>
      <header><identifier>oai:x:1</identifier>
        <datestamp>2024-01-01</datestamp><setSpec>a</setSpec><setSpec>b</setSpec></header>
      <metadata><mets:mets xmlns:mets="http://www.loc.gov/METS/"><mets:metsHdr/></mets:mets></metadata>
    </record>
    <record>
      <header status="deleted"><identifier>oai:x:2</identifier>
        <datestamp>2024-01-02</datestamp></header>
    </record>
    <resumptionToken cursor="0">tok-123</resumptionToken>
  </ListRecords>
</OAI-PMH>"""


def test_listrecords_paging_deleted_and_token():
    rows = parse_oai_envelope(LIST_PAGE)
    assert [r["identifier"] for r in rows] == ["oai:x:1", "oai:x:2"]
    assert rows[0]["set_specs"] == ["a", "b"]
    assert rows[0]["resumption_token"] == "tok-123"  # every row carries the page token
    assert rows[0]["mets_xml"] and "metsHdr" in rows[0]["mets_xml"]
    assert rows[1]["deleted"] is True and rows[1]["mets_xml"] is None


def test_error_and_malformed_are_data_rows():
    err = (
        '<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">'
        '<error code="idDoesNotExist">no such id</error></OAI-PMH>'
    )
    rows = parse_oai_envelope(err)
    assert rows == [rows[0]]
    assert rows[0]["oai_error"] == "idDoesNotExist: no such id"
    rows = parse_oai_envelope(b"<OAI-PMH")
    assert rows[0]["oai_error"].startswith("parse:")


def test_spark_oai_stage(spark):
    data = [
        ("p1", _read("320796.oai.xml")),
        ("p2", LIST_PAGE),
        ("p3", "<broken"),
    ]
    df = spark.createDataFrame(data, "source string, oai_xml string").coalesce(1)
    got = {}
    for r in oai_records(df).collect():
        got.setdefault(r["source"], []).append(r)
    assert len(got["p1"]) == 1 and got["p1"][0]["identifier"].endswith("320796")
    assert len(got["p2"]) == 2
    assert got["p2"][0]["resumption_token"] == "tok-123"
    assert got["p3"][0]["oai_error"].startswith("parse:")


def test_record_list_roundtrip():
    text = (
        "IDENTIFIER\tSETSPEC\tCREATED\tINFO\tSTATE\tSTATE_TIME\n"
        "oai:x:1\tulbhaldod\t2024-01-01\tn.a.\tn.a.\t\n"
        "oai:x:2\tulbhaldod\t2024-01-02\tpica=Aa\tocr_done\t2024-02-02T10:00:00\n"
    )
    rows = parse_record_list(text)
    assert len(rows) == 2
    assert rows[0]["IDENTIFIER"] == "oai:x:1"
    assert rows[0]["STATE_TIME"] == ""
    assert rows[1]["STATE"] == "ocr_done"
