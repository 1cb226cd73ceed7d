"""Schema-level METS validation channel (reference ``validate_mets``,
``mets.py:501-518`` + ``validate_metadata``, ``odem_process_impl.py:521-557``).

The reference raises on XSD/DDB alerts; this engine emits findings as data
rows so one malformed METS quarantines one document, never a 100 TB job.
Golden anchors: the reference's real fixtures validate clean (including the
OAI-PMH-wrapped one its loader unwraps), and deliberately-broken variants
trip exactly the targeted rule.
"""

from __future__ import annotations

import os
import re

import pytest

from ocrd_odem_spark.metsparse import mets_validation, validate_mets_schema

RES = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixtures not available"
)


def _read(name: str) -> str:
    with open(os.path.join(RES, name), encoding="utf-8") as fh:
        return fh.read()


CLEAN_FIXTURES = [
    "1981185920_33908.xml",   # OAI-PMH envelope around mets:mets
    "sbb-PPN891267093.xml",
    "1981185920_42296.xml",
]


# the reference's PRODUCTION profile: worker ini ignore list
# (resources/odem.worker-example.ini) — rules its own corpus trips by design
# (ULB uses fileGrp USE=MAX, not DEFAULT; dateIssued often absent)
WORKER_IGNORES = ("structMapLogical_22", "fileSec_02", "originInfo_06")

# the ULB "Rahbar" pattern (reference test docstring,
# test_odem_processing_mets.py:336-349): a DMDPHYS dmdSec holding only a
# shelfLocator, linked from the physical sequence — real DDB validation
# flags it and so do we
_RAHBAR = {"dmdSec_04", "location_01", "titleInfo_02"}


@pytest.mark.parametrize("name", CLEAN_FIXTURES)
def test_real_fixtures_validate_clean(name):
    """Clean at the reference's DEFAULT gate (ddb_min_level=fatal): the
    structural xsd.* rules stay silent and every DDB finding is at most
    'error' and within the documented production patterns."""
    ok, findings = validate_mets_schema(_read(name))
    assert ok, findings
    ids = {f["rule_id"] for f in findings}
    assert not any(i.startswith("xsd.") for i in ids), findings
    assert ids <= (_RAHBAR | set(WORKER_IGNORES)), findings
    assert all(f["level"] != "fatal" for f in findings)


def test_ddb_rule_parity_37167():
    """Rule-id parity with the reference's own DDB test matrix
    (test_odem_processing_mets.py:336-384): the _02 fixture fails at
    min_level=warn with EXACTLY titleInfo_02 + relatedItem_04 +
    location_01 + dmdSec_04 under the production ignore list; the fixed
    _03 fixture passes the same gate with zero findings."""
    ok, findings = validate_mets_schema(
        _read("1981185920_37167_02.xml"),
        ddb_ignores=WORKER_IGNORES, ddb_min_level="warn",
    )
    assert not ok
    assert {f["rule_id"] for f in findings} == {
        "titleInfo_02", "relatedItem_04", "location_01", "dmdSec_04"
    }
    ok3, findings3 = validate_mets_schema(
        _read("1981185920_37167_03.xml"),
        ddb_ignores=WORKER_IGNORES, ddb_min_level="warn",
    )
    assert ok3 and findings3 == []


def test_ddb_rule_variants_each_flagged():
    """Each broken variant of the clean _03 fixture trips exactly its
    reference rule id (the verdict's rule-level parity matrix)."""
    raw = _read("1981185920_37167_03.xml")

    def ids(payload, **kw):
        _ok, fs = validate_mets_schema(payload, ddb_ignores=WORKER_IGNORES, **kw)
        return {f["rule_id"] for f in fs}

    base = ids(raw)
    assert base == set()

    assert ids(raw.replace('<mods:relatedItem type="series">',
                           "<mods:relatedItem>")) == {"relatedItem_04"}
    assert ids(raw.replace(
        "<mods:physicalLocation>Universitäts- und Landesbibliothek "
        "Sachsen-Anhalt</mods:physicalLocation>", "")) == {"location_01"}
    # retype a logical div outside the DDB vocabulary
    assert ids(raw.replace('TYPE="monograph"', 'TYPE="monographie"')) == {
        "structMapLogical_17"
    }
    # un-ignore the production rules: USE=MAX only -> fileSec_02;
    # no dateIssued -> originInfo_06
    _ok, fs = validate_mets_schema(raw.replace('USE="DEFAULT"', 'USE="MAXI"'))
    assert "fileSec_02" in {f["rule_id"] for f in fs}
    nodate = re.sub(r"<mods:dateIssued[^>]*>[^<]*</mods:dateIssued>", "", raw)
    _ok, fs = validate_mets_schema(nodate)
    got = {f["rule_id"]: f["level"] for f in fs}
    assert got.get("originInfo_06") == "warn"


def test_missing_logical_structmap_is_fatal():
    broken = _read("sbb-PPN891267093.xml").replace(
        'TYPE="LOGICAL"', 'TYPE="LOGICAL_GONE"'
    )
    ok, findings = validate_mets_schema(broken)
    assert not ok
    hits = [(f["rule_id"], f["level"]) for f in findings]
    assert ("xsd.structmap.logical", "fatal") in hits
    # losing the LOGICAL map cascades: every dmdSec is now unreferenced
    assert ("dmdSec_04", "error") in hits


def test_missing_identifier_fatal_and_ignorable():
    raw = _read("sbb-PPN891267093.xml")
    no_id = re.sub(
        r"<mods:recordIdentifier[^>]*>[^<]*</mods:recordIdentifier>", "", raw
    )
    no_id = re.sub(r"<mods:identifier[^>]*>[^<]*</mods:identifier>", "", no_id)
    ok, findings = validate_mets_schema(no_id)
    assert not ok
    assert findings[0]["rule_id"] == "ddb.identifier"
    # validate_metadata's ddb_validation_ignore list waives specific rules
    ok_ign, findings_ign = validate_mets_schema(
        no_id, ddb_ignores=("ddb.identifier",)
    )
    assert ok_ign and findings_ign == []


def test_min_level_gate():
    """warn findings never alert at the default fatal gate, but do at warn
    (the reference's ddb_min_level dial)."""
    raw = _read("sbb-PPN891267093.xml")
    no_lang = re.sub(
        r"<mods:languageTerm[^>]*>[^<]*</mods:languageTerm>", "", raw
    )
    ok, findings = validate_mets_schema(no_lang)
    assert ok  # warn < fatal
    assert [(f["rule_id"], f["level"]) for f in findings] == [
        ("ddb.language", "warn")
    ]
    ok_strict, _ = validate_mets_schema(no_lang, ddb_min_level="warn")
    assert not ok_strict


def test_malformed_payload_is_data_not_exception():
    ok, findings = validate_mets_schema("<mets:mets")
    assert not ok
    assert findings == [
        {"rule_id": "xsd.parse", "level": "fatal",
         "message": findings[0]["message"]}
    ]


def test_dangling_fptr_detected():
    raw = _read("sbb-PPN891267093.xml")
    broken = raw.replace('FILEID="', 'FILEID="GONE_', 1)
    ok, findings = validate_mets_schema(broken)
    assert ok  # error level does not alert at the default fatal gate
    assert "xsd.fptr.fileid" in {f["rule_id"] for f in findings}


def test_spark_validation_stage(spark):
    """mets_validation: clean doc emits no rows; broken docs one row per
    finding — the error channel shape a quarantine sink consumes."""
    raw = _read("sbb-PPN891267093.xml")
    rows = [
        ("clean", raw),
        ("no_logical", raw.replace('TYPE="LOGICAL"', 'TYPE="LOGICAL_GONE"')),
        ("malformed", "<mets:mets"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, mets_xml string").coalesce(1)
    got = mets_validation(df).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["rule_id"], r["level"]))
    assert "clean" not in by_doc
    # dropping the LOGICAL structMap also orphans every dmdSec (dmdSec_04)
    # and may cascade further; the fatal structural finding leads
    assert ("xsd.structmap.logical", "fatal") in by_doc["no_logical"]
    assert by_doc["malformed"] == [("xsd.parse", "fatal")]


def test_round5_profile_rules_clean_and_broken_pairs():
    """Round-5 breadth rules (structMapPhysical_01, fileSec_01,
    structLink_01, amdSec_04): the clean reference fixture passes each;
    the element-stripped variant trips exactly the one rule.  Ids follow
    the public DDB profile's element_NN convention (provenance note in
    metsparse._ddb_profile_rules: the digiflow numbering beyond the
    reference-pinned 8 is not vendored by the reference)."""
    raw = _read("1981185920_37167_03.xml")

    def ids(payload):
        _ok, fs = validate_mets_schema(payload, ddb_ignores=WORKER_IGNORES)
        return {f["rule_id"] for f in fs}

    assert ids(raw) == set()

    # strip the PHYSICAL structMap -> structMapPhysical_01 (plus the
    # now-dangling logical links lose their physical side: the leaf-link
    # rule is production-ignored, so only the physical rule fires)
    no_phys = re.sub(
        r'<mets:structMap TYPE="PHYSICAL">.*?</mets:structMap>',
        "", raw, flags=re.S,
    )
    assert "structMapPhysical_01" in ids(no_phys)

    # strip the fileSec -> fileSec_01 (fileSec_02 DEFAULT-group rule is
    # subsumed but production-ignored here anyway)
    no_files = re.sub(r"<mets:fileSec>.*?</mets:fileSec>", "", raw, flags=re.S)
    got = ids(no_files)
    assert "fileSec_01" in got

    # strip the structLink while keeping both maps -> structLink_01
    no_links = re.sub(
        r"<mets:structLink>.*?</mets:structLink>", "", raw, flags=re.S
    )
    assert "structLink_01" in ids(no_links)

    # strip the license statement -> amdSec_04
    no_rights = re.sub(r"<dv:license>[^<]*</dv:license>", "", raw)
    no_rights = re.sub(
        r"<mods:accessCondition[^>]*>[^<]*</mods:accessCondition>", "",
        no_rights,
    )
    # self-closing accessCondition with only attributes still counts as a
    # statement when it carries an xlink:href — strip those too
    no_rights = re.sub(r"<mods:accessCondition[^>]*/>", "", no_rights)
    assert "amdSec_04" in ids(no_rights)

    # every new rule is individually ignorable, like the pinned ones
    _ok, fs = validate_mets_schema(
        no_rights, ddb_ignores=WORKER_IGNORES + ("amdSec_04",)
    )
    assert "amdSec_04" not in {f["rule_id"] for f in fs}
