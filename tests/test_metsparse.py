"""METS shredding: structure joins, blacklists, identifiers — end to end."""

from __future__ import annotations

from ocrd_odem_spark import metsparse
from ocrd_odem_spark.plans import pipeline

METS = """<?xml version="1.0" encoding="UTF-8"?>
<mets:mets xmlns:mets="http://www.loc.gov/METS/"
           xmlns:mods="http://www.loc.gov/mods/v3"
           xmlns:xlink="http://www.w3.org/1999/xlink">
 <mets:dmdSec ID="DMD1"><mets:mdWrap><mets:xmlData>
  <mods:mods>
   <mods:identifier type="gvk-ppn">058134433</mods:identifier>
   <mods:identifier type="urn">urn:nbn:de:test:1-2</mods:identifier>
   <mods:language><mods:languageTerm type="code">ger</mods:languageTerm>
                  <mods:languageTerm type="code">lat</mods:languageTerm></mods:language>
   <mods:recordInfo>
     <mods:recordIdentifier source="pica">Aa</mods:recordIdentifier>
   </mods:recordInfo>
  </mods:mods>
 </mets:xmlData></mets:mdWrap></mets:dmdSec>
 <mets:fileSec>
  <mets:fileGrp USE="MAX">
   <mets:file ID="F1"><mets:FLocat xlink:href="img/00000001.jpg"/></mets:file>
   <mets:file ID="F2"><mets:FLocat xlink:href="img/00000002.jpg"/></mets:file>
   <mets:file ID="F3"><mets:FLocat xlink:href="img/00000003.jpg"/></mets:file>
  </mets:fileGrp>
  <mets:fileGrp USE="THUMBS">
   <mets:file ID="T1"><mets:FLocat xlink:href="thumb/00000001.jpg"/></mets:file>
  </mets:fileGrp>
 </mets:fileSec>
 <mets:structMap TYPE="LOGICAL">
  <mets:div ID="LOG_0001" TYPE="monograph">
   <mets:div ID="LOG_0002" TYPE="cover_front"/>
   <mets:div ID="LOG_0003" TYPE="chapter"/>
  </mets:div>
 </mets:structMap>
 <mets:structMap TYPE="PHYSICAL">
  <mets:div ID="PHYSROOT" TYPE="physSequence">
   <mets:div ID="PHYS_0001" TYPE="page" ORDERLABEL="[Cover]">
     <mets:fptr FILEID="F1"/></mets:div>
   <mets:div ID="PHYS_0002" TYPE="page" ORDERLABEL="[Seite 1]">
     <mets:fptr FILEID="F2"/></mets:div>
   <mets:div ID="PHYS_0003" TYPE="page" LABEL="[Colorchecker]">
     <mets:fptr FILEID="F3"/></mets:div>
  </mets:div>
 </mets:structMap>
 <mets:structLink>
  <mets:smLink xlink:from="LOG_0002" xlink:to="PHYS_0001"/>
  <mets:smLink xlink:from="LOG_0003" xlink:to="PHYS_0002"/>
 </mets:structLink>
</mets:mets>"""


def test_parse_mets_python():
    parsed = metsparse.parse_mets(METS)
    d = parsed["doc"]
    assert d["mets_type"] == "monograph"
    assert d["pica_type"] == "Aa"
    assert d["identifiers"]["gvk-ppn"] == "058134433"
    assert d["languages"] == ["ger", "lat"]
    pages = {p["phys_id"]: p for p in parsed["pages"]}
    assert len(pages) == 3
    assert pages["PHYS_0001"]["media_ref"] == "00000001"  # MAX group, not THUMBS
    assert pages["PHYS_0001"]["log_types"] == ["cover_front"]
    assert pages["PHYS_0002"]["log_types"] == ["chapter"]
    assert pages["PHYS_0003"]["link_error"] == "Page PHYS_0003 not linked"


def test_shred_mets_to_pipeline_filters(spark):
    df = spark.createDataFrame(
        [("ppn058134433", METS), ("broken", "<mets:mets")],
        "doc_id string, mets_xml string",
    )
    doc_meta, page_meta = metsparse.shred_mets(df)

    docs = {r["doc_id"]: r for r in doc_meta.collect()}
    assert docs["ppn058134433"]["mets_type"] == "monograph"
    assert docs["broken"]["error"] is not None

    pages = page_meta.collect()
    assert len(pages) == 3

    # feed straight into the F3/F4 blacklist aggregation: the Colorchecker
    # label and the cover_front logical type blacklist two of three pages
    bl = pipeline.blacklisted_pages(
        page_meta.select("doc_id", "media_ref", "phys_id", "label", "log_types")
    ).collect()
    assert len(bl) == 1
    assert sorted(bl[0]["_blacklisted_refs"]) == ["00000001", "00000003"]

    # and into the F1 relevance filter (monograph + pica 'Aa' passes)
    ok = pipeline.relevance_filter(
        doc_meta.where(doc_meta.error.isNull()).select(
            "doc_id", "mets_type", "pica_type", "identifiers", "languages"
        )
    ).collect()
    assert [r["doc_id"] for r in ok] == ["ppn058134433"]
