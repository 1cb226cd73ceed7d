"""OAI-PMH harvest parse layer (S2) — envelope shredding + record lists.

The reference ingests via digiflow's ``OAILoader``: an HTTP GetRecord per
claimed identifier, whose OAI envelope is unwrapped to the METS payload
(``lib/odem/odem_process_impl.py:83-113``), driven by a record-list file
with fields ``IDENTIFIER, SETSPEC, CREATED, INFO, STATE, STATE_TIME``
(``cli_record_local.py:106-112``, ``lib/odem/commons.py:108-113``).

The TRANSPORT stays out of scope in this sandbox (no network); everything
after the bytes arrive is implemented and tested here:

* ``parse_oai_envelope``  — one OAI-PMH response document (GetRecord or a
  ListRecords page) -> header fields, deleted-status, the embedded METS
  payload re-serialized as a standalone document, the resumptionToken,
  and OAI protocol errors AS DATA (badArgument / idDoesNotExist / ... are
  per-record rows, never task failures).
* ``oai_records``          — Arrow-batched Spark stage shredding a table
  of stored response payloads ``(source, oai_xml)`` into the record
  table the claim/extract path consumes.  At harvest scale this is the
  same pattern as the METS/ALTO shredders: bytes move executor -> Python
  once per batch.
* ``parse_record_list``    — the reference's delimited record-file format
  -> typed rows (the S1 claim input).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

_OAI = "{http://www.openarchives.org/OAI/2.0/}"
_METS_TAG = "{http://www.loc.gov/METS/}mets"

RECORD_FIELDS = ("IDENTIFIER", "SETSPEC", "CREATED", "INFO", "STATE", "STATE_TIME")

OAI_RECORD_OUT = (
    "identifier string, datestamp string, set_specs array<string>, "
    "deleted boolean, mets_xml string, resumption_token string, "
    "oai_error string"
)


def parse_oai_envelope(payload: bytes | str) -> list[dict]:
    """Shred one OAI-PMH response into record dicts (OAI_RECORD_OUT shape).

    GetRecord yields one row; a ListRecords page yields one per record,
    each carrying the page's resumptionToken (empty-token final pages
    yield None).  An ``<error>`` response yields a single row with only
    ``oai_error`` set (``code: text``).  Malformed XML yields one row
    with ``oai_error='parse: ...'`` — ingest errors are data.
    """
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as exc:
        return [_row(oai_error=f"parse: {exc}")]

    err = next(root.iter(f"{_OAI}error"), None)
    if err is not None:
        code = err.get("code") or "unknown"
        return [_row(oai_error=f"{code}: {(err.text or '').strip()}")]

    token_el = next(root.iter(f"{_OAI}resumptionToken"), None)
    token = None
    if token_el is not None and (token_el.text or "").strip():
        token = token_el.text.strip()

    rows = []
    for rec in root.iter(f"{_OAI}record"):
        header = rec.find(f"{_OAI}header")
        ident = ds = None
        sets: list[str] = []
        deleted = False
        if header is not None:
            deleted = header.get("status") == "deleted"
            ident_el = header.find(f"{_OAI}identifier")
            ds_el = header.find(f"{_OAI}datestamp")
            ident = (ident_el.text or "").strip() if ident_el is not None else None
            ds = (ds_el.text or "").strip() if ds_el is not None else None
            sets = [
                (s.text or "").strip()
                for s in header.findall(f"{_OAI}setSpec")
                if (s.text or "").strip()
            ]
        mets_xml = None
        meta = rec.find(f"{_OAI}metadata")
        if meta is not None:
            mets_el = next(meta.iter(_METS_TAG), None)
            if mets_el is not None:
                # standalone re-serialization — the downstream METS shredder
                # takes this exactly like a directly-fetched METS file
                mets_xml = ET.tostring(mets_el, encoding="unicode")
        rows.append(
            _row(
                identifier=ident, datestamp=ds, set_specs=sets,
                deleted=deleted, mets_xml=mets_xml, resumption_token=token,
            )
        )
    if not rows:
        return [_row(oai_error="noRecordsMatch: response carries no records",
                     resumption_token=token)]
    return rows


def _row(identifier=None, datestamp=None, set_specs=None, deleted=False,
         mets_xml=None, resumption_token=None, oai_error=None) -> dict:
    return {
        "identifier": identifier,
        "datestamp": datestamp,
        "set_specs": set_specs or [],
        "deleted": deleted,
        "mets_xml": mets_xml,
        "resumption_token": resumption_token,
        "oai_error": oai_error,
    }


def oai_records(df, payload_col: str = "oai_xml", source_col: str = "source"):
    """Spark stage: (source, oai_xml) -> one row per harvested record
    (``source`` prepended to OAI_RECORD_OUT)."""
    import pandas as pd

    schema = f"{source_col} string, " + OAI_RECORD_OUT

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [source_col, "identifier", "datestamp", "set_specs",
                "deleted", "mets_xml", "resumption_token", "oai_error"]
        for pdf in batches:
            out = []
            for src, xml in zip(pdf[source_col], pdf[payload_col]):
                for row in parse_oai_envelope(xml or b""):
                    out.append((src, *[row[c] for c in cols[1:]]))
            yield pd.DataFrame(out, columns=cols)

    return df.select(source_col, payload_col).mapInPandas(run, schema=schema)


def parse_record_list(text: str, delimiter: str = "\t") -> list[dict]:
    """The reference's record-file format: a header row naming a subset of
    ``RECORD_FIELDS`` followed by one delimited row per record.  Unknown
    header fields are preserved; missing trailing fields read as ''."""
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines:
        return []
    header = [h.strip() for h in lines[0].split(delimiter)]
    rows = []
    for ln in lines[1:]:
        vals = [v.strip() for v in ln.split(delimiter)]
        vals += [""] * (len(header) - len(vals))
        rows.append(dict(zip(header, vals)))
    return rows
