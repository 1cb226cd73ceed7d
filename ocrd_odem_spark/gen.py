"""Deterministic synthetic corpus generator for the interleaved span table.

Produces documents of the authoritative input shape
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)`` with
the content features the reference semantics exercise (FIXTURES.md §1):
hyphenated line wraps, punctuation-only tokens, 1-char tokens, empty lines,
trailing punctuation, long-s / combining-e / quote sprinkles, ``J[cdhmn]``
words, RTL-marked docs, zero-content pages and oversized skew docs.

Everything is a pure function of ``(seed, doc_index, page_index,
line_index)`` via a dedicated ``random.Random`` instance per document — no
global state, no wall clock. The same arguments always produce the same
corpus, on the driver or on any executor.
"""

from __future__ import annotations

import random

from .constants import KIND_MEDIA, KIND_TEXT

_WORDS = (
    "und der die das von mit auf nicht eine sich auch nach wird sind einem "
    "einer durch oder wenn aber alle wie noch vor zum zur über unter gegen "
    "Stadt Land Kirche Haus Wasser Himmel Erde Krieg Friede Herr Frau Kind "
    "Buch Seite Wort Jahr Tag Nacht Licht Werk Volk Reich Stand Teil Hand "
    "gedruckt verlegt geschrieben gelesen gefunden verloren gegeben genommen"
).split()

_GLYPH_WORDS = [
    "Waſſer",  # long s
    "Gluͤck",  # combining small e on u
    "Jch",
    "Jn",
    "Jndeß",
    "„Anfang“",
    "Hoͤhe",
    "ſehen",
]

_PUNCT_ONLY = ["...", "—", "⸗", "!!", "???", ".,;"]
_TRAILING = [".", ",", ";", ":", "!", "?", "—", "⸗"]
_RTL_MARK = "‏"


def _line_tokens(rng: random.Random) -> list[str]:
    n = rng.randint(3, 9)
    toks = [rng.choice(_WORDS) for _ in range(n)]
    if rng.random() < 0.15:
        toks[rng.randrange(n)] = rng.choice(_GLYPH_WORDS)
    return toks


def make_line(rng: random.Random, rtl: bool = False) -> str:
    """One synthetic OCR text line (single-spaced tokens)."""
    roll = rng.random()
    if roll < 0.03:
        return ""  # empty line -> cascade deletion
    toks = _line_tokens(rng)
    if roll < 0.08:
        toks.insert(rng.randrange(len(toks)), rng.choice(_PUNCT_ONLY))
    if rng.random() < 0.20:
        toks[-1] = toks[-1] + rng.choice(_TRAILING)
    if rng.random() < 0.05:
        toks.insert(rng.randrange(len(toks)), rng.choice("abcdefgX"))
    if rng.random() < 0.04:
        # short-after-split case: "A." -> "." survives alone
        toks.append(rng.choice("ABCDE") + ".")
    if rtl:
        toks = [_RTL_MARK + t if rng.random() < 0.3 else t for t in toks]
    line = " ".join(toks)
    if rng.random() < 0.10 and not line.endswith("-"):
        line += "-"  # hyphen wrap -> de-hyphenation merge with next line
    return line


def make_document(seed: int, doc_index: int, n_pages: int | None = None) -> dict:
    """One document row ``{doc_id, spans}`` — pure function of its args."""
    rng = random.Random((seed << 20) ^ doc_index)
    doc_id = f"oai+synth_{seed}_{doc_index:06d}"
    rtl = rng.random() < 0.02
    if n_pages is None:
        n_pages = rng.randint(3, 12)
    spans: list[dict] = []
    offset = 0
    for page in range(n_pages):
        media_ref = f"{page + 1:08d}"
        spans.append(
            {"kind": KIND_MEDIA, "text": "", "media_ref": media_ref, "offset": offset}
        )
        offset += 1
        if rng.random() < 0.02:
            continue  # zero-content page
        for _ in range(rng.randint(4, 18)):
            spans.append(
                {
                    "kind": KIND_TEXT,
                    "text": make_line(rng, rtl),
                    "media_ref": media_ref,
                    "offset": offset,
                }
            )
            offset += 1
    return {"doc_id": doc_id, "spans": spans}


def make_corpus(
    seed: int, n_docs: int, oversized_every: int = 0, oversized_pages: int = 1200
) -> list[dict]:
    """A corpus of n_docs documents; optionally every k-th doc is an
    oversized "book" (skew exercise, reference scale limit ~500 pages)."""
    docs = []
    for i in range(n_docs):
        pages = None
        if oversized_every and i % oversized_every == oversized_every - 1:
            pages = oversized_pages
        docs.append(make_document(seed, i, n_pages=pages))
    return docs


def make_page_meta(seed: int, docs: list[dict]) -> list[dict]:
    """Page metadata rows with ~15% blacklisted pages (labels/log types)."""
    rows = []
    for doc_index, doc in enumerate(docs):
        rng = random.Random((seed << 21) ^ doc_index)
        refs = [s["media_ref"] for s in doc["spans"] if s["kind"] == KIND_MEDIA]
        for idx, ref in enumerate(refs):
            roll = rng.random()
            label = f"[Seite {idx + 1}]"
            log_types = ["chapter"] if idx else ["title_page"]
            if roll < 0.05:
                label = rng.choice(["[Colorchecker]", "[Leerseite]"])
            elif roll < 0.15:
                log_types = [rng.choice(["cover_front", "cover_back", "spine"])]
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "media_ref": ref,
                    "phys_id": f"PHYS_{idx + 1:04d}",
                    "label": label,
                    "log_types": log_types,
                }
            )
    return rows


def make_doc_meta(seed: int, docs: list[dict]) -> list[dict]:
    """Document metadata rows; ~12% fail the type/PICA relevance filter."""
    types_ok = ["monograph", "volume", "issue", "additional"]
    types_bad = ["newspaper_year", "newspaper_day", "periodical"]
    pica_ok = ["Aa", "Af", "AF", "AZ", "AB"]
    pica_bad = ["Ax", "Ay"]
    rows = []
    for i, doc in enumerate(docs):
        rng = random.Random((seed << 22) ^ i)
        bad = rng.random() < 0.12
        rows.append(
            {
                "doc_id": doc["doc_id"],
                "mets_type": rng.choice(types_bad if bad else types_ok),
                "pica_type": rng.choice(pica_bad if bad and rng.random() < 0.5 else pica_ok),
                "identifiers": {
                    "gvk-ppn": f"{58134000 + i}",
                    "urn": f"urn:nbn:de:synth:{seed}-{i}",
                },
                "languages": rng.choice([["ger"], ["ger", "lat"], ["ara"], ["lat"]]),
            }
        )
    return rows
