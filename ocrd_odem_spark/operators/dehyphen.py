"""De-hyphenation (word-wrap merge) as a JVM-side sequential fold (T4).

The reference merges wrapped words with a Python loop that MUTATES the list
it iterates (``lib/odem/ocr/ocr_pipeline.py:425-447``): when line *i* ends in
'-', it steals the first token of line *i+1* before that line is visited, and
a '-'-terminated line whose successor is empty vanishes entirely.

That loop is a left fold with one bit of carried state — "did the previous
line take my first token?" — because (a) a line only ever donates its first
token to its immediate predecessor, and (b) the donation happens before the
donor is visited.  We therefore express it as ``F.aggregate`` over the
document's span array: sequential *within* a row, embarrassingly parallel
*across* rows, fully inside whole-stage codegen.  No shuffle, no Python, no
``applyInPandas`` — the classic alternative (window ``lead`` + second
correction pass) cannot express donation chains, and a grouped pandas UDF
would pay an Arrow round-trip per document.

Page boundaries (media spans / media_ref changes) terminate merge chains,
matching the reference's per-page invocation (``textlines2data`` receives one
page's lines).

SCALE NOTE: the fold's array-append accumulator copies the output array each
step — O(n²) per document.  ``dehyphenate_spans`` therefore dispatches:
documents over 512 spans without chain-prone lines (single-token lines
ending '-', whose donation can change their own ending) take a LINEAR
zip-based tier; a 45k-span book dropped from ~4 minutes to seconds.  Truly
chain-y oversized documents still pay the exact fold — route those through
``mode="arrow"`` extraction or ``operators.salting.salt_oversized`` (both
proven byte-identical).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_SPAN_T = "struct<kind:string,text:string,media_ref:string,offset:int>"


def _enrich(span: Column) -> Column:
    """Attach whitespace-token decomposition used by the fold."""
    toks = F.filter(F.split(F.trim(span["text"]), r"\s+"), lambda x: x != "")
    return F.struct(
        span["kind"].alias("kind"),
        span["text"].alias("text"),
        span["media_ref"].alias("media_ref"),
        span["offset"].alias("offset"),
        F.get(toks, 0).alias("first_tok"),
        F.array_join(
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))), " "
        ).alias("rest"),
    )


def dehyphenate_spans(spans: Column) -> Column:
    """Wrap-merge a document's span array; returns
    ``struct<spans: array<span>, n_merges: int>``.

    Two-tier dispatch: the sequential state only propagates through
    "chain-prone" lines — single-token lines ending in '-' (they can donate
    their ONLY token, changing whether they still end in '-').  Documents
    without such lines (the overwhelming majority) take a LINEAR zip-based
    formulation; only chain-y documents pay the exact O(n²) fold.  Both
    tiers are proven equal in tests (and both equal the Python oracle).
    """
    chain_prone = F.exists(
        spans,
        lambda s: (s["kind"] == "text")
        & F.endswith(s["text"], F.lit("-"))
        & (
            F.size(F.filter(F.split(F.trim(s["text"]), r"\s+"), lambda x: x != ""))
            <= 1
        ),
    )
    # size gate first (O(1)): normal documents take the fold directly (it is
    # FASTER than the zip machinery at small n — measured 7.4s vs 9.9s over
    # the bench corpus); only oversized documents pay the O(n) chain check,
    # and of those only the chain-y ones pay the O(n²) fold.
    return F.when(
        F.size(spans) <= F.lit(512), _dehyphenate_fold(spans)
    ).otherwise(
        F.when(chain_prone, _dehyphenate_fold(spans)).otherwise(
            _dehyphenate_linear(spans)
        )
    )


def _dehyphenate_linear(spans: Column) -> Column:
    """Linear tier: with no chain-prone lines, whether line *i* lost its
    first token never changes whether it ends in '-', so every decision is
    a pure function of (previous, current, next) original spans."""
    enriched = F.transform(spans, _enrich)
    n = F.size(enriched)
    null_span = F.lit(None).cast(
        "struct<kind:string,text:string,media_ref:string,offset:int,"
        "first_tok:string,rest:string>"
    )
    prevs = F.concat(F.array(null_span), F.slice(enriched, 1, F.greatest(n - 1, F.lit(0))))
    nexts = F.concat(F.slice(enriched, 2, F.greatest(n - 1, F.lit(0))), F.array(null_span))
    trips = F.zip_with(
        F.zip_with(enriched, prevs, lambda c, p: F.struct(c.alias("cur"), p.alias("prv"))),
        nexts,
        lambda cp, x: F.struct(cp["cur"].alias("cur"), cp["prv"].alias("prv"), x.alias("nxt")),
    )

    def donated_to(prv: Column, cur: Column) -> Column:
        """prv (same-page text line ending '-') merged, taking cur's first token."""
        return (
            prv.isNotNull()
            & (prv["kind"] == "text")
            & (cur["kind"] == "text")
            & (prv["media_ref"] == cur["media_ref"])
            & F.endswith(prv["text"], F.lit("-"))
            & (F.trim(cur["text"]) != "")
        )

    def build(t: Column) -> Column:
        cur, prv, nxt = t["cur"], t["prv"], t["nxt"]
        is_text = cur["kind"] == "text"
        took = donated_to(prv, cur)
        eff = F.when(took, cur["rest"]).otherwise(cur["text"])
        next_same = (
            nxt.isNotNull()
            & (nxt["kind"] == "text")
            & (nxt["media_ref"] == cur["media_ref"])
        )
        merge_scope = is_text & next_same & F.endswith(cur["text"], F.lit("-"))
        dropped = merge_scope & (F.trim(nxt["text"]) == "")
        merged = F.concat(F.substr(eff, F.lit(1), F.length(eff) - 1), nxt["first_tok"])
        text_out = F.when(merge_scope & ~dropped, merged).otherwise(eff)
        span = F.struct(
            cur["kind"].alias("kind"),
            F.when(is_text, text_out).otherwise(cur["text"]).alias("text"),
            cur["media_ref"].alias("media_ref"),
            cur["offset"].alias("offset"),
        )
        return F.when(dropped, F.array().cast(f"array<{_SPAN_T}>")).otherwise(
            F.array(span)
        )

    out = F.flatten(F.transform(trips, build))
    n_merges = F.size(
        F.filter(
            trips,
            lambda t: (t["cur"]["kind"] == "text")
            & t["nxt"].isNotNull()
            & (t["nxt"]["kind"] == "text")
            & (t["nxt"]["media_ref"] == t["cur"]["media_ref"])
            & F.endswith(t["cur"]["text"], F.lit("-"))
            & (F.trim(t["nxt"]["text"]) != ""),
        )
    )
    return F.struct(out.alias("spans"), n_merges.alias("n_merges"))


def _dehyphenate_fold(spans: Column) -> Column:
    """Exact sequential fold (chain-correct for any input)."""
    enriched = F.transform(spans, _enrich)
    n = F.size(enriched)
    successors = F.concat(
        F.slice(enriched, 2, F.greatest(n - 1, F.lit(0))),
        F.array(F.lit(None).cast(
            "struct<kind:string,text:string,media_ref:string,offset:int,"
            "first_tok:string,rest:string>"
        )),
    )
    # zip_with pads the shorter side with nulls: an empty document would
    # otherwise yield one (cur=null, nxt=null) pair and a phantom output span
    pairs = F.filter(
        F.zip_with(
            enriched,
            successors,
            lambda c, x: F.struct(c.alias("cur"), x.alias("nxt")),
        ),
        lambda p: p["cur"].isNotNull(),
    )

    init = F.struct(
        F.array().cast(f"array<{_SPAN_T}>").alias("out"),
        F.lit(False).alias("took"),
        F.lit(0).alias("n_merges"),
    )

    def step(acc: Column, p: Column) -> Column:
        cur, nxt = p["cur"], p["nxt"]
        eff = F.when(acc["took"], cur["rest"]).otherwise(cur["text"])
        merge_scope = (
            (cur["kind"] == "text")
            & nxt.isNotNull()
            & (nxt["kind"] == "text")
            & (nxt["media_ref"] == cur["media_ref"])
            & F.endswith(eff, F.lit("-"))
        )
        merged_text = F.concat(
            F.substr(eff, F.lit(1), F.length(eff) - 1), nxt["first_tok"]
        )
        span_of = lambda text: F.struct(  # noqa: E731
            cur["kind"].alias("kind"),
            text.alias("text"),
            cur["media_ref"].alias("media_ref"),
            cur["offset"].alias("offset"),
        )
        return (
            F.when(
                merge_scope & (F.trim(nxt["text"]) == ""),
                # no merge possible — reference drops this line outright
                F.struct(
                    acc["out"].alias("out"),
                    F.lit(False).alias("took"),
                    acc["n_merges"].alias("n_merges"),
                ),
            )
            .when(
                merge_scope,
                F.struct(
                    F.concat(acc["out"], F.array(span_of(merged_text))).alias("out"),
                    F.lit(True).alias("took"),
                    (acc["n_merges"] + 1).alias("n_merges"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(span_of(eff))).alias("out"),
                    F.lit(False).alias("took"),
                    acc["n_merges"].alias("n_merges"),
                )
            )
        )

    return F.aggregate(
        pairs,
        init,
        step,
        lambda acc: F.struct(
            acc["out"].alias("spans"), acc["n_merges"].alias("n_merges")
        ),
    )
