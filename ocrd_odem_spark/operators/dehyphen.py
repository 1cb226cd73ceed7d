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
step — O(n²) per document.  Negligible for normal documents (<= a few
hundred spans) but quadratic on oversized books (a 45k-span document takes
minutes).  For 1000+-page documents use either (a) ``mode="arrow"``
extraction (linear; the Python loop appends in O(1)) or (b)
``operators.salting.salt_oversized`` to fold page-aligned chunks — both are
proven byte-identical to this fold.
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
    """Fold a document's extracted span array into its wrap-merged form.

    Returns ``struct<spans: array<span>, n_merges: int>`` — offsets are NOT
    re-densified here (the pipeline's final re-offset stage does that).
    """
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
