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
documents over 512 spans take the MARKS tier (pass 1 folds one decision
byte per line, pass 2 rebuilds spans linearly — exact for any donation
chain); a chain-y 45k-span book dropped from ~4 minutes to seconds.  Small
documents keep the plain fold, which is fastest at small n.  Both tiers are
proven byte-equal to each other and to the Python oracle in tests.
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

    Two-tier dispatch by size: small documents take the exact fold (fastest
    at small n); oversized documents take the marks tier — the same
    recurrence with linear array work, exact for any donation chain.  Both
    tiers are proven equal in tests (and both equal the Python oracle).
    """
    # size gate (O(1)): normal documents take the fold directly (fastest at
    # small n — the marks tier's extra zip/split machinery costs ~18% there);
    # every oversized document takes the marks tier, which is exact for ANY
    # chain shape at linear array cost — no chain probing, no caller opt-in
    # (VERDICT r1 item 6).
    return F.when(
        F.size(spans) <= F.lit(512), _dehyphenate_fold(spans)
    ).otherwise(_dehyphenate_marks(spans))


def _paired(spans: Column) -> Column:
    """(cur, nxt) pairs of enriched spans (nxt null for the last)."""
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
    return F.filter(
        F.zip_with(
            enriched,
            successors,
            lambda c, x: F.struct(c.alias("cur"), x.alias("nxt")),
        ),
        lambda p: p["cur"].isNotNull(),
    )


def _merge_scope(eff: Column, cur: Column, nxt: Column) -> Column:
    return (
        (cur["kind"] == "text")
        & nxt.isNotNull()
        & (nxt["kind"] == "text")
        & (nxt["media_ref"] == cur["media_ref"])
        & F.endswith(eff, F.lit("-"))
    )


def _let(value: Column, body) -> Column:
    """Let-binding for expensive subexpressions: HOFs run interpreted with
    NO common-subexpression elimination, so every REFERENCE to an
    expression re-evaluates it.  ``transform`` over a single-element array
    evaluates ``value`` exactly once and hands it to ``body`` as a cheap
    lambda variable."""
    return F.get(F.transform(F.array(value), body), 0)


_MARKS_CHUNK = 512


def _chunked_marks_fold(pairs: Column, step) -> Column:
    """Linear-byte pass 1 over any marks-fold ``step``.

    The plain fold's string accumulator copies ~n²/2 bytes.  Since the
    carried state is ONE BIT (``took``), each ``_MARKS_CHUNK``-pair window
    can be folded for BOTH possible entry states independently (byte cost
    per chunk is bounded by the chunk size), and a chunk-level fold then
    selects the right variant per window from the carried exit state —
    appending one STRING POINTER per chunk, not one char per pair.  Total
    byte traffic is O(n · chunk) for the speculative folds plus
    O((n/chunk)²) pointers for the selection, i.e. linear in n for any
    realistic document.  ``step`` must take/return the
    ``struct<marks,took,n_merges>`` accumulator (built with named_struct —
    plain aliases are stripped inside nested lambdas).
    """
    n = F.size(pairs)
    n_chunks = F.ceil(n / F.lit(float(_MARKS_CHUNK))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda c: F.slice(pairs, c * _MARKS_CHUNK + 1, _MARKS_CHUNK),
    )

    def fold_from(ch: Column, entry: Column) -> Column:
        init = F.named_struct(
            F.lit("marks"), F.lit(""),
            F.lit("took"), entry,
            F.lit("n_merges"), F.lit(0),
        )
        return F.aggregate(ch, init, step)

    per_chunk = F.transform(
        chunks,
        lambda ch: F.named_struct(
            F.lit("f"), fold_from(ch, F.lit(False)),
            F.lit("t"), fold_from(ch, F.lit(True)),
        ),
    )
    init2 = F.named_struct(
        F.lit("sel"), F.array().cast("array<string>"),
        F.lit("took"), F.lit(False),
        F.lit("n_merges"), F.lit(0),
    )

    def step2(acc: Column, pc: Column) -> Column:
        v = F.when(acc["took"], pc["t"]).otherwise(pc["f"])
        return F.named_struct(
            F.lit("sel"), F.concat(acc["sel"], F.array(v["marks"])),
            F.lit("took"), v["took"],
            F.lit("n_merges"), acc["n_merges"] + v["n_merges"],
        )

    return F.aggregate(
        per_chunk, init2, step2,
        lambda acc: F.named_struct(
            F.lit("marks"), F.array_join(acc["sel"], ""),
            F.lit("n_merges"), acc["n_merges"],
        ),
    )


def _dehyphenate_marks(spans: Column) -> Column:
    """Exact chain-correct tier with LINEAR array work.

    The O(n²) in the fold is the immutable output-array copy per step, not
    the state recurrence.  Pass 1 folds only O(1) state plus one decision
    CHARACTER per line ('m' merged / 'd' dropped / 'k' kept), chunk-
    speculatively so even the marks-string bytes stay linear (see
    ``_chunked_marks_fold``); pass 2 is a pure ``transform`` that rebuilds
    each span from its mark and its predecessor's mark.  A chain-y
    45k-span book runs in seconds instead of minutes, byte-equal to the
    fold and the Python oracle (tested).

    The pairs array and the pass-1 fold are each evaluated exactly ONCE via
    ``_let`` — naive multi-reference cost 4-5 fold evaluations per row and
    ran 4.5x slower than the fold on ordinary documents."""

    def with_pairs(pairs: Column) -> Column:
        def step(acc: Column, p: Column) -> Column:
            cur, nxt = p["cur"], p["nxt"]
            eff = F.when(acc["took"], cur["rest"]).otherwise(cur["text"])
            scope = _merge_scope(eff, cur, nxt)
            mark = (
                F.when(scope & (F.trim(nxt["text"]) == ""), F.lit("d"))
                .when(scope, F.lit("m"))
                .otherwise(F.lit("k"))
            )
            return F.named_struct(
                F.lit("marks"), F.concat(acc["marks"], mark),
                F.lit("took"), mark == "m",
                F.lit("n_merges"), acc["n_merges"] + (mark == "m").cast("int"),
            )

        fold = _chunked_marks_fold(pairs, step)

        def with_fold(fs: Column) -> Column:
            marks_arr = F.slice(F.split(fs["marks"], ""), 1, F.size(pairs))
            prev_arr = F.concat(
                F.array(F.lit("k")),
                F.slice(
                    F.split(fs["marks"], ""), 1,
                    F.greatest(F.size(pairs) - 1, F.lit(0)),
                ),
            )
            zipped = F.zip_with(
                pairs, marks_arr,
                lambda p, m: F.struct(p.alias("p"), m.alias("mark")),
            )
            trips = F.zip_with(
                zipped,
                prev_arr,
                lambda z, pm: F.struct(
                    z["p"].alias("p"), z["mark"].alias("mark"),
                    pm.alias("prev_mark"),
                ),
            )

            def build(t: Column) -> Column:
                cur, nxt = t["p"]["cur"], t["p"]["nxt"]
                took = t["prev_mark"] == "m"
                eff = F.when(took, cur["rest"]).otherwise(cur["text"])
                merged = F.concat(
                    F.substr(eff, F.lit(1), F.length(eff) - 1), nxt["first_tok"]
                )
                span = F.struct(
                    cur["kind"].alias("kind"),
                    F.when(t["mark"] == "m", merged).otherwise(eff).alias("text"),
                    cur["media_ref"].alias("media_ref"),
                    cur["offset"].alias("offset"),
                )
                return F.when(
                    (t["mark"] == "d") | cur.isNull(),
                    F.array().cast(f"array<{_SPAN_T}>"),
                ).otherwise(F.array(span))

            out = F.flatten(F.transform(trips, build))
            return F.struct(
                out.alias("spans"), fs["n_merges"].alias("n_merges")
            )

        return _let(fold, with_fold)

    return _let(_paired(spans), with_pairs)


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
