"""Geometry-aware token post-processing (T1's coordinate arithmetic).

The reference's trailing-punctuation split is not text-only: it SHRINKS the
original String's WIDTH by a per-char estimate and positions the split-off
punctuation element after it (``lib/odem/processing/ocr_files.py:120-152``):

    w_per_char = ceil(WIDTH / len(CONTENT))
    new_width  = (len(CONTENT) - 1) * w_per_char
    punct HPOS = HPOS + new_width, punct WIDTH = w_per_char

The span model carries text only (geometry consumers are rare at 100 TB
scale), so this lives as a standalone operator over token-geometry arrays:
``array<struct<text, hpos, vpos, width, height>>`` in, same shape out, with
the same drop semantics as the text-only path (fully-punctuated drop,
split-off punct survives un-reexamined, min-length drop on the remainder —
``ocr_files.py:62-91``).  Pure Catalyst expressions: no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..constants import MINIMUM_WORD_LEN, ODEM_PUNCTUATIONS

GEOM_TOKEN_T = (
    "struct<text:string,hpos:int,vpos:int,width:int,height:int>"
)


def _geom(text: Column, hpos: Column, vpos: Column, width: Column, height: Column) -> Column:
    return F.struct(
        text.alias("text"),
        hpos.cast("int").alias("hpos"),
        vpos.cast("int").alias("vpos"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
    )


def _postprocess_geom_token(t: Column) -> Column:
    """One geometry token -> array of surviving tokens with exact
    reference coordinate arithmetic."""
    text = t["text"]
    stripped = F.trim(text)
    fully_punct = F.translate(stripped, ODEM_PUNCTUATIONS, "") == ""
    last = F.substring(text, -1, 1)
    remainder = F.substr(text, F.lit(1), F.length(text) - 1)
    split_off = (F.length(text) > 1) & (F.translate(last, ODEM_PUNCTUATIONS, "") == "")

    n = F.length(text)
    w_per_char = F.ceil(t["width"] / n).cast("int")
    new_width = ((n - 1) * w_per_char).cast("int")
    rem_tok = _geom(remainder, t["hpos"], t["vpos"], new_width, t["height"])
    punct_tok = _geom(
        last, t["hpos"] + new_width, t["vpos"], w_per_char, t["height"]
    )

    empty = F.array().cast(f"array<{GEOM_TOKEN_T}>")
    return (
        F.when(fully_punct, empty)
        .when(
            split_off & (F.length(remainder) >= MINIMUM_WORD_LEN),
            F.array(rem_tok, punct_tok),
        )
        .when(split_off, F.array(punct_tok))
        # the reference's final min-length check reads the RAW attribute,
        # not the stripped text (ocr_files.py:80-91: _content is reassigned
        # unstripped after the split) — ' ν' (raw len 2) survives
        .when(F.length(text) >= MINIMUM_WORD_LEN, F.array(t))
        .otherwise(empty)
    )


def postprocess_geom_tokens(tokens: Column) -> Column:
    """Post-processed geometry-token array of one line (T1 with
    coordinates): fully-punctuated drop, trailing-punct split with width
    arithmetic, min-length drop."""
    return F.flatten(F.transform(tokens, _postprocess_geom_token))
