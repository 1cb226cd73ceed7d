"""Driver-facing query registry: Spark implementations + DuckDB oracles.

Every operator family from SURVEY.md §2 gets (a) a Spark callable
``(spark, sf_dir) -> DataFrame`` and (b) an equivalent ANSI-SQL string a
DuckDB oracle can run over the same parquet tables.  Column names and types
are aligned pair-by-pair (the driver hashes values after sorting columns by
name), so every computed column is explicitly aliased and cast on BOTH
sides.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import derive, pipeline
from .derive import DUCKDB, SPARK

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_VIEWS_LOADED: dict[tuple[int, str], bool] = {}


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (idempotent)."""
    key = (id(spark), sf_dir)
    if _VIEWS_LOADED.get(key):
        return
    for name in TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    _VIEWS_LOADED.clear()
    _VIEWS_LOADED[key] = True


def _sql(sql_text: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(sql_text)

    return run


def spans_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived flat spans view as a DataFrame (Spark dialect)."""
    load_views(spark, sf_dir)
    return spark.sql(
        f"WITH {derive.spans_cte(SPARK)} SELECT * FROM spans_input"
    )


def docs_nested_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived spans regrouped to the nested (doc_id, spans) contract."""
    return pipeline.from_flat(spans_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# q01 — derived spans view itself (sources S3/S4 analogue)
# ---------------------------------------------------------------------------

_Q01_SELECT = "SELECT doc_id, kind, text, media_ref, offset FROM spans_input"


def q01_spark(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(f"WITH {derive.spans_cte(SPARK)} {_Q01_SELECT}")


Q01_ORACLE = f"WITH {derive.spans_cte(DUCKDB)} {_Q01_SELECT}"


# ---------------------------------------------------------------------------
# q02 — token post-processing per line (F5/F6/T1)
# ---------------------------------------------------------------------------


def _q02_select(dialect: str) -> str:
    post = derive.postprocess_line_sql("text", dialect)
    return (
        "SELECT doc_id, media_ref, offset, "
        f"{post} AS text_out FROM spans_input WHERE kind = 'text' "
        f"AND {post} <> ''"
    )


def q02_spark(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(f"WITH {derive.spans_cte(SPARK)} {_q02_select(SPARK)}")


Q02_ORACLE = f"WITH {derive.spans_cte(DUCKDB)} {_q02_select(DUCKDB)}"


# ---------------------------------------------------------------------------
# q03 — full extract path (dense offsets) — Spark side runs the REAL
# DataFrame pipeline (narrow HOF plan); oracle rebuilds it in SQL
# ---------------------------------------------------------------------------


def q03_spark(spark, sf_dir):
    out = pipeline.extract(docs_nested_df(spark, sf_dir))
    return pipeline.to_flat(out)


def _extract_oracle_ctes() -> str:
    post = derive.postprocess_line_sql("text", DUCKDB)
    return f"""{derive.spans_cte(DUCKDB)},
_ex AS (
  SELECT doc_id, kind,
         CASE WHEN kind = 'text' THEN {post} ELSE text END AS text,
         media_ref, offset
  FROM spans_input
),
extracted AS (
  SELECT doc_id, kind, text, media_ref,
         cast(row_number() OVER (PARTITION BY doc_id ORDER BY offset) - 1 AS int) AS offset,
         offset AS offset0
  FROM _ex
  WHERE kind = 'media' OR text <> ''
)"""


Q03_ORACLE = (
    f"WITH {_extract_oracle_ctes()} "
    "SELECT doc_id, kind, text, media_ref, offset FROM extracted"
)


# ---------------------------------------------------------------------------
# q04 — extract + de-hyphenation fold (T4) — oracle via recursive CTE
# ---------------------------------------------------------------------------


def q04_spark(spark, sf_dir):
    out = pipeline.extract(docs_nested_df(spark, sf_dir), dehyphenate=True)
    return pipeline.to_flat(out)


# NB coalesce: DuckDB's array_to_string([]) is NULL, Spark's array_join([]) is ''
_EFF = (
    "CASE WHEN took THEN coalesce(array_to_string(list_slice(string_split(ls[i+1], ' '), 2, "
    "len(string_split(ls[i+1], ' '))), ' '), '') ELSE ls[i+1] END"
)

Q04_ORACLE = f"""WITH RECURSIVE {_extract_oracle_ctes()},
pages AS (
  SELECT doc_id, media_ref,
         list(text ORDER BY offset0) AS ls,
         list(offset0 ORDER BY offset0) AS offs
  FROM extracted WHERE kind = 'text'
  GROUP BY doc_id, media_ref
),
walk AS (
  SELECT doc_id, media_ref, ls, offs, 0 AS i, FALSE AS took,
         []::VARCHAR[] AS out
  FROM pages
  UNION ALL
  SELECT doc_id, media_ref, ls, offs, i + 1,
         (i < len(ls) - 1 AND ends_with({_EFF}, '-')
          AND trim(ls[i+2]) <> '') AS took,
         CASE
           WHEN i < len(ls) - 1 AND ends_with({_EFF}, '-')
                AND trim(ls[i+2]) = '' THEN out
           WHEN i < len(ls) - 1 AND ends_with({_EFF}, '-') THEN
             list_append(out, substr({_EFF}, 1, length({_EFF}) - 1)
                              || string_split(ls[i+2], ' ')[1])
           ELSE list_append(out, {_EFF})
         END AS out
  FROM walk WHERE i < len(ls)
),
merged AS (
  SELECT doc_id, media_ref, unnest(out) AS text, unnest(offs) AS offset0
  FROM walk WHERE i = len(ls)
),
allspans AS (
  SELECT doc_id, 'media' AS kind, '' AS text, media_ref, offset0
  FROM extracted WHERE kind = 'media'
  UNION ALL
  SELECT doc_id, 'text' AS kind, text, media_ref, offset0 FROM merged
)
SELECT doc_id, kind, text, media_ref,
       cast(row_number() OVER (PARTITION BY doc_id ORDER BY offset0) - 1 AS int) AS offset
FROM allspans"""


# ---------------------------------------------------------------------------
# q05 — text bundle per doc (S7/A7)
# ---------------------------------------------------------------------------


def q05_spark(spark, sf_dir):
    out = pipeline.extract(docs_nested_df(spark, sf_dir))
    return pipeline.text_bundle(out)


Q05_ORACLE = f"""WITH {_extract_oracle_ctes()}
SELECT doc_id,
       coalesce(string_agg(CASE WHEN kind='text' THEN text END, chr(10) ORDER BY offset), '') AS bundle,
       cast(count(CASE WHEN kind='text' THEN 1 END) AS bigint) AS n_text_lines
FROM extracted
GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# q06 — per-document extraction metrics (A1/A3/A7)
# ---------------------------------------------------------------------------


def q06_spark(spark, sf_dir):
    out = pipeline.extract(docs_nested_df(spark, sf_dir), with_metrics=True)
    return out.select(
        "doc_id", "n_pages", "n_lines_in", "n_lines_out", "n_tokens_out"
    )


Q06_ORACLE = f"""WITH {_extract_oracle_ctes()},
inp AS (
  SELECT doc_id,
         cast(count(CASE WHEN kind='text' THEN 1 END) AS bigint) AS n_lines_in
  FROM spans_input GROUP BY doc_id
),
outp AS (
  SELECT doc_id,
         cast(count(CASE WHEN kind='media' THEN 1 END) AS bigint) AS n_pages,
         cast(count(CASE WHEN kind='text' THEN 1 END) AS bigint) AS n_lines_out,
         cast(coalesce(sum(CASE WHEN kind='text' THEN len(string_split(text, ' ')) END), 0) AS bigint) AS n_tokens_out
  FROM extracted GROUP BY doc_id
)
SELECT inp.doc_id, outp.n_pages, inp.n_lines_in, outp.n_lines_out, outp.n_tokens_out
FROM inp JOIN outp ON inp.doc_id = outp.doc_id"""


# ---------------------------------------------------------------------------
# q07 — char-dict replace chain (T2) / q08 — regex group replace (T3)
# ---------------------------------------------------------------------------


def _q07_select(dialect: str) -> str:
    return (
        "SELECT doc_id, offset, "
        "replace(replace(text, 'agg', 'aggregat'), 'scan', 'Abtastung') AS text_out "
        "FROM spans_input WHERE kind = 'text'"
    )


def q07_spark(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(f"WITH {derive.spans_cte(SPARK)} {_q07_select(SPARK)}")


Q07_ORACLE = f"WITH {derive.spans_cte(DUCKDB)} {_q07_select(DUCKDB)}"


def _q08_select(dialect: str) -> str:
    d = derive.dialect(dialect)
    sub = d["regex_sub"]("text", "J([cdhmn])", r"I\g<1>")
    return (
        f"SELECT doc_id, offset, {sub} AS text_out, "
        f"cast(length(text) - length(replace(text, 'J', '')) AS bigint) AS n_j "
        "FROM spans_input WHERE kind = 'text' AND text LIKE '%J%'"
    )


def q08_spark(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(f"WITH {derive.spans_cte(SPARK)} {_q08_select(SPARK)}")


Q08_ORACLE = f"WITH {derive.spans_cte(DUCKDB)} {_q08_select(DUCKDB)}"


# ---------------------------------------------------------------------------
# q10-q13 — relational engine coverage (joins J1-J5, window O5, agg A*)
# ---------------------------------------------------------------------------

_Q10 = """SELECT l_returnflag, l_linestatus,
       cast(count(*) AS bigint) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""

_Q11 = """SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 10"""

_Q12 = """SELECT o_custkey AS custkey, o_orderkey AS first_orderkey,
       cast(cast(o_orderdate AS date) AS {STR}) AS first_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) ranked
WHERE rn = 1"""

_Q13 = """SELECT coalesce(p.p_partkey, l.l_partkey) AS partkey,
       CASE WHEN l.l_partkey IS NULL THEN 'no_lineitem' ELSE 'no_part' END AS side
FROM (SELECT DISTINCT p_partkey FROM part) p
FULL OUTER JOIN (SELECT DISTINCT l_partkey FROM lineitem) l
  ON p.p_partkey = l.l_partkey
WHERE p.p_partkey IS NULL OR l.l_partkey IS NULL"""


# ---------------------------------------------------------------------------
# q20+ — training-data pipeline ops over documents
# ---------------------------------------------------------------------------

_Q20 = """SELECT md5(text) AS text_hash,
       cast(count(*) AS bigint) AS n_docs,
       cast(min(doc_id) AS bigint) AS keep_doc_id
FROM documents GROUP BY md5(text)"""


def _q21(dialect: str) -> str:
    d = derive.dialect(dialect)
    toks = d["split"]("text", " ")
    return f"""SELECT doc_id,
       cast({d['size'](toks)} AS bigint) AS n_tokens,
       cast(length(text) AS bigint) AS len_chars,
       round(cast(length(text) AS double) / {d['size'](toks)}, 4) AS avg_token_span
FROM documents"""


def _q22(dialect: str) -> str:
    d = derive.dialect(dialect)
    toks = d["split"]("text", " ")
    n_tok = d["size"](toks)
    return f"""SELECT doc_id, lang,
       cast({n_tok} AS bigint) AS n_tokens,
       round(cast(length(text) - length(replace(text, 'e', '')) AS double) / length(text), 4) AS e_ratio,
       round(cast(length(text) - length(replace(text, 'a', '')) AS double) / length(text), 4) AS a_ratio,
       CASE WHEN (length(text) - length(replace(text, 'e', ''))) >=
                 (length(text) - length(replace(text, 'a', ''))) * 2
            THEN 'en' ELSE 'other' END AS lang_pred
FROM documents"""


def _q23(dialect: str) -> str:
    d = derive.dialect(dialect)
    toks = d["split"]("text", " ")
    dens = "cast(length(replace(text, ' ', '')) AS double) / length(text)"
    return f"""SELECT doc_id,
       round({dens}, 4) AS density,
       cast({d['size'](toks)} AS bigint) AS n_tokens,
       round(least(cast(1 AS double), cast({d['size'](toks)} AS double) / 100)
             * cast(0.5 AS double)
             + ({dens}) * cast(0.5 AS double), 4) AS quality_score
FROM documents"""


_Q24 = """SELECT doc_id,
       md5(lower(replace(text, ' ', ''))) AS fingerprint,
       cast(length(replace(text, ' ', '')) AS bigint) AS n_chars_packed
FROM documents"""


def _named_sql(template: str) -> tuple[Callable, str]:
    spark_sql = template.replace("{STR}", "string")
    duck_sql = template.replace("{STR}", "varchar")
    return _sql(spark_sql), duck_sql


def _duck(sql: str | None) -> str | None:
    """DuckDB-ify an oracle: quote the reserved column name ``offset``."""
    if sql is None:
        return None
    return re.sub(r"(?<![\w\"])offset(?![\w\"])", '"offset"', sql)


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    """name -> (spark callable, duckdb oracle sql or None)."""
    reg: dict[str, tuple[Callable, str | None]] = {
        "q01_derive_spans": (q01_spark, Q01_ORACLE),
        "q02_postprocess_lines": (q02_spark, Q02_ORACLE),
        "q03_extract_spans": (q03_spark, Q03_ORACLE),
        "q04_extract_dehyphenate": (q04_spark, Q04_ORACLE),
        "q05_text_bundle": (q05_spark, Q05_ORACLE),
        "q06_doc_stats": (q06_spark, Q06_ORACLE),
        "q07_char_replace": (q07_spark, Q07_ORACLE),
        "q08_regex_replace": (q08_spark, Q08_ORACLE),
    }
    for name, template in {
        "q10_pricing_summary": _Q10,
        "q11_top_revenue_join": _Q11,
        "q12_first_match_window": _Q12,
        "q13_symmetric_diff": _Q13,
        "q20_dedup_exact": _Q20,
        "q24_fingerprint": _Q24,
    }.items():
        fn, duck = _named_sql(template)
        reg[name] = (fn, duck)
    for name, builder in {
        "q21_token_count": _q21,
        "q22_lang_id": _q22,
        "q23_quality_score": _q23,
    }.items():
        reg[name] = (_sql(builder(SPARK)), builder(DUCKDB))
    return {name: (fn, _duck(sql)) for name, (fn, sql) in reg.items()}
