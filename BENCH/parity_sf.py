"""Multi-SF Spark-vs-DuckDB parity spot-checker for optimization work.

Same normalization as tests/test_oracle_parity.py but parameterized over
sf dirs and query names, so a restructured query can be proven equivalent
at larger scale than the pytest gate before it ships.

  python BENCH/parity_sf.py q46,q27 /root/testdata/sf0.01 /root/testdata/sf0.1
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from ocrd_odem_spark.plans.queries import TABLES, registry  # noqa: E402


def _duck(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    rel = con.sql(sql)
    return rel.columns, rel.fetchall()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(row[i]) for i in order) for row in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def main() -> None:
    prefixes = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.01"]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    os.environ.setdefault("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC")
    from ocrd_odem_spark.session import get_spark

    spark = get_spark("parity_sf")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = [n for n in reg if any(n.startswith(p) for p in prefixes)]
    failures = 0
    for sf_dir in sf_dirs:
        for name in names:
            fn, oracle_sql = reg[name]
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            dcols, drows = _duck(oracle_sql, sf_dir)
            ok = sorted(scols) == sorted(dcols) and len(srows) == len(drows)
            if ok:
                ok = _normalize(scols, srows) == _normalize(dcols, drows)
            print(f"{sf_dir} {name}: rows={len(srows)}/{len(drows)} {'OK' if ok else 'MISMATCH'}")
            if not ok:
                failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
