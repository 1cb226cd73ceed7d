"""Benchmark harness: headline queries + flagship extraction throughput.

Default: run every registry query once at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE JSON line::

    {"metric": ..., "value": <flagship sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "docs_per_sec": ...}

Modes:
  --flagship-only --cores N   one flagship run, print elapsed (scaling probe)
  --scaling                   run flagship at local[8] and local[32] in two
                              fresh JVMs, report throughput + efficiency and
                              write BENCH/BASELINE.md

The flagship job is the full extract+dehyphenate pipeline over the derived
interleaved span corpus, amplified deterministically (REPLICATE copies per
source document) so the 32-core run has real work.  The forcing action sums
output characters through an ``aggregate`` HOF — un-prunable, so the whole
span pipeline really executes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "48"))


def prepare_corpus(spark, sf_dir: str, replicate: int) -> str:
    """Materialise the nested (doc_id, spans) corpus once per (sf, replicate).

    This is the production input shape — an Iceberg/parquet table of nested
    span arrays.  The flagship measurement reads it back so it times the
    EXTRACTION ENGINE (read -> narrow pipeline -> aggregate), not the
    synthetic corpus construction.  Written with 64 files so any
    parallelism level up to 64 has independent input splits.
    """
    from pyspark.sql import functions as F

    from ocrd_odem_spark.plans import pipeline, queries

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    path = f"/tmp/ocrd_bench_corpus_sf{sf}_r{replicate}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    flat = queries.spans_df(spark, sf_dir)
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        flat = flat.crossJoin(F.broadcast(reps)).withColumn(
            "doc_id", F.concat(F.col("doc_id"), F.lit("#"), F.col("rep"))
        ).drop("rep")
    docs = pipeline.from_flat(flat).repartition(64)
    docs.write.mode("overwrite").parquet(path)
    return path


def run_flagship(spark, sf_dir: str, replicate: int) -> dict:
    from pyspark.sql import functions as F

    from ocrd_odem_spark.plans import pipeline

    path = prepare_corpus(spark, sf_dir, replicate)
    cores = spark.sparkContext.defaultParallelism
    # right-size partitions to the session's core count (the synthetic
    # corpus parquet is tiny after compression; a real 100 TB table would
    # provide ample splits by itself — this mirrors repartitionByRange on
    # doc_id ranges from the scale design)
    docs = spark.read.parquet(path).repartition(cores * 4)
    out = pipeline.extract(docs, dehyphenate=True)
    t0 = time.time()
    row = out.select(
        F.count("*").alias("docs"),
        F.sum(
            F.aggregate(
                "spans", F.lit(0).cast("long"), lambda acc, s: acc + F.length(s["text"])
            )
        ).alias("chars"),
    ).collect()[0]
    elapsed = time.time() - t0
    return {
        "elapsed_sec": round(elapsed, 3),
        "n_docs": row["docs"],
        "out_chars": int(row["chars"]),
        "docs_per_sec": round(row["docs"] / elapsed, 2),
    }


def _checksum(df) -> None:
    from pyspark.sql import functions as F

    df.select(
        F.expr("bit_xor(xxhash64(struct(*)))").alias("h")
    ).collect()


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from ocrd_odem_spark.plans import queries as q

    times: dict[str, float] = {}
    for name, (fn, _sql) in sorted(q.registry().items()):
        t0 = time.time()
        _checksum(fn(spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times


def _session(cores: int):
    from ocrd_odem_spark.session import get_spark

    # small maxPartitionBytes: the bench corpus files are a few MB each and
    # must not be coalesced into fewer input splits than cores
    return get_spark(
        "bench",
        cores=cores,
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--replicate", type=int, default=REPLICATE)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if args.flagship_only:
        spark = _session(args.cores)
        spark.sparkContext.setLogLevel("ERROR")
        run_flagship(spark, sf_dir, args.replicate)  # warm-up (JIT, code cache)
        result = run_flagship(spark, sf_dir, args.replicate)
        print(json.dumps(result))
        spark.stop()
        return

    if args.scaling:
        reports = {}
        for cores in (8, 32):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship-only",
                 "--cores", str(cores), "--replicate", str(args.replicate)],
                capture_output=True, text=True, env=os.environ.copy(), check=True,
            )
            reports[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
        t8, t32 = reports[8]["docs_per_sec"], reports[32]["docs_per_sec"]
        eff = round(t32 / (4 * t8), 3)
        result = {
            "metric": "extract_dehyph_scaling", "unit": "docs/sec", "sf": sf,
            "throughput_n8": t8, "throughput_n32": t32,
            "scaling_efficiency_8_to_32": eff,
            "n_docs": reports[32]["n_docs"],
        }
        os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
        md = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
        with open(md, "w", encoding="utf-8") as fh:
            fh.write(
                "# BENCH/BASELINE — scaling evidence (sandbox protocol)\n\n"
                "Same flagship job (extract + de-hyphenation over the nested span\n"
                "corpus) at two parallelism levels on identical input, per the\n"
                "north rule's two-cluster-size criterion (local[8] vs local[32]\n"
                "stands in for N vs 4N executors).\n\n"
                f"| parallelism | docs/sec | elapsed (s) | docs |\n|---|---|---|---|\n"
                f"| local[8]  | {t8} | {reports[8]['elapsed_sec']} | {reports[8]['n_docs']} |\n"
                f"| local[32] | {t32} | {reports[32]['elapsed_sec']} | {reports[32]['n_docs']} |\n\n"
                f"**Scaling efficiency (8→32) = {eff}** (requirement: ≥ 0.8).\n\n"
                "The fact-table plan is shuffle-free (narrow HOF pipeline); the\n"
                "only reshape is an explicit repartition to core count, which on\n"
                "a real 100 TB table comes for free from input splits.\n"
            )
        print(json.dumps(result))
        return

    spark = _session(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    qtimes = run_queries(spark, sf_dir)
    flag = run_flagship(spark, sf_dir, args.replicate)
    print(json.dumps({
        "metric": "flagship_extract_dehyphenate_elapsed",
        "value": flag["elapsed_sec"],
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "n_docs": flag["n_docs"],
        "docs_per_sec": flag["docs_per_sec"],
        "out_chars": flag["out_chars"],
        "cores": args.cores,
        "replicate": args.replicate,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
