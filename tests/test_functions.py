"""Dedup / similarity / textstats / multimodal behaviour tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocrd_odem_spark.functions import dedup, multimodal, similarity, textstats

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
    (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
    (4, "completely different content about spark query engines at scale"),
    (5, "der schnelle braune fuchs springt über den faulen hund und der der"),
    (6, "le renard brun rapide saute par dessus le chien paresseux et le la les"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark):
    rows = dedup.exact_duplicates(_docs_df(spark)).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2
    assert rows[0]["keep_id"] == 1
    assert rows[0]["all_ids"] == [1, 2]


def test_exact_duplicates_group_cap_bounded_and_observable(spark):
    """A 10^8-wide boilerplate group must never hit a collect_list buffer:
    the row_number cap runs BEFORE the aggregation, n_docs stays the TRUE
    count, and the truncation is reported (VERDICT r2 item 1b)."""
    boiler = [(i, "gleicher Kessel Text immer wieder gleich") for i in range(200)]
    pair = [(1000, "zwei mal da"), (1001, "zwei mal da")]
    solo = [(2000, "nur einmal vorhanden xyz")]
    df = spark.createDataFrame(boiler + pair + solo, "doc_id long, text string")
    dupes, stats = dedup.exact_duplicates(df, max_group=16, with_stats=True)
    rows = {r["keep_id"]: r for r in dupes.collect()}
    assert set(rows) == {0, 1000}
    assert rows[0]["n_docs"] == 200  # true size survives the cap
    assert rows[0]["all_ids"] == list(range(16))  # bounded sample, keeper first
    assert rows[1000]["all_ids"] == [1000, 1001]
    s = stats.collect()[0]
    assert (s["n_groups"], s["n_oversized_groups"], s["n_dropped_ids"]) == (2, 1, 184)
    # the groupBy reuses the window's text_hash partitioning — one exchange
    plan = dupes._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 1, final


def test_minhash_lsh_finds_near_dups(spark):
    pairs = dedup.minhash_lsh_candidates(_docs_df(spark), bands=16, num_hashes=64)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical
    assert (1, 3) in got or (2, 3) in got  # one-token diff
    assert not any({a, b} == {4, 5} for a, b in got)


def test_jaccard_verify(spark):
    df = _docs_df(spark)
    cand = dedup.minhash_lsh_candidates(df, bands=16, num_hashes=64)
    verified = dedup.jaccard_verify(df, cand, threshold=0.5).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified}
    assert by_pair[(1, 2)] == 1.0
    for (a, b), j in by_pair.items():
        assert j >= 0.5


def test_lsh_bucket_cap_bounded_and_observable(spark):
    """A skewed boilerplate bucket (120 identical docs) is capped to
    max_bucket ids via row_number BEFORE pair generation; the drop is
    reported, never silent (VERDICT r1 item 4)."""
    boiler = [(i, "gleicher Kessel Text immer wieder gleich") for i in range(120)]
    distinct = [(1000 + i, f"einzigartiger Text nummer {i} ohne Partner xyz{i}")
                for i in range(5)]
    df = spark.createDataFrame(boiler + distinct, "doc_id int, text string")
    pairs, stats = dedup.minhash_lsh_candidates(
        df, max_bucket=16, bands=4, num_hashes=16, with_stats=True
    )
    got = pairs.collect()
    ids = {r["id_a"] for r in got} | {r["id_b"] for r in got}
    # only the 16 smallest boilerplate ids survive the cap (orderBy id)
    assert ids == set(range(16))
    assert len(got) == 16 * 15 // 2
    s = stats.collect()[0]
    assert s["n_oversized_buckets"] >= 1
    # every band's boilerplate bucket drops 120-16 memberships; summed
    # across the 4 bands the stat reads ~4*104 (it counts memberships,
    # not unique documents — see the docstring)
    assert s["n_dropped_memberships"] >= 104
    # one exchange only: the window partitioning is reused by the groupBy
    # (AQE plans print Final + Initial sections — count the final one only)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 2  # banded + distinct


def test_simhash_near_duplicates(spark):
    # max_hamming=8 needs >= 9 pigeonhole blocks -> block_bits=7 (64//7 = 9)
    rows = dedup.simhash_near_duplicates(
        _docs_df(spark), max_hamming=8, block_bits=7
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert got.get((1, 2)) == 0
    assert (1, 3) in got or (2, 3) in got


def test_simhash_block_guard_raises(spark):
    """max_hamming beyond the pigeonhole guarantee is an error, not silent
    recall loss (ADVICE r1): 64//16 = 4 blocks only covers distance <= 3."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_near_duplicates(_docs_df(spark), max_hamming=4, block_bits=16)


def test_md5_hash60_matches_duckdb(spark):
    """The portable hash tier must agree with DuckDB's hex cast exactly."""
    import duckdb

    toks = ["Wort", "zum", "ſchönen", "123", ""]
    got = {
        r["t"]: r["h"]
        for r in spark.createDataFrame([(t,) for t in toks], "t string")
        .select("t", dedup.md5_hash60(F.col("t")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for t in toks:
        exp = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [t]
        ).fetchone()[0]
        assert got[t] == exp


def test_portable_int_planes_formula(spark):
    """Plane weights reproduce the documented md5 formula (the q30 oracle
    generates the same values inside DuckDB SQL)."""
    import duckdb

    tables = similarity.portable_int_planes(4, 2, 2)
    con = duckdb.connect()
    for t in range(2):
        for p in range(2):
            for d in range(4):
                exp = con.execute(
                    "SELECT ('0x' || substr(md5(?), 1, 13))::BIGINT % 19 - 9",
                    [f"ann_{t}_{p}_{d}"],
                ).fetchone()[0]
                assert tables[t][p][d] == exp
                assert -9 <= tables[t][p][d] <= 9


def test_lsh_topk_int_planes(spark):
    """Integer-plane tier returns the same shape and sane ranks."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(4)
    out = similarity.lsh_cosine_topk(
        emb, queries, k=2, int_tables=similarity.portable_int_planes(64, 6, 8)
    ).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(r["neighbor_id"] != q for r in rows)


def test_cosine_topk_exact(spark, request):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(4)
    out = similarity.cosine_topk(emb, queries, k=3).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 4
    for q, rows in by_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]
        sims = [r["sim"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)

    # python cross-check of rank-1 neighbour for one query
    rows = emb.collect()
    vecs = {r["vec_id"]: r["embedding"] for r in rows}
    q0 = sorted(by_q)[0]
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))
    best = max(
        ((vid, round(cos(v, vecs[q0]), 6)) for vid, v in vecs.items() if vid != q0),
        key=lambda kv: (kv[1], -kv[0]),
    )
    got1 = next(r for r in by_q[q0] if r["rank"] == 1)
    assert got1["neighbor_id"] == best[0] and abs(got1["sim"] - best[1]) < 1e-6


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(8)
    exact = similarity.cosine_topk(emb, queries, k=1).collect()
    approx = similarity.lsh_cosine_topk(emb, queries, k=1, n_planes=4).collect()
    exact1 = {r["query_id"]: r["neighbor_id"] for r in exact}
    approx1 = {r["query_id"]: r["neighbor_id"] for r in approx}
    hits = sum(1 for q, n in approx1.items() if exact1.get(q) == n)
    assert len(approx1) >= 4  # buckets may drop some queries
    assert hits >= len(approx1) // 2  # coarse recall sanity


def test_ivf_topk_full_probe_equals_brute_force(spark):
    """IVF's recall dial tops out at exactness: probing ALL cells makes
    candidates = whole corpus, so results must EQUAL cosine_topk; with
    n_probe=1 results stay a subset of each query's own-cell scoring."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 6")
    cents = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where("vec_id < 5").collect()
    )
    exact = sorted(map(tuple, similarity.cosine_topk(emb, queries, k=2).collect()))
    full = sorted(map(tuple, similarity.ivf_topk(
        emb, queries, cents, k=2, n_probe=len(cents)).collect()))
    assert full == exact

    narrow = similarity.ivf_topk(emb, queries, cents, k=2, n_probe=1).collect()
    assert len(narrow) >= 1  # each query's own cell holds >= itself's cellmates
    for r in narrow:
        assert r["rank"] <= 2 and r["query_id"] != r["neighbor_id"]
    # the corpus side must not shuffle: assignment is a literal projection
    # and the probe join broadcasts the exploded queries
    plan = similarity.ivf_topk(
        emb, queries, cents, k=2, n_probe=1
    )._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final


def test_textstats_profile(spark):
    df = _docs_df(spark)
    prof = {r["doc_id"]: r for r in textstats.document_profile(df).collect()}
    assert prof[1]["lang_pred"] == "en"
    assert prof[5]["lang_pred"] == "de"
    assert prof[6]["lang_pred"] == "fr"
    assert prof[1]["fingerprint"] == prof[2]["fingerprint"]
    assert prof[1]["fingerprint"] != prof[4]["fingerprint"]
    assert prof[1]["n_tokens"] == 12
    assert 0.0 <= prof[1]["quality"] <= 1.0
    # subword counting splits punctuation and digits apart
    one = spark.createDataFrame([(9, "ab12cd, x!")], "doc_id long, text string")
    r = textstats.document_profile(one).collect()[0]
    assert r["n_subwords"] == 6  # ab / 12 / cd / , / x / !


def test_multimodal_plumbing(spark):
    rows = [
        ("m1", "d1", "00000001", "image/jpeg", bytearray(b"\xff\xd8fakejpegdata0123"),
         {"width": 2000, "height": 3000, "dpi": 300, "n_bytes": 1048576, "duration_ms": None}),
        ("m2", "d1", "00000002", "image/png", None,
         {"width": 100, "height": 100, "dpi": None, "n_bytes": 2048, "duration_ms": None}),
        ("m3", "d2", "00000001", "video/mp4", bytearray(b"vid"),
         {"width": 1920, "height": 1080, "dpi": None, "n_bytes": 9999999, "duration_ms": 3500}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    stats = {r["doc_id"]: r for r in multimodal.media_stats(media).collect()}
    assert stats["d1"]["n_media"] == 2
    assert abs(stats["d1"]["mps"] - 6.01) < 0.01

    feats = {r["media_id"]: r for r in multimodal.extract_image_features(
        media, fake_decoder=True).collect()}
    assert feats["m1"]["decode_error"] is None and len(feats["m1"]["feat"]) == 4
    assert feats["m2"]["decode_error"] is not None  # empty payload -> error channel

    # stub without fake decoder: errors, never task failure
    stub = multimodal.extract_image_features(media, fake_decoder=False).collect()
    assert all(r["decode_error"] for r in stub)

    frames = multimodal.frame_sample_plan(media).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000]


def test_megapixel_histogram(spark):
    rows = [
        ("m1", "d1", "1", "image/jpeg", None,
         {"width": 2000, "height": 3000, "dpi": 300, "n_bytes": 10, "duration_ms": None}),
        ("m2", "d1", "2", "image/jpeg", None,
         {"width": 2000, "height": 3010, "dpi": 300, "n_bytes": 10, "duration_ms": None}),
        ("m3", "d2", "1", "image/jpeg", None,
         {"width": 1000, "height": 1000, "dpi": 300, "n_bytes": 10, "duration_ms": None}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    hist = {r["mps"]: r["n"] for r in multimodal.megapixel_histogram(media).collect()}
    assert hist == {6.0: 2, 1.0: 1}


def test_simhash_agg_equals_hof(spark):
    df = _docs_df(spark)
    hof = {r["doc_id"]: None for r in df.collect()}
    from pyspark.sql import functions as F
    a = df.select(F.col("doc_id").alias("id"), dedup.simhash64(F.col("text")).alias("sh"))
    b = dedup.simhash64_agg(df)
    ra = {r["id"]: r["sh"] for r in a.collect()}
    rb = {r["id"]: r["sh"] for r in b.collect()}
    assert ra == rb


def test_cosine_near_duplicates(spark):
    """Planted near-duplicates are found via bucket collisions; the pair
    set never contains self-pairs or sub-threshold similarity."""
    import math
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [v + rng.gauss(0, 0.02) for v in base]  # cosine ~0.999
    far = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(20)]
    rows = [(0, base), (1, near)] + [(i + 2, v) for i, v in enumerate(far)]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    got = similarity.cosine_near_duplicates(
        emb, threshold=0.9,
        int_tables=similarity.portable_int_planes(64, 6, 8),
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["sim"] for r in got}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    for (a, b), sim in pairs.items():
        assert a < b and sim >= 0.9


def test_pil_decode_tier(spark):
    """fake_decoder=False decodes a real PNG into the 2x2 grayscale
    feature — via PIL when importable, else the pure-numpy PNG tier
    (round 5; the old base64 fixture here had a corrupt IDAT CRC and
    Adler-32, unnoticed while the no-PIL branch only asserted the
    codec-gap error).  Malformed payloads stay in the error channel
    either way."""
    import struct
    import zlib

    def _chunk(ctype, body):
        return (len(body).to_bytes(4, "big") + ctype + body
                + zlib.crc32(ctype + body).to_bytes(4, "big"))

    # 1x1 white 8-bit gray PNG, spec-conformant
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(b"\x00\xff"))
           + _chunk(b"IEND", b""))
    rows = [("p1", "d1", "r1", "image/png", bytearray(png),
             {"width": 1, "height": 1, "dpi": None, "n_bytes": len(png),
              "duration_ms": None}),
            ("p2", "d1", "r2", "image/png", bytearray(b"notanimage"),
             {"width": 1, "height": 1, "dpi": None, "n_bytes": 10,
              "duration_ms": None})]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           multimodal.extract_image_features(media).collect()}
    # PIL and the numpy PNG tier agree: a real PNG decodes ...
    assert got["p1"]["decode_error"] is None
    assert [round(v, 4) for v in got["p1"]["feat"]] == [1.0, 1.0, 1.0, 1.0]
    assert got["p2"]["decode_error"]  # ... malformed -> error row, not crash


def test_numpy_raw_decode_tier(spark):
    """Uncompressed rasters decode with NO codec library: binary PPM (P6)
    and 24-bit BMP payloads yield exact quadrant-mean features while
    compressed formats stay on the error channel.  (PIL, when present,
    takes precedence and is covered by test_pil_decode_tier.)"""
    if multimodal.HAS_PIL:  # tier unreachable when PIL importable
        import pytest

        pytest.skip("PIL present; numpy raw tier shadowed")

    # 4x4 PPM, solid 2x2 quadrants: black, white, red, blue
    head = b"P6\n# comment\n4 4\n255\n"
    tl, tr, bl, br = b"\x00\x00\x00", b"\xff\xff\xff", b"\xff\x00\x00", b"\x00\x00\xff"
    ppm = head + (tl * 2 + tr * 2) * 2 + (bl * 2 + br * 2) * 2

    # 2x2 24-bit BMP, gray rows top-down [10, 20], [30, 40]; stored
    # bottom-up with 4-byte row padding (6 -> 8)
    def row(vals):
        return b"".join(bytes([v, v, v]) for v in vals) + b"\x00\x00"

    pixels = row([30, 40]) + row([10, 20])
    bmp = (
        b"BM" + (54 + len(pixels)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
    ) + pixels

    meta = {"width": 4, "height": 4, "dpi": None, "n_bytes": 0, "duration_ms": None}
    rows = [
        ("ppm", "d1", "r1", "image/x-portable-pixmap", bytearray(ppm), meta),
        ("bmp", "d1", "r2", "image/bmp", bytearray(bmp), meta),
        ("jpg", "d1", "r3", "image/jpeg", bytearray(b"\xff\xd8\xff\xe0data"), meta),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           multimodal.extract_image_features(media).collect()}

    assert got["ppm"]["decode_error"] is None
    assert [round(v, 3) for v in got["ppm"]["feat"]] == [0.0, 1.0, 0.299, 0.114]
    assert got["bmp"]["decode_error"] is None
    assert [round(v * 255, 1) for v in got["bmp"]["feat"]] == [10.0, 20.0, 30.0, 40.0]
    # truncated JPEG: error ROW (from the baseline decoder), never a crash
    assert got["jpg"]["decode_error"]

    # resize dial: a 4x4 grid over the 4x4 PPM is the identity downsample —
    # each output cell is one source pixel's luma
    grid = {r["media_id"]: r for r in multimodal.extract_image_features(
        media, feature_size=(4, 4)).collect()}
    f = [round(v, 3) for v in grid["ppm"]["feat"]]
    assert len(f) == 16
    assert f[0:4] == [0.0, 0.0, 1.0, 1.0]      # row 0: black black white white
    assert f[8:12] == [0.299, 0.299, 0.114, 0.114]  # row 2: red red blue blue


def test_train_centroids_deterministic_and_exact(spark):
    """Lloyd trainer: deterministic across invocations, k centroids on the
    2^-20 grid, a pure-Python replay of the same recurrence agrees, and
    the trained table feeds ivf_topk with full probe == brute force."""
    import math

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = similarity.train_centroids(emb, k=4, n_iter=2)
    b = similarity.train_centroids(emb, k=4, n_iter=2)
    assert a == b
    assert [cid for cid, _ in a] == [0, 1, 2, 3]
    Q = 1 << 20
    for _, vec in a:
        for x in vec:
            assert x * Q == math.floor(x * Q)  # integer-valued on the grid

    # pure-Python replay of the documented recurrence
    rows = sorted(
        (int(r["vec_id"]), [math.floor(float(x) * Q) for x in r["embedding"]])
        for r in emb.collect()
    )
    cents = [(i, rows[i][1]) for i in range(4)]
    for _ in range(2):
        groups: dict[int, list[list[int]]] = {}
        for _vid, vq in rows:
            best = min(
                ((sum(c * c for c in cv) - 2 * sum(a_ * b_ for a_, b_ in zip(vq, cv)), cid)
                 for cid, cv in cents),
            )[1]
            groups.setdefault(best, []).append(vq)
        cents = [
            (cid, [math.floor(sum(col) / len(g)) for col in zip(*g)])
            if (g := groups.get(cid)) else (cid, old)
            for cid, old in cents
        ]
    want = [(cid, [c / Q for c in cv]) for cid, cv in cents]
    assert a == want

    # trained centroids drive IVF; full probe tops out at exact brute force
    queries = emb.where("vec_id < 5")
    exact = sorted(map(tuple, similarity.cosine_topk(emb, queries, k=2).collect()))
    full = sorted(map(tuple, similarity.ivf_topk(
        emb, queries, a, k=2, n_probe=len(a)).collect()))
    assert full == exact


def test_train_centroids_guards(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least k"):
        similarity.train_centroids(emb.where("vec_id < 2"), k=4)
    with _pytest.raises(ValueError, match="k >= 1"):
        similarity.train_centroids(emb, k=0)


def test_jpeg_decode_tier(spark):
    """Real baseline AND progressive JPEGs decode through the Arrow
    feature stage with NO codec library: exact-value features from a known
    synthetic image; an arithmetic-coded payload stays on the error
    channel."""
    if multimodal.HAS_PIL:
        import pytest

        pytest.skip("PIL present; numpy jpeg tier shadowed")
    import numpy as np

    from tests.test_jpeg_decode import encode_jpeg
    from tests.test_jpeg_progressive import encode_jpeg_progressive

    # 16x16 grayscale, solid 8x8 quadrants 40/80/120/200
    img = np.zeros((16, 16))
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 40.0, 80.0, 120.0, 200.0
    payload = encode_jpeg(img)
    prog = encode_jpeg_progressive(img)  # SOF2, same coefficients

    # arithmetic-coded stand-in: flip the SOF marker
    arith = bytearray(payload)
    arith[arith.index(b"\xff\xc0") + 1] = 0xC9

    meta = {"width": 16, "height": 16, "dpi": None,
            "n_bytes": len(payload), "duration_ms": None}
    rows = [
        ("base", "d1", "r1", "image/jpeg", bytearray(payload), meta),
        ("prog", "d1", "r2", "image/jpeg", bytearray(prog), meta),
        ("arith", "d1", "r3", "image/jpeg", bytearray(bytes(arith)), meta),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           multimodal.extract_image_features(media).collect()}
    for name in ("base", "prog"):
        assert got[name]["decode_error"] is None
        feats = [round(v * 255, 0) for v in got[name]["feat"]]
        assert feats == [40.0, 80.0, 120.0, 200.0], name
    assert "codec library" in got["arith"]["decode_error"]
