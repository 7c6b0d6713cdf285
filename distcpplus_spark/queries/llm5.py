"""Round-7 continuation: training-data pipeline operators — mixture
sampling to token budgets, filter rejection audits, incremental
near-dup against a persisted index, and DP-noised stat release.

All follow the repo's determinism contract: integer-mixer uniforms
instead of RNG, explicit rounding, every computed column aliased
identically in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import local_rows, money_sum, money_sum_2dec, query, small_sort

# The corpus mixture spec: per-language token-share weights (the
# DoReMi/Pile-style knob a training run sets). Literal here so the
# oracle can restate it as VALUES.
_MIX_WEIGHTS = [
    ("en", 0.40),
    ("zh", 0.20),
    ("de", 0.15),
    ("fr", 0.15),
    ("es", 0.10),
]


@query(
    "q250_mixture_token_budget",
    oracle="""
    WITH tot AS (SELECT sum(n_chars) AS total FROM documents),
    w(lang, wt) AS (VALUES
      ('en', 0.40), ('zh', 0.20), ('de', 0.15),
      ('fr', 0.15), ('es', 0.10)),
    budg AS (
      SELECT w.lang,
             CAST(floor(tot.total * w.wt * 0.3) AS BIGINT) AS budget
      FROM w, tot
    ),
    pri AS (
      SELECT doc_id, lang, n_chars,
             (doc_id * 2654435761 + 1013904223) % 1000000 AS pri
      FROM documents
    ),
    cum AS (
      SELECT lang, doc_id, n_chars,
             sum(n_chars) OVER (
               PARTITION BY lang ORDER BY pri, doc_id
             ) AS c
      FROM pri
    ),
    kept AS (
      SELECT cum.lang, doc_id, n_chars
      FROM cum JOIN budg ON cum.lang = budg.lang
      WHERE c - n_chars < budget
    )
    SELECT k.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(k.n_chars) AS BIGINT) AS tokens,
           b.budget
    FROM kept k JOIN budg b ON k.lang = b.lang
    GROUP BY k.lang, b.budget
    ORDER BY k.lang
    """,
)
def q250_mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling to a token budget: given per-language
    mixture weights and a 30%-of-corpus total budget, pick a
    deterministic doc subset per language whose token (char) mass
    fills that language's share — the curriculum/mixture step every
    LLM data pipeline runs between dedup and packing.

    Mechanics: an integer-mixer priority orders each language's docs
    reproducibly (no RNG), a PER-LANGUAGE window computes the running
    token prefix sum, and the doc that crosses the budget is the last
    one kept. Scale: the window partitions by language (each
    partition's sort is distributed by key, never a global order);
    the only driver scalar is the corpus-total aggregate, and the
    budget frame is dimension-sized. Output is the per-language
    achievement summary (docs, tokens, budget) — bounded by the
    number of domains at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    weights = local_rows(spark, _MIX_WEIGHTS, "lang string, wt double")
    budg = weights.select(
        "lang",
        F.floor(F.lit(float(total)) * F.col("wt") * F.lit(0.3))
        .cast("bigint")
        .alias("budget"),
    )
    pri = (
        F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223)
    ) % F.lit(1000000)
    win = Window.partitionBy("lang").orderBy("pri", "doc_id")
    cum = docs.select(
        "doc_id", "lang", "n_chars", pri.alias("pri")
    ).withColumn("c", F.sum("n_chars").over(win))
    kept = cum.join(F.broadcast(budg), "lang").filter(
        F.col("c") - F.col("n_chars") < F.col("budget")
    )
    out = kept.groupBy("lang", "budget").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("tokens"),
    ).select("lang", "n_docs", "tokens", "budget")
    return small_sort(out, "lang")


_AUDIT_RULES = [
    {"type": "min_len", "col": "text", "value": 200},
    {"type": "lang_in", "col": "lang", "values": ["en", "de", "fr", "es"]},
    {"type": "max_word_len", "col": "text", "value": 7},
    {"type": "min_words", "col": "text", "value": 40},
]


@query(
    "q251_filter_rejection_audit",
    oracle="""
    SELECT reason,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(round(count(*) * 1.0 /
                      (SELECT count(*) FROM documents), 6) AS DOUBLE)
               AS share
    FROM (
      SELECT CASE
        WHEN NOT (length(text) >= 200) THEN '0:min_len'
        WHEN NOT (lang IN ('en', 'de', 'fr', 'es')) THEN '1:lang_in'
        WHEN NOT (list_max(list_transform(string_split(text, ' '),
                                          w -> length(w))) <= 7)
          THEN '2:max_word_len'
        WHEN NOT (length(list_filter(string_split(text, ' '),
                                     w -> length(w) > 0)) >= 40)
          THEN '3:min_words'
        ELSE 'kept' END AS reason
      FROM documents
    )
    GROUP BY reason
    ORDER BY reason
    """,
)
def q251_filter_rejection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection-reason breakdown for the declarative filter DSL
    (q216's spec language): each doc is attributed to the FIRST rule
    it fails, so the output funnel says exactly which config line
    shrank the corpus — the audit every filter-config change review
    wants. The reason column is compiled by the SAME rule compiler
    as the fused keep-predicate (operators/dedup.py::
    filter_rejection_audit), so audit and filter cannot drift.
    Scale: one scan, one codegen'd CASE, one hash aggregate over a
    handful of reason labels; the share denominator is a scalar
    subquery (broadcast), never a window."""
    from distcpplus_spark.operators.dedup import filter_rejection_audit

    docs = load_table(spark, sf_dir, "documents")
    reason, _labels = filter_rejection_audit(_AUDIT_RULES)
    total = docs.count()
    out = (
        docs.select(reason.alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").alias("n_docs"))
        .withColumn(
            "share",
            F.round(F.col("n_docs") / F.lit(float(total)), 6),
        )
    )
    return small_sort(out, "reason")


@query(
    "q252_incremental_lsh_dedup",
    # doc set bounded to doc_id < 5000 on BOTH sides: the fixture's
    # 31-word vocabulary gives random documents high ambient Jaccard,
    # so minhash buckets degenerate toward all-pairs as the corpus
    # grows — at sf1 (50k docs) candidates explode quadratically in
    # BOTH engines (the sf1 sweep wedged here). Real corpora have
    # near-zero ambient similarity (the banding tuner q404 exists for
    # picking bands against measured collision rates); the bound is a
    # no-op at the sf0.01 driver gate (500 docs) and at sf0.1.
    oracle="""
    WITH sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(length(text) - 7, 0) + 1),
          i -> substr(text, CAST(i AS INTEGER), 8)))) AS shingle
        FROM documents WHERE doc_id < 5000)
    ),
    sig AS (
      SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
      FROM sh, (VALUES (0), (1), (2), (3)) seeds(seed)
      GROUP BY doc_id, seed
    ),
    cand AS (
      SELECT n.doc_id AS new_id, h.doc_id AS hist_id
      FROM sig n JOIN sig h
        ON n.seed = h.seed AND n.minhash = h.minhash
      WHERE n.doc_id % 2 = 1 AND h.doc_id % 2 = 0
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
      SELECT c.new_id, c.hist_id, count(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.new_id
      JOIN sh b ON b.doc_id = c.hist_id AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT i.new_id, i.hist_id,
             round(n_common /
                   CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS jac
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.new_id
      JOIN sizes sb ON sb.doc_id = i.hist_id
    ),
    best AS (
      SELECT new_id, hist_id, jac FROM (
        SELECT new_id, hist_id, jac,
               row_number() OVER (
                 PARTITION BY new_id ORDER BY jac DESC, hist_id
               ) AS rk
        FROM verified WHERE jac >= 0.5
      ) WHERE rk = 1
    )
    SELECT d.doc_id AS new_id,
           CAST(b.hist_id AS BIGINT) AS dup_of,
           CAST(b.jac AS DOUBLE) AS jaccard
    FROM documents d LEFT JOIN best b ON b.new_id = d.doc_id
    WHERE d.doc_id % 2 = 1 AND d.doc_id < 5000
    ORDER BY new_id
    """,
)
def q252_incremental_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup of an arriving batch against the stored
    corpus (operators/dedup.py::incremental_minhash_dedup): odd
    doc_ids play the new batch, even ids the persisted index side.
    Candidates come from a (seed, minhash) bucket join with >= 2 of
    4 agreeing seeds, exact shingle-Jaccard verifies ONLY those
    pairs, and each new doc gets its best verified match (tau=0.5)
    or NULL = novel. At 100 TB the index side is signature rows
    (4 small rows/doc, persisted), the batch side is the only text
    scanned, and no stage enumerates cross pairs outside LSH
    buckets — per-batch cost is O(batch + collisions), not
    O(corpus)."""
    from distcpplus_spark.operators.dedup import incremental_minhash_dedup

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 5000  # mirrors the oracle's bound (see above)
    )
    history = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    verdicts, _append = incremental_minhash_dedup(
        history, new, "doc_id", "text", k=8, n_seeds=4, min_agree=2, tau=0.5
    )
    return verdicts.orderBy("new_id")


# Literal group-id map so the noise mixer has an integer seed per
# released cell in BOTH engines (no string hashing dependence).
_DP_GIDS = [("de", 1), ("en", 2), ("es", 3), ("fr", 4), ("zh", 5)]


@query(
    "q253_dp_noised_release",
    oracle="""
    WITH g(lang, gid) AS (VALUES
      ('de', 1), ('en', 2), ('es', 3), ('fr', 4), ('zh', 5)),
    agg AS (
      SELECT lang, count(*) AS n,
             sum(least(n_chars, 2000)) AS clipped_chars
      FROM documents GROUP BY lang
    ),
    noised AS (
      SELECT a.lang,
             a.n, a.clipped_chars,
             ((g.gid * 2654435761 + 1013904223) % 1000000 + 1)
               / 1000001.0 AS u1,
             (((g.gid + 7) * 2654435761 + 1013904223) % 1000000 + 1)
               / 1000001.0 AS u2
      FROM agg a JOIN g ON a.lang = g.lang
    )
    SELECT lang,
           CAST(round(n + (-1.0 / 0.5) *
             (CASE WHEN u1 < 0.5 THEN -1.0 ELSE 1.0 END) *
             ln(1 - 2 * abs(u1 - 0.5)), 4) AS DOUBLE) AS dp_count,
           CAST(round(clipped_chars + (-2000.0 / 0.5) *
             (CASE WHEN u2 < 0.5 THEN -1.0 ELSE 1.0 END) *
             ln(1 - 2 * abs(u2 - 0.5)), 4) AS DOUBLE) AS dp_chars,
           CAST(1.0 AS DOUBLE) AS epsilon_total
    FROM noised
    ORDER BY lang
    """,
)
def q253_dp_noised_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private corpus statistics release: per-language
    doc count (sensitivity 1) and CLIPPED char total (per-doc clip
    at 2000 => sensitivity 2000), each with Laplace(b = sens/eps)
    noise at eps = 0.5, total budget eps = 1.0 — the mechanism a
    data steward runs before publishing corpus composition stats.
    Noise is the inverse-CDF transform of the repo's deterministic
    integer-mixer uniform (seeded per released cell), so the
    mechanism is exactly reproducible in the oracle — swap the
    mixer for a real RNG in production; the accounting and clipping
    are the graded substance. Scale: one hash aggregate; noise is
    applied to the dimension-sized result."""
    docs = load_table(spark, sf_dir, "documents")
    gids = local_rows(spark, _DP_GIDS, "lang string, gid int")
    agg = docs.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.least(F.col("n_chars"), F.lit(2000))).alias("clipped_chars"),
    )

    def _u(seed_col):
        return (
            (seed_col * F.lit(2654435761) + F.lit(1013904223))
            % F.lit(1000000)
            + 1
        ) / F.lit(1000001.0)

    def _laplace(u, b):
        sign = F.when(u < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        return F.lit(-b) * sign * F.log(1 - 2 * F.abs(u - F.lit(0.5)))

    j = agg.join(F.broadcast(gids), "lang")
    u1 = _u(F.col("gid"))
    u2 = _u(F.col("gid") + 7)
    out = j.select(
        "lang",
        F.round(F.col("n") + _laplace(u1, 1.0 / 0.5), 4).alias("dp_count"),
        F.round(
            F.col("clipped_chars") + _laplace(u2, 2000.0 / 0.5), 4
        ).alias("dp_chars"),
        F.lit(1.0).alias("epsilon_total"),
    )
    return small_sort(out, "lang")


@query(
    "q254_partitioned_upsert_gated",
    oracle="""
    WITH upd(doc_id, source, n_chars) AS (VALUES
      (1, 'src1', 111111), (2, 'src0', 222222), (100000, 'src2', 42)),
    base AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id < 120
    ),
    moved_old AS (
      SELECT b.source FROM base b JOIN upd u ON b.doc_id = u.doc_id
      WHERE b.source <> u.source
    ),
    parts AS (
      SELECT source FROM upd UNION SELECT source FROM moved_old
    ),
    np AS (SELECT count(*) AS n FROM parts),
    final AS (
      SELECT doc_id, source, n_chars FROM upd
      UNION ALL
      SELECT doc_id, source, n_chars FROM base
      WHERE doc_id NOT IN (SELECT doc_id FROM upd)
    )
    SELECT f.doc_id, f.source, CAST(f.n_chars AS BIGINT) AS n_chars,
           CAST(np.n AS INTEGER) AS n_partitions_rewritten
    FROM final f, np
    WHERE f.doc_id IN (1, 2, 100000) OR f.n_chars > 100000
    ORDER BY f.doc_id
    """,
)
def q254_partitioned_upsert_gated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x19's partition-pruned upsert under the full driver hash gate:
    the oracle restates upsert semantics relationally (replace-by-
    key, insert-unmatched, rewrite set = batch partitions ∪ moved
    keys' old partitions) while the engine actually round-trips the
    table through disk via operators/upsert.py::upsert_partitioned.
    Proves both the merged STATE and the REWRITE-SET SIZE — the
    scale contract (a 100 TB table absorbs a 3-row batch by
    rewriting 3-4 partitions) is now itself hash-checked."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.operators.upsert import upsert_partitioned

    root = _tf.mkdtemp(prefix="q254_upsert_")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .filter(F.col("doc_id") < 120)
    )
    docs.write.mode("overwrite").partitionBy("source").parquet(root)
    updates = spark.createDataFrame(
        [
            (1, "src1", 111_111),
            (2, "src0", 222_222),
            (100_000, "src2", 42),
        ],
        "doc_id BIGINT, source STRING, n_chars BIGINT",
    )
    try:
        n_rewritten = upsert_partitioned(
            spark, root, updates, key="doc_id", partition_col="source"
        )
        rows = (
            spark.read.parquet(root)
            .filter(
                F.col("doc_id").isin(1, 2, 100_000)
                | (F.col("n_chars") > 100_000)
            )
            .select(
                "doc_id",
                "source",
                "n_chars",
                F.lit(n_rewritten).alias("n_partitions_rewritten"),
            )
            .orderBy("doc_id")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows,
        "doc_id BIGINT, source STRING, n_chars BIGINT, "
        "n_partitions_rewritten INT",
    ).orderBy("doc_id")


@query(
    "q255_chunk_split_plan_gated",
    oracle="""
    WITH meta AS (
      SELECT source || '/' || doc_id || '.txt' AS relative_dst,
             CAST(n_chars AS BIGINT) AS length
      FROM documents
    ),
    chunked AS (
      SELECT relative_dst, length,
             CAST(greatest(ceil(length / 512.0), 1) AS INTEGER)
               AS n_chunks
      FROM meta
    )
    SELECT relative_dst, length, n_chunks,
           CAST(u.i - 1 AS INTEGER) AS chunk_idx,
           CAST((u.i - 1) * 512 AS BIGINT) AS "offset",
           CAST(least(512, length - (u.i - 1) * 512) AS BIGINT)
               AS chunk_len
    FROM chunked, LATERAL unnest(range(1, n_chunks + 1)) u(i)
    ORDER BY relative_dst, chunk_idx
    """,
)
def q255_chunk_split_plan_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x12's chunked-copy split planning under the driver hash gate:
    the SAME operator (operators/copier.py::split_into_chunks) that
    plans real-filesystem chunk tasks runs here over the derived
    doc-metadata listing (the etl.py oracle device), so every chunk
    row — index, byte offset, tail-chunk length, ceil-division
    count — is value-checked against relational algebra. 512-byte
    chunks over n_chars-sized 'files' exercise multi-chunk,
    exact-multiple, and sub-chunk cases present in the fixture."""
    from distcpplus_spark.operators.copier import split_into_chunks

    docs = load_table(spark, sf_dir, "documents")
    listing = docs.select(
        F.concat_ws(
            "/",
            "source",
            F.concat(F.col("doc_id").cast("string"), F.lit(".txt")),
        ).alias("relative_dst"),
        F.col("n_chars").cast("bigint").alias("length"),
        F.lit(False).alias("is_dir"),
    )
    return (
        split_into_chunks(listing, chunk_bytes=512)
        .select(
            "relative_dst",
            "length",
            "n_chunks",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "offset",
            "chunk_len",
        )
        .orderBy("relative_dst", "chunk_idx")
    )


@query(
    "q256_bloom_prefilter_join",
    oracle="""
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0
                AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_nationkey < 5
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def q256_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join (operators/bloom.py::bloom_prefilter_join):
    a ~4%-selective customer dim builds a sharded Bloom bitmap, a
    map-only Arrow UDF drops provably-unmatched orders BEFORE the
    join, and the exact equi-join cleans up false positives — result
    identical to the plain join (which is what the oracle runs), but
    the shuffled fact volume tracks dim selectivity instead of table
    size. tests/test_bloom.py asserts the reduction itself. The
    explicit-operator form matters when AQE's own runtime filter
    can't see through an API boundary; with a broadcast-sized dim
    Spark would broadcast anyway — the target regime is a dim too
    big to broadcast but selective against the fact."""
    from distcpplus_spark.operators.bloom import bloom_prefilter_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") < 5)
    )
    joined = bloom_prefilter_join(
        spark, orders, cust, "o_custkey", "c_custkey",
        num_shards=16, bits_per_shard=1 << 16,
    )
    out = joined.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("revenue"),
    )
    return small_sort(out, "c_nationkey")


@query(
    "q257_image_ahash_neardup_gated",
    oracle="""
    WITH px AS (
      SELECT d.doc_id, x.i AS x, y.i AS y,
        CASE WHEN
          (CASE WHEN ((x.i*31 + y.i*17 + (d.doc_id % 10)*7) % 97) > 40
                THEN 1 ELSE 0 END)
          + (CASE WHEN (x.i + y.i*16) = (d.doc_id // 10) * 37
                  THEN 1 ELSE 0 END) = 1
        THEN 1 ELSE 0 END AS wh
      FROM documents d, range(0,16) x(i), range(0,16) y(i)
      WHERE d.doc_id < 80
    ),
    tot AS (SELECT doc_id, sum(wh) AS k_total FROM px GROUP BY doc_id),
    blocks AS (
      SELECT doc_id, (y // 2) * 8 + (x // 2) AS idx, sum(wh) AS k
      FROM px GROUP BY doc_id, (y // 2) * 8 + (x // 2)
    ),
    bits AS (
      SELECT b.doc_id, b.idx,
             CASE WHEN 64 * b.k > t.k_total THEN 1 ELSE 0 END AS bit
      FROM blocks b JOIN tot t USING (doc_id)
    ),
    h AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN idx >= 2
                      THEN bit * (CAST(1 AS BIGINT)
                                  << CAST(63 - idx AS INTEGER))
                      ELSE 0 END) AS BIGINT) AS phash
      FROM bits GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, CAST(b.i AS INTEGER) AS band_idx,
             (phash >> CAST(b.i * 16 AS INTEGER)) & 65535 AS band_val
      FROM h, range(0,4) b(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS media_a, bb.doc_id AS media_b
      FROM bands a JOIN bands bb
        ON a.band_idx = bb.band_idx AND a.band_val = bb.band_val
       AND a.doc_id < bb.doc_id
    )
    SELECT c.media_a, c.media_b,
           CAST(bit_count(xor(ha.phash, hb.phash)) AS INTEGER) AS hamming
    FROM cand c
    JOIN h ha ON ha.doc_id = c.media_a
    JOIN h hb ON hb.doc_id = c.media_b
    WHERE bit_count(xor(ha.phash, hb.phash)) <= 6
    ORDER BY media_a, media_b
    """,
)
def q257_image_ahash_neardup_gated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x17's visual near-dup pipeline under the FULL driver hash
    gate: textured BMPs are synthesized in executors, decoded by the
    engine's real BMP parser, average-hashed, band-joined, and
    XOR-verified — and the ORACLE recomputes the identical 62-bit
    hashes relationally. The closed form works because for binary
    images the ahash bit comparison reduces to integers: with
    r=g=b, cell > mean(cells) iff 64*block_whites > total_whites
    (the BT.601 luma scale cancels), and the pattern threshold (40,
    vs x17's 48) is chosen so no doc's white count is a multiple of
    64 — float rounding then can never flip a strict comparison, so
    the gate is exact, not luck. Scale shape unchanged from x17:
    band equi-join candidates, never all-pairs."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import struct

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                g, v = int(did) % 10, int(did) // 10
                w = h = 16
                px = bytearray()
                row_bytes = (w * 3 + 3) & ~3
                for y in range(h - 1, -1, -1):  # BMP is bottom-up
                    line = bytearray()
                    for x in range(w):
                        lum = (
                            255
                            if ((x * 31 + y * 17 + g * 7) % 97) > 40
                            else 0
                        )
                        if (x + y * 16) % 256 == v * 37:
                            lum = 255 - lum
                        line += bytes((lum, lum, lum))
                    px += line + b"\x00" * (row_bytes - w * 3)
                hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
                dib = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                    2835, 2835, 0, 0,
                )
                rows.append((int(did), hdr + dib + bytes(px)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    feats = extract_image_features(
        docs.select("doc_id").mapInPandas(synth, media_schema)
    ).select("media_id", "phash")
    bands = feats.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("phash", i * 16) % (1 << 16)
                    for i in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 6)
    )
    return small_sort(pairs, "media_a", "media_b")


def _planted_clustered_vectors(
    ids: DataFrame, cluster=None
) -> DataFrame:
    """Deterministic clustered 16-dim geometry over vec_id: 8
    one-hot-ish cluster directions (scale 5.0) + mixer noise
    (±0.1) — the closed-form fixture q258/q279's ANN recall
    contracts need, since the real embeddings table is
    near-orthogonal (no honest neighbor structure). ``cluster``
    overrides the cluster-id expression (default vec_id % 8 —
    q279 passes (vec_id // 2) % 8 so its parity split puts both
    halves in every cluster)."""
    c = F.col("vec_id") % 8 if cluster is None else cluster

    def comp(d):
        noise = (
            (
                (F.col("vec_id") * 16 + d) * F.lit(2654435761)
                + F.lit(1013904223)
            )
            % F.lit(1000)
        ) / F.lit(1000.0) - F.lit(0.5)
        return (
            F.when(d == c, F.lit(5.0)).otherwise(F.lit(0.0))
            + noise * F.lit(0.2)
        )

    return ids.select(
        "vec_id",
        F.transform(F.sequence(F.lit(0), F.lit(15)), comp).alias(
            "embedding"
        ),
    ).localCheckpoint(eager=True)


@query(
    "q258_lsh_multiprobe_recall_bound",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS n_queries,
           CAST(5 AS BIGINT) AS k,
           CAST(1 AS BOOLEAN) AS recall_at_least_80pct
    """,
)
def q258_lsh_multiprobe_recall_bound(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-probe hyperplane LSH under a recall CONTRACT (the q232
    device, closing the x13 gap): x13 stays rows-only because the
    FIXTURE embeddings are near-orthogonal — no ANN method has an
    honest bound there — so this query plants a clustered geometry
    (8 one-hot-ish clusters + mixer noise, derived closed-form from
    vec_id, scale-free) where near-neighbor structure EXISTS, then
    requires multiprobe recall@5 >= 0.8 against exact brute force.
    Everything is deterministic (seeded planes, mixer noise), so the
    boolean is stable across SFs (measured recall 1.0 at sf0.001/
    0.01/0.1 — the 0.8 bar leaves honest headroom). Scale shape: bucket + Hamming-1
    probes scan ~(planes+1)/2^planes of the corpus per query."""
    from distcpplus_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    vecs = _planted_clustered_vectors(
        load_table(spark, sf_dir, "embeddings").select("vec_id")
    )
    queries = vecs.filter(F.col("vec_id") < 10)
    approx = lsh_topk(
        vecs, queries, "embedding", "vec_id",
        k=5, n_planes=6, multi_probe=True,
    )
    bf = brute_force_topk(vecs, queries, "embedding", "vec_id", k=5)
    hits = (
        approx.select("query_id", "corpus_id")
        .join(bf.select("query_id", "corpus_id"), ["query_id", "corpus_id"])
        .count()
    )
    total = bf.count()
    n_q = queries.count()
    return spark.createDataFrame(
        [(int(n_q), 5, bool(hits / total >= 0.8))],
        "n_queries BIGINT, k BIGINT, recall_at_least_80pct BOOLEAN",
    )


def _amplified_lsh_oracle() -> str:
    """Generate the x10-mirror oracle: the SAME seeded hyperplanes the
    engine uses (make_hyperplanes is pure python — shared source of
    truth), embedded as SQL literals via repr() (shortest-round-trip
    floats parse back to the identical double)."""
    from distcpplus_spark.operators.similarity import make_hyperplanes

    sigs = []
    for seed in (42, 43, 44):
        planes = make_hyperplanes(64, 4, seed)
        bits = " || ".join(
            "(CASE WHEN list_dot_product(v, ["
            + ", ".join(repr(c) for c in plane)
            + "]) >= 0 THEN '1' ELSE '0' END)"
            for plane in planes
        )
        sigs.append(bits)
    return f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 200
    ),
    sig AS (
      SELECT vec_id, v,
             {sigs[0]} AS s1,
             {sigs[1]} AS s2,
             {sigs[2]} AS s3
      FROM vecs
    ),
    cand AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib FROM sig a JOIN sig b
        ON a.s1 = b.s1 AND a.vec_id < b.vec_id
      UNION
      SELECT a.vec_id, b.vec_id FROM sig a JOIN sig b
        ON a.s2 = b.s2 AND a.vec_id < b.vec_id
      UNION
      SELECT a.vec_id, b.vec_id FROM sig a JOIN sig b
        ON a.s3 = b.s3 AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT c.ia AS id_a, c.ib AS id_b,
             list_dot_product(va.v, vb.v) /
               (sqrt(list_dot_product(va.v, va.v)) *
                sqrt(list_dot_product(vb.v, vb.v))) AS raw
      FROM cand c
      JOIN vecs va ON va.vec_id = c.ia
      JOIN vecs vb ON vb.vec_id = c.ib
    )
    SELECT id_a, id_b, CAST(round(raw, 6) AS DOUBLE) AS cos_sim
    FROM scored WHERE raw >= 0.25
    ORDER BY id_a, id_b
    """


@query("q259_lsh_amplified_pairs_gated", oracle=_amplified_lsh_oracle())
def q259_lsh_amplified_pairs_gated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x10's OR-amplified LSH pair search under the FULL hash gate:
    the oracle re-derives the three seeded hyperplane sets from the
    same make_hyperplanes source the engine uses, recomputes every
    sign signature and candidate union relationally, and scores
    candidates with the same sequential dot product — so bucket
    membership, amplification, dedupe, AND the exact cosine values
    are all value-checked. Scale shape unchanged: per-seed bucket
    equi-joins, one scoring pass over the deduped union."""
    from distcpplus_spark.operators.similarity import (
        pairwise_above_threshold_amplified,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 200
    )
    return (
        pairwise_above_threshold_amplified(
            emb, "embedding", "vec_id", threshold=0.25, n_planes=4
        )
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy("id_a", "id_b")
    )


@query(
    "q260_pipeline_runner_lineage",
    oracle="""
    WITH filtered AS (
      SELECT doc_id, lang, text, n_chars FROM documents
      WHERE length(text) >= 200 AND lang IN ('en', 'de', 'fr', 'es')
        AND list_max(list_transform(string_split(text, ' '),
                                    w -> length(w))) <= 7
        AND length(list_filter(string_split(text, ' '),
                               w -> length(w) > 0)) >= 40
    ),
    dedup AS (
      SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY text ORDER BY doc_id)
                 AS rn
        FROM filtered) WHERE rn = 1
    ),
    tot AS (SELECT sum(n_chars) AS total FROM dedup),
    w(lang, wt) AS (VALUES
      ('en', 0.45), ('de', 0.20), ('fr', 0.20), ('es', 0.15)),
    budg AS (
      SELECT w.lang,
             CAST(floor(tot.total * w.wt * 0.3) AS BIGINT) AS budget
      FROM w, tot
    ),
    cum AS (
      SELECT d.lang, d.doc_id, d.n_chars,
             sum(d.n_chars) OVER (PARTITION BY d.lang ORDER BY
               (d.doc_id * 2654435761 + 1013904223) % 1000000,
               d.doc_id) AS c
      FROM dedup d
    ),
    kept AS (
      SELECT cum.lang, doc_id, n_chars
      FROM cum JOIN budg ON cum.lang = budg.lang
      WHERE c - n_chars < budget
    ),
    train AS (
      SELECT * FROM kept
      WHERE (doc_id * 2654435761 + 1013904223) % 10 <> 0
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS stage, 'filter_rules' AS op,
             (SELECT count(*) FROM documents) AS rows_in,
             (SELECT count(*) FROM filtered) AS rows_out
      UNION ALL
      SELECT 2, 'exact_dedup',
             (SELECT count(*) FROM filtered),
             (SELECT count(*) FROM dedup)
      UNION ALL
      SELECT 3, 'mixture_budget',
             (SELECT count(*) FROM dedup),
             (SELECT count(*) FROM kept)
      UNION ALL
      SELECT 4, 'hash_split',
             (SELECT count(*) FROM kept),
             (SELECT count(*) FROM train)
    ) ORDER BY stage
    """,
)
def q260_pipeline_runner_lineage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The declarative pipeline runner (plans/pipeline.py) end to
    end: filter DSL -> exact dedup -> mixture-to-budget ->
    deterministic train split, one spec, with the per-stage row
    lineage funnel as the gated output — the reviewable artifact a
    config change produces. The oracle restates all four stages
    relationally, so the COMPOSITION (stage order, survivor
    threading, count attribution) is value-checked, not just each
    operator in isolation. Scale: the runner adds nothing to its
    stages' plans (one count action per boundary here; observe()
    metrics at 100 TB — see module docstring)."""
    from distcpplus_spark.plans.pipeline import run_pipeline

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    spec = {
        "stages": [
            {"op": "filter_rules", "rules": _AUDIT_RULES},
            {"op": "exact_dedup", "id_col": "doc_id", "text_col": "text"},
            {
                "op": "mixture_budget",
                "group_col": "lang",
                "size_col": "n_chars",
                "id_col": "doc_id",
                "weights": [
                    ("en", 0.45), ("de", 0.20), ("fr", 0.20), ("es", 0.15)
                ],
                "frac": 0.3,
            },
            {"op": "hash_split", "id_col": "doc_id", "keep": "train"},
        ]
    }
    _final, lineage = run_pipeline(docs, spec)
    return local_rows(spark,
        lineage, "stage BIGINT, op STRING, rows_in BIGINT, rows_out BIGINT"
    ).orderBy("stage")


@query(
    "q261_substring_contamination_scan",
    oracle="""
    WITH pats AS (
      SELECT DISTINCT substr(text, 11, 16) AS pat FROM documents
      WHERE doc_id % 41 = 0 AND length(text) >= 32
    ),
    hits AS (
      SELECT d.doc_id, count(DISTINCT p.pat) AS n_matched
      FROM documents d JOIN pats p ON contains(d.text, p.pat)
      WHERE d.doc_id % 41 <> 0
      GROUP BY d.doc_id
    )
    SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched
    FROM hits ORDER BY doc_id
    """,
)
def q261_substring_contamination_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-substring contamination scan: which training docs
    contain any 16-char span lifted from the held-out set (doc_id %
    41 == 0 stands in for the benchmark, as in q108)? q108 counts
    word-bigram overlap — the fuzzy screen; this is the EXACT
    long-span detector (the Lee et al./eval-decontamination regime,
    character-level so tokenization can't hide a hit). Engine path:
    every doc explodes into its distinct 16-char windows
    (shingle-class cost), the pattern set broadcasts, the equi-join
    is map-side, and the count aggregates per doc — no all-pairs
    contains() over the corpus. At 100 TB with a large pattern set,
    windows and patterns both become 64-bit rolling hashes and the
    same join prunes to hash-collision candidates before an exact
    recheck; the broadcast form here is the small-pattern-set
    special case."""
    docs = load_table(spark, sf_dir, "documents")
    pats = (
        docs.filter((F.col("doc_id") % 41 == 0) & (F.length("text") >= 32))
        .select(F.substring("text", 11, 16).alias("pat"))
        .distinct()
    )
    windows = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length("text") - 15),
            lambda i: F.substring("text", i, F.lit(16)),
        )
    )
    corpus = (
        docs.filter((F.col("doc_id") % 41 != 0) & (F.length("text") >= 16))
        .select("doc_id", F.explode(windows).alias("win"))
    )
    out = (
        corpus.join(F.broadcast(pats), corpus.win == pats.pat)
        .groupBy("doc_id")
        .agg(F.count_distinct("pat").alias("n_matched"))
    )
    return out.orderBy("doc_id")


@query(
    "q262_tfrecord_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           CAST(bit_xor(CAST(concat('0x', substr(md5(text), 1, 15))
                             AS BIGINT)) AS BIGINT) AS sig
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q262_tfrecord_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRecord as a first-class training-shard sink/source
    (sources/tfrecord.py): documents are written as CRC-32C-framed
    tf.train.Example shards (hand-encoded protobuf wire format —
    public spec, no protobuf runtime) and read back
    frame-verified, then fingerprinted per language: doc count,
    char mass, and a bit_xor of 60-bit md5 prefixes — any lost,
    duplicated, or corrupted record flips the signature vs the
    oracle's direct scan. The avro lesson applies: every aggregate
    is CAST to BIGINT. Scale: one shard per partition on write,
    one task per shard on read — the file-per-task unit shared
    with the WARC path."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.tfrecord import (
        read_tfrecord,
        write_tfrecord_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    root = _tf.mkdtemp(prefix="q262_tfr_")
    try:
        write_tfrecord_shards(docs.repartition(8), root)
        back = read_tfrecord(
            spark, root, "doc_id bigint, text string, lang string"
        )
        sig = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast(
            "bigint"
        )
        rows = (
            back.withColumn("_sig", sig)
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
                F.expr("bit_xor(_sig)").cast("bigint").alias("sig"),
            )
            .orderBy("lang")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "lang STRING, n_docs BIGINT, sum_chars BIGINT, sig BIGINT"
    ).orderBy("lang")


def _tone_wav_synth(batches):
    """Deterministic two-tone PCM WAV per doc: exact FFT bins
    k_a = 3 + doc_id % 13 and k_b = 20 + doc_id % 29 of a 256-sample
    frame (leakage-free, equal amplitudes) — shared by q263's
    corpus and query sides."""
    import struct

    import math

    import pandas as pd

    for pdf in batches:
        rows = []
        for did in pdf["doc_id"]:
            did = int(did)
            ka, kb = 3 + did % 13, 20 + did % 29
            n = 256
            pcm = b"".join(
                struct.pack(
                    "<h",
                    int(
                        12000 * math.sin(2 * math.pi * ka * t / n)
                        + 12000 * math.sin(2 * math.pi * kb * t / n)
                    ),
                )
                for t in range(n)
            )
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(pcm))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                + b"data"
                + struct.pack("<I", len(pcm))
            )
            rows.append((did, hdr + pcm))
        yield pd.DataFrame(rows, columns=["media_id", "content"])


@query(
    "q263_audio_constellation_match",
    oracle="""
    SELECT a.doc_id AS query_id, b.doc_id AS corpus_id
    FROM documents a JOIN documents b
      ON a.doc_id % 13 = b.doc_id % 13
     AND a.doc_id % 29 = b.doc_id % 29
     AND a.doc_id <> b.doc_id
    WHERE a.doc_id % 10 = 0
    ORDER BY query_id, corpus_id
    """,
)
def q263_audio_constellation_match(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Landmark audio matching end to end under the hash gate:
    two-tone WAVs are synthesized per doc in executors, decoded by
    the engine's own RIFF/PCM parser, FFT'd, peak-paired into
    constellation hashes (operators/multimodal.py::
    audio_constellation_hashes), and snippet queries (doc_id % 10
    == 0, identically synthesized) match the corpus by hash
    equi-join. The oracle is pure arithmetic: two docs share their
    (k_a, k_b) peak pair iff doc_id agrees mod 13 AND mod 29 — so
    a single shifted FFT bin, mis-sorted peak, or hash-packing bug
    empties or pollutes the join. Scale: fingerprints are small
    integer rows, matching is a bucket join — audio never moves
    after the map-side decode."""
    from pyspark.sql import types as T

    from distcpplus_spark.operators.multimodal import (
        audio_constellation_hashes,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    corpus_fp = audio_constellation_hashes(
        docs.mapInPandas(_tone_wav_synth, media_schema)
    )
    query_fp = audio_constellation_hashes(
        docs.filter(F.col("doc_id") % 10 == 0).mapInPandas(
            _tone_wav_synth, media_schema
        )
    )
    out = (
        query_fp.alias("q")
        .join(
            corpus_fp.alias("c"),
            (F.col("q.chash") == F.col("c.chash"))
            & (F.col("q.media_id") != F.col("c.media_id")),
        )
        .select(
            F.col("q.media_id").alias("query_id"),
            F.col("c.media_id").alias("corpus_id"),
        )
        .distinct()
    )
    return out.orderBy("query_id", "corpus_id")


@query(
    "q264_interval_overlap_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, event_type, ts AS s,
             ts + ((event_id % 120 + 1) * INTERVAL 1 MINUTE) AS e
      FROM events
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    win AS (
      SELECT d, CAST(d AS TIMESTAMP) + INTERVAL 8 HOUR AS ws,
             CAST(d AS TIMESTAMP) + INTERVAL 16 HOUR AS we
      FROM days
    )
    SELECT w.d AS day, ev.event_type,
           CAST(count(*) AS BIGINT) AS n_overlapping
    FROM ev JOIN win w ON ev.s < w.we AND w.ws < ev.e
    GROUP BY w.d, ev.event_type
    ORDER BY day, event_type
    """,
)
def q264_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via bucketized equi-join
    (operators/asof.py::interval_overlap_join): events become
    [ts, ts + 1..120 min) intervals, maintenance windows are
    derived 08:00-16:00 spans per day, and the overlap join runs as
    bucket-explode + equi-join + exact verify instead of the
    nested-loop plan Spark gives a raw non-equi join. The oracle IS
    that raw non-equi join (single-node is fine there), so the
    rewrite's equivalence — including half-open boundary semantics
    and cross-bucket dedupe — is value-checked. 6-hour buckets:
    each event interval touches 1-2 buckets, each window 2-3."""
    from distcpplus_spark.operators.asof import interval_overlap_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("ts").alias("s"),
        F.expr(
            "ts + make_dt_interval(0, 0, CAST(event_id % 120 + 1 AS INT), 0)"
        ).alias("e"),
    )
    win = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .select(
            "d",
            (F.col("d").cast("timestamp") + F.expr("INTERVAL 8 HOURS"))
            .alias("ws"),
            (F.col("d").cast("timestamp") + F.expr("INTERVAL 16 HOURS"))
            .alias("we"),
        )
    )
    joined = interval_overlap_join(ev, win, "s", "e", "ws", "we", 21600)
    out = joined.groupBy(
        F.col("d").alias("day"), "event_type"
    ).agg(F.count("*").alias("n_overlapping"))
    return small_sort(out, "day", "event_type")


@query(
    "q265_mojibake_repair",
    oracle="""
    WITH rep AS (
      SELECT lang,
             text || CASE WHEN doc_id % 3 = 0
                          THEN ' café ’' ELSE ' plain' END AS t
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(bit_xor(CAST(concat('0x', substr(md5(t), 1, 15))
                             AS BIGINT)) AS BIGINT) AS sig
    FROM rep GROUP BY lang ORDER BY lang
    """,
)
def q265_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake (double-encoded UTF-8) repair at corpus scale
    (operators/quality.py::repair_mojibake): a third of the docs get
    a planted cp1252-mis-decoded suffix (built by actually running
    the corruption — encode UTF-8, decode cp1252 — not by
    hand-typing bytes), the repair UDF reverses it, and the oracle
    md5-fingerprints the expected CLEAN text per language — so both
    the repair of corrupted rows AND the pass-through of clean rows
    are value-checked. Scale: map-only Arrow-batched pass on the
    ingest path; nothing shuffles but the per-language summary."""
    from distcpplus_spark.operators.quality import repair_mojibake

    moji = " café ’".encode("utf-8").decode("cp1252")
    docs = load_table(spark, sf_dir, "documents")
    corrupted = docs.select(
        "lang",
        F.concat(
            "text",
            F.when(F.col("doc_id") % 3 == 0, F.lit(moji)).otherwise(
                F.lit(" plain")
            ),
        ).alias("t_bad"),
    )
    repaired = corrupted.select(
        "lang", repair_mojibake(F.col("t_bad")).alias("t")
    )
    sig = F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("bigint")
    out = (
        repaired.withColumn("_sig", sig)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("bit_xor(_sig)").cast("bigint").alias("sig"),
        )
    )
    return small_sort(out, "lang")


@query(
    "q266_gaps_and_islands",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    isl AS (
      SELECT user_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM o
    ),
    sizes AS (
      SELECT user_id, island, count(*) AS cnt
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(cnt) AS BIGINT) AS max_len
    FROM sizes GROUP BY user_id ORDER BY user_id
    """,
)
def q266_gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (activity-burst segmentation): per user,
    events closer than 30 minutes chain into one island; report
    island count and the largest island size — the canonical
    break-flag + running-sum formulation (the batch twin of q35's
    session_window, expressed so ANY engine's window algebra can run
    it). Scale: both windows partition by user_id — one shuffle,
    no global ordering anywhere; islands never materialize as state
    beyond the running counter."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer MICROseconds: unix_timestamp() truncates to
    # seconds, so a gap of 1800.000001..1800.999999 s read as exactly
    # 1800 and chained islands DuckDB's exact interval math breaks —
    # invisible until the sf1 sweep's 1M events landed one gap in
    # that window
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > 1800 * 1_000_000
        ),
        1,
    ).otherwise(0)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = ev.withColumn("brk", brk).withColumn(
        "island", F.sum("brk").over(w2)
    )
    sizes = isl.groupBy("user_id", "island").agg(F.count("*").alias("cnt"))
    out = sizes.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("cnt").alias("max_len"),
    )
    return out.orderBy("user_id")


@query(
    "q267_tfrecord_datasource",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(bit_xor(CAST(concat('0x', substr(md5(text), 1, 15))
                             AS BIGINT)) AS BIGINT) AS sig
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q267_tfrecord_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRecord through the Spark 4 Python DataSource API:
    ``spark.read.format("tfrecord")`` (sources/pyds.py) plans one
    InputPartition per shard and parses CRC-verified Examples in
    executors — the same integration tier q245 gives WARC, so the
    training-shard format also composes with SQL USING/option
    plumbing. Fingerprint gate as q262 (per-lang count + md5-prefix
    bit_xor)."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.pyds import register_python_sources
    from distcpplus_spark.sources.tfrecord import write_tfrecord_shards

    register_python_sources(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    root = _tf.mkdtemp(prefix="q267_tfr_")
    try:
        write_tfrecord_shards(docs.repartition(8), root)
        back = (
            spark.read.format("tfrecord")
            .option("columns", "doc_id bigint, text string, lang string")
            .option("path", root)
            .load()
        )
        sig = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast(
            "bigint"
        )
        rows = (
            back.withColumn("_sig", sig)
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.expr("bit_xor(_sig)").cast("bigint").alias("sig"),
            )
            .orderBy("lang")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "lang STRING, n_docs BIGINT, sig BIGINT"
    ).orderBy("lang")


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    ]
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"CAST(round(corr({a}, {b}), 6) AS DOUBLE) AS r FROM lineitem"
        for a, b in pairs
    )
    return f"SELECT * FROM ({rows}) ORDER BY col_a, col_b"


@query("q268_correlation_matrix", oracle=_corr_oracle())
def q268_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the fact table's numeric
    measures in ONE aggregation pass: all six pairs' corr()
    accumulators ride the same partial-aggregate shuffle (one scan,
    k² tiny states — the scale-correct way to build a correlation
    matrix; per-pair passes would scan the table six times). The
    oracle unions DuckDB's corr() per pair."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    ]
    agg = li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"{a}|{b}")
            for a, b in pairs
        ]
    ).collect()[0]
    rows = [
        (a, b, float(agg[f"{a}|{b}"])) for a, b in pairs
    ]
    return local_rows(spark,
        rows, "col_a STRING, col_b STRING, r DOUBLE"
    ).orderBy("col_a", "col_b")


@query(
    "q269_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             datediff('day', f.cohort, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort, day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset IN (0, 1, 7, 14)
    GROUP BY cohort, day_offset
    ORDER BY cohort, day_offset
    """,
)
def q269_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort analysis (the product-analytics staple):
    users are cohorted by first-activity date, then counted as
    active at day offsets 0/1/7/14. Scale shape: one hash aggregate
    for cohorts (user-keyed), the cohort frame re-joins the events
    on user_id (same key — co-partitioned shuffle), distinct on
    (user, offset) then a small aggregate; no windows, no global
    sorts, output bounded by days × offsets."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.to_date("ts"), F.col("cohort")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    out = (
        activity.filter(F.col("day_offset").isin(0, 1, 7, 14))
        .groupBy("cohort", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )
    return small_sort(out, "cohort", "day_offset")


@query(
    "q270_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
             (SELECT count(*) FROM s1) AS n_users
      UNION ALL
      SELECT 2, 'click', (SELECT count(*) FROM s2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    ) ORDER BY step
    """,
)
def q270_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase, each
    step strictly AFTER the previous step's first occurrence) — the
    sequential-dependency analytics q228's regex CEP generalizes,
    here in the min-timestamp-threading form that runs as three
    user-keyed aggregates + co-partitioned joins (user_id is the
    shuffle key throughout; no windows, no ordering beyond
    per-group min)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        (1, "view", s1.count()),
        (2, "click", s2.count()),
        (3, "purchase", s3.count()),
    ]
    return local_rows(spark,
        rows, "step BIGINT, event_type STRING, n_users BIGINT"
    ).orderBy("step")


@query(
    "q271_crawl_frontier_plan",
    oracle="""
    WITH slots AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY doc_id) - 1 AS slot
      FROM documents
    )
    SELECT source,
           CAST((CAST(concat('0x', substr(md5(source), 1, 8)) AS BIGINT)
                 % 8) AS BIGINT) AS worker,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(max(slot) AS BIGINT) AS max_slot
    FROM slots
    GROUP BY source
    ORDER BY source
    """,
)
def q271_crawl_frontier_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier politeness partitioning: every URL of a host
    (source stands in) is pinned to ONE worker (hash of host mod
    worker count), and within the host URLs get sequential fetch
    slots — the invariant a polite distributed fetcher needs (no
    host is ever hit by two workers concurrently; per-host rate
    limits become local state). Scale: one window partitioned by
    host (bounded by per-host URL count) + a hash — no coordination
    structure, no global ordering. Output: per-host worker
    assignment + queue depth."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    slot = (
        F.row_number().over(
            Window.partitionBy("source").orderBy("doc_id")
        )
        - 1
    )
    worker = (
        F.conv(F.substring(F.md5("source"), 1, 8), 16, 10).cast("bigint")
        % 8
    )
    out = (
        docs.withColumn("slot", slot)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_urls"),
            F.max("slot").alias("max_slot"),
        )
        .withColumn("worker", worker)
        .select("source", "worker", "n_urls", "max_slot")
    )
    return small_sort(out, "source")


@query(
    "q272_domain_blocklist_filter",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'sub' || (doc_id % 3) || '.' || source || '.example.com'
               AS host
      FROM documents
    ),
    block(pattern) AS (VALUES
      ('src1.example.com'), ('sub2.src4.example.com'), ('example.org')),
    chains AS (
      SELECT doc_id, host,
             array_to_string(list_slice(string_split(host, '.'), i,
                             len(string_split(host, '.'))), '.') AS sfx
      FROM urls,
           LATERAL unnest(range(1, len(string_split(host, '.')) + 1))
             u(i)
    ),
    blocked AS (
      SELECT DISTINCT c.doc_id FROM chains c
      JOIN block b ON c.sfx = b.pattern
    )
    SELECT u.doc_id, u.host,
           CAST(u.doc_id IN (SELECT doc_id FROM blocked) AS BOOLEAN)
             AS is_blocked
    FROM urls u
    WHERE u.doc_id < 100
    ORDER BY u.doc_id
    """,
)
def q272_domain_blocklist_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Domain blocklist filtering with SUFFIX semantics (blocking
    'src1.example.com' blocks every subdomain of it — how real URL
    blocklists behave): each host explodes into its dot-suffix
    chain, which equi-joins the broadcast blocklist — no regex over
    the corpus, no per-pattern scans; cost is O(labels-per-host)
    rows into one map-side join at any corpus size. Output audits
    the first 100 docs' verdicts; the corpus-scale use filters on
    the same join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    host = F.concat(
        F.lit("sub"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("."),
        F.col("source"),
        F.lit(".example.com"),
    )
    urls = docs.select("doc_id", host.alias("host"))
    labels = F.split("host", "\\.")
    chain = F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )
    block = spark.createDataFrame(
        [
            ("src1.example.com",),
            ("sub2.src4.example.com",),
            ("example.org",),
        ],
        "pattern string",
    )
    blocked = (
        urls.select("doc_id", F.explode(chain).alias("sfx"))
        .join(F.broadcast(block), F.col("sfx") == F.col("pattern"))
        .select("doc_id")
        .distinct()
        .withColumn("_b", F.lit(True))
    )
    out = (
        urls.join(blocked, "doc_id", "left")
        .select(
            "doc_id",
            "host",
            F.coalesce(F.col("_b"), F.lit(False)).alias("is_blocked"),
        )
        .filter(F.col("doc_id") < 100)
    )
    return out.orderBy("doc_id")


@query(
    "q273_partition_backfill_plan",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    calendar AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                  AS DATE) AS d
      FROM bounds
    ),
    m AS (SELECT avg(n) AS a FROM daily),
    missing AS (
      SELECT c.d, CAST(0 AS BIGINT) AS n
      FROM calendar c LEFT JOIN daily dd ON c.d = dd.d
      WHERE dd.d IS NULL
    ),
    low AS (
      SELECT d, CAST(n AS BIGINT) AS n FROM daily, m WHERE n < 0.97 * a
    )
    SELECT d AS backfill_day, n AS n_events
    FROM (SELECT * FROM missing UNION ALL SELECT * FROM low)
    ORDER BY backfill_day
    """,
)
def q273_partition_backfill_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Backfill planning: which daily partitions need rebuilding?
    Two detectors union: (a) days absent from the calendar spine
    (sequence over the min/max bounds anti-joined with observed
    days — the classic missing-partition check) and (b) days whose
    volume sits below 97% of the mean daily count — the
    under-filled-partition signal a relative threshold keeps
    non-trivial at EVERY scale factor (the q164 scale-free-threshold
    lesson; a fixed cutoff empties as SF grows). Scale: daily
    counts are one tiny hash aggregate; the spine is bounded by
    calendar length, not data size."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    bounds = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    calendar = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    missing = calendar.join(daily, "d", "anti").select(
        "d", F.lit(0).cast("bigint").alias("n")
    )
    avg = daily.agg(F.avg("n")).collect()[0][0]
    low = daily.filter(F.col("n") < 0.97 * float(avg)).select(
        "d", F.col("n").cast("bigint")
    )
    out = missing.unionByName(low).select(
        F.col("d").alias("backfill_day"), F.col("n").alias("n_events")
    )
    return small_sort(out, "backfill_day")


@query(
    "q274_rate_anomaly_mad",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    med AS (
      SELECT event_type, median(n) AS m FROM hourly GROUP BY event_type
    ),
    dev AS (
      SELECT h.event_type, h.h, h.n, med.m, abs(h.n - med.m) AS ad
      FROM hourly h JOIN med ON h.event_type = med.event_type
    ),
    mad AS (
      SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.h,
           CAST(d.n AS BIGINT) AS n,
           CAST(round((d.n - d.m) / (1.4826 * mad.mad), 4) AS DOUBLE)
             AS robust_z
    FROM dev d JOIN mad ON d.event_type = mad.event_type
    WHERE mad.mad > 0
      AND abs((d.n - d.m) / (1.4826 * mad.mad)) > 2.5
    ORDER BY d.event_type, d.h
    """,
)
def q274_rate_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust rate-anomaly detection: hourly event counts per type,
    flagged when the MAD-based robust z-score (1.4826 * median
    absolute deviation ~ sigma under normality) exceeds 2.5 — the
    monitoring detector that, unlike mean/stddev, a single spike
    cannot poison. Exact medians on purpose (percentile over
    per-type groups — each group is bounded by hours-per-series,
    not corpus size); the detector frame is series-keyed
    throughout, one shuffle per aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").cast("double").alias("n"))
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("m")
    )
    dev = hourly.join(med, "event_type").withColumn(
        "ad", F.abs(F.col("n") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    z = (F.col("n") - F.col("m")) / (F.lit(1.4826) * F.col("mad"))
    out = (
        dev.join(mad, "event_type")
        .filter((F.col("mad") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_type",
            "h",
            F.col("n").cast("bigint").alias("n"),
            F.round(z, 4).alias("robust_z"),
        )
    )
    return small_sort(out, "event_type", "h")


@query(
    "q275_pipeline_with_near_dedup",
    oracle="""
    WITH docs0 AS MATERIALIZED (
      SELECT doc_id, lang, text, n_chars FROM documents
      WHERE doc_id < 10000
    ),
    filtered AS (
      SELECT doc_id, lang, text, n_chars FROM docs0
      WHERE length(text) >= 200 AND lang IN ('en', 'de', 'fr', 'es')
        AND list_max(list_transform(string_split(text, ' '),
                                    w -> length(w))) <= 7
        AND length(list_filter(string_split(text, ' '),
                               w -> length(w) > 0)) >= 40
    ),
    dedup AS (
      SELECT doc_id, lang, text, n_chars FROM (
        SELECT doc_id, lang, text, n_chars,
               row_number() OVER (PARTITION BY text ORDER BY doc_id)
                 AS rn
        FROM filtered) WHERE rn = 1
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(length(text) - 7, 0) + 1),
          i -> substr(text, CAST(i AS INTEGER), 8)))) AS shingle
        FROM dedup)
    ),
    sig AS (
      SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
      FROM sh, (VALUES (0), (1), (2), (3)) seeds(seed)
      GROUP BY doc_id, seed
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b
        ON a.seed = b.seed AND a.minhash = b.minhash
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    losers AS (
      SELECT DISTINCT c.id_b FROM cand c
      JOIN (SELECT c2.id_a, c2.id_b, count(*) AS common
            FROM cand c2
            JOIN sh a ON a.doc_id = c2.id_a
            JOIN sh b ON b.doc_id = c2.id_b AND b.shingle = a.shingle
            GROUP BY c2.id_a, c2.id_b) i
        ON i.id_a = c.id_a AND i.id_b = c.id_b
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      WHERE i.common / CAST(sa.n_sh + sb.n_sh - i.common AS DOUBLE)
            >= 0.5
    ),
    neardedup AS (
      SELECT * FROM dedup WHERE doc_id NOT IN (SELECT id_b FROM losers)
    ),
    train AS (
      SELECT * FROM neardedup
      WHERE (doc_id * 2654435761 + 1013904223) % 10 <> 0
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS stage, 'filter_rules' AS op,
             (SELECT count(*) FROM docs0) AS rows_in,
             (SELECT count(*) FROM filtered) AS rows_out
      UNION ALL
      SELECT 2, 'exact_dedup',
             (SELECT count(*) FROM filtered),
             (SELECT count(*) FROM dedup)
      UNION ALL
      SELECT 3, 'near_dedup',
             (SELECT count(*) FROM dedup),
             (SELECT count(*) FROM neardedup)
      UNION ALL
      SELECT 4, 'hash_split',
             (SELECT count(*) FROM neardedup),
             (SELECT count(*) FROM train)
    ) ORDER BY stage
    """,
)
def q275_pipeline_with_near_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The pipeline runner with its near-dup stage engaged: filter
    DSL -> exact dedup -> MinHash-LSH near-dedup (portable md5
    signatures, any-of-4-seeds candidates, exact-Jaccard >= 0.5
    verify, keep-min star-collapse) -> train split, all from one
    spec, lineage gated. The oracle restates the LSH stage down to
    the candidate rule, so the runner's stage THREADING through a
    non-trivial operator is value-checked end to end."""
    from distcpplus_spark.plans.pipeline import run_pipeline

    # doc_id < 10000: no-op at the driver-gate SFs, bounds the LSH
    # candidate blowup at sf1+ — the 31-word fixture vocabulary gives
    # every doc high ambient Jaccard, so the oracle's candidate
    # triple-join inflates quadratically with SF (filled a 150 GB
    # spill at sf3). Same medicine as q252/q315; the operator's df-cap
    # lever is the production answer for real corpora.
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10000)
        .select("doc_id", "lang", "text", "n_chars")
    )
    spec = {
        "stages": [
            {"op": "filter_rules", "rules": _AUDIT_RULES},
            {"op": "exact_dedup", "id_col": "doc_id", "text_col": "text"},
            {
                "op": "near_dedup",
                "id_col": "doc_id",
                "text_col": "text",
                "threshold": 0.5,
            },
            {"op": "hash_split", "id_col": "doc_id", "keep": "train"},
        ]
    }
    _final, lineage = run_pipeline(docs, spec)
    return local_rows(spark,
        lineage, "stage BIGINT, op STRING, rows_in BIGINT, rows_out BIGINT"
    ).orderBy("stage")


@query(
    "q276_observed_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
             AS total_qty,
           CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_discounted,
           CAST((SELECT count(DISTINCT l_returnflag) FROM lineitem)
                AS BIGINT) AS n_flags
    FROM lineitem
    """,
)
def q276_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass observability via ``Observation``/``observe()``:
    row count, quantity mass, and a data-quality counter (discounted
    rows) are collected as metrics ON the same scan that feeds the
    actual aggregation — at 100 TB this is how a pipeline gets its
    health counters WITHOUT a second pass over the table (the
    DataFrame twin of the reference's in-flight copy counters,
    DistCPPlus's RECORDSKIPPED family). The oracle recomputes the
    observed values relationally, proving observe() saw every row
    exactly once."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("q276")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_quantity")).cast("long"))
        .cast("double").alias("total_qty"),
        F.sum(
            F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
        ).alias("n_discounted"),
    )
    flags = observed.select("l_returnflag").distinct().count()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                float(m["total_qty"]),
                int(m["n_discounted"]),
                int(flags),
            )
        ],
        "n_rows BIGINT, total_qty DOUBLE, n_discounted BIGINT, "
        "n_flags BIGINT",
    )


@query(
    "q277_exif_metadata_extract",
    oracle="""
    SELECT doc_id,
           CAST(doc_id % 8 + 1 AS INTEGER) AS orientation,
           'Cam' || (doc_id % 5) AS make,
           '2024:01:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
             || ' 00:00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
             AS taken_at,
           CAST(doc_id % 8 + 1 IN (5, 6, 7, 8) AS BOOLEAN)
             AS needs_transpose
    FROM documents WHERE doc_id < 120
    ORDER BY doc_id
    """,
)
def q277_exif_metadata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction for image pipelines
    (operators/multimodal.py::parse_exif): JPEG APP1 segments are
    synthesized per doc (real marker framing + a little-endian TIFF
    IFD, built by build_exif_jpeg), parsed back by the engine's own
    marker/IFD walker, and the orientation is classified into the
    needs-transpose set (5-8) — the rotate-before-resize decision
    every image ingest must make BEFORE pixels are touched. Closed
    form: all three tags derive from doc_id. Scale: map-only
    mapInPandas metadata parse; EXIF never forces an image
    decode."""
    import pandas as pd
    from pyspark.sql import types as T

    from distcpplus_spark.operators.multimodal import (
        build_exif_jpeg,
        parse_exif,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 120
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                j = build_exif_jpeg(
                    did % 8 + 1,
                    f"Cam{did % 5}",
                    f"2024:01:{did % 28 + 1:02d} 00:00:{did % 60:02d}",
                )
                ex = parse_exif(j)
                rows.append(
                    (
                        did,
                        ex.get("orientation"),
                        ex.get("make"),
                        ex.get("datetime"),
                        ex.get("orientation") in (5, 6, 7, 8),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "orientation",
                    "make",
                    "taken_at",
                    "needs_transpose",
                ],
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("orientation", T.IntegerType(), True),
            T.StructField("make", T.StringType(), True),
            T.StructField("taken_at", T.StringType(), True),
            T.StructField("needs_transpose", T.BooleanType(), True),
        ]
    )
    return docs.select("doc_id").mapInPandas(extract, schema).orderBy(
        "doc_id"
    )


@query(
    "q278_distribution_drift_psi",
    oracle="""
    WITH bucketed AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS half,
             least(CAST(n_chars // 100 AS INTEGER), 7) AS bucket
      FROM documents
    ),
    counts AS (
      SELECT half, bucket, count(*) AS n
      FROM bucketed GROUP BY half, bucket
    ),
    tot AS (SELECT half, sum(n) AS t FROM counts GROUP BY half),
    props AS (
      SELECT b.i AS bucket,
             coalesce(r.n, 0) / rt.rt + 0.0005 AS p,
             coalesce(c.n, 0) / ct.ct + 0.0005 AS q
      FROM range(0, 8) b(i)
      LEFT JOIN (SELECT bucket, CAST(n AS DOUBLE) n FROM counts
                 WHERE half = 'ref') r ON r.bucket = b.i
      LEFT JOIN (SELECT bucket, CAST(n AS DOUBLE) n FROM counts
                 WHERE half = 'cur') c ON c.bucket = b.i,
      (SELECT CAST(t AS DOUBLE) rt FROM tot WHERE half = 'ref') rt,
      (SELECT CAST(t AS DOUBLE) ct FROM tot WHERE half = 'cur') ct
    )
    SELECT CAST(b.i AS INTEGER) AS bucket,
           CAST(round(p.p, 6) AS DOUBLE) AS p_ref,
           CAST(round(p.q, 6) AS DOUBLE) AS p_cur,
           CAST(round((p.p - p.q) * ln(p.p / p.q), 6) AS DOUBLE)
             AS psi_term
    FROM range(0, 8) b(i) JOIN props p ON p.bucket = b.i
    ORDER BY bucket
    """,
)
def q278_distribution_drift_psi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distribution-drift detection via the Population Stability
    Index — the MLOps metric that flags when incoming data stopped
    looking like the training reference. Doc length is bucketed
    (100-char bins, capped), the even-id half plays the frozen
    reference and the odd-id half the current stream, and each
    bucket's PSI term (p-q)ln(p/q) is emitted (sum > 0.2 = the
    conventional 'investigate' bar). The 5e-4 additive smoothing
    keeps empty buckets finite — standard PSI practice, identical
    on both engines. Scale: two hash aggregates over 8-bucket
    frames; nothing depends on corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(
        F.floor(F.col("n_chars") / 100).cast("int"), F.lit(7)
    )
    half = F.when(F.col("doc_id") % 2 == 0, "ref").otherwise("cur")
    counts = (
        docs.select(half.alias("half"), bucket.alias("bucket"))
        .groupBy("half", "bucket")
        .agg(F.count("*").alias("n"))
    )
    buckets = spark.range(0, 8).select(F.col("id").cast("int").alias("bucket"))
    ref = counts.filter(F.col("half") == "ref").select(
        "bucket", F.col("n").alias("n_ref")
    )
    cur = counts.filter(F.col("half") == "cur").select(
        "bucket", F.col("n").alias("n_cur")
    )
    t_ref = float(ref.agg(F.sum("n_ref")).collect()[0][0])
    t_cur = float(cur.agg(F.sum("n_cur")).collect()[0][0])
    p = F.coalesce(F.col("n_ref"), F.lit(0)) / F.lit(t_ref) + 0.0005
    q = F.coalesce(F.col("n_cur"), F.lit(0)) / F.lit(t_cur) + 0.0005
    out = (
        buckets.join(F.broadcast(ref), "bucket", "left")
        .join(F.broadcast(cur), "bucket", "left")
        .select(
            "bucket",
            F.round(p, 6).alias("p_ref"),
            F.round(q, 6).alias("p_cur"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )
    return small_sort(out, "bucket")


@query(
    "q279_ann_cell_join_recall",
    oracle="""
    SELECT CAST(1 AS BOOLEAN) AS recall_at_least_80pct,
           CAST(1 AS BIGINT) AS k
    """,
)
def q279_ann_cell_join_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN JOIN between two large tables under a recall contract
    (operators/similarity.py::ann_cell_join): odd-id planted
    vectors join even-id ones through shared IVF cells — the
    dataset-alignment / cross-corpus-dedup shape where NEITHER side
    fits a broadcast, so ivf_search's query-broadcast is the wrong
    tool. Contract: top-1 recall vs exact brute force >= 0.8 on the
    clustered geometry (single-probe cell join; measured 1.0 — with
    8 planted clusters and k-means cells, left and right cluster
    members land in the same cell). Scale: the only shuffle is the
    cell-keyed equi-join; both assignments are broadcast folds."""
    from distcpplus_spark.operators.similarity import (
        ann_cell_join,
        brute_force_topk,
    )

    vecs = _planted_clustered_vectors(
        load_table(spark, sf_dir, "embeddings").select("vec_id"),
        cluster=F.floor(F.col("vec_id") / 2) % 8,
    )
    left = vecs.filter(F.col("vec_id") % 2 == 1).filter(
        F.col("vec_id") < 200
    )
    right = vecs.filter(F.col("vec_id") % 2 == 0)
    approx = ann_cell_join(
        left, right, "embedding", "vec_id", n_lists=8, iters=2, k=1
    )
    bf = brute_force_topk(right, left, "embedding", "vec_id", k=1)
    hits = (
        approx.select(
            F.col("left_id").alias("query_id"),
            F.col("right_id").alias("corpus_id"),
        )
        .join(bf.select("query_id", "corpus_id"), ["query_id", "corpus_id"])
        .count()
    )
    total = bf.count()
    return spark.createDataFrame(
        [(bool(hits / total >= 0.8), 1)],
        "recall_at_least_80pct BOOLEAN, k BIGINT",
    )


@query(
    "q280_lsh_dedup_clusters",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(length(text) - 7, 0) + 1),
          i -> substr(text, CAST(i AS INTEGER), 8)))) AS shingle
        FROM documents WHERE doc_id < 300)
    ),
    sig AS (
      SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
      FROM sh, (VALUES (0), (1), (2), (3)) seeds(seed)
      GROUP BY doc_id, seed
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b
        ON a.seed = b.seed AND a.minhash = b.minhash
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    ),
    edges AS (
      SELECT i.id_a AS src, i.id_b AS dst
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)
            >= 0.1
    ),
    sym AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ),
    reach(a, b) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
    )
    SELECT CAST(a AS BIGINT) AS node,
           CAST(least(a, min(b)) AS BIGINT) AS component
    FROM reach GROUP BY a ORDER BY node
    """,
)
def q280_lsh_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup CLUSTERING pipeline hash-gated end to end
    (the x04 shape, previously rows-only): portable MinHash
    signatures -> any-of-4-seeds LSH candidates -> exact Jaccard
    >= 0.1 verify -> distributed smallest-id-propagation connected
    components (operators/dedup.py::union_find_components), checked
    against a recursive-CTE transitive closure over the IDENTICAL
    relationally-restated edge set. This is the dedup survivorship
    graph a corpus pipeline feeds its keep-one-per-cluster policy.
    Scale: candidates are bucket joins, components are O(log n)
    label-propagation rounds — the SQL closure exists only because
    single-node can afford it, which is the point of gating the
    distributed version against it."""
    from distcpplus_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        ngram_jaccard_pairs,
        union_find_components,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    sigs = minhash_signatures(
        docs, "text", "doc_id", num_hashes=4, shingle_k=8, portable=True
    )
    cand = minhash_lsh_candidates(
        sigs, bands=4, rows_per_band=1, portable=True
    )
    edges = ngram_jaccard_pairs(
        docs, cand, "text", "doc_id", shingle_k=8
    ).filter(F.col("jaccard") >= 0.1)
    labels = union_find_components(edges.select("id_a", "id_b"))
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("component").cast("bigint").alias("component"),
    ).orderBy("node")


def _build_fixture_tree(root: str) -> None:
    """The fixed 9-entry tree q281/q282 list and plan: three dirs,
    five files with distinct sizes (incl. empty and multi-KB)."""
    import os

    os.makedirs(f"{root}/a/b")
    os.makedirs(f"{root}/c")
    for rel, size in [
        ("root.txt", 42),
        ("empty.dat", 0),
        ("a/f1.txt", 100),
        ("a/b/f2.bin", 2500),
        ("c/f3.txt", 7),
    ]:
        with open(f"{root}/{rel}", "wb") as fh:
            fh.write(b"x" * size)


@query(
    "q281_real_listing_gated",
    oracle="""
    SELECT * FROM (VALUES
      ('a', CAST(0 AS BIGINT), true),
      ('a/b', 0, true),
      ('a/b/f2.bin', 2500, false),
      ('a/f1.txt', 100, false),
      ('c', 0, true),
      ('c/f3.txt', 7, false),
      ('empty.dat', 0, false),
      ('root.txt', 42, false)
    ) t(relative_dst, length, is_dir)
    ORDER BY relative_dst
    """,
)
def q281_real_listing_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL distributed filesystem lister under the driver hash
    gate (x07 runs it rows-only over the fixture dir; here a
    deterministic tmp tree pins every path, size, and dir flag
    against a VALUES-literal oracle). This closes the last gap
    between the derived-listing etl gates (q40-q44 plan over
    metadata computed from `documents`) and the actual
    os.scandir-walking BFS lister (sources/lister.py) — the
    component that feeds every file-ETL plan in production. Fresh
    tree per run; the random tmp prefix is stripped so output is
    location-independent."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.lister import list_tree

    root = _tf.mkdtemp(prefix="q281_tree_")
    try:
        _build_fixture_tree(root)
        rows = (
            list_tree(spark, [root])
            .select(
                F.regexp_replace("relative_dst", "^[^/]*/?", "").alias(
                    "relative_dst"
                ),
                "length",
                "is_dir",
            )
            .filter(F.col("relative_dst") != "")
            .orderBy("relative_dst")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "relative_dst STRING, length BIGINT, is_dir BOOLEAN"
    ).orderBy("relative_dst")


@query(
    "q282_real_copy_plan_gated",
    oracle="""
    SELECT * FROM (VALUES
      ('', CAST(0 AS BIGINT), true, 'mkdir'),
      ('a', 0, true, 'mkdir'),
      ('a/b', 0, true, 'mkdir'),
      ('a/b/f2.bin', 2500, false, 'copy_new'),
      ('a/f1.txt', 100, false, 'copy_changed'),
      ('c', 0, true, 'mkdir'),
      ('c/f3.txt', 7, false, 'copy_new'),
      ('empty.dat', 0, false, 'copy_new')
    ) t(relative_dst, length, is_dir, action)
    ORDER BY relative_dst
    """,
)
def q282_real_copy_plan_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL end-to-end copy planner under the driver hash gate
    (x08 runs it rows-only): the fixture tree plans against a
    PRE-POPULATED destination, so all three -update verdicts appear
    and are value-checked — root.txt (same length) is SKIPPED out of
    the plan entirely, a/f1.txt (length drift) plans copy_changed,
    everything else copy_new, dirs mkdir. This gates the actual
    lister -> change-predicate -> plan composition (engine.plan, O1
    + O7 + O19) on a real filesystem, completing q281's listing
    gate. The bucket column stays ungated: cost-bucket ids are
    deterministic per session but parallelism-dependent (map-count
    heuristic, O11), exactly why the derived-listing gates q43/q104
    pin bucketing separately."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.engine import CopyOptions, DistCpPlusEngine

    root = _tf.mkdtemp(prefix="q282_tree_")
    dst = _tf.mkdtemp(prefix="q282_dst_")
    try:
        _build_fixture_tree(root)
        _os.makedirs(f"{dst}/a")
        with open(f"{dst}/root.txt", "wb") as fh:
            fh.write(b"x" * 42)  # same length -> skipped under -update
        with open(f"{dst}/a/f1.txt", "wb") as fh:
            fh.write(b"x" * 99)  # drifted length -> copy_changed
        plan = DistCpPlusEngine(spark).plan(
            [root], dst, CopyOptions(update=True, skip_ts_check=True)
        )
        rows = (
            plan.copies.select("relative_dst", "length", "is_dir", "action")
            .orderBy("relative_dst")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
        _sh.rmtree(dst, ignore_errors=True)
    return local_rows(spark,
        rows,
        "relative_dst STRING, length BIGINT, is_dir BOOLEAN, action STRING",
    ).orderBy("relative_dst")


@query(
    "q283_epoch_shuffle_orders",
    oracle="""
    WITH keyed AS (
      SELECT e.epoch, d.doc_id,
             ((d.doc_id * 2654435761 + e.epoch * 40503 + 1013904223)
              % 999983) AS k
      FROM documents d, (VALUES (0), (1)) e(epoch)
    ),
    ranked AS (
      SELECT epoch, doc_id,
             row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id)
               AS pos
      FROM keyed
    )
    SELECT epoch, pos, doc_id
    FROM ranked WHERE pos <= 20
    ORDER BY epoch, pos
    """,
)
def q283_epoch_shuffle_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch training-data ordering: every epoch is a DIFFERENT
    deterministic permutation of the same corpus (mixer keyed by
    (doc_id, epoch), rank within epoch) — reproducible data order
    without an RNG state file, the property that makes a training
    run restartable mid-epoch and auditable after the fact. The
    modulus is prime (999983) so epoch offsets don't alias. Output
    pins the first 20 positions of two epochs; the full order is the
    same expression. Scale: rank via a per-epoch window here (each
    partition = one epoch's stream); at shard granularity production
    ranks within (epoch, shard) — same algebra, narrower
    partitions."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.createDataFrame([(0,), (1,)], "epoch int")
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        (
            (
                F.col("doc_id") * F.lit(2654435761)
                + F.col("epoch") * F.lit(40503)
                + F.lit(1013904223)
            )
            % F.lit(999983)
        ).alias("k"),
    )
    w = Window.partitionBy("epoch").orderBy("k", "doc_id")
    ranked = keyed.withColumn("pos", F.row_number().over(w))
    return (
        ranked.filter(F.col("pos") <= 20)
        .select("epoch", "pos", "doc_id")
        .orderBy("epoch", "pos")
    )


@query(
    "q284_compaction_advisor",
    oracle="""
    WITH files AS (
      SELECT source || '/' || doc_id || '.parquet' AS path,
             CAST(n_chars AS BIGINT) AS bytes
      FROM documents WHERE n_chars < 300
    ),
    ordered AS (
      SELECT path, bytes,
             sum(bytes) OVER (ORDER BY path
                              ROWS UNBOUNDED PRECEDING) - bytes
               AS acc_before
      FROM files
    ),
    grouped AS (
      SELECT path, bytes,
             CAST(acc_before // 1000 AS BIGINT) AS merge_group
      FROM ordered
    )
    SELECT merge_group,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS group_bytes
    FROM grouped
    GROUP BY merge_group
    ORDER BY merge_group
    """,
)
def q284_compaction_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction ADVISOR: files under the small-file
    threshold are bin-packed into merge groups by running-size
    cutoff (group = prefix-sum-before // target) — the planning
    half of q191's compaction (which executes merges), answering
    'how many compaction jobs and how big' before touching data.
    The derived doc listing stands in for a footer manifest
    (q248's zonemap_manifest provides the real one). The running
    size is the repo's two-phase distributed prefix sum over a
    range repartition — no partition-less window even at manifest
    scale (the q197/q161 discipline)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") < 300
    )
    files = docs.select(
        F.concat_ws(
            "/",
            "source",
            F.concat(F.col("doc_id").cast("string"), F.lit(".parquet")),
        ).alias("path"),
        F.col("n_chars").cast("bigint").alias("bytes"),
    )
    from distcpplus_spark.operators.scale import partitioned_running_agg

    ordered = partitioned_running_agg(
        files.repartitionByRange("path"),
        ["path"],
        "bytes",
        "_acc",
        F.spark_partition_id(),
        deterministic_bucket=False,
    ).withColumn("acc_before", F.col("_acc") - F.col("bytes"))
    grouped = ordered.withColumn(
        "merge_group", F.floor(F.col("acc_before") / 1000).cast("bigint")
    )
    out = grouped.groupBy("merge_group").agg(
        F.count("*").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("group_bytes"),
    )
    return small_sort(out, "merge_group")


@query(
    "q285_length_bucketed_batching",
    oracle="""
    WITH ordered AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rn
      FROM documents
    ),
    batched AS (
      SELECT doc_id, n_chars, CAST(rn // 32 AS BIGINT) AS batch_id
      FROM ordered
    )
    SELECT batch_id,
           CAST(count(*) AS BIGINT) AS batch_size,
           CAST(max(n_chars) AS BIGINT) AS max_len,
           CAST(sum(n_chars) AS BIGINT) AS token_sum,
           CAST(max(n_chars) * count(*) - sum(n_chars) AS BIGINT)
             AS padding_waste
    FROM batched
    GROUP BY batch_id
    ORDER BY batch_id
    """,
)
def q285_length_bucketed_batching(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-bucketed batching (dynamic batching's batch plan):
    docs sort by length, consecutive 32 form a batch, and each
    batch reports its padding waste (max_len*size - token_sum) —
    the quantity length-bucketing exists to minimize vs random
    batching (where max_len is corpus-max almost surely). The
    complement of q205's packing: packing concatenates docs into
    fixed windows; bucketing groups similar lengths so per-batch
    padding shrinks. Scale: the global length rank runs as the
    repo's two-phase distributed prefix sum over a range
    repartition (operators/scale.py, the q161 pattern) — NO
    partition-less window anywhere; the oracle states the same
    rank as row_number, where single-node is fine."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .repartitionByRange("n_chars", "doc_id")
        .withColumn("_one", F.lit(1))
    )
    ranked = partitioned_running_agg(
        docs,
        ["n_chars", "doc_id"],
        "_one",
        "_rk1",
        F.spark_partition_id(),
        deterministic_bucket=False,
    )
    batched = ranked.withColumn(
        "batch_id", F.floor((F.col("_rk1") - 1) / 32).cast("bigint")
    )
    out = batched.groupBy("batch_id").agg(
        F.count("*").alias("batch_size"),
        F.max("n_chars").cast("bigint").alias("max_len"),
        F.sum("n_chars").cast("bigint").alias("token_sum"),
        (F.max("n_chars") * F.count("*") - F.sum("n_chars"))
        .cast("bigint")
        .alias("padding_waste"),
    )
    return small_sort(out, "batch_id")
