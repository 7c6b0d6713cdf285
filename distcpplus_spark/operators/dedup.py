"""Deduplication operators for training-data pipelines.

Four tiers, in increasing recall of near-duplicates and cost:

1. exact_dedup        — hash-groupBy, one shuffle of 16-byte keys
2. simhash_dedup      — 64-bit fingerprints, hamming-ball grouping
3. minhash_lsh_dedup  — banded MinHash (Broder 1997; Leskovec et al.,
                        Mining of Massive Datasets ch.3): tunable
                        (bands, rows) S-curve
4. ngram_jaccard      — exact Jaccard on shingle sets (verification
                        tier for LSH candidates, quadratic — only run
                        on candidate pairs, never the corpus)

All operate on any (id, text) DataFrame. Deterministic: hashes are
xxhash64 with fixed seeds (or md5 in portable mode for oracle parity).

Scale design: every step is a shuffle on a *small* key (hash, band
signature), never on text. Candidate generation is strictly
bucket-join (LSH) so the O(n^2) pair space is never enumerated;
exact Jaccard runs only per candidate pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.functions.text import char_shingles


def _spread_scan(df: DataFrame, key: str) -> DataFrame:
    """Guarantee enough partitions BEFORE heavy per-row compute
    (guide §2.5 input skew): a scan of few or row-group-monolithic
    files yields fewer tasks than cores, so the expensive downstream
    expressions (here: per-shingle seeded hashing) serialize onto one
    core — measured 15.2 → 1.9 s for the 16-seed signature pass at
    sf0.1, whose documents table is one parquet row group = ONE task.

    Only repartitions when the scan is actually deficient (planned
    partitions < half the cores): a well-split input at scale passes
    through untouched, so no corpus-sized payload shuffle is ever
    added on the 100 TB path. Hash-partitioning on the doc id keeps
    row placement deterministic (safe under retries, unlike
    round-robin of a non-deterministic input) and lets the downstream
    groupBy(id) reuse the exchange.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target, key)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per exact text hash. Returns the surviving
    rows (all original columns).

    The winner-per-group is computed with a window over the hash —
    one shuffle; the text itself never shuffles twice.
    """
    w = W.partitionBy(F.xxhash64(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_k: int = 8,
    portable: bool = False,
) -> DataFrame:
    """(id, seed, minhash) — min over shingles of seeded xxhash64.

    One explode + one groupBy; the shuffle carries (id, seed, hash)
    triples. num_hashes=16 with 4-row bands gives the standard
    S-curve threshold ~ (1/b)^(1/r) = (1/4)^(1/4) ≈ 0.71 Jaccard.

    ``portable=True`` swaps the seeded xxhash64 for md5 of
    ``seed || ':' || shingle`` — the engine-portable hash DuckDB can
    reproduce bit-for-bit, so the whole LSH pipeline becomes
    oracle-checkable (the MinHash property only needs a uniform hash,
    not a fast one; the minhash column is then a hex STRING, compared
    lexicographically on both engines).

    Round-14 (guide §2.3 — don't expand rows you immediately
    re-collapse): the old shape EXPLODED each shingle row into
    ``num_hashes`` seed rows before grouping by (id, seed). The seeded
    hashes are computed per shingle either way, so the explode only
    multiplied the rows the partial aggregate had to hash-group
    (num_hashes ×). Now one groupBy(id) takes the per-seed mins as
    ``num_hashes`` aggregate columns and ``stack()`` unpivots back to
    (id, seed, minhash) AFTER aggregation — same rows, same types
    (seed INT, minhash STRING/BIGINT), one fewer Generate, 16× fewer
    aggregate input rows at the default num_hashes (the q58 device;
    probe: 5.05 → 4.17 s for the 16-hash signature pass at sf0.1).

    Round-15: _spread_scan first — the seeded-hash mins are the
    single most expensive per-row expression in the package, and a
    deficient scan serializes them onto one core (see _spread_scan).
    """
    df = _spread_scan(df, id_col)
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(char_shingles(F.col(text_col), shingle_k))
        ).alias("_shingle"),
    )
    if portable:
        aggs = [
            F.min(
                F.md5(
                    F.concat(F.lit(f"{i}:"), F.col("_shingle")).cast("binary")
                )
            ).alias(f"_m{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(
                F.xxhash64(F.concat(F.lit(str(i)), F.col("_shingle")))
            ).alias(f"_m{i}")
            for i in range(num_hashes)
        ]
    pairs = ", ".join(f"{i}, _m{i}" for i in range(num_hashes))
    return (
        sh.groupBy("_id")
        .agg(*aggs)
        .select(
            "_id",
            F.expr(
                f"stack({num_hashes}, {pairs}) AS (_seed, _minhash)"
            ),
        )
    )


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Candidate pairs from banded LSH: docs sharing ALL rows of any
    band. Returns (id_a, id_b) with id_a < id_b, distinct.

    The band signature is a single hash of the band's minhashes, so
    the candidate join is an equi-join on (band, band_sig) — pure
    bucketing, no pair enumeration outside buckets. ``portable=True``
    keeps the concatenated minhashes AS the band key (no xxhash64
    re-hash): exactly reproducible in SQL, and collision-free by
    construction — the key is longer, but there are only
    ``bands`` rows of it per document.
    """
    band_key = F.concat_ws(",", F.sort_array(F.collect_list("_minhash")))
    if not portable:
        band_key = F.xxhash64(band_key)
    # lazy checkpoint: the self-join references `banded` twice, and
    # without an Exchange boundary to reuse each side re-ran the
    # whole signature pipeline (guide §5; x01 A/B 18.0 → 15.3 s)
    banded = (
        signatures.withColumn("_band", (F.col("_seed") / rows_per_band).cast("int"))
        .groupBy("_id", "_band")
        .agg(band_key.alias("_band_sig"))
    ).localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._band_sig") == F.col("b._band_sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 8,
) -> DataFrame:
    """Exact Jaccard for candidate pairs only (the verify tier after
    LSH). Returns (id_a, id_b, jaccard).

    Computes |A∩B| via a shingle join restricted to candidate ids —
    cost is proportional to candidate volume, not corpus^2.

    Round-14 (guide §5 caching): ``candidates`` is referenced three
    times below (both sides of cand_ids plus the intersection join)
    and the shingle table twice — each reference used to re-run the
    whole upstream LSH pipeline unless an Exchange happened to be
    reusable. Lazy localCheckpoints materialize each exactly once on
    the first action (construction stays side-effect-free); both are
    candidate-volume-sized, and MEMORY_AND_DISK spills rather than
    OOMs at scale. Measured on the q280 shape: the verify stage
    dropped 4.5 → ~2 s at sf0.1.
    """
    candidates = candidates.localCheckpoint(eager=False)
    cand_ids = (
        candidates.select(F.col("id_a").alias("_id"))
        .union(candidates.select("id_b"))
        .distinct()
    )
    # spread BEFORE the broadcast semi-join: the join output inherits
    # the streamed side's partitioning, so a one-task scan would run
    # the whole candidate-shingle explode serially (§2.5)
    base = _spread_scan(df, id_col)
    sh = (
        base.join(cand_ids, base[id_col] == cand_ids._id)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.array_distinct(char_shingles(F.col(text_col), shingle_k))
            ).alias("_shingle"),
        )
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    inter = (
        candidates.join(a, F.col("id_a") == F.col("sa._id"))
        .join(
            b,
            (F.col("id_b") == F.col("sb._id"))
            & (F.col("sa._shingle") == F.col("sb._shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    na = sizes.alias("na")
    nb = sizes.alias("nb")
    return (
        inter.join(na, F.col("id_a") == F.col("na._id"))
        .join(nb, F.col("id_b") == F.col("nb._id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("_inter")
                / (F.col("na._n") + F.col("nb._n") - F.col("_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → exact
    Jaccard verify → connected-component-free survivor choice (keep
    min id of each duplicate pair's union; star-collapse, one pass).

    Note: star-collapse (drop b of every verified (a<b) pair) is the
    single-pass approximation of connected components — standard for
    dedup where chains are short. An iterative smallest-id propagation
    (see union_find_components) is available when exact components
    matter. ``portable=True`` runs the md5 signature/band variant the
    DuckDB oracle can reproduce exactly (see minhash_signatures).
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, portable=portable
    )
    cands = minhash_lsh_candidates(sigs, bands, rows, portable=portable)
    verified = ngram_jaccard_pairs(df, cands, text_col, id_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )
    losers = verified.select(F.col("id_b").alias("_loser")).distinct()
    return df.join(losers, df[id_col] == losers._loser, "left_anti")


def simhash_fingerprints(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32,
    portable: bool = False,
) -> DataFrame:
    """(id, simhash) 32-bit fingerprints over whitespace tokens.

    Per-bit majority vote of token hashes, computed with one explode
    over (token × bit) and two groupBys — all JVM-side.

    ``portable=False`` (production) takes token bits from xxhash64 —
    the engine-native fast path. ``portable=True`` takes bit i from
    the high bit of hex digit i+1 of the token's md5 (the q60 ASCII
    trick: '8' <= hexchar works for 0-9a-f), which any engine can
    recompute — the hash-gated q418 twin runs THIS SAME function in
    portable mode so the explode/vote/pack structure is value-checked
    end to end, while the xxhash64 path keeps its quantitative
    near-dup contract in tests/test_simhash_contract.py.
    """
    if portable and bits > 32:
        raise ValueError("portable mode draws from md5's 32 hex digits")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ", -1)).alias("_tok"),
    )
    if portable:
        toks = toks.withColumn("_h", F.md5(F.col("_tok").cast("binary")))
        sign = (
            F.when(F.expr("substring(_h, _i + 1, 1)") >= "8", 1)
            .otherwise(-1)
        )
    else:
        toks = toks.withColumn("_h", F.xxhash64("_tok"))
        sign = (
            F.when(F.expr("(_h div shiftleft(1, _i)) % 2 != 0"), 1)
            .otherwise(-1)
        )
    bits_df = toks.select(
        "_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("_i"),
        "_h",
    ).select(
        "_id",
        "_i",
        sign.alias("_sign"),
    )
    votes = bits_df.groupBy("_id", "_i").agg(F.sum("_sign").alias("_v"))
    return votes.groupBy("_id").agg(
        F.sum(
            F.when(F.col("_v") >= 0, F.expr("shiftleft(1L, _i)")).otherwise(0)
        ).alias("simhash")
    )


def union_find_components(
    pairs: DataFrame,
    max_iters: int = 20,
    local_max_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components by smallest-id propagation WITH pointer
    doubling: each round a node adopts the min id among itself, its
    neighbors' labels, and its label's label (component -> that
    component's component). Returns (node, component).

    The doubling hop is what makes convergence O(log diameter), not
    O(diameter): plain neighbor-min propagation moves the min id one
    edge per round, so a 1000-node chain (sorted-run edges, linked
    lists of near-dups) needs 1000 rounds — far past any sane
    iteration cap, and a cap-hit without a fixpoint check returns
    WRONG labels silently. With doubling the label graph halves in
    height every round (Shiloach-Vishkin style), so 20 rounds cover
    diameters up to ~2^20. Each round is three shuffles; rounds stop
    early at fixpoint, and a cap-hit without fixpoint now raises
    instead of returning partial labels.

    Round-15 SIZE-GATED LOCAL FINISH (guide §1.2 — fix the
    distributed algorithm first): when the edge list is small
    (``local_max_edges``, default 1M pairs ≈ 16 MB — far below any
    driver/result limit), classic union-find with path compression on
    the collected pairs replaces the iterative rounds entirely. Every
    distributed CC implementation has this step (e.g. GraphFrames
    finishes components locally once the contracted graph fits);
    without it a 700-edge candidate graph still pays ~10 rounds ×
    ~0.6 s of per-round shuffle/stage overhead — measured 6.7 s →
    ~0.3 s on the q310 core graph. Labels are identical by
    construction: both paths assign every node the MIN id in its
    component. Above the gate, the pointer-doubling rounds run
    unchanged — the 100 TB path never collects.
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint(eager=False)
    n_edges = edges.count()  # materializes the checkpoint
    if n_edges <= local_max_edges:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in edges.collect():
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the component label
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        out = [(n, find(n)) for n in parent]
        node_t = edges.schema["src"].dataType
        spark = pairs.sparkSession
        from pyspark.sql import types as T

        return spark.createDataFrame(
            spark.sparkContext.parallelize(out, numSlices=1),
            T.StructType(
                [
                    T.StructField("node", node_t, True),
                    T.StructField("component", node_t, True),
                ]
            ),
        )

    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    # (a round-15 probe REJECTED pre-hashing sym by dst to the session
    # shuffle-partition count here: pinning HashPartitioning(dst, 32)
    # defeats AQE's coalescing of every round's tiny stages — measured
    # q310 6.6→8.6 s, q280 6.2→9.3 s at sf0.1. AQE right-sizes the
    # per-round exchanges better than a static pin.)
    sym = sym.localCheckpoint(eager=True)
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("_nmin"))
        )
        # localCheckpoint truncates lineage each round: without it the
        # plan embeds every previous iteration (O(rounds²) recompute
        # and eventual analyzer blow-up — the classic iterative-
        # algorithm trap). On a cluster with lineage-based recovery
        # concerns, swap for checkpoint() on reliable storage.
        hop1 = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.col("component").alias("_prev"),
                F.least(
                    F.col("component"), F.coalesce("_nmin", F.col("component"))
                ).alias("component"),
            )
        )
        # pointer doubling: component := component's component. The
        # grandparent lookup is a self-join on the (node, component)
        # frame — labels are ids, so min over the hop is still the
        # min id reachable, monotone and safe to take every round.
        grand = hop1.select(
            F.col("node").alias("_gn"), F.col("component").alias("_gc")
        )
        # the round's pre-update label rides along as _prev so the
        # fixpoint test below is a filter over the frame this round
        # checkpoints anyway — the old new⋈old join paid one extra
        # shuffle per round just to ask "did anything move?"
        # round-15: LAZY checkpoint + the fixpoint count as the ONE
        # materializing action — the old eager checkpoint ran a full
        # job and the changed-probe a second one per round (guide
        # §2.6 / the r14 Finding-8 device: when a driver action runs
        # every round anyway, let IT materialize the checkpoint)
        new_labels = (
            hop1.join(grand, hop1.component == grand._gn, "left")
            .select(
                "node",
                "_prev",
                F.least(
                    F.col("component"), F.coalesce("_gc", F.col("component"))
                ).alias("component"),
            )
        ).localCheckpoint(eager=False)
        changed = new_labels.filter(
            F.col("component") != F.col("_prev")
        ).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"union_find_components did not reach fixpoint in {max_iters} "
        "rounds — graph diameter exceeds 2^max_iters, or labels are "
        "oscillating (which the min-fold makes impossible); raise "
        "max_iters rather than consuming partial labels"
    )


def semantic_dedup(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.2,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style embedding-space near-dup pruning (Abbas et al.
    2023, public arXiv 2303.09540, re-expressed Spark-first): drop
    every vector that has a MORE-SENIOR (smaller id) neighbor with
    cosine >= threshold in its LSH bucket; keep the rest.

    The keep-first rule makes the survivor set closed-form (no
    iterative clustering): v survives iff NOT EXISTS a same-bucket
    u < v with cos(u, v) >= t — exactly SQL-expressible, so the
    operator is oracle-checkable end to end (q180), unlike a learned
    k-means partition. Candidate generation reuses the sign-LSH
    bucketing (pairwise_above_threshold): cost Σ|bucket|², never n²,
    and at 100 TB the buckets are the partition keys — each task sees
    one bucket's vectors, nothing global. Cross-bucket near-dups are
    intentionally out of contract (the standard LSH recall trade,
    same as the MinHash banding tier above)."""
    from distcpplus_spark.operators.similarity import (
        pairwise_above_threshold,
    )

    pairs = pairwise_above_threshold(
        emb, vec_col, id_col, threshold=threshold,
        n_planes=n_planes, dim=dim, seed=seed,
    )
    removed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return emb.join(removed, id_col, "left_anti")


def duplicated_span_coverage(
    docs: DataFrame, text_col: str, id_col: str, k: int = 20
) -> DataFrame:
    """Exact duplicated-substring coverage per document (the measure
    behind suffix-array corpus dedup, Lee et al. 2021, public arXiv
    2107.06499 — re-expressed Spark-first as a k-gram inverted
    index): a position is covered iff the k-char gram starting there
    occurs >= 2 times in the corpus; overlapping covered spans merge
    via gaps-and-islands; output is the merged covered length.

    Scale shape: the explode is len(text) rows per doc but each
    carries only (id, pos, 8-byte gram hash); occurrence counting is
    one hash-partitioned groupBy with map-side combine, the
    count-join shuffles on the same key, and the island merge is a
    per-doc window — no all-pairs anything. A suffix array would find
    arbitrary-length duplicates in O(n log n) but needs a global
    sort over the whole corpus text; the k-gram index trades minimum
    match length k for pure hash partitioning, the right trade on a
    1000-executor cluster."""
    t = F.col(text_col)
    positions = (
        docs.select(
            F.col(id_col),
            t.alias("_txt"),
            F.length(t).alias("_len"),
        )
        # guard BEFORE sequence(): Spark's sequence(1, stop) with
        # stop < 1 yields a DESCENDING sequence, not an empty one
        .filter(F.length("_txt") >= k)
        .withColumn(
            "_pos",
            F.explode(
                F.sequence(F.lit(1), F.length("_txt") - (k - 1))
            ),
        )
        .withColumn(
            "_gram_h",
            F.xxhash64(F.expr(f"substring(_txt, _pos, {k})")),
        )
        .select(id_col, "_len", "_pos", "_gram_h")
    )
    counts = positions.groupBy("_gram_h").agg(
        F.count("*").alias("_n_occ")
    )
    covered = (
        positions.join(counts, "_gram_h")
        .filter(F.col("_n_occ") >= 2)
        .select(
            id_col,
            "_len",
            F.col("_pos").alias("_start"),
            (F.col("_pos") + (k - 1)).alias("_end"),
        )
    )
    win = (
        W.partitionBy(id_col)
        .orderBy("_start")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    islands = (
        covered.withColumn("_prev_max_end", F.max("_end").over(win))
        .withColumn(
            "_new_island",
            F.when(
                F.col("_prev_max_end").isNull()
                | (F.col("_start") > F.col("_prev_max_end") + 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_island",
            F.sum("_new_island").over(
                W.partitionBy(id_col).orderBy("_start").rowsBetween(
                    W.unboundedPreceding, 0
                )
            ),
        )
        .groupBy(id_col, "_island", "_len")
        .agg(
            F.min("_start").alias("_s"),
            F.max("_end").alias("_e"),
        )
        .groupBy(id_col, "_len")
        .agg(F.sum(F.col("_e") - F.col("_s") + 1).alias("dup_chars"))
    )
    return (
        docs.select(id_col, F.length(t).alias("total_chars"))
        .join(islands.select(id_col, "dup_chars"), id_col, "left")
        .select(
            id_col,
            F.coalesce("dup_chars", F.lit(0)).cast("bigint")
            .alias("dup_chars"),
            F.col("total_chars").cast("bigint").alias("total_chars"),
        )
    )


def build_filter_pipeline(rules: list[dict]):
    """Compile a declarative corpus-filter spec into a single Column
    predicate — the config-driven cleaning pipeline (C4/FineWeb
    style) where the rule list lives in version control, not code.

    Supported rule types (all compile to codegen'd expressions; the
    whole pipeline is ONE scan with a fused predicate — never N
    passes):
      {"type": "min_len",  "col": c, "value": n}
      {"type": "max_len",  "col": c, "value": n}
      {"type": "lang_in",  "col": c, "values": [..]}
      {"type": "max_word_len", "col": c, "value": n}   (longest token)
      {"type": "min_words",    "col": c, "value": n}
      {"type": "not_regex",    "col": c, "pattern": p} (drop matches)
      {"type": "max_digit_ratio", "col": c, "value": x}

    Returns (predicate, described) where described is the
    human-readable rule list for lineage/datasheet reporting."""
    preds = []
    described = []
    for r in rules:
        t = r["type"]
        c = F.col(r["col"])
        if t == "min_len":
            p = F.length(c) >= r["value"]
        elif t == "max_len":
            p = F.length(c) <= r["value"]
        elif t == "lang_in":
            p = c.isin(list(r["values"]))
        elif t == "max_word_len":
            p = (
                F.array_max(
                    F.transform(
                        F.split(c, " ", -1), lambda w: F.length(w)
                    )
                )
                <= r["value"]
            )
        elif t == "min_words":
            p = (
                F.size(F.filter(F.split(c, " ", -1),
                                lambda w: F.length(w) > 0))
                >= r["value"]
            )
        elif t == "not_regex":
            p = ~c.rlike(r["pattern"])
        elif t == "max_digit_ratio":
            digits = F.length(F.regexp_replace(c, "[^0-9]", ""))
            p = digits <= r["value"] * F.length(c)
        else:
            raise ValueError(f"unknown filter rule type {t!r}")
        preds.append(p)
        described.append(
            f"{t}({r.get('col')}"
            + (f", {r.get('value')}" if "value" in r else "")
            + (f", {r.get('values')}" if "values" in r else "")
            + (f", {r.get('pattern')}" if "pattern" in r else "")
            + ")"
        )
    out = F.lit(True)
    for p in preds:
        out = out & p
    return out, described


def filter_rejection_audit(rules: list[dict]):
    """Per-rule audit column for the same declarative spec
    ``build_filter_pipeline`` compiles: the FIRST rule (in spec
    order) a row fails, or 'kept'. This is the pipeline-debugging
    view — when a corpus shrinks 40% after a config change, this
    says which rule did it. Rule semantics are compiled by the same
    code path as the fused predicate, so the audit can never drift
    from what the filter actually does.

    Returns (reason_column, labels) where labels is the ordered rule
    label list (plus the implicit 'kept')."""
    labels = []
    reason = None
    for i, r in enumerate(rules):
        pred, desc = build_filter_pipeline([r])
        label = f"{i}:{r['type']}"
        labels.append(label)
        clause = F.when(~pred, F.lit(label))
        reason = clause if reason is None else reason.when(~pred, F.lit(label))
    reason = (
        reason.otherwise(F.lit("kept"))
        if reason is not None
        else F.lit("kept")
    )
    return reason, labels + ["kept"]


def deletion_neighborhood_join(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """All pairs at edit distance <= 1, with NO blocking attribute —
    the FastSS deletion-neighborhood trick (Bocek et al., 2007,
    public): two strings are within one edit iff they share a member
    of D(s) = {s} ∪ {s minus one character}. Each row explodes into
    len(s)+1 variants (pure JVM string expressions — no UDF), an
    equi-join on the variant hash-buckets candidates, and
    ``levenshtein`` verifies survivors (the variant overlap admits
    false positives like "ab"/"ba" — verification is mandatory).

    Scale: candidate generation is a single equi-join shuffle keyed
    on the variant string — never an all-pairs comparison. Variant
    fan-out is O(len) per row; for long texts callers should key on
    a bounded field (title, URL, name), which is the published
    FastSS regime too. Returns (id_a, id_b, dist) with id_a < id_b.
    """
    s = F.col(text_col)
    # sequence(0, len-1) DESCENDS when len == 0 (recorded gotcha):
    # greatest() floors the stop, the filter drops the bogus variant.
    deletions = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(s) - 1, F.lit(0))),
            lambda i: F.concat(
                s.substr(F.lit(1), i),
                s.substr(i + 2, F.length(s)),
            ),
        ),
        lambda _v: F.length(s) > 0,
    )
    variants = F.array_union(F.array(s), deletions)
    ex = df.select(
        F.col(id_col).alias("_id"),
        s.alias("_txt"),
        F.explode(variants).alias("_var"),
    )
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._var") == F.col("b._var"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._txt").alias("txt_a"),
            F.col("b._txt").alias("txt_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "dist",
            F.levenshtein("txt_a", "txt_b").cast("bigint"),
        )
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )


def _portable_minhash(df: DataFrame, id_col: str, text_col: str,
                      k: int, n_seeds: int) -> DataFrame:
    """(id, seed, minhash) signature rows — md5-seeded so an oracle
    can replay them; the persisted unit of the incremental index.

    Round-14: per-seed mins as aggregate columns + stack() after the
    aggregation, instead of exploding each shingle n_seeds× before
    grouping (the minhash_signatures rewrite; same rows/types).
    Round-15: _spread_scan before the seeded-hash compute (§2.5)."""
    df = _spread_scan(df, id_col)
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(char_shingles(F.col(text_col), k))
        ).alias("shingle"),
    )
    aggs = [
        F.min(
            F.md5(
                F.concat(F.lit(f"{i}:"), F.col("shingle")).cast("binary")
            )
        ).alias(f"_m{i}")
        for i in range(n_seeds)
    ]
    pairs = ", ".join(f"{i}, _m{i}" for i in range(n_seeds))
    return (
        sh.groupBy("_id")
        .agg(*aggs)
        .select(
            "_id",
            F.expr(f"stack({n_seeds}, {pairs}) AS (seed, minhash)"),
        )
    )


def incremental_minhash_dedup(
    history: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    n_seeds: int = 4,
    min_agree: int = 2,
    tau: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup check of an ARRIVING batch against a persisted corpus
    index — the incremental regime a continuously-ingesting pipeline
    actually runs (full-corpus re-LSH per batch would be quadratic
    over time). ``history`` stands for the stored index side; in
    production its signature rows live as a parquet table and only
    ``new``'s signatures are computed per batch.

    Stages (all bucket-joins, never all-pairs):
      1. signatures for both sides (history's come from the index);
      2. candidates = equi-join on (seed, minhash) with >= min_agree
         agreeing seeds — the banded-LSH collision rule;
      3. exact shingle-Jaccard verification on candidate pairs ONLY,
         keeping pairs >= tau;
      4. verdict per new doc: best verified match (highest rounded
         jaccard, ties to lowest history id) or novel.

    Returns (verdicts, append_rows): verdicts is
    (new_id, dup_of, jaccard) for EVERY new doc (NULLs = novel);
    append_rows is the novel docs' signature rows, ready to append
    to the index so the next batch sees them."""
    # lazy checkpoints: sig_n feeds both the candidate join and
    # append_rows, cand feeds three consumers (two semi-joins + the
    # intersection join), and each shingle table two — without
    # materialization every reference re-runs its whole upstream
    # pipeline (guide §5; the ngram_jaccard_pairs note)
    sig_h = _portable_minhash(history, id_col, text_col, k, n_seeds)
    sig_n = _portable_minhash(new, id_col, text_col, k, n_seeds).localCheckpoint(
        eager=False
    )
    cand = (
        sig_n.alias("n")
        .join(
            sig_h.alias("h"),
            (F.col("n.seed") == F.col("h.seed"))
            & (F.col("n.minhash") == F.col("h.minhash")),
        )
        .groupBy(
            F.col("n._id").alias("new_id"),
            F.col("h._id").alias("hist_id"),
        )
        .agg(F.count("*").alias("agree"))
        .filter(F.col("agree") >= min_agree)
    ).localCheckpoint(eager=False)
    # exact verification, candidate docs only (scan spread first —
    # the §2.5 one-task-scan guard, see _spread_scan)
    sh_n = _spread_scan(new, id_col).join(
        cand.select("new_id").distinct(),
        new[id_col] == F.col("new_id"),
        "semi",
    ).select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(char_shingles(F.col(text_col), k))
        ).alias("shingle"),
    ).localCheckpoint(eager=False)
    sh_h = _spread_scan(history, id_col).join(
        cand.select("hist_id").distinct(),
        history[id_col] == F.col("hist_id"),
        "semi",
    ).select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(char_shingles(F.col(text_col), k))
        ).alias("shingle"),
    ).localCheckpoint(eager=False)
    size_n = sh_n.groupBy("_id").agg(F.count("*").alias("n_sh"))
    size_h = sh_h.groupBy("_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh_n.alias("a"), F.col("a._id") == F.col("new_id"))
        .join(
            sh_h.alias("b"),
            (F.col("b._id") == F.col("hist_id"))
            & (F.col("b.shingle") == F.col("a.shingle")),
        )
        .groupBy("new_id", "hist_id")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.round(
        F.col("n_common")
        / (F.col("sn.n_sh") + F.col("sh.n_sh") - F.col("n_common")).cast(
            "double"
        ),
        6,
    )
    verified = (
        inter.join(size_n.alias("sn"), F.col("sn._id") == F.col("new_id"))
        .join(size_h.alias("sh"), F.col("sh._id") == F.col("hist_id"))
        .select("new_id", "hist_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
    )
    best = (
        verified.withColumn(
            "_rk",
            F.row_number().over(
                W.partitionBy("new_id").orderBy(
                    F.desc("jaccard"), F.asc("hist_id")
                )
            ),
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    verdicts = (
        new.select(F.col(id_col).alias("new_id"))
        .join(best, "new_id", "left")
        .select(
            "new_id",
            F.col("hist_id").alias("dup_of"),
            "jaccard",
        )
    )
    append_rows = sig_n.join(
        best.select("new_id"),
        sig_n["_id"] == F.col("new_id"),
        "anti",
    ).select(F.col("_id"), F.col("seed"), F.col("minhash"))
    return verdicts, append_rows


def prefix_filter_jaccard_join(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """EXACT all-pairs Jaccard join via prefix filtering (the
    All-Pairs/PPJoin family — Bayardo et al. WWW'07, public
    literature): unlike MinHash-LSH this loses NOTHING — every pair
    with token-set Jaccard >= threshold is returned, yet candidate
    generation never goes quadratic.

    The theorem: order every document's distinct tokens by a single
    global order (rarest first — ties broken by token text); take
    each document's PREFIX of length n - ceil(t*n) + 1. If
    J(a,b) >= t, their first common token in that order sits inside
    BOTH prefixes (at most n - |intersection| non-common tokens can
    precede it, and |intersection| >= ceil(t*n)). So an equi-join on
    prefix tokens finds every qualifying pair; exact verification on
    the full token arrays then drops false candidates.

    Scale shape: token frequencies are one hash aggregate; the
    rarest-first order makes prefixes land on LOW-frequency tokens,
    so the candidate equi-join's per-key fan-out is small by
    construction (the hot tokens — stopwords — are exactly the ones
    prefixes exclude); verification touches candidates only. Returns
    (id_a, id_b, jac) with id_a < id_b, jac >= threshold.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(
            F.filter(
                F.split(F.col(text_col), " ", -1), lambda x: x != ""
            )
        ).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    flat = toks.select("_id", F.explode("_toks").alias("_tok"))
    freq = flat.groupBy("_tok").agg(F.count("*").alias("_df"))
    w = W.partitionBy("_id").orderBy("_df", "_tok")
    ranked = (
        flat.join(freq, "_tok")
        .withColumn("_rk", F.row_number().over(w))
        .join(toks.select("_id", F.size("_toks").alias("_n")), "_id")
    )
    prefix_len = F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
    prefix = ranked.filter(F.col("_rk") <= prefix_len).select("_id", "_tok")
    cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a._tok") == F.col("b._tok"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()
    )
    verified = (
        cands.join(
            toks.select(
                F.col("_id").alias("id_a"), F.col("_toks").alias("_ta")
            ),
            "id_a",
        )
        .join(
            toks.select(
                F.col("_id").alias("id_b"), F.col("_toks").alias("_tb")
            ),
            "id_b",
        )
        .withColumn("_i", F.size(F.array_intersect("_ta", "_tb")))
        .withColumn(
            "jac",
            F.col("_i")
            / (F.size("_ta") + F.size("_tb") - F.col("_i")).cast("double"),
        )
        .filter(F.col("jac") >= threshold)
    )
    return verified.select("id_a", "id_b", "jac")


def cross_doc_longest_match(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 20,
    cap: int = 64,
    prefix: int = 4,
) -> DataFrame:
    """Per document: the LONGEST substring (capped at ``cap`` chars)
    shared with ANY other document, found without a global suffix
    sort — the arbitrary-length companion to the fixed-k
    duplicated_span_coverage above (Lee et al. 2021 measure; a full
    suffix array needs a corpus-wide sort, which is exactly what we
    avoid).

    Algorithm: explode every suffix (truncated to ``cap`` chars),
    hash-partition by the suffix's first ``prefix`` chars, sort
    WITHIN each bucket, and take the LCP of lexicographically
    adjacent suffixes from different documents. Correctness rests on
    two standard suffix-order facts: (1) no string outside a prefix
    bucket can sort strictly between two members of it, so
    within-bucket adjacency equals global adjacency for any pair
    sharing >= ``prefix`` chars (pairs sharing fewer are below
    ``min_len`` anyway, which is why ``min_len >= prefix`` is
    required); (2) for every document d, the maximum LCP between a
    suffix of d and a suffix of any other document is attained at an
    ADJACENT pair with differing documents — walking from a distant
    pair toward adjacency can only keep or raise the LCP, and some
    step must cross a document boundary.

    Returns (id_col, best_len int, partner): best_len is the true
    maximum shared-substring length min(true, cap); partner is the
    deterministic min partner id among adjacent pairs achieving it.

    Scale: suffix rows carry <= cap chars each (cap x corpus bytes,
    the explicit memory/length trade); the only shuffle keys on the
    prefix bucket. Hot prefixes (natural-language stopwords) are the
    skew risk — lengthen ``prefix`` (and ``min_len``) or dict-filter
    the top buckets to split them; each bucket's scan is a local
    sort + one vectorized pass.
    """
    if min_len < prefix:
        raise ValueError("min_len must be >= prefix for bucket-locality")
    import pandas as pd

    sfx = (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, char_length({text_col})), "
                    f"p -> substring({text_col}, p, {int(cap)}))"
                )
            ).alias("_pos", "_sfx"),
        )
        .filter(F.char_length(F.col("_sfx")) >= 1)
        .withColumn("_bkt", F.substring("_sfx", 1, int(prefix)))
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame(
                {"doc": pd.Series([], dtype="int64"),
                 "partner": pd.Series([], dtype="int64"),
                 "lcp": pd.Series([], dtype="int32")}
            )
        pdf = pdf.sort_values(["_sfx", "_doc", "_pos"])
        arr = np.array(pdf["_sfx"].to_numpy(), dtype=f"U{cap}")
        m = arr.view(np.uint32).reshape(len(arr), cap)
        eq = m[1:] == m[:-1]
        raw = eq.cumprod(axis=1).sum(axis=1)
        lens = pdf["_sfx"].str.len().to_numpy()
        lcp = np.minimum(raw, np.minimum(lens[1:], lens[:-1]))
        doc = pdf["_doc"].to_numpy()
        mask = doc[1:] != doc[:-1]
        a, b, v = doc[:-1][mask], doc[1:][mask], lcp[mask]
        return pd.DataFrame(
            {
                "doc": np.concatenate([a, b]),
                "partner": np.concatenate([b, a]),
                "lcp": np.concatenate([v, v]).astype("int32"),
            }
        )

    pairs = sfx.groupBy("_bkt").applyInPandas(
        scan, "doc long, partner long, lcp int"
    )
    best = pairs.groupBy("doc").agg(F.max("lcp").alias("best_len"))
    return (
        pairs.join(best, ["doc"])
        .filter(F.col("lcp") == F.col("best_len"))
        .groupBy("doc", "best_len")
        .agg(F.min("partner").alias("partner"))
        .filter(F.col("best_len") >= F.lit(int(min_len)))
        .select(
            F.col("doc").alias(id_col),
            F.col("best_len").cast("int").alias("best_len"),
            F.col("partner").cast("long").alias("partner"),
        )
    )


def containment_join(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    shingle: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """ASYMMETRIC near-dup detection by shingle containment
    C(A, B) = |S(A) ∩ S(B)| / |S(A)| (Broder 1997's containment, the
    companion to resemblance/Jaccard): a short document quoted or
    prefixed inside a longer one scores C ≈ 1 even though Jaccard is
    tiny — the case symmetric dedup (MinHash q57-q59, prefix-filter
    q302) structurally misses, and a real corpus-hygiene concern
    (press-release reprints, quoted posts, boilerplate wrappers).

    S(A) = distinct ``shingle``-token windows. Returns directed
    pairs (id_a, id_b, inter, containment) with C(A,B) >= threshold;
    both directions are evaluated (denominators differ).

    Scale: candidate pairs come ONLY from the shingle inverted index
    (equi-join on the shingle — the same never-n² shape as every
    candidate generator here); candidate volume is Σ_s df(s)², so at
    corpus scale the standing lever is dropping ultra-frequent
    boilerplate shingles (df cap) before the join — a semantic
    choice (containment over rare shingles) that must then be
    mirrored in any oracle. The group-by and the size join key on
    doc ids. Threshold comparisons are exact (small-integer ratio).
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.split(F.col(text_col), " ").alias("_t"),
    )
    n = int(shingle)
    # size guard BEFORE sequence(): Spark's sequence(1, stop) runs
    # DESCENDING for stop < 1, which would explode bogus windows
    sh = (
        toks.filter(F.size("_t") >= n)
        .select(
            "_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_t) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(_t, i, {n})))"
                )
            ).alias("_sh"),
        )
        .distinct()
    )
    sz = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    inter = (
        sh.select(F.col("_id").alias("id_a"), "_sh")
        .join(sh.select(F.col("_id").alias("id_b"), "_sh"), "_sh")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sz.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumn(
            "containment", F.col("inter") / F.col("_n").cast("double")
        )
        .filter(F.col("containment") >= F.lit(float(threshold)))
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            F.round("containment", 6).alias("containment"),
        )
    )


def linkage_score(
    pairs: DataFrame,
    rules: list[tuple[Column, int, int]],
    out_col: str = "fs_weight",
) -> DataFrame:
    """Fellegi-Sunter record-linkage scoring over candidate pairs:
    each field comparison contributes its agreement weight
    (log2(m/u), positive) when the agreement predicate holds and its
    disagreement weight (log2((1-m)/(1-u)), negative) otherwise; the
    pair's score is the sum, and match/possible/non-match bands are
    thresholds on that sum. ``rules`` is
    [(agreement_predicate, w_agree, w_disagree), ...] with weights
    as INTEGERS (the standard practice once m/u are estimated —
    integer weights keep the score exact-arithmetic and
    hash-portable across engines; callers holding float log-weights
    scale them to integers first).

    Scale: pure column expressions over an already-blocked candidate
    set — the expensive part of linkage is candidate generation
    (sorted-neighborhood q370, deletion variants q249, LSH q57),
    which this composes with; scoring itself is map-only and
    whole-stage-codegen'd. Reference parity: north-star scope — the
    reference's dedup surface is the -update predicate
    (DistCPPlus.java); this is the probabilistic mastering tier
    above it."""
    score = None
    for pred, w_agree, w_disagree in rules:
        term = F.when(pred, F.lit(int(w_agree))).otherwise(
            F.lit(int(w_disagree))
        )
        score = term if score is None else score + term
    if score is None:
        raise ValueError("linkage_score needs at least one rule")
    return pairs.withColumn(out_col, score.cast("long"))
