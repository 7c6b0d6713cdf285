"""Tests for dedup, similarity, and multimodal operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distcpplus_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    union_find_components,
)
from distcpplus_spark.operators.multimodal import (
    extract_image_features,
    resample_audio,
    sample_video_frames,
)
from distcpplus_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    pairwise_above_threshold,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog again and again!"),  # near dup
        (4, "completely different text about spark dataframes and shuffles"),
        (5, "another unrelated document mentioning parquet row groups"),
    ]
    return spark.createDataFrame(base, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, "text", "doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 3, 4, 5}  # 2 dropped (dup of 1, higher id)


def test_minhash_candidates_find_near_dup(spark, docs):
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=16)
    assert sigs.count() == 5 * 16
    cands = minhash_lsh_candidates(sigs, bands=4, rows_per_band=4)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs  # exact dup always a candidate
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup caught


def test_ngram_jaccard_verification(spark, docs):
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=16)
    cands = minhash_lsh_candidates(sigs, bands=4, rows_per_band=4)
    verified = ngram_jaccard_pairs(docs, cands, "text", "doc_id")
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert by_pair[(1, 2)] == pytest.approx(1.0)
    if (1, 3) in by_pair:
        assert by_pair[(1, 3)] > 0.8


def test_minhash_lsh_dedup_end_to_end(spark, docs):
    out = minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.7)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids and 4 in ids and 5 in ids
    assert 2 not in ids  # exact dup removed
    assert 3 not in ids  # near dup removed (jaccard ~0.9)


def test_simhash_near_for_near_dups(spark, docs):
    fp = {r["_id"]: r["simhash"] for r in
          simhash_fingerprints(docs, "text", "doc_id").collect()}
    assert fp[1] == fp[2]  # identical text → identical simhash
    ham_13 = bin(fp[1] ^ fp[3]).count("1")
    ham_14 = bin(fp[1] ^ fp[4]).count("1")
    assert ham_13 < ham_14  # near-dup closer than unrelated


def test_union_find(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    comp = {r["node"]: r["component"] for r in union_find_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


def test_brute_force_topk_self_excluded(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(emb, q, "embedding", "vec_id", k=5)
    rows = out.collect()
    assert len(rows) == 15
    assert all(r["query_id"] != r["corpus_id"] for r in rows)
    # ranks are 1..5 per query, similarity non-increasing
    for qid in range(3):
        sims = [r["cos_sim"] for r in sorted(
            (x for x in rows if x["query_id"] == qid), key=lambda x: x["rank"]
        )]
        assert sims == sorted(sims, reverse=True)


def test_lsh_topk_subset_of_bucket(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = lsh_topk(emb, q, "embedding", "vec_id", k=5, n_planes=4)
    rows = out.collect()
    # approximate: each query returns ≤5, all from its own bucket
    assert all(1 <= r["rank"] <= 5 for r in rows)


def test_lsh_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, lsh_topk(emb, q, "embedding", "vec_id", k=3).collect()))
    b = sorted(map(tuple, lsh_topk(emb, q, "embedding", "vec_id", k=3).collect()))
    assert a == b


def test_pairwise_threshold_vs_bruteforce(spark):
    """LSH pairs must be a subset of true pairs (no false positives
    after scoring; recall is allowed < 1)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") < 80)
    lsh_pairs = {
        (r["id_a"], r["id_b"])
        for r in pairwise_above_threshold(
            emb, "embedding", "vec_id", threshold=0.2, n_planes=4
        ).collect()
    }
    # brute-force truth
    from distcpplus_spark.functions.vectors import cosine_similarity, to_double_array

    e = emb.select("vec_id", to_double_array(F.col("embedding")).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine_similarity(F.col("a.v"), F.col("b.v")).alias("cs"),
        )
        .filter(F.col("cs") >= 0.2)
        .collect()
    }
    assert lsh_pairs <= truth


# ---------------------------------------------------------------------------
# multimodal (stubbed decode, real plumbing)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "a.jpg", "image", bytes(range(200)), 200, {"k": "v"}),
        (2, "b.jpg", "image", b"\xff" * 5000, 5000, {}),
        (3, "c.jpg", "image", None, 0, {}),  # error path
    ]
    from distcpplus_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features(spark, media):
    out = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert out[1]["channels"] == 3
    assert out[1]["width"] is not None and out[1]["phash"] is not None
    assert out[3]["width"] is None  # decode failure → nulls, row kept


def test_image_features_deterministic(spark, media):
    a = sorted(map(tuple, extract_image_features(media).collect()))
    b = sorted(map(tuple, extract_image_features(media).collect()))
    assert a == b


def test_resample_audio(spark, media):
    out = {r["media_id"]: r for r in resample_audio(media, 16000).collect()}
    assert out[1]["sample_rate"] == 16000
    assert out[1]["content"] is not None
    assert out[3]["content"] is None


def test_video_frames_explode(spark, media):
    rows = sample_video_frames(media).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[2]) == 5  # 5000 bytes → 5 frames
    assert 3 not in by_id  # null content yields no rows
    idxs = sorted(r["frame_idx"] for r in by_id[2])
    assert idxs == [0, 1, 2, 3, 4]


def test_resize_images_contract(spark, media):
    from distcpplus_spark.operators.multimodal import resize_images

    out = resize_images(media, width=32, height=32).collect()
    assert len(out) == media.count()
    by_id = {r["media_id"]: r for r in out}
    for r in out:
        assert r["width"] == 32 and r["height"] == 32
    # deterministic: same input bytes → same resized bytes
    again = {r["media_id"]: r for r in resize_images(media, 32, 32).collect()}
    for mid, r in by_id.items():
        assert again[mid]["content"] == r["content"]


def test_engine_sql_entry_point(spark):
    from distcpplus_spark.engine import DistCpPlusEngine

    eng = DistCpPlusEngine(spark)
    n = eng.sql(
        "SELECT count(*) AS n FROM lineitem", "/root/testdata/sf0.001"
    ).collect()[0]["n"]
    assert n > 0


def test_hash_media_arrow(spark, media):
    import hashlib

    from distcpplus_spark.operators.multimodal import hash_media_arrow

    rows = {r["media_id"]: r for r in hash_media_arrow(media).collect()}
    src = {r["media_id"]: r["content"] for r in media.collect()}
    assert rows.keys() == src.keys()
    for mid, content in src.items():
        if content is None:
            assert rows[mid]["sha256"] is None
            assert rows[mid]["n_bytes"] == 0
        else:
            assert rows[mid]["sha256"] == hashlib.sha256(content).hexdigest()
            assert rows[mid]["n_bytes"] == len(content)


def test_semantic_dedup_matches_bruteforce(spark):
    """semantic_dedup survivors == the brute-force keep-first rule
    computed in numpy over the same sign-LSH buckets."""
    import numpy as np

    from distcpplus_spark.operators.dedup import semantic_dedup
    from distcpplus_spark.operators.similarity import make_hyperplanes

    rng = np.random.default_rng(19)
    dim, n = 16, 120
    base = rng.normal(size=(30, dim))
    vecs = []
    for i in range(n):
        v = base[i % 30] + rng.normal(scale=0.15 if i % 3 else 2.0, size=dim)
        vecs.append(v / np.linalg.norm(v))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    threshold, planes = 0.8, 6
    got = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            df, "embedding", "vec_id", threshold=threshold,
            n_planes=planes, dim=dim, seed=7,
        ).collect()
    )
    hp = np.array(make_hyperplanes(dim, planes, 7))
    buckets = ["".join("1" if d >= 0 else "0" for d in hp @ v) for v in vecs]
    expect = []
    for i in range(n):
        senior_dup = any(
            buckets[j] == buckets[i]
            and float(np.dot(vecs[j], vecs[i])) >= threshold
            for j in range(i)
        )
        if not senior_dup:
            expect.append(i)
    assert got == expect
    assert 0 < len(expect) < n  # both paths exercised


def test_duplicated_span_coverage_closed_form(spark):
    """Hand-built corpus with known shared substrings: coverage must
    equal the hand-merged span lengths; short docs yield 0."""
    from distcpplus_spark.operators.dedup import duplicated_span_coverage

    shared = "0123456789ABCDEF"  # 16 chars, k=8 -> 9 shared grams
    docs = spark.createDataFrame(
        [
            (1, "xx" + shared + "yyyyyy"),        # spans 3..18
            (2, "zzzz" + shared),                 # spans 5..20
            (3, "no duplicates here at all!"),    # unique text
            (4, "tiny"),                          # shorter than k
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {
        r["doc_id"]: (r["dup_chars"], r["total_chars"])
        for r in duplicated_span_coverage(
            docs, "text", "doc_id", k=8
        ).collect()
    }
    # doc1: shared occupies positions 3..18 -> 16 covered chars
    assert rows[1] == (16, 24)
    assert rows[2] == (16, 20)
    assert rows[3] == (0, 26)
    assert rows[4] == (0, 4)


def test_duplicated_span_coverage_self_repeat(spark):
    """A repeat WITHIN one doc counts (>=2 occurrences anywhere),
    and overlapping spans merge into one island."""
    from distcpplus_spark.operators.dedup import duplicated_span_coverage

    docs = spark.createDataFrame(
        [(1, "abcdabcd____")],  # "abcd" at pos 1 and 5, k=4
        "doc_id BIGINT, text STRING",
    )
    rows = duplicated_span_coverage(docs, "text", "doc_id", k=4).collect()
    # grams "abcd" (pos 1, 5) duplicated -> spans [1,4] and [5,8]
    # merge (adjacent) into [1,8] = 8 chars
    assert (rows[0]["dup_chars"], rows[0]["total_chars"]) == (8, 12)


def test_zvalue_matches_python_morton(spark):
    """The JVM-expression Morton code equals a bit-by-bit python
    reference for exhaustive small inputs and random 8-bit pairs."""
    import random

    from distcpplus_spark.operators.layout import zvalue

    def ref(a, b, bits=8):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    rnd = random.Random(3)
    pairs = [(a, b) for a in range(8) for b in range(8)] + [
        (rnd.randrange(256), rnd.randrange(256)) for _ in range(100)
    ]
    df = spark.createDataFrame(pairs, "a BIGINT, b BIGINT")
    rows = df.select(
        "a", "b", zvalue(F.col("a"), F.col("b"), 8).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == ref(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_by_partitions_are_rectangles(spark, tmp_path):
    """After zorder_by + write, every output file's (a, b) min/max
    box covers far less than the full domain — the data-skipping
    property single-column layout cannot give for BOTH columns."""
    import random

    from distcpplus_spark.operators.layout import zorder_by

    rnd = random.Random(7)
    rows = [
        (rnd.randrange(256), rnd.randrange(256)) for _ in range(20000)
    ]
    df = spark.createDataFrame(rows, "a BIGINT, b BIGINT")
    out = str(tmp_path / "zordered")
    zorder_by(
        df, F.col("a"), F.col("b"), bits=8, num_partitions=16
    ).write.mode("overwrite").parquet(out)
    stats = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in stats) == 20000
    # 16 z-range files over the 256x256 grid: an aligned 2^12 z-block
    # is a 64x64 rectangle; sampled (unaligned) cuts can straddle a
    # high-bit boundary and stretch ONE dimension, so assert the
    # skipping property on bounding-box AREA — every file well under
    # half the domain, and the average near the aligned-block size
    areas = [(r["sa"] + 1) * (r["sb"] + 1) for r in stats]
    domain = 256 * 256
    assert max(areas) <= domain // 2, max(areas)
    assert sum(areas) / len(areas) <= domain // 5


def test_power_iteration_matches_numpy_eig(spark):
    """x23's distributed matvec loop must converge to the same
    dominant eigenvector numpy finds for the same matrix."""
    import numpy as np

    from distcpplus_spark.catalog import load_table
    from __spark_entry__ import queries

    got = {
        r["part_id"]: r["centrality"]
        for r in queries()["x23_power_iteration_centrality"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    li = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .filter(F.col("l_partkey") < 80)
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    from collections import defaultdict

    orders = defaultdict(list)
    for r in li:
        orders[r["l_orderkey"]].append(r["l_partkey"])
    w = defaultdict(float)
    nodes = set()
    for parts in orders.values():
        for u in parts:
            for v in parts:
                if u != v:
                    w[(u, v)] += 1.0
                    nodes.add(u)
                    nodes.add(v)
    idx = {n: i for i, n in enumerate(sorted(nodes))}
    A = np.zeros((len(idx), len(idx)))
    for (u, v), wt in w.items():
        A[idx[u], idx[v]] = wt
    vals, vecs = np.linalg.eigh(A)  # symmetric by construction
    top = np.abs(vecs[:, np.argmax(vals)])
    ref = {n: top[i] / np.linalg.norm(top) for n, i in idx.items()}
    for pid, score in got.items():
        assert abs(score - ref[pid]) < 1e-3, (pid, score, ref[pid])


def test_deletion_neighborhood_join_exact_vs_bruteforce(spark):
    from distcpplus_spark.operators.dedup import deletion_neighborhood_join

    rows = [
        (1, "spark"),   # 2<->1 substitution, 3<->1 deletion
        (2, "spork"),
        (3, "sparks"),
        (4, "ab"),      # 4/5: transposition = distance 2 (the FastSS
        (5, "ba"),      # false-positive pair — must be verified away)
        (6, ""),        # empty string: distance 1 to any 1-char string
        (7, "a"),
        (8, "zzzz"),    # isolated
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in deletion_neighborhood_join(df, "id", "s").collect()
    }
    # brute-force ground truth via the same JVM levenshtein
    a, b = df.alias("a"), df.alias("b")
    expect = {
        (r["id_a"], r["id_b"]): r["d"]
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.s", "b.s").alias("d"),
        )
        .filter(F.col("d") <= 1)
        .collect()
    }
    assert got == {k: v for k, v in expect.items()}
    assert (4, 5) not in got  # transposition verified away
    assert (6, 7) in got  # empty-string edge handled


def test_incremental_minhash_dedup_two_batches(spark):
    from distcpplus_spark.operators.dedup import incremental_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again "
    hist = spark.createDataFrame(
        [(0, base * 4), (2, "completely different corpus text here " * 5)],
        "doc_id long, text string",
    )
    batch1 = spark.createDataFrame(
        [
            (11, base * 4 + "tail"),     # near-dup of 0
            (13, "novel one of a kind document body " * 5),
        ],
        "doc_id long, text string",
    )
    v1, append1 = incremental_minhash_dedup(
        hist, batch1, "doc_id", "text", tau=0.5
    )
    got1 = {r["new_id"]: r["dup_of"] for r in v1.collect()}
    assert got1[11] == 0 and got1[13] is None
    # only the novel doc's signatures get appended
    assert {r["_id"] for r in append1.collect()} == {13}

    # batch 2 contains a near-dup OF THE APPENDED doc 13 — visible
    # only if the index actually grew
    hist2 = hist.union(batch1.filter(F.col("doc_id") == 13))
    batch2 = spark.createDataFrame(
        [(21, "novel one of a kind document body " * 5 + "x")],
        "doc_id long, text string",
    )
    v2, _ = incremental_minhash_dedup(
        hist2, batch2, "doc_id", "text", tau=0.5
    )
    assert {r["new_id"]: r["dup_of"] for r in v2.collect()} == {21: 13}


def test_pipeline_runner_stages_and_lineage(spark):
    from distcpplus_spark.plans.pipeline import hash_split, run_pipeline

    df = spark.createDataFrame(
        [
            (i, "en" if i % 2 else "de", ("word " * 50).strip(), 250)
            for i in range(40)
        ]
        + [(100, "en", "short", 5)],   # fails min_len
        "doc_id long, lang string, text string, n_chars long",
    )
    spec = {
        "stages": [
            {
                "op": "filter_rules",
                "rules": [{"type": "min_len", "col": "text", "value": 100}],
            },
            {"op": "exact_dedup", "id_col": "doc_id", "text_col": "text"},
            {"op": "hash_split", "id_col": "doc_id", "keep": "train"},
        ]
    }
    final, lineage = run_pipeline(df, spec)
    assert [t[1] for t in lineage] == [
        "filter_rules", "exact_dedup", "hash_split"
    ]
    assert lineage[0][2] == 41 and lineage[0][3] == 40  # short doc dropped
    assert lineage[1][3] == 1  # all texts identical -> one survivor
    # lineage chains: each stage's rows_in == previous rows_out
    for prev, nxt in zip(lineage, lineage[1:]):
        assert nxt[2] == prev[3]
    # split is a partition: train + test == whole, disjoint
    train = hash_split(df, "doc_id", "train")
    test = hash_split(df, "doc_id", "test")
    assert train.count() + test.count() == df.count()
    assert train.join(test, "doc_id").count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_pipeline(df, {"stages": [{"op": "nope"}]})


def test_prefix_filter_jaccard_join_completeness(spark):
    """Prefix filtering must equal the brute-force join exactly —
    including the boundary pair at exactly the threshold and tiny
    token sets where prefix length bottoms out at 1."""
    from distcpplus_spark.operators.dedup import prefix_filter_jaccard_join

    rows = [
        (1, "a b c d"),          # J(1,2) = 3/5 = 0.6
        (2, "a b c e"),
        (3, "a b"),              # J(3,4) = 1/3
        (4, "a c"),
        (5, "x y z w q"),        # J(5,6) = 4/6 ≈ 0.667
        (6, "x y z w r s"),
        (7, "solo"),
        (8, "p q"),              # J(8,9) = 0.5 — exactly at threshold
        (9, "p r"),              # J(8,9) = 1/3, actually: {p,q} vs {p,r} = 1/3
        (10, "m n"),             # J(10,11) = 2/2 = 1.0 duplicate
        (11, "n m"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def brute(t):
        toks = {i: set(s.split()) for i, s in rows}
        out = set()
        for a in toks:
            for b in toks:
                if a < b:
                    j = len(toks[a] & toks[b]) / len(toks[a] | toks[b])
                    if j >= t:
                        out.add((a, b, round(j, 6)))
        return out

    for t in (0.3, 0.5, 0.6, 0.99):
        got = {
            (r["id_a"], r["id_b"], round(r["jac"], 6))
            for r in prefix_filter_jaccard_join(
                docs, "text", "doc_id", t
            ).collect()
        }
        assert got == brute(t), f"threshold={t}"


def test_prefix_filter_join_plan_is_equijoin(spark):
    """Candidate generation must be an equi-join on prefix tokens,
    never a cartesian/BNLJ."""
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.operators.dedup import prefix_filter_jaccard_join

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        "doc_id < 60"
    )
    plan = (
        prefix_filter_jaccard_join(docs, "text", "doc_id", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_linkage_score_exact_bands(spark):
    """Fellegi-Sunter scoring: integer weights sum exactly; the
    match/non-match bands are deterministic."""
    from distcpplus_spark.operators.dedup import linkage_score
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [
            ("alice", "alice", "A", "A", 100, 102),   # all agree
            ("alice", "alicia", "A", "A", 100, 102),  # name off
            ("bob", "ann", "A", "B", 0, 9000),        # all disagree
        ],
        "na string, nb string, sa string, sb string, ba long, bb long",
    )
    out = linkage_score(
        pairs,
        [
            (F.col("na") == F.col("nb"), 6, -5),
            (F.col("sa") == F.col("sb"), 3, -2),
            (F.abs(F.col("ba") - F.col("bb")) <= 5, 4, -3),
        ],
    ).select("na", "nb", "fs_weight").collect()
    got = {(r["na"], r["nb"]): r["fs_weight"] for r in out}
    assert got[("alice", "alice")] == 6 + 3 + 4 == 13
    assert got[("alice", "alicia")] == -5 + 3 + 4 == 2
    assert got[("bob", "ann")] == -5 - 2 - 3 == -10
    import pytest as _pt

    with _pt.raises(ValueError):
        linkage_score(pairs, [])


def test_temperature_allocation_sums_exactly(spark):
    """Largest-remainder integerization: allocations sum EXACTLY to
    the budget at any temperature, are monotone in n at T=inf-ward
    flattening, and T=1 reproduces near-natural proportions."""
    from distcpplus_spark.plans.pipeline import temperature_allocation

    counts = spark.createDataFrame(
        [("a", 1000), ("b", 100), ("c", 10), ("d", 1)],
        "g string, n long",
    )
    for temp in (1.0, 2.0, 4.0):
        rows = temperature_allocation(
            counts, "g", "n", budget=97, temperature=temp
        ).collect()
        alloc = {r["g"]: r["alloc"] for r in rows}
        assert sum(alloc.values()) == 97, (temp, alloc)
        # allocation order follows count order at every temperature
        assert alloc["a"] >= alloc["b"] >= alloc["c"] >= alloc["d"]
    # T=2 flattens vs T=1: the biggest domain gives up share
    a1 = {
        r["g"]: r["alloc"]
        for r in temperature_allocation(counts, "g", "n", 97, 1.0).collect()
    }
    a2 = {
        r["g"]: r["alloc"]
        for r in temperature_allocation(counts, "g", "n", 97, 2.0).collect()
    }
    assert a2["a"] < a1["a"] and a2["c"] >= a1["c"]
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_allocation(counts, "g", "n", 10, temperature=0)


def test_temperature_allocation_property(spark):
    """Property sweep: for random count vectors, budgets, and
    temperatures, allocations are non-negative, sum EXACTLY to the
    budget, and respect count order (largest-remainder can break
    monotonicity only at equal weights, which distinct counts under
    1e-6 quantization avoid at these magnitudes)."""
    import random

    from distcpplus_spark.plans.pipeline import temperature_allocation

    rng = random.Random(7)
    for trial in range(6):
        k = rng.randint(2, 8)
        counts = rng.sample(range(1, 100000), k)
        budget = rng.randint(k, 5000)
        temp = rng.choice([1.0, 1.5, 2.0, 3.0, 8.0])
        df = spark.createDataFrame(
            [(f"g{i}", c) for i, c in enumerate(counts)],
            "g string, n long",
        )
        rows = temperature_allocation(df, "g", "n", budget, temp).collect()
        alloc = {r["g"]: r["alloc"] for r in rows}
        n_of = {f"g{i}": c for i, c in enumerate(counts)}
        assert len(alloc) == k
        assert all(a >= 0 for a in alloc.values()), (trial, alloc)
        assert sum(alloc.values()) == budget, (trial, alloc, budget)
        ordered = sorted(alloc, key=lambda g: -n_of[g])
        got = [alloc[g] for g in ordered]
        # non-increasing within 1 (largest-remainder grants +1s)
        assert all(a >= b - 1 for a, b in zip(got, got[1:])), (trial, got)
