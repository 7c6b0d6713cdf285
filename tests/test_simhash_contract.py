"""Quantitative contract for the xxhash64 simhash fast path (x02).

The portable-md5 mode of the SAME operator is value-checked by the
q418 driver hash gate; these tests pin the engine-native xxhash64
path, which no external SQL engine can replay:

* bit-exact identity on single-token documents (the vote of one
  token IS the token's hash bits — checked against an independent
  Python recomputation from the raw xxhash64 value);
* the property simhash exists for: planted near-duplicates (1 token
  of 50 changed) land at small Hamming distance while unrelated
  random documents concentrate around 16/32 bits — with margins wide
  enough (<=10 vs >=11 on means) that a broken vote or pack stage
  (which decorrelates everything toward 16) fails loudly;
* determinism across runs.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from distcpplus_spark.operators.dedup import simhash_fingerprints


def _corpus(n_docs: int = 30, n_tokens: int = 50, seed: int = 7):
    rng = random.Random(seed)
    vocab = [f"tok{i:04d}" for i in range(4000)]
    base = [
        " ".join(rng.choice(vocab) for _ in range(n_tokens))
        for _ in range(n_docs)
    ]
    rows = []
    for i, text in enumerate(base):
        rows.append((i, text))
        toks = text.split(" ")
        toks[rng.randrange(n_tokens)] = rng.choice(vocab)
        rows.append((1000 + i, " ".join(toks)))  # near-dup of doc i
    return rows


def _fingerprints(spark, rows):
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    return {
        r["_id"]: r["simhash"]
        for r in simhash_fingerprints(df, "text", "doc_id").collect()
    }


def test_single_token_identity(spark):
    """One-token documents: every bit's vote is that token's hash
    bit, so the fingerprint must equal the packed hash bits. The
    expected value is recomputed in PYTHON from the raw xxhash64
    (trunc-division semantics: bit i of a negative hash is bit i of
    its absolute value), so the explode/vote/pack stages are checked
    independently of the Spark expressions that implement them."""
    toks = ["alpha", "bravo", "charlie", "delta", ""]
    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    hashes = {
        r["t"]: r["h"]
        for r in df.select(
            F.col("text").alias("t"), F.xxhash64("text").alias("h")
        ).collect()
    }
    got = _fingerprints(spark, rows)
    for i, t in enumerate(toks):
        h = abs(hashes[t])
        expect = sum(((h >> b) & 1) << b for b in range(32))
        assert got[i] == expect, (t, hashes[t])


def test_near_dup_separation_and_determinism(spark):
    rows = _corpus()
    fp1 = _fingerprints(spark, rows)
    fp2 = _fingerprints(spark, rows)
    assert fp1 == fp2  # deterministic across runs

    def ham(a, b):
        return bin(a ^ b).count("1")

    near = [ham(fp1[i], fp1[1000 + i]) for i in range(30)]
    unrelated = [
        ham(fp1[i], fp1[j]) for i in range(30) for j in range(i + 1, 30)
    ]
    # 49/50 shared tokens: each bit's vote moves by at most 2, so only
    # near-tied bits can flip. Mean near-dup distance measured ~2-4;
    # unrelated pairs are ~Binomial(32, 1/2) => mean ~16, and 435
    # pairs put the sample mean within ~0.4 of it.
    assert sum(near) / len(near) <= 10.0, near
    assert max(near) <= 16, near
    assert sum(unrelated) / len(unrelated) >= 11.0
