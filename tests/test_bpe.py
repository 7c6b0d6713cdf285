"""BPE merge-loop training (operators/bpe.py) against an independent
in-test reference implementation of the public algorithm."""

from pyspark.sql import functions as F

from distcpplus_spark.operators.bpe import bpe_apply, bpe_train


def _ref_bpe(word_freqs, n_merges, min_count=2):
    """Classic Sennrich-style reference: dict-of-tuples vocabulary,
    same tie-break (count DESC, pair ASC on left+SEP+right)."""
    vocab = {tuple(w): c for w, c in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for toks, c in vocab.items():
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(
            pairs.items(),
            key=lambda kv: (-kv[1], kv[0][0] + "\x00" + kv[0][1]),
        )
        if best[1] < min_count:
            break
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        new_vocab = {}
        for toks, c in vocab.items():
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "newer newest new low",
    "wider wide wider widest",
    "low newer lowest wide wide",
]


def _freqs(texts):
    freqs = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def test_matches_reference_implementation(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id INT, text STRING"
    )
    assert bpe_train(docs, "text", n_merges=8) == _ref_bpe(_freqs(TEXTS), 8)


def test_matches_reference_on_fixture_corpus(spark):
    """Same equality on real fixture text (100 documents, 10 merges) —
    catches anything the toy corpus misses (unicode, punctuation runs,
    long repeated substrings)."""
    from distcpplus_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 100
    )
    texts = [r["text"] for r in docs.select("text").collect()]
    assert bpe_train(docs, "text", n_merges=10) == _ref_bpe(_freqs(texts), 10)


def test_apply_replays_merges_in_order(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id INT, text STRING"
    )
    merges = bpe_train(docs, "text", n_merges=8)
    out = {
        r["w"]: list(r["bpe_tokens"])
        for r in bpe_apply(
            spark.createDataFrame([("lowest",), ("wider",), ("x",)], "w STRING"),
            "w",
            merges,
        ).collect()
    }
    # learned merges: low, de/ide/wide, st ...
    assert out["lowest"] == ["low", "e", "st"]
    assert out["wider"] == ["wide", "r"]
    assert out["x"] == ["x"]  # unseen word falls back to chars


def test_greedy_overlap_semantics(spark):
    """Rule (a,a) over 'aaa' merges left-to-right non-overlapping:
    ['aa','a'] — the fold must not re-merge its own output."""
    docs = spark.createDataFrame([("aaa aaa aaa",)], "text STRING")
    merges = bpe_train(docs, "text", n_merges=1)
    assert [(m[1], m[2]) for m in merges] == [("a", "a")]
    out = bpe_apply(
        spark.createDataFrame([("aaa",), ("aaaa",)], "w STRING"), "w", merges
    ).collect()
    got = {r["w"]: list(r["bpe_tokens"]) for r in out}
    assert got["aaa"] == ["aa", "a"]
    assert got["aaaa"] == ["aa", "aa"]


def test_deterministic_across_runs(spark):
    from distcpplus_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 60
    )
    assert bpe_train(docs, "text", n_merges=6) == bpe_train(
        docs, "text", n_merges=6
    )
