"""BPE tokenizer training as an iterative DataFrame fold.

q132 counts symbol pairs (one aggregation); this module runs the
actual merge LOOP of byte-pair encoding (Sennrich et al. 2016,
public algorithm): per iteration, count adjacent-pair frequencies
over the (word, freq) vocabulary, pick the most frequent pair with a
deterministic tie-break, and rewrite every word's token array with
the merged symbol. The reference engine has no tokenizer surface;
this is part of the extended training-data pipeline.

Scale shape (the same driver-fold pattern as k-means/PageRank):
- the VOCABULARY (distinct words + counts) is the iterated frame,
  not the corpus — one corpus-sized shuffle up front, then every
  iteration touches |vocab| rows only (Heaps' law: ~10^6-10^7 words
  for a 100 TB corpus — a small frame by cluster standards).
- each iteration is one hash aggregation (pair counts) + a driver
  top-1 + a codegen'd array rewrite; the merge table (KBs) lives on
  the driver exactly like k-means centroids.
- lineage is truncated with localCheckpoint every few merges so
  iteration k's plan never embeds all k-1 predecessors.

Everything runs in JVM higher-order functions — the left-to-right
greedy pair rewrite is an ``aggregate`` fold; no Python touches
per-word data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x00"  # pair separator; cannot appear in whitespace-split words


def _chars(col):
    """Split a word into single-character tokens (JVM-side)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.substring(col, i.cast("int"), 1),
    )


def _adjacent_pairs(toks):
    """array<string> of 'left SEP right' for each adjacent pair."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(SEP), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _merge_pair(toks, left: str, right: str):
    """Left-to-right greedy rewrite: every non-overlapping adjacent
    (left, right) becomes left+right — a sequential fold, matching
    the reference algorithm's in-order replacement semantics."""
    return F.aggregate(
        toks,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (t == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def build_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, wn, toks) vocabulary frame: the ONE corpus-sized
    aggregation; every BPE iteration works on this, not the corpus."""
    words = (
        docs.select(F.explode(F.split(text_col, " ", -1)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("wn"))
    )
    return words.withColumn("toks", _chars(F.col("word")))


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 10,
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules. Returns
    [(rank, left, right, pair_count), ...] in merge order.

    Deterministic: ties on pair count break lexicographically on the
    pair string (count DESC, pair ASC) — identical across runs,
    partitionings, and engines."""
    vocab = build_vocab(docs, text_col).persist()
    vocab.count()  # materialize before iterating
    merges: list[tuple[int, str, str, int]] = []
    cur = vocab
    for it in range(n_merges):
        top = (
            cur.select("wn", F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
            .groupBy("p")
            .agg(F.sum("wn").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        left, right = top[0]["p"].split(SEP)
        merges.append((it, left, right, int(top[0]["cnt"])))
        cur = cur.withColumn("toks", _merge_pair(F.col("toks"), left, right))
        if (it + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=False)
    vocab.unpersist()
    return merges


def bpe_apply(
    df: DataFrame, text_col: str, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: split to
    chars, replay every merge rule in rank order (each a codegen'd
    fold — the merge table is plan constants, never a shuffle), and
    return the input plus a ``bpe_tokens`` array column."""
    words = df.withColumn("_toks", _chars(F.col(text_col)))
    toks = F.col("_toks")
    for _, left, right, _ in merges:
        toks = _merge_pair(toks, left, right)
    return words.withColumn("bpe_tokens", toks).drop("_toks")
