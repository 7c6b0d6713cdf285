"""Multi-pattern substring matching — one pass over the text for ANY
number of patterns.

Reference parity: turn/DistCPPlus has no multi-pattern matcher (its
filters are per-file predicates); this extends the engine's corpus-
hygiene tier (suffix blocklists, PII spans) to literal blocklists the
size a production crawl filter carries (10k+ entries), where
per-pattern scans (k LIKE/regex passes over 100 TB) are the wrong
plan and a single Aho-Corasick automaton pass is the right one.

The automaton is classic Aho-Corasick 1975 (trie + BFS failure links
+ output links), built once per executor from the plain pattern list
— a few KB rides the closure, no broadcast machinery needed. Matching
counts EVERY occurrence (at each text position, walk the output
chain), which for border-free patterns (no proper prefix that is also
a suffix) equals the non-overlapping count — the form a SQL oracle
can replay with the replace-length trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_automaton(patterns: list[str]):
    """Build (goto, fail, out) tables. States are dense ints; goto is
    a list of dicts char→state; out[s] is a tuple of pattern indexes
    whose match ends at state s (own output + failure-chain outputs,
    pre-flattened so the scan never walks the chain)."""
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for pi, pat in enumerate(patterns):
        if not pat:
            raise ValueError("empty pattern")
        s = 0
        for ch in pat:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(pi)
    # BFS failure links
    fail = [0] * len(goto)
    queue = list(goto[0].values())
    for s in queue:
        fail[s] = 0
    i = 0
    while i < len(queue):
        s = queue[i]
        i += 1
        for ch, t in goto[s].items():
            queue.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0)
            if fail[t] == t:
                fail[t] = 0
            out[t].extend(out[fail[t]])
    return goto, fail, [tuple(o) for o in out]


def count_matches(text: str, automaton) -> dict[int, int]:
    """Count ALL occurrences of every pattern in one left-to-right
    pass. Returns {pattern_index: count} for patterns with count>0."""
    goto, fail, out = automaton
    counts: dict[int, int] = {}
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            for pi in out[s]:
                counts[pi] = counts.get(pi, 0) + 1
    return counts


def multi_pattern_counts(
    df: DataFrame, id_col: str, text_col: str, patterns: list[str]
) -> DataFrame:
    """(id, pattern, cnt) rows for every pattern occurring in each
    text — one automaton pass per row regardless of |patterns|.

    Scale: embarrassingly parallel mapInPandas, ZERO shuffle; the
    pattern list rides the task closure (fine to ~100k short
    patterns; beyond that, ship a file and build per-executor). The
    per-row cost is O(len(text) + matches), independent of pattern
    count — the property that makes 10k-entry blocklists viable at
    100 TB where k regex scans are k full passes."""
    import pandas as pd  # noqa: F401

    pats = list(patterns)
    schema = f"{id_col} bigint, pattern string, cnt bigint"

    def scan(batches):
        import pandas as pd

        automaton = build_automaton(pats)
        for pdf in batches:
            ids, outp, cnts = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for pi, c in count_matches(text, automaton).items():
                    ids.append(int(rid))
                    outp.append(pats[pi])
                    cnts.append(c)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "pattern": pd.Series(outp, dtype="object"),
                 "cnt": pd.Series(cnts, dtype="int64")}
            )

    return df.select(id_col, text_col).mapInPandas(scan, schema)
