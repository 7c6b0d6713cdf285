"""Regex source selection (the reference's -rg and -regexPath modes).

-rg (Arguments.java:184-201, 306-346): flat mode — children of a
directory whose *name* matches a pattern.

-regexPath (Arguments.java:363-437): per-depth mode — a '/'-separated
chain rx0/rx1/... where the path component at depth d must match
regexes[d]; a directory matched at the final depth is selected
wholesale.

Both are pure DataFrame filters over the listing — no filesystem
point-probes (the reference skips per-file existence RPCs in regex
mode for exactly this reason, DistCPPlus.java:180-188).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _basename(path: Column) -> Column:
    return F.element_at(F.split(path, "/"), -1)


def filter_name_regex(file_meta: DataFrame, pattern: str) -> DataFrame:
    """-rg: keep rows whose file NAME fully matches ``pattern``.

    The reference uses Java String.matches (full match,
    Arguments.java:330-336); rlike is a contains-match, so anchor.
    """
    anchored = f"^(?:{pattern})$"
    return file_meta.filter(_basename(F.col("path")).rlike(anchored))


def filter_depth_regexes(
    file_meta: DataFrame, root: str, patterns: list[str]
) -> DataFrame:
    """-regexPath: path component at depth d (below root) must match
    patterns[d]. Rows deeper than len(patterns) survive if their
    ancestor chain matched (leaf-dir selected wholesale — the
    reference pushes matched leaf dirs as sources, Arguments.java:418-428).
    """
    root = root.rstrip("/")
    # literal prefix strip (NOT regexp_replace: a root containing
    # regex metacharacters like '+' or '(' would silently mis-strip)
    rel = F.expr(f"substring(path, {len(root) + 2})")
    parts = F.split(rel, "/")
    cond = F.col("path").startswith(root + "/")
    for d, rx in enumerate(patterns):
        anchored = f"^(?:{rx})$"
        # Component d must match when present (try_element_at → null
        # for rows shallower than the chain; null rlike is false, so
        # intermediate dirs drop out). Components beyond the chain are
        # free — those rows are inside a wholesale-selected leaf dir.
        cond = cond & F.try_element_at(parts, F.lit(d + 1)).rlike(anchored)
    cond = cond & (F.size(parts) >= len(patterns))
    return file_meta.filter(cond)


def touched_dirs(selected: DataFrame, root: str) -> DataFrame:
    """Ancestor directories of every selected path (the reference's
    touchedDirs set, Arguments.java:61-74) — needed by the
    attribute-preservation finalize pass."""
    root = root.rstrip("/")
    rel = F.expr(f"substring(path, {len(root) + 2})")  # literal strip
    parts = F.split(rel, "/")
    ancestors = F.transform(
        F.sequence(F.lit(1), F.size(parts) - 1),
        lambda i: F.concat_ws(
            "/", F.lit(root), F.concat_ws("/", F.slice(parts, 1, i))
        ),
    )
    return (
        selected.select(F.explode(ancestors).alias("dir_path"))
        .distinct()
    )
