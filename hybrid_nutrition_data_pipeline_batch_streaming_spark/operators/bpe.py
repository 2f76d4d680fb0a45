"""Distributed BPE tokenizer training (iterative greedy merges).

`plans.text.bpe_top_pairs` value-checks ONE merge-selection step; this is the
full trainer loop: k rounds of (count weighted adjacent pairs → pick the
argmax pair → merge it everywhere), the exact greedy algorithm of Sennrich et
al. 2016, run over the word-frequency table — the classic BPE compression
trick that makes corpus size irrelevant: after the initial word count, every
round's cost is O(vocabulary), not O(tokens).

Spark-first shape: the symbol sequences live as space-separated STRINGS, so
the merge step is ONE JVM-side regexp_replace per round (no Python, no
explode-rebuild): the pattern ``" l r(?= )"`` consumes the left symbol and
asserts (without consuming) the trailing boundary, which reproduces greedy
left-to-right non-overlapping merging exactly — ``a a a a`` merges to
``aa aa``, ``a a a`` to ``aa a``, byte-for-byte what the reference Python
implementation does. Pair counting is the same zip-shifted bigram explode as
`bpe_top_pairs`, weighted by word frequency.

Per-round lineage is cut with `session.checkpoint_truncate` (reliable
checkpoint() under SPARK_GRAFT_CHECKPOINT_DIR, localCheckpoint otherwise) —
the same discipline as connected components and the k-means trainer; an
uncut 50-round loop re-analyzes a 50-deep regexp chain per action.

Determinism: the argmax pair tie-breaks on (count DESC, left, right), so the
merge sequence is a pure function of the word-frequency table — identical
across partitionings, reruns, and the pure-Python twin the test compares
against.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import checkpoint_truncate


def _pair_counts(df: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over (syms, freq) symbol strings."""
    toks = F.split(F.col("syms"), " ")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        df.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def train_bpe(
    words: DataFrame, n_merges: int, min_count: int = 1
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from a (w: string, freq: long)
    word-frequency table. Returns (merge rules in order, final symbolized
    table (syms, freq)).

    Each round is two jobs: a pair-count aggregation (partial-agg shuffle
    over the vocabulary) and a 1-row argmax collect — scalar-only driver
    traffic, like the k-means objective and the CC convergence test.
    Symbols must not contain spaces (the separator) or ``$`` (Java
    replacement metacharacter); word characters satisfy both."""
    df = words.select(
        F.concat_ws(" ", F.split(F.col("w"), "")).alias("syms"),
        F.col("freq").cast("long").alias("freq"),
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(df)
            .where(F.col("cnt") >= min_count)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r = top[0]["l"], top[0]["r"]
        merges.append((l, r))
        pattern = f" {re.escape(l)} {re.escape(r)}(?= )"
        replacement = f" {l}{r}"
        df = checkpoint_truncate(
            df.select(
                F.btrim(
                    F.regexp_replace(
                        F.concat(F.lit(" "), F.col("syms"), F.lit(" ")),
                        pattern,
                        replacement,
                    )
                ).alias("syms"),
                "freq",
            )
        )
    return merges, df


def train_bpe_python(words: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Pure-Python reference trainer (the differential twin for tests):
    identical greedy semantics, same tie-break."""
    table = [(list(w), f) for w, f in words]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in table:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        l, r = best
        for i, (syms, f) in enumerate(table):
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            table[i] = (out, f)
    return merges


def encode_with_merges(df: DataFrame, merges: list[tuple[str, str]], text_col: str = "w") -> DataFrame:
    """Apply learned merge rules to new text — the ENCODE half of the
    tokenizer (train on the corpus once, encode everything forever). The
    k rules chain as k regexp_replace expressions inside ONE projection
    (no loop actions, no Python): Catalyst folds them into a single
    codegen'd stage, so encoding cost is one map pass however many rules
    exist. Returns (original column, bpe_tokens array, n_bpe_tokens)."""
    col = F.concat_ws(" ", F.split(F.col(text_col), ""))
    for l, r in merges:
        col = F.btrim(
            F.regexp_replace(
                F.concat(F.lit(" "), col, F.lit(" ")),
                f" {re.escape(l)} {re.escape(r)}(?= )",
                f" {l}{r}",
            )
        )
    toks = F.split(col, " ")
    return df.select(
        F.col(text_col),
        toks.alias("bpe_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
    )
