"""Distributed BPE: merge-list learning and corpus encoding.

``bpe_pair_counts`` / ``bpe_apply_merge`` (queries/corpus_ops.py)
demonstrate single induction rounds; this module completes the
pipeline: LEARN a merge list over the corpus, then ENCODE documents
into token ids — the step that turns curated text into training
tokens (pairs with ``operators/packing.sequence_packing`` downstream).
The reference repo has no tokenizer at all (its LLM step is a remote
chat API, ``rag_llama.py``) — net-new LLM-pipeline capability.

Shape (the same driver-iterative contract as
``operators/clustering.kmeans_assign``):

- :func:`learn_merges` runs ``n_merges`` true BPE induction rounds.
  Each round is one distributed pair-count aggregate over the working
  word frame (map-side partial counts; the shuffle carries (2-symbol
  pair, count) scalars) followed by a driver-side collect of exactly
  ONE row (the argmax pair) — bounded regardless of corpus size.
  Merged pairs become single placeholder symbols ``chr(1..n)``.
- :func:`apply_merges` folds the learned list into a chain of
  codegen'd ``replace`` expressions — left-to-right non-overlapping
  replacement, identical semantics in Spark and DuckDB, no UDFs.

Determinism contract (what makes the DuckDB oracle possible): pair
counts use word multiplicity (real BPE), the argmax tie-breaks on the
lexicographically smallest pair, and merges apply in learned order.
The oracle unrolls the induction rounds as a generated CTE chain,
exactly like ``queries/clustering._kmeans_cte``.

At 100 TB: learning scans the (persisted) word frame once per round
with only scalar-pair shuffles, and encoding is map-only string
arithmetic — no shuffle at all. The placeholder alphabet bounds
``n_merges`` at 255 symbols; production tokenizers with 50k merges
would swap the chr-placeholder trick for an int-array representation,
but the plan shape (iterate tiny aggregates, then map-only encode)
is the scalable one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def learn_merges(
    words: DataFrame,
    n_merges: int = 12,
    word_col: str = "w",
    count_col: str | None = None,
) -> list[str]:
    """Learn ``n_merges`` BPE merges over a (word) frame with
    multiplicity. Returns the ordered pair list; pair ``i`` (1-based)
    is merged into the placeholder symbol ``chr(i)``.

    ``count_col`` (round-17, guide §2.3 "aggregate before you
    shuffle"): callers that pre-aggregate the corpus to DISTINCT
    words with a multiplicity column pass it here, and every round's
    pair count becomes ``SUM(count)`` over the vocabulary-sized
    distinct-word frame instead of ``COUNT(*)`` over the corpus-token
    frame — exact integer equality with the unweighted form, but the
    per-round scan and the replace chain touch |vocabulary| rows, not
    |corpus| rows. The learned merge list is bit-identical.

    Callers should persist ``words`` first — every round re-scans it
    with ``i-1`` stacked replaces (all map-side).
    """
    if not 1 <= n_merges <= 255:
        raise ValueError("n_merges must be in [1, 255] (chr placeholder alphabet)")
    merges: list[str] = []
    if count_col is None:
        w = words.select(F.col(word_col).alias("w"), F.lit(1).alias("_n"))
    else:
        w = words.select(
            F.col(word_col).alias("w"), F.col(count_col).alias("_n")
        )
    for i in range(1, n_merges + 1):
        best = (
            w.filter(F.length("w") >= 2)
            .select(
                "w",
                "_n",
                F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("p"),
            )
            .select(F.expr("substring(w, p, 2)").alias("pair"), "_n")
            .groupBy("pair")
            .agg(F.sum("_n").alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair = best[0]["pair"]
        merges.append(pair)
        w = w.select(
            F.replace(F.col("w"), F.lit(pair), F.lit(chr(i))).alias("w"), "_n"
        )
    return merges


def apply_merges(col: Column | str, merges: list[str]) -> Column:
    """Fold the learned merge list into one codegen'd replace chain:
    merge ``i`` (1-based) rewrites its pair to ``chr(i)``."""
    c = F.col(col) if isinstance(col, str) else col
    for i, pair in enumerate(merges, start=1):
        c = F.replace(c, F.lit(pair), F.lit(chr(i)))
    return c


def decode_merges(col: Column | str, merges: list[str]) -> Column:
    """Inverse of :func:`apply_merges`: expand placeholders back to
    their pairs in REVERSE learned order (later merges may reference
    earlier placeholders). apply -> decode round-trips exactly."""
    c = F.col(col) if isinstance(col, str) else col
    for i in range(len(merges), 0, -1):
        c = F.replace(c, F.lit(chr(i)), F.lit(merges[i - 1]))
    return c
