"""Composed pipelines: QuerySpec-driven plans through the driver
gate, the corpus-filter pipeline, and skew-handling shapes — each
checked against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import text
from ..operators.skew import salted_sum_count
from ..plans import QuerySpec, compile_spec
from . import register


@register(
    "queryspec_filter_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice > 100000
      AND EXTRACT(YEAR FROM o_orderdate) BETWEEN 1996 AND 1997
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    doc="The QuerySpec planner driven end-to-end through the driver "
    "gate: filters dict (equality + comparison), year range, order, "
    "limit — compiled to one plan by plans.compile_spec.",
)
def queryspec_filter_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(
        dataset="orders",
        metrics=["o_orderkey", "o_custkey", "o_totalprice"],
        filters={"o_orderstatus": "O", "o_totalprice": (">", 100000)},
        year_range=(1996, 1997),
        order_by=[("o_totalprice", False), ("o_orderkey", True)],
        limit=15,
    )
    plan, dropped = compile_spec(spec, load_table(spark, sf_dir, "orders"))
    assert dropped == []
    return plan


@register(
    "queryspec_group_agg",
    """
    SELECT c_mktsegment, ROUND(SUM(c_acctbal), 2) AS c_acctbal
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    """,
    doc="QuerySpec aggregation path: comparison filter + groupBy + sum "
    "(the A2/A8 shape through the planner).",
)
def queryspec_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = QuerySpec(
        dataset="customer",
        metrics=["c_acctbal"],
        filters={"c_acctbal": (">", 0)},
        group_by=["c_mktsegment"],
        agg="sum",
    )
    plan, _ = compile_spec(spec, load_table(spark, sf_dir, "customer"))
    return plan.select("c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal"))


@register(
    "corpus_filter_pipeline",
    r"""
    WITH scored AS (
      SELECT doc_id, text, lang, n_chars,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
             ROUND(len(regexp_extract_all(text, '[A-Za-z]'))
                   / CAST(GREATEST(length(text), 1) AS DOUBLE), 4) AS alpha_ratio
      FROM documents
    ), keep AS (
      SELECT fp, MIN(doc_id) AS keep_id FROM scored GROUP BY fp
    )
    SELECT s.doc_id, s.lang, s.n_chars, s.alpha_ratio
    FROM scored s JOIN keep k ON s.doc_id = k.keep_id
    WHERE s.alpha_ratio >= 0.7 AND s.n_chars BETWEEN 100 AND 500
    """,
    doc="The pretraining corpus-filter pipeline: exact dedup (keep min "
    "doc_id per fingerprint) + quality gate (alpha ratio, length "
    "bounds) in one plan — the composition every data-curation run "
    "starts with. Near-dup and ANN stages chain on top (rows-only "
    "variants).",
)
def corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    feats = text.quality_features("text")
    scored = d.select(
        "doc_id",
        "lang",
        "n_chars",
        text.fingerprint("text").alias("fp"),
        feats["alpha_ratio"].alias("alpha_ratio"),
    )
    keep = scored.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    return (
        scored.join(keep, scored.doc_id == keep.keep_id, "left_semi")
        .filter((F.col("alpha_ratio") >= 0.7) & F.col("n_chars").between(100, 500))
        .select("doc_id", "lang", "n_chars", "alpha_ratio")
    )


@register(
    "curation_end_to_end",
    None,  # MinHash stage is hash-randomized -> rows-only; each stage
    # has its own oracle/bound elsewhere (corpus_filter_pipeline,
    # decontaminate_corpus, minhash recall floor, document_chunks)
    doc="The full pretraining-curation DAG as ONE lazy plan: held-out "
    "split -> quality gate -> exact dedup -> MinHash near-dup removal "
    "(keep min id per pair) -> decontamination against the held-out "
    "set -> token-window chunking. Demonstrates that every operator "
    "composes without materialization barriers (the MinHash persist "
    "is the single deliberate reuse point).",
)
def curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup
    from ..operators.text import chunk_spans, quality_features

    d = load_table(spark, sf_dir, "documents", rebalance=True)
    # Held-out "eval" split by stable key arithmetic (not random).
    heldout = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)

    gated = corpus.filter(quality_features("text")["alpha_ratio"] >= 0.5)
    uniq = dedup.drop_exact_duplicates(gated)

    near = dedup.minhash_near_duplicates(uniq, min_jaccard=0.5)
    # Keep the lexicographically-first member of each near-dup pair.
    drop_ids = near.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = uniq.join(drop_ids, "doc_id", "left_anti")

    clean, _ = dedup.decontaminate(deduped, heldout)
    return chunk_spans(clean, chunk_tokens=64, overlap=16)


@register(
    "salted_agg_equivalence",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 2) AS sum_l_quantity,
           COUNT(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Skew-handling: two-phase salted aggregation over a 3-value "
    "grouping key (maximal skew: every key is hot). The oracle is the "
    "plain GROUP BY — salting must be algebraically invisible.",
)
def salted_agg_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", rebalance=True)
    out = salted_sum_count(li, ["l_returnflag"], "l_quantity", n_salts=16)
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity", 2).alias("sum_l_quantity"),
        "n_rows",
    )
