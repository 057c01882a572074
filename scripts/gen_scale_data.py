"""Distribution-matched scale-up of the driver's synthetic documents/
embeddings tables, for scaling-exponent measurement ONLY.

The driver's generator is not shipped, so this script re-creates the
two tables the heavy curation pipelines consume with the SAME measured
distributions as /root/testdata/sf0.1 (read-only; never modified):

- documents: vocabulary extracted from the real sf0.1 table (31
  tokens), length ~ Uniform(10, 100) words, lang weights measured
  (en 0.41, de/es/fr/zh ~0.148), source = 'src{doc_id % 20}',
  ~5% of docs are near-copies of a uniformly random earlier doc with
  0-2 token perturbations (matches the measured 256 exact-Jaccard
  >= 0.5 pairs per 5000 docs and the handful of exact dups).
- embeddings: 64-dim unit-normalized Gaussian vectors (measured:
  per-component std 0.125 = 1/sqrt(64), norms == 1, labels ~
  Uniform{0..9}, within-label cosine indistinguishable from across).

Deterministic (numpy PCG64, fixed seed). Output goes under
/root/repo/.scale/sf{X}/ — NOT /root/testdata (read-only contract).
These tables are for relative timing across scales, not for
correctness oracles; the driver's own tables remain the only
correctness input.

Usage: python scripts/gen_scale_data.py --mult 10 --out .scale/sf1
       (mult is relative to sf0.1: mult 10 -> 50,000 docs / 20,000
       vectors; mult 1 regenerates an sf0.1-sized twin so scaling is
       measured between two SAME-generator datasets.)
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_DOCS = 5000  # driver sf0.1 row counts
BASE_VECS = 2000
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.412, 0.148, 0.148, 0.148, 0.144]
DUP_P = 0.05
DIM = 64
N_LABELS = 10


def _vocab() -> list[str]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        r"""
        SELECT DISTINCT unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM read_parquet('/root/testdata/sf0.1/documents.parquet')
        ORDER BY tok
        """
    ).fetchall()
    con.close()
    return [r[0] for r in rows if r[0]]


def gen_documents(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    v = len(vocab)
    texts: list[str] = []
    langs: list[str] = []
    lang_idx = rng.choice(len(LANGS), size=n, p=LANG_W)
    for i in range(n):
        if i > 0 and rng.random() < DUP_P:
            # near-copy of a random earlier doc, 0-2 token edits
            src = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(int(rng.integers(0, 3))):
                src[int(rng.integers(0, len(src)))] = vocab[int(rng.integers(0, v))]
            texts.append(" ".join(src))
        else:
            length = int(rng.integers(10, 101))
            texts.append(" ".join(vocab[j] for j in rng.integers(0, v, size=length)))
        langs.append(LANGS[lang_idx[i]])
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_documents_zipf(n: int, seed: int = 47) -> pa.Table:
    """Content-RARITY twin: Heaps-law vocabulary (V = 50*sqrt(n) ->
    3.5k/11k/35k types at 1x/10x/100x) with Zipf(s=1.1) token
    frequencies — the statistics real corpora have, unlike the
    31-token uniform twin whose saturation drives the tfidf/winnow/
    allpairs regime boundaries in BASELINE.md. Same doc lengths, lang
    mix, sources, and 5% near-copy injection as gen_documents, so the
    ONLY variable between the two twins is content rarity."""
    rng = np.random.default_rng(seed)
    v = int(np.ceil(50.0 * np.sqrt(n)))
    p = 1.0 / np.power(np.arange(1, v + 1), 1.1)
    cum = np.cumsum(p / p.sum())

    def word(t: int) -> str:
        # Base-26 LETTERS, not f"w{t}": digit-heavy tokens leak token
        # SHAPE into the twin (alpha_ratio ~0.25 fails every
        # quality gate, emptying the curation DAGs), which broke the
        # only-variable-is-rarity contract. The letter encoding is a
        # bijection on type ids, so the rarity statistics are
        # untouched. (Found in round 11: curation_end_to_end returned
        # 0 rows at every zipf scale.)
        s = ""
        t += 1
        while t:
            t, r = divmod(t - 1, 26)
            s = chr(ord("a") + r) + s
        return "w" + s

    texts: list[str] = []
    langs: list[str] = []
    lang_idx = rng.choice(len(LANGS), size=n, p=LANG_W)
    for i in range(n):
        if i > 0 and rng.random() < DUP_P:
            src = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(int(rng.integers(0, 3))):
                t = int(np.searchsorted(cum, rng.random()))
                src[int(rng.integers(0, len(src)))] = word(t)
            texts.append(" ".join(src))
        else:
            length = int(rng.integers(10, 101))
            toks = np.searchsorted(cum, rng.random(length))
            texts.append(" ".join(word(int(t)) for t in toks))
        langs.append(LANGS[lang_idx[i]])
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, seed: int = 43) -> pa.Table:
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, DIM))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in m], pa.list_(pa.float32())
            ),
            "label": pa.array(rng.integers(0, N_LABELS, size=n), pa.int32()),
        }
    )


def gen_embeddings_skew(n: int, seed: int = 48, n_components: int = 32) -> pa.Table:
    """Embedding-SKEW twin: a clustered mixture with Zipf(s=1.1)
    component occupancy — the geometry the isotropic twin cannot
    exhibit and the actual 100-TB ANN failure mode (hot inverted
    lists -> straggler partitions; FAISS's imbalance_factor measures
    exactly this). The hottest of the 32 components holds ~26% of the
    vectors vs the uniform 3.1%.

    Marginals stay matched to the isotropic twin: vectors are
    unit-normalized 64-dim, so per-component RMS is 1/8 by
    construction; the ONLY variable between the twins is cluster
    structure + occupancy skew. Each vector is
    normalize(0.8 * center_c + 0.6 * g), g ~ N(0, I/sqrt(dim)):
    within-component cosine ~0.64, across ~0 — distinct but
    overlapping clusters, like real encoder output. Labels stay
    Uniform{0..9} (label-based queries see the same distribution)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_components, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    p = 1.0 / np.power(np.arange(1, n_components + 1), 1.1)
    comp = rng.choice(n_components, size=n, p=p / p.sum())
    g = rng.standard_normal((n, DIM)) / np.sqrt(DIM)
    m = 0.8 * centers[comp] + 0.6 * g
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in m], pa.list_(pa.float32())
            ),
            "label": pa.array(rng.integers(0, N_LABELS, size=n), pa.int32()),
        }
    )


BASE_PARTS = 20000


def gen_part(n: int, seed: int = 44) -> pa.Table:
    """Part twin for the entity-resolution scale target. Names are
    sampled from the REAL sf0.1 empirical name distribution, so the
    distinct-name domain (what fuzzy_name_match_pairs actually blocks
    and joins over after its groupBy) saturates at the measured
    vocabulary as rows grow — the behavior a fixed catalog has at 10x
    order volume. Other columns are shape-filler; the scale targets
    read only p_name."""
    import duckdb

    rng = np.random.default_rng(seed)
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT p_name, COUNT(*) AS c
        FROM read_parquet('/root/testdata/sf0.1/part.parquet')
        GROUP BY p_name ORDER BY p_name
        """
    ).fetchall()
    con.close()
    names = [r[0] for r in rows]
    w = np.array([r[1] for r in rows], dtype=np.float64)
    picks = rng.choice(len(names), size=n, p=w / w.sum())
    return pa.table(
        {
            "p_partkey": pa.array(range(1, n + 1), pa.int64()),
            "p_name": pa.array([names[i] for i in picks], pa.string()),
            "p_brand": pa.array([f"Brand#{i % 5 + 1}" for i in range(n)], pa.string()),
            "p_type": pa.array([f"type{i % 7}" for i in range(n)], pa.string()),
            "p_size": pa.array(rng.integers(1, 51, size=n), pa.int32()),
            "p_retailprice": pa.array(
                np.round(rng.uniform(900.0, 2100.0, size=n), 2), pa.float64()
            ),
        }
    )


BASE_ORDERS = 150000


def gen_orders(n: int, seed: int = 45) -> pa.Table:
    """Orders twin for the maintenance-job scale target
    (compaction_roundtrip): dense keys, measured status/priority
    weights, uniform price over the measured range, dates uniform
    over the real table's 1995-2001 span. The compaction path reads
    only (o_orderkey, o_custkey, o_totalprice, o_orderdate); the
    other columns keep load_table's schema expectations happy."""
    import duckdb

    rng = np.random.default_rng(seed)
    con = duckdb.connect()
    sw = con.execute(
        """
        SELECT o_orderstatus, COUNT(*) FROM
        read_parquet('/root/testdata/sf0.1/orders.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    pw = con.execute(
        """
        SELECT o_orderpriority, COUNT(*) FROM
        read_parquet('/root/testdata/sf0.1/orders.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    con.close()
    statuses = [r[0] for r in sw]
    s_w = np.array([r[1] for r in sw], dtype=np.float64)
    priorities = [r[0] for r in pw]
    p_w = np.array([r[1] for r in pw], dtype=np.float64)
    s_pick = rng.choice(len(statuses), size=n, p=s_w / s_w.sum())
    p_pick = rng.choice(len(priorities), size=n, p=p_w / p_w.sum())
    span_us = (2001 - 1995 + 1) * 365 * 86_400_000_000
    t0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    dates = t0 + rng.integers(0, span_us, size=n)
    return pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, max(1, n // 10), size=n), pa.int64()),
            "o_orderstatus": pa.array([statuses[i] for i in s_pick], pa.string()),
            "o_totalprice": pa.array(
                np.round(rng.uniform(900.0, 450000.0, size=n), 2), pa.float64()
            ),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array([priorities[i] for i in p_pick], pa.string()),
        }
    )


BASE_EVENTS = 100000


def gen_events(n: int, seed: int = 46) -> pa.Table:
    """Events twin for the window-family scale targets (OHLC,
    sessionization): measured type mix (uniform over 5), users scale
    with rows (n/66 like the real 1,500 per 100k), timestamps uniform
    over the real table's 30-day span, values U(0, 560) 2dp."""
    rng = np.random.default_rng(seed)
    types = ["click", "error", "purchase", "signup", "view"]
    t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    span_us = 30 * 86_400_000_000
    n_users = max(1, n * 1500 // BASE_EVENTS)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(t0 + rng.integers(0, span_us, size=n), pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
            "event_type": pa.array(
                [types[i] for i in rng.integers(0, len(types), size=n)], pa.string()
            ),
            "value": pa.array(
                np.round(rng.uniform(0.0, 560.0, size=n), 2), pa.float64()
            ),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)],
                pa.string(),
            ),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, required=True, help="multiple of sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--tables",
        nargs="*",
        default=["documents", "embeddings", "part", "orders", "events"],
        help="subset of tables to (re)write into --out",
    )
    ap.add_argument(
        "--zipf",
        action="store_true",
        help="documents get the Heaps+Zipf content-rarity twin instead "
        "of the 31-token distribution-matched one",
    )
    ap.add_argument(
        "--embed-skew",
        action="store_true",
        help="embeddings get the clustered-mixture Zipf-occupancy twin "
        "instead of the isotropic one",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    wrote = []
    if "documents" in args.tables:
        n = int(BASE_DOCS * args.mult)
        gen = gen_documents_zipf if args.zipf else gen_documents
        pq.write_table(gen(n), os.path.join(args.out, "documents.parquet"))
        wrote.append(f"{n} docs" + (" (zipf)" if args.zipf else ""))
    if "embeddings" in args.tables:
        n = int(BASE_VECS * args.mult)
        egen = gen_embeddings_skew if args.embed_skew else gen_embeddings
        pq.write_table(egen(n), os.path.join(args.out, "embeddings.parquet"))
        wrote.append(f"{n} vecs" + (" (skew)" if args.embed_skew else ""))
    if "part" in args.tables:
        n = int(BASE_PARTS * args.mult)
        pq.write_table(gen_part(n), os.path.join(args.out, "part.parquet"))
        wrote.append(f"{n} parts")
    if "orders" in args.tables:
        n = int(BASE_ORDERS * args.mult)
        pq.write_table(gen_orders(n), os.path.join(args.out, "orders.parquet"))
        wrote.append(f"{n} orders")
    if "events" in args.tables:
        n = int(BASE_EVENTS * args.mult)
        pq.write_table(gen_events(n), os.path.join(args.out, "events.parquet"))
        wrote.append(f"{n} events")
    print(f"wrote {' / '.join(wrote)} to {args.out}")


if __name__ == "__main__":
    main()
