"""Independent plain-Python references for the newest operators,
cross-checked on randomized corpora (seeded — each case is one Spark
job, so randomness comes from seeds rather than per-example
hypothesis runs). These are deliberately naive reimplementations from
the operator CONTRACTS, not the code, so a shared bug in the Spark
plan and its DuckDB oracle would still be caught here.
"""

from __future__ import annotations

import hashlib
import random

from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators import (
    dedup,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _md5_64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _random_docs(seed: int, n: int = 20):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        if i > 2 and rng.random() < 0.3:
            base = docs[rng.randrange(len(docs))][1].split()
            if base:
                base[rng.randrange(len(base))] = rng.choice(VOCAB)
            docs.append((i, " ".join(base)))
        else:
            docs.append(
                (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 30))))
            )
    return docs


def _py_cdc(text: str, w: int = 8, gate: int = 64) -> list[str]:
    t = text.strip()
    if not t:
        return []
    ends = [
        e
        for e in range(w, len(t) + 1)
        if _md5_64(t[e - w : e]) % gate == 0 and e < len(t)
    ]
    starts = [1] + [e + 1 for e in ends]
    starts = sorted(set(starts))
    chunks = []
    for i, s in enumerate(starts):
        nxt = starts[i + 1] if i + 1 < len(starts) else len(t) + 1
        chunks.append(t[s - 1 : nxt - 1])
    return chunks


def _py_shingles(text: str, k: int = 3) -> list[str]:
    toks = text.strip().split()
    if not toks:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _py_weighted_jaccard(a: str, b: str, k: int = 3) -> float:
    from collections import Counter

    ca, cb = Counter(_py_shingles(a, k)), Counter(_py_shingles(b, k))
    inter = sum(min(ca[s], cb[s]) for s in ca.keys() & cb.keys())
    union = sum(ca.values()) + sum(cb.values()) - inter
    return round(inter / union, 6) if union else 0.0


def test_cdc_chunks_match_python_reference(spark):
    for seed in (0, 1, 2):
        docs = [(i, t) for i, t in _random_docs(seed) if t.strip()]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got: dict[int, list[str]] = {}
        for r in dedup.cdc_chunks(df).collect():
            got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
        got = {k: [c for _, c in sorted(v)] for k, v in got.items()}
        want = {i: _py_cdc(t) for i, t in docs}
        assert got == want, f"seed {seed}"


def test_weighted_jaccard_matches_python_reference(spark):
    for seed in (0, 1, 2):
        docs = [(i, t) for i, t in _random_docs(seed) if t.strip()]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = dedup.weighted_jaccard_pairs(
            df, k=3, min_jaccard=0.0, max_shingle_df=None, hash_family=None
        ).collect()
        got = {(r.id_a, r.id_b): r.w_jaccard for r in rows}
        texts = dict(docs)
        for (a, b), wj in got.items():
            assert wj == _py_weighted_jaccard(texts[a], texts[b]), (seed, a, b)
        # completeness: every pair sharing a shingle appears
        ids = sorted(texts)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                expect = _py_weighted_jaccard(texts[a], texts[b])
                if expect > 0:
                    assert (a, b) in got, (seed, a, b)


def test_priority_sample_matches_python_reference(spark):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.operators.sampling import (
        priority_sample,
    )

    rng = random.Random(9)
    rows = [(i, rng.randint(1, 50)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, w int")
    got = sorted(
        r.id for r in priority_sample(df, weight_col="w", key_col="id", n=60).collect()
    )
    pri = {
        i: (w * 4294967296.0) / float(2 * _md5_64(f"0:{i}") + 1) for i, w in rows
    }
    want = sorted(
        i for i, _ in sorted(rows, key=lambda t: (-pri[t[0]], t[0]))[:60]
    )
    assert got == want
