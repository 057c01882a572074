"""The scale-twin generators back BASELINE.md's scaling-exponent and
regime-boundary claims, so their statistical knobs are pinned here:
determinism, the saturated twin's fixed vocabulary, and the zipf
twin's growing (Heaps-law) vocabulary with rare tails."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from gen_scale_data import gen_documents, gen_documents_zipf  # noqa: E402


def _vocab_of(table) -> set[str]:
    toks: set[str] = set()
    for t in table.column("text").to_pylist():
        toks.update(t.split(" "))
    return toks


def test_zipf_twin_is_deterministic():
    a = gen_documents_zipf(1000)
    b = gen_documents_zipf(1000)
    assert a.equals(b)
    assert a.column_names == ["doc_id", "text", "lang", "source", "n_chars"]


def test_zipf_vocabulary_grows_and_has_rare_tail():
    small = _vocab_of(gen_documents_zipf(500))
    big = _vocab_of(gen_documents_zipf(2000))
    # Heaps' law: V = 50*sqrt(n) draws more types as n grows (the
    # realized vocab is smaller than the parameter — tail types with
    # tiny probability may never be drawn — but must clearly grow).
    assert len(big) > 1.5 * len(small)
    # rare tail: a solid fraction of types appear in <= 5 documents
    # (measured ~29% at n=2000; the share grows with n as Heaps
    # keeps minting tail types)
    t = gen_documents_zipf(2000)
    df: dict[str, int] = {}
    for txt in t.column("text").to_pylist():
        for tok in set(txt.split(" ")):
            df[tok] = df.get(tok, 0) + 1
    rare = sum(1 for v in df.values() if v <= 5)
    assert rare >= len(df) / 5


def test_uniform_twin_vocabulary_is_fixed():
    # the saturated twin draws from the real sf0.1 table's fixed
    # vocabulary regardless of n — that saturation IS its point
    v1 = _vocab_of(gen_documents(300))
    v2 = _vocab_of(gen_documents(1500))
    assert v2 <= v1 | v2 and len(v2) <= 40  # 31 tokens + slack


def test_both_twins_inject_near_copies():
    for gen in (gen_documents, gen_documents_zipf):
        t = gen(2000)
        texts = t.column("text").to_pylist()
        exact = len(texts) - len(set(texts))
        # ~5% near-copies, 1/3 of which get zero edits -> expect
        # dozens of exact dups at n=2000; be loose but nonzero
        assert exact > 5, gen.__name__
