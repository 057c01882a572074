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


def test_embedding_skew_twin_statistics():
    """The clustered Zipf-occupancy embedding twin (VERDICT r12 ask
    #3): deterministic, unit-norm with the isotropic twin's 1/8
    per-component RMS, and with real occupancy skew — the hottest
    mixture component holds several times the uniform share, the
    geometry hot IVF inverted lists come from."""
    import numpy as np

    from gen_scale_data import gen_embeddings, gen_embeddings_skew

    a = gen_embeddings_skew(1500)
    b = gen_embeddings_skew(1500)
    assert a.equals(b)
    assert a.column_names == ["vec_id", "embedding", "label"]

    m = np.array(a.column("embedding").to_pylist())
    assert m.shape == (1500, 64)
    np.testing.assert_allclose(np.linalg.norm(m, axis=1), 1.0, atol=1e-5)
    # marginal matched to the isotropic twin (unit norm -> RMS 1/8)
    iso = np.array(gen_embeddings(1500).column("embedding").to_pylist())
    assert abs(m.std() - iso.std()) < 0.01

    # occupancy skew: nearest-true-center assignment recovers a hot
    # component far above the uniform 1/32 share (Zipf s=1.1 -> ~26%)
    rng = np.random.default_rng(48)
    centers = rng.standard_normal((32, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    comp = (m @ centers.T).argmax(axis=1)
    top_share = np.bincount(comp, minlength=32).max() / len(comp)
    assert top_share > 0.15, top_share
    # while the isotropic twin has no such component structure
    iso_comp = (iso @ centers.T).argmax(axis=1)
    iso_share = np.bincount(iso_comp, minlength=32).max() / len(iso_comp)
    assert iso_share < 0.12, iso_share
