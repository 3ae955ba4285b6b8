"""remove_global_ngrams (cross-document duplicate n-gram span removal):
scalar-spec equivalence on seeded corpora, broadcast path == sort-join scale
path, partition invariance, packed-key guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _run(texts, n=3, parts=3, cap=10**6):
    import ray.data

    from search_engine_ray.pipelines.training_data import remove_global_ngrams

    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(parts)
    out = remove_global_ngrams(ds, n=n, broadcast_cap=cap).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _spec(texts, n=3):
    """Brute-force scalar reference: global first occurrence of each gram
    (doc order, then start) protects its tokens; every covered-but-never-
    protected token is removed."""
    toks = [t.split() for t in texts]
    first = {}
    for d, tt in enumerate(toks):
        for j in range(len(tt) - n + 1):
            g = tuple(tt[j:j + n])
            if g not in first:
                first[g] = (d, j)
    rows = []
    for d, tt in enumerate(toks):
        covered = np.zeros(len(tt), bool)
        protected = np.zeros(len(tt), bool)
        for j in range(len(tt) - n + 1):
            g = tuple(tt[j:j + n])
            covered[j:j + n] = True
            if first[g] == (d, j):
                protected[j:j + n] = True
        keep = ~(covered & ~protected)
        rows.append({
            "doc_id": d,
            "text_clean": " ".join(np.array(tt, dtype=object)[keep]),
            "n_removed": int((~keep).sum()),
        })
    return pd.DataFrame(rows)


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "unique words only here today friends",
    "intro text the quick brown fox jumps over something else",
    "the quick brown fox jumps over the lazy dog",
    "totally different content with no overlap at all",
    "",
    "short one",
]


def test_semantics(ray_session):
    out = _run(CORPUS)
    # global first copy (doc 0) untouched; exact dup (doc 3) fully removed
    assert out.loc[0, "text_clean"] == CORPUS[0]
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[3, "text_clean"] == ""
    assert out.loc[3, "n_removed"] == 9
    # unique docs untouched (whitespace-normalized)
    assert out.loc[1, "text_clean"] == CORPUS[1]
    assert out.loc[4, "n_removed"] == 0
    # sub-n docs pass through
    assert out.loc[5, "text_clean"] == ""
    assert out.loc[6, "text_clean"] == "short one"


@pytest.mark.parametrize("n", [2, 3, 5])
def test_matches_scalar_spec(ray_session, n):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → heavy cross-doc dup
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
             for _ in range(60)]
    out = _run(texts, n=n, parts=4)
    spec = _spec(texts, n=n)
    pd.testing.assert_frame_equal(
        out.astype({"n_removed": np.int64}),
        spec.astype({"doc_id": np.int64, "n_removed": np.int64}))


def test_join_path_equals_broadcast_path(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(80)]
    a = _run(texts, parts=5, cap=10**6)   # broadcast winners
    b = _run(texts, parts=5, cap=0)       # sort-co-group scale path
    pd.testing.assert_frame_equal(a, b)


def test_partition_invariance(ray_session):
    a = _run(CORPUS, parts=1)
    b = _run(CORPUS, parts=7)
    pd.testing.assert_frame_equal(a, b)


def test_packed_key_guards():
    from search_engine_ray.pipelines.training_data import _gn_pack

    with pytest.raises(ValueError, match="doc ids"):
        _gn_pack(np.array([1 << 41]), np.array([0]))
    with pytest.raises(ValueError, match="2\\^22 tokens"):
        _gn_pack(np.array([1]), np.array([1 << 22]))
    k = _gn_pack(np.array([5], np.int64), np.array([9], np.int64))
    assert (k[0] >> 22, k[0] & ((1 << 22) - 1)) == (5, 9)
