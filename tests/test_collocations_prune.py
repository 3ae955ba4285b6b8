"""collocations (PMI) + prune_postings: scalar-spec equivalence on a tiny
deterministic corpus, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(parts=1):
    import ray.data

    texts = [
        "red apple red apple pie",
        "green apple pie crust",
        "red apple pie again and again",
        "crust and crumb",
        "red apple",
    ] * 4  # repeat so min_count has bite
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    return ray.data.from_arrow(tbl).repartition(parts), texts


def _spec_counts(texts):
    from collections import Counter

    uni, bi = Counter(), Counter()
    for t in texts:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    return uni, bi


@pytest.mark.parametrize("parts", [1, 6])
def test_collocations_matches_spec(ray_session, parts):
    import math

    from search_engine_ray.pipelines.training_data import collocations

    ds, texts = _docs(parts)
    out = collocations(ds, k=10, min_count=4).to_pandas()
    uni, bi = _spec_counts(texts)
    t_uni, t_bi = sum(uni.values()), sum(bi.values())
    exp = []
    for (w1, w2), c in bi.items():
        if c >= 4:
            pmi = round(math.log10((c * t_uni * t_uni) / (t_bi * uni[w1] * uni[w2])), 6)
            exp.append((f"{w1} {w2}", c, uni[w1], uni[w2], pmi))
    exp.sort(key=lambda r: (-r[4], r[0]))
    exp = exp[:10]
    got = list(out[["bigram", "n_pair", "n_w1", "n_w2", "pmi_r"]]
               .itertuples(index=False, name=None))
    assert [(b, int(np_), int(n1), int(n2), round(p, 6)) for b, np_, n1, n2, p in got] == exp


@pytest.mark.parametrize("parts", [1, 6])
def test_cooccurrence_matches_spec(ray_session, parts):
    from collections import Counter

    from search_engine_ray.pipelines.training_data import cooccurrence

    ds, texts = _docs(parts)
    W, MIN, K = 3, 3, 15
    out = cooccurrence(ds, window=W, k=K, min_count=MIN).to_pandas()
    pairs = Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks)):
            for j in range(i + 1, min(i + W + 1, len(toks))):
                a, b = sorted((toks[i], toks[j]))
                pairs[(a, b)] += 1
    exp = sorted(((w1, w2, c) for (w1, w2), c in pairs.items() if c >= MIN),
                 key=lambda r: (-r[2], r[0], r[1]))[:K]
    got = [(w1, w2, int(c)) for w1, w2, c in
           out[["w1", "w2", "n_pair"]].itertuples(index=False, name=None)]
    assert got == exp


def test_cooccurrence_skips_dropped_positions(ray_session):
    """A token normalizing to '' (pure punctuation) leaves a position GAP:
    its neighbours pair only if their position distance fits the window."""
    import ray.data

    from search_engine_ray.pipelines.training_data import cooccurrence

    # 'aaa . bbb' — '.' normalizes to '' but still holds position 1, so
    # aaa(0)–bbb(2) has gap 2: found at window=2, absent at window=1
    tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "text": pa.array(["aaa . bbb"], pa.string())})
    ds = ray.data.from_arrow(tbl)
    w2 = cooccurrence(ds, window=2, k=5, min_count=1).to_pandas()
    assert ("aaa", "bbb", 1) in list(w2.itertuples(index=False, name=None))
    w1 = cooccurrence(ds, window=1, k=5, min_count=1).to_pandas()
    assert len(w1) == 0


def _spec_remove_repeated(tokens, n=3):
    """Scalar spec: token t removed iff covered by ≥1 window and by NO
    first-occurrence window (first = smallest start of that gram value)."""
    L = len(tokens)
    first_seen = {}
    firsts = []
    for j in range(L - n + 1):
        g = tuple(tokens[j:j + n])
        if g not in first_seen:
            first_seen[g] = j
            firsts.append(j)
    covered = [False] * L
    protected = [False] * L
    for j in range(L - n + 1):
        for t in range(j, j + n):
            covered[t] = True
    for j in firsts:
        for t in range(j, j + n):
            protected[t] = True
    kept = [w for t, w in enumerate(tokens) if not (covered[t] and not protected[t])]
    return " ".join(kept), sum(1 for t in range(L) if covered[t] and not protected[t])


@pytest.mark.parametrize("parts", [1, 5])
def test_remove_repeated_ngrams_matches_spec(ray_session, parts):
    import ray.data

    from search_engine_ray.pipelines.training_data import remove_repeated_ngrams

    rng = np.random.default_rng(13)
    vocab = ["a", "b", "c", "d", "e"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
             for _ in range(120)]
    texts += ["x y z x y z x y z",           # pure repetition
              "p q",                          # shorter than n → untouched
              "", "one two three one two three four"]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    out = remove_repeated_ngrams(
        ray.data.from_arrow(tbl).repartition(parts), n=3
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        clean, nrem = _spec_remove_repeated(t.split(), 3)
        assert out.text_clean[i] == clean, (i, t)
        assert out.n_removed[i] == nrem, (i, t)
    # crafted cases pinned explicitly: in "x y z x y z x y z" the first
    # occurrences of xyz/yzx/zxy protect tokens 0-4; tokens 5-8 are covered
    # only by repeats and drop
    row = out[out.doc_id == len(texts) - 4].iloc[0]
    assert row.text_clean == "x y z x y" and row.n_removed == 4
    assert out[out.doc_id == len(texts) - 3].iloc[0].text_clean == "p q"
    # overlapping firsts protect everything: the repeat of (one two three)
    # sits inside windows that are themselves firsts → nothing removed
    assert out[out.doc_id == len(texts) - 1].iloc[0].n_removed == 0


@pytest.mark.parametrize("parts", [1, 6])
def test_prune_postings_top_n(ray_session, parts):
    from collections import Counter

    from search_engine_ray.pipelines.training_data import prune_postings

    ds, texts = _docs(parts)
    out = prune_postings(ds, keep_n=2).to_pandas()
    # spec: per (term, doc) tf, keep top-2 per term by (tf desc, doc asc)
    tf = Counter()
    for d, t in enumerate(texts):
        for w in t.split():
            tf[(w, d)] += 1
    exp = {}
    for (w, d), c in tf.items():
        exp.setdefault(w, []).append((-c, d))
    kept = set()
    for w, lst in exp.items():
        for negc, d in sorted(lst)[:2]:
            kept.add((w, d, -negc))
    got = set(zip(out.term, out.doc_id.astype(int), out.tf.astype(int)))
    assert got == kept
    assert (out.groupby("term").size() <= 2).all()
