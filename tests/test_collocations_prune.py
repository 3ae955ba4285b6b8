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
