"""Rank fusion: combine retrieval runs from different scorers.

Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009): given
rankings R_1..R_m over doc ids, score(d) = Σ_i 1/(K + rank_i(d)), summing
only over rankings that contain d. RRF is the standard way to fuse a
lexical run (BM25) with a dense/embedding run without score calibration —
ranks are comparable, raw scores are not. The reference engine has a single
scorer (tf·idf, scoring/mod.rs); fusion is the hybrid-retrieval extension a
modern serving stack layers on top.

K dampens the head of each ranking; 60 is the paper's (and the de-facto
industry) default. Everything here is driver-side over top-k pools — the
expensive parts (the runs themselves) are produced by the engine / a
Dataset ANN pass; fusion touches O(pool) ids.
"""

from __future__ import annotations


def rrf_fuse(
    rankings: list[list[int]], k: int = 10, K: int = 60
) -> list[tuple[int, float]]:
    """Fuse rankings (each a list of ids, best first) into the top-k by
    (RRF score desc, id asc) — the engine-wide tie contract."""
    scores: dict[int, float] = {}
    for ranking in rankings:
        for r, d in enumerate(ranking, start=1):
            scores[d] = scores.get(d, 0.0) + 1.0 / (K + r)
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(int(d), float(s)) for d, s in out[:k]]


def dense_rerank(candidate_ids, embeddings, query_vec, k: int = 10,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 round_digits: int = 6):
    """Second-stage DENSE rerank of a lexical candidate pool: keep only
    the pool's rows of a (vec_id, embedding) Dataset and order them by
    cosine similarity to ``query_vec`` — the standard retrieve-then-
    rerank serving shape (BM25 recall, embedding precision). The pool is
    O(top-k): it broadcasts once via ``ray.put`` and each embedding batch
    is filtered by one sorted membership probe, so the embedding table
    itself streams — nothing doc-cardinality materializes.

    Returns (rank, vec_id, cos_r) rows via
    :func:`~search_engine_ray.pipelines.training_data.ann_brute_force`'s
    (round(cos) desc, id asc) tie contract, rank 1 = best."""
    import numpy as np
    import pyarrow as pa
    import ray

    from search_engine_ray.pipelines.training_data import ann_brute_force

    pool = np.unique(np.asarray(list(candidate_ids), np.int64))
    pref = ray.put(pool)

    def member(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        p = ray.get(pref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(p, ids), max(len(p) - 1, 0))
        keep = (p[idx] == ids) if len(p) else np.zeros(len(ids), bool)
        return batch.filter(pa.array(keep))

    cand = embeddings.map_batches(member, batch_format="pyarrow")
    qm = np.asarray(query_vec, np.float64).reshape(1, -1)
    out = ann_brute_force(cand, qm, k=k, id_col=id_col, emb_col=emb_col,
                          round_digits=round_digits)
    return out.drop_columns(["query_id"])


def mmr_rerank(candidate_ids, embeddings, query_vec, k: int = 10,
               lam: float = 0.7, id_col: str = "vec_id",
               emb_col: str = "embedding"):
    """Maximal-marginal-relevance diversified rerank (Carbonell &
    Goldstein, SIGIR'98): greedily pick

        argmax_d  lam·cos(q, d) − (1−lam)·max_{s∈S} cos(d, s)

    over the remaining pool, S the already-selected set — relevance
    traded against redundancy, the classic answer to near-duplicate
    results crowding a top-k. The pool is O(top-k): its embedding rows
    stream out of the (vec_id, embedding) Dataset via a broadcast
    membership probe; the greedy loop then runs driver-side on a
    pool×dim matrix (bounded, not corpus-sized). Ties break by id asc;
    lam=1 degenerates to pure cosine order (pytest-pinned). Returns
    [(vec_id, mmr_score), ...] selection-ordered."""
    import numpy as np
    import pyarrow as pa
    import ray

    pool = np.unique(np.asarray(list(candidate_ids), np.int64))
    if len(pool) == 0 or k <= 0:
        return []
    pref = ray.put(pool)

    def member(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([id_col, emb_col])
        p = ray.get(pref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(p, ids), max(len(p) - 1, 0))
        keep = (p[idx] == ids) if len(p) else np.zeros(len(ids), bool)
        return batch.filter(pa.array(keep)).select([id_col, emb_col])

    rows = embeddings.map_batches(member, batch_format="pyarrow").take_all()
    if not rows:
        return []
    rows.sort(key=lambda r: r[id_col])
    ids = np.asarray([r[id_col] for r in rows], np.int64)
    m = np.asarray([np.asarray(r[emb_col], np.float64) for r in rows])
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    q = np.asarray(query_vec, np.float64)
    q /= max(np.linalg.norm(q), 1e-30)
    rel = m @ q                      # relevance
    sim = m @ m.T                    # pairwise redundancy
    picked: list[int] = []
    out: list[tuple[int, float]] = []
    alive = np.ones(len(ids), bool)
    for _ in range(min(k, len(ids))):
        red = sim[:, picked].max(axis=1) if picked else np.zeros(len(ids))
        score = lam * rel - (1.0 - lam) * red
        score[~alive] = -np.inf
        best = int(np.argmax(score))  # argmax takes the FIRST max: id asc
        picked.append(best)
        alive[best] = False
        out.append((int(ids[best]), float(score[best])))
    return out
