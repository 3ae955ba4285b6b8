"""Tokenize stage: actor pool emitting postings rows.

The reference tokenizes on the reader thread and streams one ``Term`` record
per (document, distinct word) over an mpsc channel to the SPIMI consumer
(/root/reference/src/indexer/indexer.rs:105-144,195-204). Here the same unit
of work is a row of the postings Dataset:

    (term: string, doc_id: int64, positions: list<int32>, tf: int32,
     doc_length: int32)

produced by ``map_batches(TokenizeStage, concurrency=N)`` — the lemma table
loads once per actor in ``__init__`` (reference: SearchTokenizer built once,
tokenizer.rs:109-121). Zero-token docs emit one sentinel row with term=""
(cleaned-empty raw tokens never yield "" terms, so the sentinel is
unambiguous); it carries doc_length=0 so doc metadata can be derived from
postings without re-reading the corpus, and is filtered before the merge.

The batch kernel is vectorized everywhere except the raw split (Python
``str.split`` — C-speed, and the only way to get Rust ``split_whitespace``'s
Unicode semantics) and per-UNIQUE-token normalization, which is memoized
across batches in the actor (Zipfian text → tiny unique set per batch).
Tested against the pure-Python spec in functions/tokenizer.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.tokenizer import Tokenizer

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("pos_enc", pa.binary()),
        ("tf", pa.int32()),
        ("doc_length", pa.int32()),
    ]
)


class TokenizeStage:
    """Callable-class stage: one lemma table + normalization cache per actor."""

    def __init__(self, config: EngineConfig | None = None):
        config = config or EngineConfig()
        self.tokenizer = Tokenizer(lemma_path=config.lemma_path)
        self.bigrams = config.index_bigrams

    def __call__(self, batch: pa.Table) -> pa.Table:
        return tokenize_batch(batch, self.tokenizer, bigrams=self.bigrams)


#: process-global tokenizer per (lemma_path): lets plain *task*-based
#: map_batches reuse the lemma table + normalize cache across tasks on the
#: same worker, with none of an actor pool's startup latency or fixed size —
#: tasks stay fully elastic across CPU budgets (scaling criterion).
_WORKER_TOKENIZERS: dict = {}


def get_worker_tokenizer(lemma_path: str | None = None) -> Tokenizer:
    tok = _WORKER_TOKENIZERS.get(lemma_path)
    if tok is None:
        tok = Tokenizer(lemma_path=lemma_path)
        _WORKER_TOKENIZERS[lemma_path] = tok
    return tok


def tokenized_stream(
    batch: pa.Table,
    tokenizer: Tokenizer,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The flat EMITTED token stream of a batch, pre-grouping: returns
    ``(doc_idx, term_code, pos, norm_terms, doc_ids)`` where rows are in
    original order (ascending position per doc), ``term_code`` indexes
    ``norm_terms`` (factorized normalized forms), and dropped tokens
    (normalize → '') are already removed. Shared by :func:`tokenize_batch`
    and stream-shaped consumers (windowed co-occurrence)."""
    import pyarrow.compute as pc

    batch = batch.combine_chunks()
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(doc_ids)

    toks = pc.utf8_split_whitespace(texts)
    counts_raw = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    # WORKAROUND for a nondeterministic pyarrow kernel bug (observed on
    # 17.x-era kernels, reproduced via hypothesis): utf8_split_whitespace
    # sometimes glues a trailing whitespace char onto the final token
    # (e.g. '9\x8a\x1d' instead of '9\x8a' + '') depending on prior kernel
    # calls. Trimming is a no-op on correct tokens and canonicalizes the
    # buggy variant; the kept-token positions are unaffected either way
    # (the phantom difference is only a trailing EMPTY token).
    flat = pc.utf8_trim_whitespace(flat)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    total = len(flat)

    if total == 0:
        empty = np.array([], np.int64)
        return empty, empty, empty, np.zeros(0, dtype=object), doc_ids

    doc_idx = np.repeat(np.arange(n_docs), counts_raw)
    keep_raw = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)

    # positions = rank among NON-EMPTY raw tokens within the doc
    cum = np.cumsum(keep_raw, dtype=np.int64)
    exc = np.empty(total, np.int64)
    exc[0] = 0
    exc[1:] = cum[:-1]
    doc_starts = np.zeros(n_docs + 1, np.int64)
    np.cumsum(counts_raw, out=doc_starts[1:])
    base = np.zeros(n_docs, np.int64)
    np.take(np.append(exc, cum[-1]), doc_starts[:-1], out=base)
    pos = exc - base[doc_idx]

    # dictionary-encode raw tokens → normalize each UNIQUE once (memoized)
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False)
    norm_unique = [tokenizer.normalize(u) for u in denc.dictionary.to_pylist()]
    # factorize normalized forms so groupings use int codes, '' = dropped
    norm_codes_u, norm_terms = pd.factorize(np.asarray(norm_unique, dtype=object), use_na_sentinel=False)
    tok_norm_code = norm_codes_u[codes]
    keep = keep_raw & (np.asarray(norm_terms, dtype=object)[tok_norm_code] != "")
    return doc_idx[keep], tok_norm_code[keep], pos[keep], norm_terms, doc_ids


def tokenize_batch(
    batch: pa.Table,
    tokenizer: Tokenizer,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = False,
) -> pa.Table:
    """Fully Arrow-vectorized tokenization: the raw split, token→unique
    coding and position arithmetic never materialize Python objects — only
    the (small, memoized) per-UNIQUE-token normalization runs in Python.
    Semantics match Rust ``split_whitespace`` / Python ``str.split``:
    Arrow's ``utf8_split_whitespace`` emits empty tokens at string edges, so
    empties are masked out and positions are the rank among non-empty raw
    tokens (bit-identical to the spec in functions/tokenizer.py —
    pytest-enforced)."""
    d_k, c_k, p_k, norm_terms, doc_ids = tokenized_stream(
        batch, tokenizer, text_col=text_col, id_col=id_col)
    n_docs = len(doc_ids)

    uni = _emit(tokenizer, d_k, c_k, p_k,
                norm_terms, np.zeros(n_docs, np.int64), doc_ids)
    if not bigrams:
        return uni

    # bigram rows (index-side mirror of tokenize_query, tokenizer.rs:150-160):
    # consecutive EMITTED tokens of one doc pair up as "{prev} {cur}" at
    # position cur.position - 1. Composite int codes keep the grouping
    # vectorized; only the (small) unique set materializes strings.
    d, c, p = d_k, c_k, p_k
    if len(d) >= 2:
        adj = d[1:] == d[:-1]
        bd = d[1:][adj]
        n_u = np.int64(len(norm_terms) + 1)
        bc = c[:-1][adj] * n_u + c[1:][adj]
        bp = p[1:][adj] - 1
        ucomp, binv = np.unique(bc, return_inverse=True)
        nt = np.asarray(norm_terms, dtype=object)
        bigram_terms = np.array(
            [f"{nt[int(x // n_u)]} {nt[int(x % n_u)]}" for x in ucomp], dtype=object
        )
    else:
        bd = np.zeros(0, np.int64)
        binv = np.zeros(0, np.int64)
        bp = np.zeros(0, np.int64)
        bigram_terms = np.zeros(0, dtype=object)
    bi = _emit(tokenizer, bd, binv, bp, bigram_terms,
               np.zeros(n_docs, np.int64), doc_ids, sentinels=False)
    return pa.concat_tables([uni, bi])


def _emit(tokenizer, doc_idx, term_code, positions, norm_terms, counts, doc_ids,
          sentinels: bool = True):
    """Group kept tokens by (doc, term) → postings rows (+ zero-doc sentinels)."""
    n = len(doc_idx)
    if n:
        # one stable argsort on a fused (doc, term) int64 key — positions
        # arrive ascending per doc, so stability keeps them ordered (cheaper
        # than a 3-key lexsort by ~2x)
        n_u = np.int64(len(norm_terms) + 1)
        order = np.argsort(doc_idx * n_u + term_code, kind="stable")
        doc_idx = doc_idx[order]
        term_code = term_code[order]
        positions = positions[order]
        # run starts where (doc, term) changes
        change = np.empty(n, bool)
        change[0] = True
        np.logical_or(doc_idx[1:] != doc_idx[:-1], term_code[1:] != term_code[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        run_doc = doc_idx[starts]
        run_term = term_code[starts]
        run_len = np.diff(np.append(starts, n))
        doc_lengths_all = np.bincount(doc_idx, minlength=len(counts))
    else:
        starts = np.array([], np.int64)
        run_doc = np.array([], np.int64)
        run_term = np.array([], np.int64)
        run_len = np.array([], np.int64)
        doc_lengths_all = np.zeros(len(counts), np.int64)

    if len(run_term):
        # vectorized: take per-run term strings from the (small) unique set
        norm_arr = pa.array(np.asarray(norm_terms, dtype=object), type=pa.string())
        terms_arr = norm_arr.take(pa.array(run_term, type=pa.int64()))
    else:
        terms_arr = pa.array([], type=pa.string())

    # positions, delta-gap + VB encoded per posting right here (the postings
    # runs ARE VB-compressed, like the reference's spill files spimi.rs:148-179;
    # it also shrinks the merge shuffle ~4x vs list<int32>)
    from search_engine_ray.functions.vb import binary_from_spans, vb_encode_array

    m = len(positions)
    if m:
        gaps = np.empty(m, np.int64)
        gaps[0] = positions[0]
        np.subtract(positions[1:], positions[:-1], out=gaps[1:])
        gaps[starts] = positions[starts]  # absolute at each posting start
        enc, bytelens = vb_encode_array(gaps)
        bounds = np.zeros(m + 1, np.int64)
        np.cumsum(bytelens, out=bounds[1:])
        spans = bounds[np.append(starts, m)]
    else:
        enc = np.zeros(0, np.uint8)
        spans = np.zeros(len(starts) + 1, np.int64)
    pos_enc = binary_from_spans(enc, spans)

    # sentinel rows for zero-token docs
    empty_docs = np.flatnonzero(doc_lengths_all == 0) if sentinels else np.zeros(0, np.int64)
    if len(empty_docs):
        terms_arr = pa.concat_arrays([terms_arr, pa.array([""] * len(empty_docs), pa.string())])
        run_doc = np.concatenate([run_doc, empty_docs])
        run_len = np.concatenate([run_len, np.zeros(len(empty_docs), np.int64)])
        pos_enc = pa.concat_arrays([pos_enc, pa.array([b""] * len(empty_docs), pa.binary())])

    return pa.table(
        {
            "term": terms_arr,
            "doc_id": pa.array(doc_ids[run_doc], type=pa.int64()),
            "pos_enc": pos_enc,
            "tf": pa.array(run_len, type=pa.int32()),
            "doc_length": pa.array(doc_lengths_all[run_doc], type=pa.int32()),
        }
    )


def tokenize_stage(ds, config: EngineConfig | None = None):
    """docs Dataset (doc_id, text, ...) → postings Dataset (see module doc)."""
    config = config or EngineConfig()
    kwargs = dict(batch_format="pyarrow", batch_size=config.tokenize_batch_size)
    if config.tokenize_concurrency:
        # explicit actor pool when requested
        return ds.map_batches(TokenizeStage, fn_constructor_args=(config,),
                              concurrency=config.tokenize_concurrency, **kwargs)
    # default: plain tasks + process-global tokenizer — elastic across any
    # CPU budget, no pool startup, cache still amortized per worker process
    lemma_path = config.lemma_path
    bigrams = config.index_bigrams

    def fn(batch: pa.Table) -> pa.Table:
        return tokenize_batch(batch, get_worker_tokenizer(lemma_path), bigrams=bigrams)

    return ds.map_batches(fn, **kwargs)
