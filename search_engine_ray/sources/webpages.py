"""Synthetic Common-Crawl-style webpages corpus (the input_hint table).

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Two generators, both fully deterministic (seeded per-row by row index, so
output is identical at any parallelism / partitioning):

* ``webpages_from_documents`` — wraps the driver's ``documents.parquet``
  texts in deterministic html (functions/textproc.synthesize_html) so the
  extraction invariant is verifiable; doc_id i → url sorting key preserves
  doc_id order (zero-padded), letting oracle SQL reproduce our doc_ids with
  ROW_NUMBER() OVER (ORDER BY doc_id).

* ``generate_webpages`` — standalone Zipfian corpus for benches (FIXTURES.md
  §5): ~vocab_size terms, Zipf exponent ~1.1, avg ~tokens_per_doc tokens,
  built with ``ray.data.range`` + map_batches (streams; never materializes
  the corpus on the driver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from search_engine_ray.functions.textproc import synthesize_html

EPOCH_US = 1_500_000_000_000_000  # deterministic base timestamp (2017-07-14)


def _url_for(i: int, n_digits: int = 9) -> str:
    return f"https://example-{i:0{n_digits}d}.test/page"


def webpages_from_documents(sf_dir: str,
                            file_path: str | None = None) -> "ray.data.Dataset":
    """documents.parquet → webpages table (html synthesized from text).
    ``file_path`` points at a specific documents-style parquet instead of
    ``{sf_dir}/documents.parquet`` (CLI single-file convenience)."""
    path = file_path or f"{sf_dir}/documents.parquet"
    import pyarrow.parquet as _pq

    names = set(_pq.read_schema(path).names)
    cols = [c for c in ("doc_id", "text", "lang") if c in names]
    ds = ray.data.read_parquet(path, columns=cols)
    if "lang" not in names:
        ds = ds.map_batches(
            lambda b: b.append_column(
                "lang", pa.array(["und"] * b.num_rows, pa.string())),
            batch_format="pyarrow")

    def to_webpages(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        urls = [_url_for(int(i)) for i in doc_ids]
        htmls = [synthesize_html(t or "").encode("utf-8") for t in texts]
        ts = pa.array((EPOCH_US + doc_ids * 1_000_000_000).astype("int64"), pa.timestamp("us"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": ts,
                "html": pa.array(htmls, pa.binary()),
                "text": batch["text"],
                "lang": batch["lang"],
            }
        )

    return ds.map_batches(to_webpages, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# standalone Zipfian bench corpus
# ---------------------------------------------------------------------------

_CONSONANTS = "bcdfghjklmnpqrstvwz"
_VOWELS = "aeiou"


def make_vocab(size: int) -> list[str]:
    """Deterministic pronounceable vocabulary, unique, no punctuation."""
    out = []
    i = 0
    while len(out) < size:
        s = []
        n = i
        for _ in range(3):
            s.append(_CONSONANTS[n % len(_CONSONANTS)])
            n //= len(_CONSONANTS)
            s.append(_VOWELS[n % len(_VOWELS)])
            n //= len(_VOWELS)
        out.append("".join(s) + (str(i // 1000) if i >= len(_CONSONANTS) * 5 else ""))
        i += 1
    return out[:size]


class _GenDocs:
    """Stateful generator actor: vocab + Zipf CDF built once per actor."""

    def __init__(self, vocab_size: int, tokens_per_doc: int, zipf_s: float, seed: int):
        self.vocab = np.asarray(make_vocab(vocab_size), dtype=object)
        ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
        weights = ranks ** (-zipf_s)
        self.cdf = np.cumsum(weights / weights.sum())
        self.tokens_per_doc = tokens_per_doc
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = []
        for i in ids:
            rng = np.random.default_rng(self.seed * 1_000_003 + int(i))  # per-row seed
            n = int(rng.integers(self.tokens_per_doc // 2, self.tokens_per_doc * 3 // 2 + 1))
            draws = np.searchsorted(self.cdf, rng.random(n))
            words = self.vocab[draws]
            # a few multi-paragraph docs to exercise the \n\n path
            if n > 20 and i % 7 == 0:
                texts.append(" ".join(words[: n // 2]) + "\n\n" + " ".join(words[n // 2 :]))
            else:
                texts.append(" ".join(words))
        urls = [_url_for(int(i)) for i in ids]
        htmls = [synthesize_html(t).encode("utf-8") for t in texts]
        langs = ["en" if i % 10 < 8 else ("de" if i % 10 == 8 else "fr") for i in ids]
        ts = pa.array(EPOCH_US + ids * 1_000_000_000, pa.timestamp("us"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": ts,
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )


def generate_webpages(
    num_docs: int,
    vocab_size: int = 50_000,
    tokens_per_doc: int = 200,
    zipf_s: float = 1.1,
    seed: int = 42,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    if override_num_blocks is None:
        # ~2k-doc blocks: parallel enough for 32 CPUs without a tiny-block
        # storm (downstream sorts pay per-block overhead per wave)
        override_num_blocks = max(8, num_docs // 2_000)
    ds = ray.data.range(num_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        _GenDocs,
        fn_constructor_args=(vocab_size, tokens_per_doc, zipf_s, seed),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 16),
    )
