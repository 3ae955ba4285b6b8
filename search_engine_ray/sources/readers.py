"""bz2 + concatenated-JSON article reader — the reference's ingest path
(/root/reference/src/indexer/indexer.rs:88-144,178-186: recursive dir walk,
BzDecoder, serde_json streaming iterator over WikiArticle {url, text:
[[String]], id, title}) re-expressed Ray-Data-first: one read task per .bz2
file (``ray.data.read_binary_files`` does the dir walk), decompress + parse
inside ``map_batches``, emit input_hint-schema webpages rows.

Paragraph joining matches the reference byte-for-byte
(indexer.rs:59-70): sentences of a paragraph concatenate with "", paragraphs
join with "\\n\\n"; tag stripping stays in the extract stage downstream,
exactly like the reference applies extract_plaintext after reading.

Malformed JSON values are skipped per the reference's ``Err(_) =>
continue`` arm (indexer.rs:128-133 match), not fatal.
"""

from __future__ import annotations

import bz2
import json

import pyarrow as pa
import ray.data

from search_engine_ray.sources.webpages import EPOCH_US


def parse_article_stream(data: bytes) -> list[dict]:
    """Concatenated/whitespace-separated JSON values → article dicts
    (the serde ``Deserializer::into_iter`` equivalent; also accepts plain
    JSONL). Malformed values are skipped, like the reference."""
    text = data.decode("utf-8", errors="replace")
    dec = json.JSONDecoder()
    out = []
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i].isspace():
            i += 1
        if i >= n:
            break
        try:
            obj, end = dec.raw_decode(text, i)
            out.append(obj)
            i = end
        except ValueError:
            # skip to the next plausible value start (reference: Err => continue)
            nxt = text.find("{", i + 1)
            if nxt < 0:
                break
            i = nxt
    return out


def article_body(article: dict) -> str:
    """WikiArticle.text ([[sentence]]) → one string, reference joining
    semantics (indexer.rs:59-66). A plain-string ``text`` (C4/JSONL-style
    ``{url, text}`` docs) passes through unchanged."""
    paragraphs = article.get("text") or []
    if isinstance(paragraphs, str):
        return paragraphs
    return "\n\n".join("".join(p) for p in paragraphs)


def read_wiki_bz2(path: str) -> "ray.data.Dataset":
    """Recursive .bz2 discovery + streaming parse → webpages Dataset
    (url, warc_ts, html, text, lang) ready for pipelines/build.py.
    ``html`` carries the raw joined article body (may contain markup);
    extraction happens in the extract stage like the reference."""
    files = ray.data.read_binary_files(path, file_extensions=["bz2"])
    return files.map_batches(_expand_articles, batch_format="pyarrow")


def read_wiki_jsonl(path: str) -> "ray.data.Dataset":
    """Uncompressed .jsonl / .json article reader — the same article
    semantics and malformed-skip as :func:`read_wiki_bz2` over the plain
    files public corpora commonly ship (one read task per file; both
    ``{url, text: [[sentence]]}`` wiki articles and C4-style
    ``{url, text: str}`` docs parse)."""
    files = ray.data.read_binary_files(path, file_extensions=["jsonl", "json"])
    return files.map_batches(_expand_articles, batch_format="pyarrow")


def _expand_articles(batch: pa.Table) -> pa.Table:
    """bytes column → webpages rows (shared by the bz2 and jsonl readers):
    decompress when the payload is a bz2 stream, stream-parse articles,
    derive deterministic urls/timestamps (see read_wiki_bz2)."""
    urls, ts, htmls, texts, langs = [], [], [], [], []
    for payload in batch["bytes"].to_pylist():
        if payload[:3] == b"BZh":
            try:
                raw = bz2.decompress(payload)
            except OSError:
                continue  # corrupt bz2 stream — skip file
        else:
            # Arrow's filesystem layer auto-decompresses by extension;
            # bytes may already be plain JSON
            raw = payload
        for art in parse_article_stream(raw):
            from search_engine_ray.functions.hashing import poly_hash_str

            body = article_body(art)
            url = art.get("url")
            if not url:
                # `is not None`, not truthiness: id 0 is a legitimate id.
                # Last resort derives from CONTENT, not a per-file
                # enumeration index — same body ⇒ same url across files,
                # distinct bodies never collide on "article-<i>" (the
                # build's url-uniqueness determinism precondition).
                aid = art.get("id")
                url = str(aid) if aid is not None else f"article-{poly_hash_str(body):016x}"
            url = str(url)

            urls.append(url)
            # deterministic pseudo-timestamp (hash() is seed-dependent)
            ts.append(EPOCH_US + (poly_hash_str(url) % 1_000_000) * 1_000_000)
            htmls.append(body.encode("utf-8"))
            texts.append("")
            langs.append("und")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )

