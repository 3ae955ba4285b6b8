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



# ---------------------------------------------------------------------------
# WARC — the native Common-Crawl container (ISO 28500). Pure-Python parse:
# the warc libraries aren't in this container and aren't needed — records
# are length-framed headers + payload, and .warc.gz files are concatenated
# per-record gzip MEMBERS that zlib walks via unused_data.
# ---------------------------------------------------------------------------


def _gzip_members(data: bytes):
    """Yield each decompressed member of a concatenated-gzip stream (the
    Common-Crawl layout: one member per WARC record so ranges are
    seekable). A truncated/corrupt tail member is skipped, not fatal.

    The walk is LINEAR in file size: the buffer is wrapped in one
    memoryview and fed to each member's decompressobj in bounded chunks,
    so per-member cost is O(member) — handing ``data[pos:]`` to
    decompress() would copy the entire remaining buffer once per member
    (and ``unused_data`` would copy it back), an O(members × file_size)
    memcpy that turns a tens-of-thousands-member ~1 GB Common-Crawl
    .warc.gz from seconds into hours."""
    import zlib

    mv = memoryview(data)
    n = len(mv)
    chunk_size = 1 << 20
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=47)  # gzip header + window
        parts = []
        try:
            while not d.eof and pos < n:
                chunk = mv[pos:pos + chunk_size]
                parts.append(d.decompress(chunk))
                # before eof the whole chunk is consumed; at eof the
                # member's remainder within THIS chunk (≤ chunk_size)
                # lands in unused_data — never the rest of the file
                pos += len(chunk) - len(d.unused_data)
        except zlib.error:
            return
        if not d.eof:  # truncated final member
            return
        yield b"".join(parts)


def parse_warc_records(raw: bytes) -> list[dict]:
    """WARC records of one (decompressed) stream → dicts with lowercase
    header keys + ``payload`` bytes. Malformed framing skips the rest of
    the stream (records are length-framed; resync is not possible)."""
    out = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos:pos + 2] in (b"\r\n", b"\n"):
            pos += 2 if raw[pos:pos + 2] == b"\r\n" else 1
        if pos >= n:
            break
        if not raw.startswith(b"WARC/", pos):
            break
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            break
        headers["payload"] = raw[body_start:body_start + clen]
        out.append(headers)
        pos = body_start + clen
    return out


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response header block from a WARC response payload
    (Content-Type: application/http); payloads without one pass through."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def read_warc(path: str) -> "ray.data.Dataset":
    """Recursive .warc / .warc.gz discovery → webpages Dataset (url,
    warc_ts, html, text, lang), one read task per file: response records
    keep their WARC-Target-URI and WARC-Date (fallback: deterministic
    hash-derived timestamp), the HTTP header block is stripped, and
    request/metadata records, malformed framing and corrupt gzip members
    are skipped — the streaming shape Common Crawl's own layout (one gzip
    member per record) is built for."""
    # File discovery happens driver-side (file-cardinality, like the
    # manifest scans) and tasks read RAW bytes: read_binary_files would
    # auto-gunzip .gz by extension as ONE stream — losing the per-member
    # framing and dying on a corrupt tail member, both of which the
    # CC layout's member-per-record design exists to survive.
    import os

    paths = []
    if os.path.isfile(path):
        paths = [path]
    else:
        for root, _dirs, files_ in os.walk(path):
            for f in sorted(files_):
                if f.endswith(".warc") or f.endswith(".warc.gz"):
                    paths.append(os.path.join(root, f))
    if not paths:
        raise ValueError(f"no .warc/.warc.gz files under {path}")

    def load(batch: pa.Table) -> pa.Table:
        payloads = []
        for p in batch["path"].to_pylist():
            with open(p, "rb") as fh:
                payloads.append(fh.read())
        return pa.table({"bytes": pa.array(payloads, pa.binary())})

    files = ray.data.from_items([{"path": p} for p in paths],
                                override_num_blocks=len(paths))
    return files.map_batches(load, batch_format="pyarrow").map_batches(
        _expand_warc, batch_format="pyarrow")


def _expand_warc(batch: pa.Table) -> pa.Table:
    from search_engine_ray.functions.hashing import poly_hash_str

    urls, ts, htmls, texts, langs = [], [], [], [], []
    for payload in batch["bytes"].to_pylist():
        if payload[:2] == b"\x1f\x8b":
            streams = _gzip_members(payload)
        else:
            streams = [payload]
        for raw in streams:
            for rec in parse_warc_records(raw):
                if rec.get("warc-type") != "response":
                    continue
                url = rec.get("warc-target-uri")
                body = _http_body(rec["payload"])
                if not url:
                    url = f"warc-{poly_hash_str(body.decode('utf-8', 'replace')):016x}"
                date = rec.get("warc-date", "")
                t = _parse_warc_date(date)
                if t is None:
                    t = EPOCH_US + (poly_hash_str(url) % 1_000_000) * 1_000_000
                urls.append(url)
                ts.append(t)
                htmls.append(body)
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


def _parse_warc_date(s: str):
    """ISO-8601 WARC-Date → microseconds since epoch (None if absent or
    unparseable — caller falls back to a deterministic pseudo-ts)."""
    if not s:
        return None
    try:
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return None


def read_webpages_csv(path: str) -> "ray.data.Dataset":
    """CSV ingest (columns: url, text[, lang]) → webpages Dataset with
    the input-hint schema; ``html`` carries the raw text bytes (extraction
    downstream, like every other reader). Ray's read_csv does the dir
    walk + parallel parse; rows with a null/empty url are dropped."""
    ds = ray.data.read_csv(path)

    def to_pages(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from search_engine_ray.functions.hashing import poly_hash_str

        b = b.combine_chunks()
        if "url" not in b.column_names or "text" not in b.column_names:
            raise ValueError(
                f"webpages csv needs url,text columns; got {b.column_names}")
        keep = pc.and_(pc.is_valid(b["url"]),
                       pc.not_equal(pc.fill_null(b["url"], ""), ""))
        b = b.filter(keep)
        urls = b["url"].to_pylist()
        texts = [t or "" for t in b["text"].to_pylist()]
        langs = ([l or "und" for l in b["lang"].to_pylist()]
                 if "lang" in b.column_names else ["und"] * len(urls))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [EPOCH_US + (poly_hash_str(u) % 1_000_000) * 1_000_000
                 for u in urls], pa.timestamp("us")),
            "html": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array(langs, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")
