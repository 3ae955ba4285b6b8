"""HTML → plaintext extraction stage (stateless map_batches, zero-copy Arrow).

Reference semantics: strip every ``<[^>]*>`` span
(/root/reference/src/indexer/indexer.rs:64-69). Vectorized with
``pyarrow.compute.replace_substring_regex`` (RE2 — same non-greedy
single-tag behavior as the Rust regex crate for this pattern); the per-url
byte-identical invariant is pytest-checked against the pure-Python spec in
functions/textproc.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TAG_PATTERN = "<[^>]*>"


def extract_batch(batch: pa.Table, html_col: str = "html", out_col: str = "text") -> pa.Table:
    html = batch[html_col]
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        target = pa.large_string() if pa.types.is_large_binary(html.type) else pa.string()
        try:
            html = pc.cast(html, target)
        except pa.ArrowInvalid:
            # real crawl HTML routinely contains invalid UTF-8; match the
            # scalar spec (textproc.extract_plaintext_bytes): lossy decode
            html = pa.array(
                [None if v is None else v.decode("utf-8", errors="replace")
                 for v in html.to_pylist()],
                type=target,
            )
    text = pc.replace_substring_regex(html, pattern=TAG_PATTERN, replacement="")
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, text)


def extract_stage(ds, html_col: str = "html", out_col: str = "text", batch_size: int | None = None):
    """ds must have a (binary|string) html column; adds/replaces ``out_col``."""
    return ds.map_batches(
        lambda b: extract_batch(b, html_col, out_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
