"""Text extraction / normalization kernels, reference-exact.

Semantics mirror the reference (cited per function); the per-url invariant in
BASELINE.md ("byte-identical extracted text") binds to ``extract_plaintext``.
"""

from __future__ import annotations

import re

#: the reference strips every non-greedy single-tag match ``<[^>]*>``
#: (/root/reference/src/indexer/indexer.rs:64-69). Note ``<>`` is NOT matched
#: by the Rust regex? It is: [^>]* matches empty, so "<>" IS stripped.
_TAG_RE = re.compile(r"<[^>]*>")

#: paragraph separator used when flattening Vec<Vec<String>> article text
#: (/root/reference/src/indexer/indexer.rs:59-63): sentences joined with "",
#: paragraphs joined with "\n\n".
PARAGRAPH_SEP = "\n\n"
SENTENCE_SEP = ""


def join_article_text(paragraphs: list[list[str]]) -> str:
    """Flatten paragraphs×sentences exactly like the reference
    (/root/reference/src/indexer/indexer.rs:59-63)."""
    return PARAGRAPH_SEP.join(SENTENCE_SEP.join(p) for p in paragraphs)


def extract_plaintext(html: str) -> str:
    """Strip every ``<[^>]*>`` span (/root/reference/src/indexer/indexer.rs:64-69).

    This regex-strip IS the reference's entire HTML→text semantics; the
    byte-identical-per-url invariant binds here.
    """
    return _TAG_RE.sub("", html)


def extract_plaintext_bytes(html: bytes) -> str:
    """Input-hint html column is binary; decode UTF-8 (surrogate-safe) then strip."""
    return extract_plaintext(html.decode("utf-8", errors="replace"))


def clean_word(word: str) -> str:
    """Lowercase, then strip leading and trailing non-alphanumerics
    (Unicode), exactly like the reference
    (/root/reference/src/query_parser/tokenizer.rs:89-102: to_lowercase →
    skip_while !is_alphanumeric front → back).

    Python ``str.isalnum`` covers the same L*/N* Unicode categories as Rust
    ``char::is_alphanumeric`` for all practical inputs.
    """
    w = word.lower()
    i, n = 0, len(w)
    while i < n and not w[i].isalnum():
        i += 1
    j = n
    while j > i and not w[j - 1].isalnum():
        j -= 1
    return w[i:j]


def split_whitespace(text: str) -> list[str]:
    """Rust ``str::split_whitespace`` equivalent: Unicode whitespace, no empty
    tokens (/root/reference/src/query_parser/tokenizer.rs:136,185)."""
    return text.split()


# ---------------------------------------------------------------------------
# Deterministic html synthesis (test/bench corpus): builds html FROM plaintext
# such that extract_plaintext(synthesize_html(text)) == text byte-identically
# (FIXTURES.md §1.1). Used by sources/webpages.py and by the oracle SQL
# (the same construction is expressible as string concat + regexp_replace).
# ---------------------------------------------------------------------------

HTML_PREFIX = "<html><head><title></title></head><body><p>"
HTML_PARA_SEP = "</p>\n\n<p>"
HTML_SUFFIX = "</p></body></html>"


def synthesize_html(text: str) -> str:
    """Wrap plaintext in tags so that stripping ``<[^>]*>`` restores it.

    Paragraphs (split on \\n\\n) are wrapped in <p>..</p>; the inter-paragraph
    "\\n\\n" stays OUTSIDE the tags so extraction reproduces it. Requires the
    text itself to contain no '<'.
    """
    return HTML_PREFIX + text.replace("\n\n", HTML_PARA_SEP) + HTML_SUFFIX
