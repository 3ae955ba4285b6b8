"""Tokenizer: whitespace split → clean → lemmatize, reference-exact.

Semantics (/root/reference/src/query_parser/tokenizer.rs:123-224):
- split on Unicode whitespace (``split_whitespace``), positions start at 0;
- the position counter increments for EVERY whitespace token, including ones
  cleaned to empty (tokenizer.rs:219-221) — empties emit no token but consume
  a position;
- clean = lowercase + strip leading/trailing non-alphanumerics;
- lemmatize = exact dict lookup, miss keeps the cleaned word;
- query tokenization additionally emits bigram tokens ``"{prev} {cur}"`` at
  ``position - 1`` over consecutive non-empty words (tokenizer.rs:150-160).

This module is the executable spec and the per-query path; the batched /
vectorized corpus path lives in stages/tokenize.py and is tested against it.
"""

from __future__ import annotations

from dataclasses import dataclass

from search_engine_ray.functions.lemmas import load_lemmas
from search_engine_ray.functions.textproc import clean_word


@dataclass
class Token:
    position: int
    word: str


class Tokenizer:
    def __init__(self, lemmas: dict[str, str] | None = None, lemma_path: str | None = None):
        self.lemmas = lemmas if lemmas is not None else load_lemmas(lemma_path)
        # memoized raw-token → normalized form ('' = cleaned away); Zipfian
        # text makes this cache extremely hot.
        self._cache: dict[str, str] = {}

    def normalize(self, raw_word: str) -> str:
        """clean + lemmatize one raw token; '' means 'no token emitted'."""
        cached = self._cache.get(raw_word)
        if cached is not None:
            return cached
        cleaned = clean_word(raw_word)
        out = self.lemmas.get(cleaned, cleaned) if cleaned else ""
        if len(self._cache) < 1_000_000:  # bound memory on adversarial input
            self._cache[raw_word] = out
        return out

    def tokenize(self, text: str) -> list[Token]:
        """Index-side tokenization (tokenizer.rs:178-224)."""
        if not text.strip():
            return []
        out: list[Token] = []
        for position, raw in enumerate(text.split()):
            word = self.normalize(raw)
            if word:
                out.append(Token(position, word))
        return out

    def tokenize_query(self, text: str) -> tuple[list[Token], list[Token]]:
        """Query-side: (unigrams, bigrams) (tokenizer.rs:123-176)."""
        unigrams: list[Token] = []
        bigrams: list[Token] = []
        prev: str | None = None
        for position, raw in enumerate(text.split()):
            word = self.normalize(raw)
            if word:
                unigrams.append(Token(position, word))
                if prev is not None:
                    bigrams.append(Token(position - 1, f"{prev} {word}"))
                prev = word
        return unigrams, bigrams

    def doc_postings(self, doc_id: int, text: str) -> tuple[dict[str, list[int]], int]:
        """Per-doc term→positions grouping + doc_length
        (/root/reference/src/indexer/indexer.rs:109-134). Positions per term
        ascend in token order; doc_length = number of emitted tokens."""
        tokens = self.tokenize(text)
        postings: dict[str, list[int]] = {}
        for t in tokens:
            postings.setdefault(t.word, []).append(t.position)
        return postings, len(tokens)
