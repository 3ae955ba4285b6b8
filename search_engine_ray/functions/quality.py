"""Text-analysis kernels for training-data pipelines: token counting,
quality scoring, language-ID heuristic, all deterministic and cheap.

The quality metrics are SQL-expressible (oracle-checked); language-ID is a
stopword-profile heuristic (rows-only check).
"""

from __future__ import annotations

import re


#: BPE-ish pre-tokenization: letter runs, digit runs, single non-space symbols
#: (a simplified GPT-2-style pattern; compiled once per actor).
BPE_ISH = re.compile(r"[^\W\d_]+|\d+|[^\w\s]")

STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was were be been for on with as at by it this that".split()
)

_LANG_PROFILES: dict[str, frozenset] = {
    "en": STOPWORDS_EN,
    "de": frozenset("der die das und oder von zu im ist sind war waren für auf mit als bei".split()),
    "fr": frozenset("le la les et ou de du au est sont était pour sur avec comme chez dans".split()),
    "es": frozenset("el la los las y o de del al es son era para en con como donde una".split()),
}


def bpe_ish_token_count(text: str) -> int:
    return len(BPE_ISH.findall(text))


def doc_stats(text: str) -> dict:
    """Whitespace-token stats used by the quality score; SQL-mirrorable."""
    toks = text.split()
    n = len(toks)
    n_chars = len(text)
    alpha = sum(t.isalpha() for t in toks)
    digit = sum(t.isdigit() for t in toks)
    stop = sum(t.lower() in STOPWORDS_EN for t in toks)
    mean_len = (sum(len(t) for t in toks) / n) if n else 0.0
    return {
        "n_tokens": n,
        "n_chars": n_chars,
        "mean_token_len": mean_len,
        "alpha_ratio": (alpha / n) if n else 0.0,
        "digit_ratio": (digit / n) if n else 0.0,
        "stopword_ratio": (stop / n) if n else 0.0,
    }


def quality_score(stats: dict) -> float:
    """Composite [0,1] quality heuristic: length sweet-spot, alpha-dominance,
    not-too-many digits. Deterministic; documented, not learned."""
    n = stats["n_tokens"]
    length_term = min(n / 50.0, 1.0) * (1.0 if n <= 10_000 else 0.5)
    return round(0.5 * length_term + 0.4 * stats["alpha_ratio"] + 0.1 * (1.0 - stats["digit_ratio"]), 6)


def lang_id(text: str) -> tuple[str, float]:
    """Stopword-profile language guess → (lang, confidence). 'und' =
    undetermined (no profile hits)."""
    toks = [t.lower() for t in text.split()[:200]]
    if not toks:
        return "und", 0.0
    best_lang, best_hits = "und", 0
    for lang, prof in _LANG_PROFILES.items():
        hits = sum(t in prof for t in toks)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang, best_hits / len(toks)
