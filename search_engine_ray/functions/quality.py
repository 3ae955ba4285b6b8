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
    # isdecimal (not isdigit): matches Arrow's utf8_is_decimal exactly so
    # the batch twin is bit-identical ('²'.isdigit() is True but it is not
    # a decimal digit; for ASCII corpora the two agree)
    digit = sum(t.isdecimal() for t in toks)
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


# ---------------------------------------------------------------------------
# whole-batch vectorized twins (property-tested ≡ the scalar specs above;
# the per-doc Python loops were the remaining hot-path cost of text_stats /
# langid at corpus scale)
# ---------------------------------------------------------------------------


def _flat_tokens(texts):
    """(counts int64[n], flat tokens StringArray, doc_idx int64[total]) for
    a batch column — Python-split semantics (empty edge tokens removed;
    includes the split-kernel glue workaround, see stages/tokenize.py)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    toks = pc.utf8_split_whitespace(texts)
    counts_raw = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.utf8_trim_whitespace(pc.list_flatten(toks))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return np.zeros(n, np.int64), flat, np.zeros(0, np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    doc_idx = np.repeat(np.arange(n), counts_raw)[keep]
    flat = flat.filter(pa.array(keep))
    counts = np.bincount(doc_idx, minlength=n).astype(np.int64)
    return counts, flat, doc_idx


def batch_doc_stats(texts) -> dict:
    """Vectorized :func:`doc_stats` over a batch column → dict of numpy
    arrays (n_tokens, n_chars, mean_token_len, alpha_ratio, digit_ratio,
    stopword_ratio)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    counts, flat, doc_idx = _flat_tokens(texts)
    n_chars = pc.fill_null(pc.utf8_length(texts), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)

    def per_doc(mask_arr) -> "np.ndarray":
        m = mask_arr.to_numpy(zero_copy_only=False).astype(bool)
        return np.bincount(doc_idx[m], minlength=n).astype(np.float64)

    if len(flat):
        alpha = per_doc(pc.utf8_is_alpha(flat))
        digit = per_doc(pc.utf8_is_decimal(flat))
        stop = per_doc(pc.is_in(pc.utf8_lower(flat),
                                value_set=pa.array(sorted(STOPWORDS_EN))))
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        len_sum = np.bincount(doc_idx, weights=tok_lens, minlength=n)
    else:
        alpha = digit = stop = len_sum = np.zeros(n, np.float64)
    denom = np.maximum(counts, 1).astype(np.float64)
    nz = counts > 0
    return {
        "n_tokens": counts,
        "n_chars": n_chars,
        "mean_token_len": np.where(nz, len_sum / denom, 0.0),
        "alpha_ratio": np.where(nz, alpha / denom, 0.0),
        "digit_ratio": np.where(nz, digit / denom, 0.0),
        "stopword_ratio": np.where(nz, stop / denom, 0.0),
    }


def batch_quality_score(stats: dict):
    """Vectorized :func:`quality_score` over :func:`batch_doc_stats` output."""
    import numpy as np

    nt = stats["n_tokens"].astype(np.float64)
    length_term = np.minimum(nt / 50.0, 1.0) * np.where(nt <= 10_000, 1.0, 0.5)
    return np.round(0.5 * length_term + 0.4 * stats["alpha_ratio"]
                    + 0.1 * (1.0 - stats["digit_ratio"]), 6)


def batch_lang_id(texts):
    """Vectorized :func:`lang_id` → (langs object array, confidences).
    Only the first 200 tokens per doc vote, like the scalar spec."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    counts, flat, doc_idx = _flat_tokens(texts)
    langs = np.full(n, "und", dtype=object)
    confs = np.zeros(n, np.float64)
    if len(flat) == 0:
        return langs, confs
    # rank within doc; only ranks < 200 vote
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(len(doc_idx)) - starts[doc_idx]
    voting = rank < 200
    low = pc.utf8_lower(flat)
    profiles = list(_LANG_PROFILES.items())
    hits = np.zeros((len(profiles), n), np.int64)
    for i, (_lang, prof) in enumerate(profiles):
        m = pc.is_in(low, value_set=pa.array(sorted(prof))).to_numpy(
            zero_copy_only=False).astype(bool) & voting
        hits[i] = np.bincount(doc_idx[m], minlength=n)
    denom = np.minimum(np.maximum(counts, 1), 200).astype(np.float64)
    best = hits.argmax(axis=0)         # first profile wins ties (spec order)
    best_hits = hits[best, np.arange(n)]
    has = best_hits > 0
    langs[has] = np.array([profiles[i][0] for i in best[has]], dtype=object)
    confs[has] = best_hits[has] / denom[has]
    return langs, confs


# ---------------------------------------------------------------------------
# PII scrubbing (deterministic regex redaction; RE2-compatible patterns)
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) applied IN ORDER; counts are taken on the
#: text as it stands when that pattern runs (so the oracle can mirror the
#: sequential semantics exactly). Patterns deliberately use explicit [0-9]
#: and are compiled re.ASCII so Python `re`, Arrow's RE2 and DuckDB's RE2
#: agree byte-for-byte (\d and \b differ between unicode-aware `re` and RE2).
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)

_PII_COMPILED = [(name, re.compile(pat, re.ASCII), repl) for name, pat, repl in PII_RULES]


def pii_scrub(text: str) -> tuple[str, dict[str, int]]:
    """Scalar spec: sequentially redact each PII_RULES pattern, counting
    matches at each step → (clean_text, {rule_name: n_matches})."""
    counts = {}
    for name, rx, repl in _PII_COMPILED:
        text, n = rx.subn(repl, text)
        counts[name] = n
    return text, counts


def batch_pii_scrub(texts):
    """Vectorized :func:`pii_scrub` over a batch column → (clean StringArray,
    {rule_name: int64 counts array}). One RE2 pass per rule per batch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    counts = {}
    for name, pat, repl in PII_RULES:
        counts[name] = pc.count_substring_regex(texts, pattern=pat)
        texts = pc.replace_substring_regex(texts, pattern=pat, replacement=repl)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return texts, counts


# ---------------------------------------------------------------------------
# repetition stats (Gopher-style duplicate-text quality signals)
# ---------------------------------------------------------------------------

def repetition_stats(text: str) -> dict:
    """Scalar spec of per-doc repetition signals:

    - lines = non-empty '\\n'-split segments; a line is *duplicated* when it
      occurs more than once; dup_line_frac counts ALL occurrences of
      duplicated lines (not just the surplus), dup_line_char_frac weights by
      line length (code points, like SQL length()).
    - 5-grams over whitespace tokens (``str.split`` semantics);
      dup_5gram_frac = 1 - distinct/total.

    All ratios are raw IEEE quotients of int64 — bit-identical in DuckDB."""
    from collections import Counter

    lines = [l for l in text.split("\n") if l != ""]
    n_lines = len(lines)
    c = Counter(lines)
    dup_occ = sum(v for v in c.values() if v > 1)
    line_chars = sum(len(l) for l in lines)
    dup_chars = sum(len(l) * v for l, v in c.items() if v > 1)
    toks = text.split()
    n_grams = max(len(toks) - 4, 0)
    grams = {" ".join(toks[i:i + 5]) for i in range(n_grams)}
    return {
        "n_lines": n_lines,
        "dup_line_frac": (dup_occ / n_lines) if n_lines else 0.0,
        "dup_line_char_frac": (dup_chars / line_chars) if line_chars else 0.0,
        "n_5grams": n_grams,
        "dup_5gram_frac": (1.0 - len(grams) / n_grams) if n_grams else 0.0,
    }


def batch_repetition_stats(texts) -> dict:
    """Vectorized :func:`repetition_stats` over a batch column → dict of
    numpy arrays. Lines are dictionary-encoded (string-exact distinctness);
    5-gram distinctness uses the 64-bit shingle hashes of
    :mod:`functions.hashing` (collision odds ~n²/2⁶⁴ per doc — property- and
    oracle-tested equal to the string spec on real corpora)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from search_engine_ray.functions.hashing import batch_shingle_hashes
    from search_engine_ray.pipelines.training_data import _batch_tok_hashes

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    out = {
        "n_lines": np.zeros(n, np.int64),
        "dup_line_frac": np.zeros(n, np.float64),
        "dup_line_char_frac": np.zeros(n, np.float64),
        "n_5grams": np.zeros(n, np.int64),
        "dup_5gram_frac": np.zeros(n, np.float64),
    }
    if n == 0:
        return out

    # --- lines ---
    split = pc.split_pattern(pc.fill_null(texts, ""), pattern="\n")
    lcounts = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(split)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_idx = np.repeat(np.arange(n), lcounts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    flat, doc_idx = flat.filter(pa.array(keep)), doc_idx[keep]
    if len(flat):
        codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = doc_idx * (codes.max() + 1) + codes
        _, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        occ_cnt = cnt[inv]                       # per-occurrence multiplicity
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        n_lines = np.bincount(doc_idx, minlength=n).astype(np.int64)
        dup = occ_cnt > 1
        dup_occ = np.bincount(doc_idx[dup], minlength=n).astype(np.int64)
        line_chars = np.bincount(doc_idx, weights=lens, minlength=n).astype(np.int64)
        dup_chars = np.bincount(doc_idx[dup], weights=lens[dup], minlength=n).astype(np.int64)
        out["n_lines"] = n_lines
        nz = n_lines > 0
        out["dup_line_frac"][nz] = dup_occ[nz] / n_lines[nz]
        cz = line_chars > 0
        out["dup_line_char_frac"][cz] = dup_chars[cz] / line_chars[cz]

    # --- 5-grams ---
    offs, th = _batch_tok_hashes(texts)
    sh_offs, sh = batch_shingle_hashes(offs, th, 5)
    g_counts = np.diff(sh_offs)
    out["n_5grams"] = g_counts
    if len(sh):
        g_doc = np.repeat(np.arange(n), g_counts)
        order = np.lexsort((sh, g_doc))
        s_doc, s_sh = g_doc[order], sh[order]
        new = np.ones(len(s_sh), bool)
        new[1:] = (s_doc[1:] != s_doc[:-1]) | (s_sh[1:] != s_sh[:-1])
        distinct = np.bincount(s_doc[new], minlength=n).astype(np.int64)
        gz = g_counts > 0
        out["dup_5gram_frac"][gz] = 1.0 - distinct[gz] / g_counts[gz]
    return out


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models", App. A —
# the document-level heuristics of MassiveWeb). Deterministic, SQL-mirrorable.
# ---------------------------------------------------------------------------

#: Gopher's "contains at least two of" stop-word list (distinct membership).
GOPHER_STOP8: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")

#: Line-shape patterns. Written to mean the same thing in Python `re`, Arrow
#: RE2 and DuckDB RE2: explicit [ \t] instead of \s (unicode-aware in `re`,
#: ASCII in RE2).
GOPHER_BULLET_RE = r"^[ \t]*[-•*] "
GOPHER_ELLIPSIS_RE = r"(\.\.\.|…)[ \t]*$"

_BULLET_C = re.compile(GOPHER_BULLET_RE)
_ELLIPSIS_C = re.compile(GOPHER_ELLIPSIS_RE)
_ALPHA_C = re.compile(r"[A-Za-z]")


def gopher_stats(text: str) -> dict:
    """Scalar spec of the Gopher rule inputs over one document:

    - words = whitespace tokens (``str.split``); lines = ``'\\n'``-split
      segments INCLUDING empties (DuckDB ``string_split`` semantics), so
      n_lines ≥ 1 always.
    - symbol_ratio = (# of '#' + non-overlapping '...' + '…') / n_words.
    - bullet_line_frac / ellipsis_line_frac match GOPHER_BULLET_RE /
      GOPHER_ELLIPSIS_RE.
    - alpha_word_frac = words containing ≥1 [A-Za-z] char / n_words.
    - n_stop_hits = DISTINCT members of GOPHER_STOP8 present (lowercased).

    All ratios are raw IEEE quotients of int64 (bit-identical in DuckDB);
    zero-word docs define every word-denominated ratio as 0.0."""
    toks = text.split()
    n = len(toks)
    lines = text.split("\n")
    n_lines = len(lines)
    n_sym = text.count("#") + text.count("...") + text.count("…")
    low = {t.lower() for t in toks}
    stats = {
        "n_words": n,
        "mean_word_len": (sum(len(t) for t in toks) / n) if n else 0.0,
        "symbol_ratio": (n_sym / n) if n else 0.0,
        "bullet_line_frac": sum(bool(_BULLET_C.search(l)) for l in lines) / n_lines,
        "ellipsis_line_frac": sum(bool(_ELLIPSIS_C.search(l)) for l in lines) / n_lines,
        "alpha_word_frac": (sum(bool(_ALPHA_C.search(t)) for t in toks) / n) if n else 0.0,
        "n_stop_hits": sum(w in low for w in GOPHER_STOP8),
    }
    return stats


def gopher_pass(stats: dict) -> bool:
    """The Gopher accept decision over :func:`gopher_stats` output (the
    paper's rule thresholds, App. A.1.1)."""
    return (
        50 <= stats["n_words"] <= 100_000
        and 3.0 <= stats["mean_word_len"] <= 10.0
        and stats["symbol_ratio"] <= 0.1
        and stats["bullet_line_frac"] <= 0.9
        and stats["ellipsis_line_frac"] <= 0.3
        and stats["alpha_word_frac"] >= 0.8
        and stats["n_stop_hits"] >= 2
    )


def batch_gopher_stats(texts) -> dict:
    """Vectorized :func:`gopher_stats` over a batch column → dict of numpy
    arrays (property-tested ≡ the scalar spec). Null texts behave as ''."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    n = len(texts)
    counts, flat, doc_idx = _flat_tokens(texts)
    denom = np.maximum(counts, 1).astype(np.float64)
    nz = counts > 0

    if len(flat):
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        len_sum = np.bincount(doc_idx, weights=tok_lens, minlength=n)
        alpha_m = pc.match_substring_regex(flat, _ALPHA_C.pattern).to_numpy(
            zero_copy_only=False).astype(bool)
        alpha = np.bincount(doc_idx[alpha_m], minlength=n).astype(np.float64)
        low = pc.utf8_lower(flat)
        stop_hits = np.zeros(n, np.int64)
        for w in GOPHER_STOP8:
            m = pc.equal(low, w).to_numpy(zero_copy_only=False).astype(bool)
            stop_hits += np.bincount(doc_idx[m], minlength=n) > 0
    else:
        len_sum = alpha = np.zeros(n, np.float64)
        stop_hits = np.zeros(n, np.int64)

    n_sym = sum(
        pc.count_substring(texts, pattern=p).to_numpy(zero_copy_only=False).astype(np.int64)
        for p in ("#", "...", "…")
    )

    split = pc.split_pattern(texts, pattern="\n")
    lcounts = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    lflat = pc.list_flatten(split)
    if isinstance(lflat, pa.ChunkedArray):
        lflat = lflat.combine_chunks()
    line_idx = np.repeat(np.arange(n), lcounts)
    if len(lflat):
        bullet_m = pc.match_substring_regex(lflat, GOPHER_BULLET_RE).to_numpy(
            zero_copy_only=False).astype(bool)
        ell_m = pc.match_substring_regex(lflat, GOPHER_ELLIPSIS_RE).to_numpy(
            zero_copy_only=False).astype(bool)
        bullet = np.bincount(line_idx[bullet_m], minlength=n).astype(np.float64)
        ell = np.bincount(line_idx[ell_m], minlength=n).astype(np.float64)
    else:  # pragma: no cover — split always yields ≥1 segment per row
        bullet = ell = np.zeros(n, np.float64)
    ldenom = np.maximum(lcounts, 1).astype(np.float64)

    return {
        "n_words": counts,
        "mean_word_len": np.where(nz, len_sum / denom, 0.0),
        "symbol_ratio": np.where(nz, n_sym / denom, 0.0),
        "bullet_line_frac": bullet / ldenom,
        "ellipsis_line_frac": ell / ldenom,
        "alpha_word_frac": np.where(nz, alpha / denom, 0.0),
        "n_stop_hits": stop_hits,
    }


def batch_gopher_pass(stats: dict):
    """Vectorized :func:`gopher_pass` → int64 0/1 array."""
    import numpy as np

    return (
        (stats["n_words"] >= 50) & (stats["n_words"] <= 100_000)
        & (stats["mean_word_len"] >= 3.0) & (stats["mean_word_len"] <= 10.0)
        & (stats["symbol_ratio"] <= 0.1)
        & (stats["bullet_line_frac"] <= 0.9)
        & (stats["ellipsis_line_frac"] <= 0.3)
        & (stats["alpha_word_frac"] >= 0.8)
        & (stats["n_stop_hits"] >= 2)
    ).astype(np.int64)


#: quality-packing constants shared by cluster_best / curriculum_order /
#: token_budget_head: q6 = quality in millionths (≤ 2^20), doc_id in the
#: low 41 bits — one int64 carries (quality, id) through MIN/MAX/sort.
QPACK_SHIFT = 1 << 41


def pack_quality_desc_key(doc_ids, q) -> "object":
    """(ids, quality scores) → int64 keys ascending in (quality DESC,
    doc_id ASC) order: (10^6 − round(q·10^6)) · 2^41 + doc_id. Raises on
    ids ≥ 2^40 (they would corrupt the packing) — the single source of
    truth for the packing width and rounding convention."""
    import numpy as np

    ids = np.asarray(doc_ids, np.int64)
    if len(ids) and int(ids.max()) >= (1 << 40):
        raise ValueError("quality packing holds doc_id in 41 bits; "
                         "ids >= 2^40 need a wider packing")
    q6 = np.rint(np.asarray(q, np.float64) * 1e6).astype(np.int64)
    return (np.int64(1_000_000) - q6) * np.int64(QPACK_SHIFT) + ids


def pack_quality_max_key(doc_ids, q) -> "object":
    """(ids, quality) → int64 keys whose MAX selects (quality DESC, id
    ASC): q6 · 2^41 + (2^41 − 1 − doc_id). Same width/rounding contract
    as :func:`pack_quality_desc_key`."""
    import numpy as np

    ids = np.asarray(doc_ids, np.int64)
    if len(ids) and int(ids.max()) >= (1 << 40):
        raise ValueError("quality packing holds doc_id in 41 bits; "
                         "ids >= 2^40 need a wider packing")
    q6 = np.rint(np.asarray(q, np.float64) * 1e6).astype(np.int64)
    shift = np.int64(QPACK_SHIFT)
    return q6 * shift + (shift - np.int64(1) - ids)


def unpack_quality_max_key(packed) -> tuple:
    """Inverse of :func:`pack_quality_max_key` → (doc_ids, quality)."""
    import numpy as np

    packed = np.asarray(packed, np.int64)
    shift = np.int64(QPACK_SHIFT)
    q6 = packed // shift
    ids = shift - np.int64(1) - (packed - q6 * shift)
    return ids, q6.astype(np.float64) / 1e6
