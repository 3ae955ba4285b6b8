"""Query-string DSL: one string → boolean filters + ranked scoring.

The reference's ``handle_query`` skeleton (search_engine/mod.rs:118-211)
routes a raw query string to exactly one operator; real engines accept a
composed query language (Lucene classic syntax). This parser implements the
core of that grammar over the operators this engine already serves:

    word        SHOULD   — contributes to ranking; defines candidates when
                           no MUST/phrase constraint is present
    +word       MUST     — candidate filter (AND) and a scoring term
    -word       MUST_NOT — excludes any doc containing the term
    "a b ..."   phrase   — candidate filter (consecutive positions);
                           filter-only, not scored
    wild*card   wildcard — expands via the k-gram index into SHOULD terms
    ~word       fuzzy    — expands via the BK-tree (distance 1) into SHOULD

Semantics (Lucene's): candidates = (∩ MUST postings) ∩ (∩ phrase matches),
or the union of SHOULD-term postings when no constraint exists; MUST_NOT
always subtracts. Score = BM25 summed over the distinct MUST ∪ SHOULD terms
(expansions included), 0.0 for a candidate matching only filters; top-k by
(score desc, doc_id asc), the engine-wide contract.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TOKEN_RE = re.compile(r'"[^"]*"|\S+')


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)     # normalized terms
    must: list[str] = field(default_factory=list)       # normalized terms
    must_not: list[str] = field(default_factory=list)   # normalized terms
    phrases: list[str] = field(default_factory=list)    # raw inner text
    wildcards: list[str] = field(default_factory=list)  # raw patterns
    fuzzy: list[str] = field(default_factory=list)      # raw probes


def parse_query(query: str, normalize) -> ParsedQuery:
    """Parse the DSL; ``normalize`` maps a raw word to its index term
    (clean + lemma — the engine passes its tokenizer's normalize) and may
    return '' to drop a token."""
    out = ParsedQuery()
    for tok in _TOKEN_RE.findall(query or ""):
        if tok.startswith('"'):
            inner = tok.strip('"').strip()
            if inner:
                out.phrases.append(inner)
            continue
        bucket = out.should
        if tok[0] == "+":
            bucket, tok = out.must, tok[1:]
        elif tok[0] == "-":
            bucket, tok = out.must_not, tok[1:]
        elif tok[0] == "~":
            if len(tok) > 1:
                out.fuzzy.append(tok[1:])
            continue
        if not tok:
            continue
        if "*" in tok:
            # wildcard patterns address index terms directly (kgram.py);
            # only SHOULD expansion is supported — a MUST/NOT wildcard
            # would need per-pattern set algebra nothing serves yet
            if bucket is out.should:
                out.wildcards.append(tok)
            continue
        w = normalize(tok)
        if w:
            bucket.append(w)
    return out
