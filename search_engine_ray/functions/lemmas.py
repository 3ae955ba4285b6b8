"""Lemma table: inflected form → lemma, exact-match lookup only.

The reference loads an 84,486-line ``lemmas.txt`` with lines like
``be,"is, was, are, were, s, been, being, re, m, am"`` and lemmatizes by
exact dictionary lookup, keeping the cleaned word on a miss
(/root/reference/src/query_parser/tokenizer.rs:32-41,52-87). Later duplicate
inflected keys overwrite earlier ones.

We do NOT copy the reference's data file. We ship a compact built-in table of
common English irregular forms (same lookup semantics) and support loading
any reference-format file via ``parse_lemma_file`` (``EngineConfig.lemma_path``).
The engine and its oracle always share one table, so correctness checks are
independent of table size.
"""

from __future__ import annotations

# (lemma, [inflected forms...]) — standard English irregulars; hand-written.
_BUILTIN: list[tuple[str, list[str]]] = [
    ("be", ["is", "was", "are", "were", "been", "being", "am"]),
    ("have", ["has", "had", "having"]),
    ("do", ["does", "did", "done", "doing"]),
    ("go", ["goes", "went", "gone", "going"]),
    ("say", ["says", "said", "saying"]),
    ("get", ["gets", "got", "gotten", "getting"]),
    ("make", ["makes", "made", "making"]),
    ("know", ["knows", "knew", "known", "knowing"]),
    ("think", ["thinks", "thought", "thinking"]),
    ("take", ["takes", "took", "taken", "taking"]),
    ("see", ["sees", "saw", "seen", "seeing"]),
    ("come", ["comes", "came", "coming"]),
    ("find", ["finds", "found", "finding"]),
    ("give", ["gives", "gave", "given", "giving"]),
    ("tell", ["tells", "told", "telling"]),
    ("become", ["becomes", "became", "becoming"]),
    ("leave", ["leaves", "left", "leaving"]),
    ("put", ["puts", "putting"]),
    ("mean", ["means", "meant", "meaning"]),
    ("keep", ["keeps", "kept", "keeping"]),
    ("let", ["lets", "letting"]),
    ("begin", ["begins", "began", "begun", "beginning"]),
    ("show", ["shows", "showed", "shown", "showing"]),
    ("hear", ["hears", "heard", "hearing"]),
    ("run", ["runs", "ran", "running"]),
    ("hold", ["holds", "held", "holding"]),
    ("bring", ["brings", "brought", "bringing"]),
    ("write", ["writes", "wrote", "written", "writing"]),
    ("sit", ["sits", "sat", "sitting"]),
    ("stand", ["stands", "stood", "standing"]),
    ("lose", ["loses", "lost", "losing"]),
    ("pay", ["pays", "paid", "paying"]),
    ("meet", ["meets", "met", "meeting"]),
    ("set", ["sets", "setting"]),
    ("learn", ["learns", "learnt", "learned", "learning"]),
    ("lead", ["leads", "led", "leading"]),
    ("understand", ["understands", "understood", "understanding"]),
    ("speak", ["speaks", "spoke", "spoken", "speaking"]),
    ("read", ["reads", "reading"]),
    ("spend", ["spends", "spent", "spending"]),
    ("grow", ["grows", "grew", "grown", "growing"]),
    ("win", ["wins", "won", "winning"]),
    ("buy", ["buys", "bought", "buying"]),
    ("send", ["sends", "sent", "sending"]),
    ("build", ["builds", "built", "building"]),
    ("fall", ["falls", "fell", "fallen", "falling"]),
    ("cut", ["cuts", "cutting"]),
    ("sell", ["sells", "sold", "selling"]),
    ("rise", ["rises", "rose", "risen", "rising"]),
    ("drive", ["drives", "drove", "driven", "driving"]),
    ("break", ["breaks", "broke", "broken", "breaking"]),
    ("feel", ["feels", "felt", "feeling"]),
    ("child", ["children"]),
    ("man", ["men"]),
    ("woman", ["women"]),
    ("foot", ["feet"]),
    ("tooth", ["teeth"]),
    ("mouse", ["mice"]),
    ("person", ["people"]),
    ("datum", ["data"]),
    ("index", ["indices", "indexes"]),
    ("query", ["queries"]),
    ("table", ["tables"]),
    ("row", ["rows"]),
    ("column", ["columns"]),
    ("value", ["values"]),
    ("key", ["keys"]),
    ("batch", ["batches"]),
    ("stream", ["streams"]),
    ("window", ["windows"]),
    ("line", ["lines"]),
    ("part", ["parts"]),
    ("document", ["documents"]),
    ("term", ["terms"]),
]


def builtin_lemmas() -> dict[str, str]:
    """inflected→lemma map (reference lookup semantics, tokenizer.rs:32-41)."""
    out: dict[str, str] = {}
    for lemma, forms in _BUILTIN:
        for f in forms:
            out[f] = lemma  # later duplicates overwrite, like the reference
    return out


def parse_lemma_file(path: str) -> dict[str, str]:
    """Parse the reference's lemmas.txt format
    (/root/reference/src/query_parser/tokenizer.rs:52-87): per line,
    ``lemma,"form1, form2, ..."`` — split at the FIRST comma, strip one pair
    of surrounding quotes, split forms on commas, trim, drop empties; each
    form maps to the lemma, later lines overwrite earlier."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            comma = line.find(",")
            if comma < 0:
                continue
            key = line[:comma].strip()
            values = line[comma + 1 :].strip().strip('"')
            for form in values.split(","):
                form = form.strip()
                if form:
                    out[form] = key
    return out


def load_lemmas(lemma_path: str | None = None) -> dict[str, str]:
    """Built-in table, overlaid with ``lemma_path`` entries if given."""
    table = builtin_lemmas()
    if lemma_path:
        table.update(parse_lemma_file(lemma_path))
    return table
