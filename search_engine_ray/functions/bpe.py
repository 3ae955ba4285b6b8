"""Byte-pair-encoding vocabulary training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm). Training operates on the DISTINCT-WORD frequency table, the
standard trick that makes BPE scale-honest: the corpus-sized work is one
distributed word-count pass; the merge loop touches only vocab-cardinality
state. Deterministic: ties on pair frequency break lexicographically."""

from __future__ import annotations

END = "</w>"  # end-of-word marker so merges never cross word boundaries


def train_bpe_from_counts(word_counts: dict[str, int],
                          num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word→count table. Each word is a
    symbol sequence (chars + END); per round the most frequent adjacent
    symbol pair (count-weighted; ties → lexicographically smallest pair)
    merges everywhere. Stops early when no pair occurs twice."""
    seqs: list[list[str]] = []
    counts: list[int] = []
    for w, c in sorted(word_counts.items()):
        if not w:
            continue
        seqs.append(list(w) + [END])
        counts.append(int(c))
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, c in zip(seqs, counts):
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merged = a + b
        merges.append((a, b))
        for seq in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i:i + 2] = [merged]
                else:
                    i += 1
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with learned merges (lowest-rank pair first — the
    canonical greedy application order)."""
    seq = list(word) + [END]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {p: i for i, p in enumerate(merges)}
