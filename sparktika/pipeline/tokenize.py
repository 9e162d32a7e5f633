"""Tokenizer-aware token accounting: a real BPE merge walk on executors.

The LLM-pipeline planners (``corpus_mixture_plan``, ``corpus_concat_chunks``)
count whitespace tokens; training budgets are set in *tokenizer* tokens, and
the two diverge word-by-word. This module upgrades the accounting to exact
byte-pair-encoding inference (Sennrich et al. 2016; the GPT-2 greedy
lowest-rank merge walk): a broadcast merge-rank table, per-word merge walk,
memoized per Arrow batch so the closed corpus vocabulary costs one walk per
distinct word per batch.

Oracle strategy (the DSIR precedent, ``pipeline/dsir.py``): the Spark side
runs the REAL algorithm; the DuckDB oracle joins an offline-derived per-word
ground-truth table. The synthetic documents corpus has a closed 31-word
vocabulary (identical at every scale factor), so the table is exact, and
``tests/test_tokenize.py`` re-derives both the merge list and the table from
the frozen word list — drift between the walker and the oracle cannot pass.

The reference (tika-fork) has no tokenizer; this is a beyond-parity
training-data-pipeline operator (round-7 verdict item 10).

At 100 TB: the merge table is a few hundred bytes broadcast in the UDF
closure; token counting is map-only (zero Exchange); only the final
per-language plan aggregates, map-side combined, over ~|langs| rows.
"""
from __future__ import annotations

from collections import Counter
from typing import Iterable, Sequence

# The closed vocabulary of the synthetic documents corpus (sorted; pinned by
# tests/test_tokenize.py::test_corpus_vocabulary_closed at sf0.001).
CORPUS_WORDS: tuple[str, ...] = (
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
)

N_MERGES = 24


def train_bpe(words: Sequence[str], n_merges: int) -> list[tuple[str, str]]:
    """Uniform-weight BPE training over a word list.

    Classic algorithm: repeatedly merge the most frequent adjacent symbol
    pair. Deterministic — ties break on the lexicographically smallest
    pair, so the merge list replays bit-for-bit from the frozen word list.
    """
    seqs = [tuple(w) for w in words]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += 1
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt = []
        for s in seqs:
            out: list[str] = []
            i = 0
            while i < len(s):
                if (i + 1 < len(s) and s[i] == best[0]
                        and s[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt.append(tuple(out))
        seqs = nxt
    return merges


def merge_ranks(
        merges: Iterable[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {p: i for i, p in enumerate(merges)}


# Frozen at import from the frozen word list (pure deterministic function).
MERGES: tuple[tuple[str, str], ...] = tuple(
    train_bpe(list(CORPUS_WORDS), N_MERGES))
RANKS: dict[tuple[str, str], int] = merge_ranks(MERGES)


def bpe_token_count(word: str,
                    ranks: dict[tuple[str, str], int] | None = None) -> int:
    """Greedy lowest-rank merge walk (GPT-2 inference order): repeatedly
    merge the adjacent pair with the smallest rank, leftmost-first on rank
    ties, until no adjacent pair is in the table. Returns the token count
    (the empty word is zero tokens)."""
    if ranks is None:
        ranks = RANKS
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


def text_token_counts(texts: Iterable[str | None],
                      ranks: dict[tuple[str, str], int] | None = None,
                      ) -> list[int]:
    """Exact BPE token count per text (single-space word split, matching
    the oracle's ``string_split(text, ' ')`` — consecutive/trailing
    delimiters yield empty words that count zero on both engines). NULL
    text counts zero. Per-word memo amortizes the walk across a batch."""
    if ranks is None:
        ranks = RANKS
    memo: dict[str, int] = {}
    out: list[int] = []
    for t in texts:
        if t is None:
            out.append(0)
            continue
        n = 0
        for w in t.split(" "):
            c = memo.get(w)
            if c is None:
                c = bpe_token_count(w, ranks)
                memo[w] = c
            n += c
        out.append(n)
    return out


def word_token_table() -> dict[str, int]:
    """Ground-truth (word -> token count) over the frozen vocabulary —
    the oracle's inlined VALUES table is generated from this."""
    return {w: bpe_token_count(w) for w in CORPUS_WORDS}
