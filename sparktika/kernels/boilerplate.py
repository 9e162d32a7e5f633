"""Boilerplate stripping via text-density / link-density block classification.

Implements the NumWordsRulesClassifier decision rules from Boilerpipe
(Kohlschütter, Fankhauser, Nejdl: "Boilerplate Detection using Shallow
Text Features", WSDM 2010 — public algorithm). A block is classified
using its own link density and word count plus the word counts of its
neighbors:

    if curr.link_density > 0.333333:            boilerplate
    elif prev.link_density <= 0.555556:
        content iff curr.words > 16 or next.words > 15 or prev.words > 4
    else:
        content iff curr.words > 40 or next.words > 17

The reference extractor has no boilerplate notion (it emits all body
text); this kernel is the `main_text` add-on required by the engine's
north star, layered over the same block stream produced by
kernels/htmlparse.py.
"""

from __future__ import annotations

from .htmlparse import Block


def classify_blocks(blocks: list[Block]) -> list[bool]:
    """Return per-block is_content flags (Boilerpipe NumWordsRulesClassifier)."""
    flags: list[bool] = []
    n = len(blocks)
    for i, curr in enumerate(blocks):
        prev = blocks[i - 1] if i > 0 else None
        nxt = blocks[i + 1] if i + 1 < n else None
        prev_words = prev.n_words if prev else 0
        next_words = nxt.n_words if nxt else 0
        prev_ld = prev.link_density if prev else 0.0
        if curr.link_density > 0.333333:
            flags.append(False)
        elif prev_ld <= 0.555556:
            flags.append(curr.n_words > 16 or next_words > 15 or prev_words > 4)
        else:
            flags.append(curr.n_words > 40 or next_words > 17)
    return flags


def main_text(blocks: list[Block]) -> str:
    """Concatenate content blocks with newlines."""
    flags = classify_blocks(blocks)
    return "\n".join(b.text for b, f in zip(blocks, flags) if f)
