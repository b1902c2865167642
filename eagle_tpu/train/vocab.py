"""Draft-vocabulary construction for EAGLE-3 reduced-vocab heads.

Analog of the reference's `scandata` (traineagle3/cnets.py:536-687): count
token frequencies over the loss-masked training tokens, keep the
`draft_vocab_size` most frequent target tokens as the draft vocabulary, and
build the two mapping buffers the draft head ships with:

- d2t [dV] int: OFFSET from draft id to target id (target = draft + d2t)
- t2d [V] bool: membership of each target token in the draft vocab

The draft ids are the selected target ids in ascending order, so d2t is the
per-rank offset (matching the checkpoint layout consumed by
models/draft.map_draft_to_target and the reference's cnets.py:708-713).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Tuple

import numpy as np


def count_tokens(batches: Iterable[dict], vocab_size: int) -> np.ndarray:
    """Accumulate loss-masked token counts over {input_ids, loss_mask}
    batches (the Counter pass of cnets.py:556-600)."""
    counts = np.zeros(vocab_size, np.int64)
    for b in batches:
        ids = np.asarray(b["input_ids"]).reshape(-1)
        lm = np.asarray(b["loss_mask"]).reshape(-1)
        sel = ids[lm > 0]
        np.add.at(counts, sel, 1)
    return counts


def build_draft_vocab(counts: np.ndarray,
                      draft_vocab_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Top-`draft_vocab_size` tokens by count → (d2t offsets, t2d bools)
    (cnets.py:661-687)."""
    V = len(counts)
    assert draft_vocab_size <= V
    top = np.argsort(-counts, kind="stable")[:draft_vocab_size]
    keep = np.sort(top)                       # ascending target ids
    d2t = keep - np.arange(draft_vocab_size)  # offset form
    t2d = np.zeros(V, bool)
    t2d[keep] = True
    return d2t.astype(np.int64), t2d


def scan_dataset(batches: Iterable[dict], vocab_size: int,
                 draft_vocab_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """One-call scandata equivalent."""
    return build_draft_vocab(count_tokens(batches, vocab_size),
                             draft_vocab_size)
