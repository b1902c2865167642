"""Training data pipeline: chat tokenization + assistant-span loss masks.

Analog of the reference's dataset builders (traineagle3/main.py:55-171 and
train/main.py:134-175): sharegpt-style conversations are rendered through
the tokenizer's chat template and the loss mask covers assistant responses
only. Unlike the reference's hand-maintained per-template offset arithmetic
(searching for "<|eot_id|>" etc.), spans are computed by *incremental
tokenization*: tokenize each conversation prefix and diff the lengths —
template-agnostic and immune to offset drift.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator, List, Optional, Sequence

import numpy as np


def load_sharegpt(path: str) -> Iterator[List[dict]]:
    """Yield conversations as [{'role','content'}, ...] from a sharegpt-style
    json/jsonl file (fields `conversations` with `from`/`value`)."""
    role_map = {"human": "user", "user": "user", "gpt": "assistant",
                "assistant": "assistant", "system": "system"}

    def convert(item):
        msgs = item.get("conversations") or item.get("messages") or []
        out = []
        for m in msgs:
            role = role_map.get(m.get("from") or m.get("role"), None)
            if role is None:
                continue
            out.append({"role": role,
                        "content": m.get("value") or m.get("content") or ""})
        return out

    with open(path) as f:
        head = f.read(1)
        f.seek(0)
        if head == "[":
            for item in json.load(f):
                conv = convert(item)
                if conv:
                    yield conv
        else:
            for line in f:
                if line.strip():
                    conv = convert(json.loads(line))
                    if conv:
                        yield conv


def build_example(tokenizer, conversation: Sequence[dict],
                  max_len: int = 2048) -> Optional[dict]:
    """One conversation → {input_ids [T], loss_mask [T]} with mask=1 exactly
    on assistant-response tokens (incremental-tokenization span diffing)."""
    prev_len = 0
    ids: Optional[np.ndarray] = None
    mask_spans = []
    for i in range(len(conversation)):
        prefix = list(conversation[: i + 1])
        toks = tokenizer.apply_chat_template(
            prefix, tokenize=True, add_generation_prompt=False)
        toks = np.asarray(toks, np.int32)
        span = (prev_len, len(toks))
        if conversation[i]["role"] == "assistant":
            mask_spans.append(span)
        prev_len = len(toks)
        ids = toks
    if ids is None or not mask_spans:
        return None
    ids = ids[:max_len]
    lm = np.zeros(len(ids), np.float32)
    for a, b in mask_spans:
        lm[a:min(b, len(ids))] = 1.0
    if lm.sum() == 0:
        return None
    return {"input_ids": ids, "loss_mask": lm}


def collate(examples: Sequence[dict], pad_to: Optional[int] = None) -> dict:
    """Pad a list of examples into a fixed [B, T] batch
    (DataCollatorWithPadding analog, train/main.py:185-215)."""
    T = pad_to or max(len(e["input_ids"]) for e in examples)
    B = len(examples)
    out = {
        "input_ids": np.zeros((B, T), np.int32),
        "loss_mask": np.zeros((B, T), np.float32),
        "pad_mask": np.zeros((B, T), bool),
    }
    for i, e in enumerate(examples):
        n = min(len(e["input_ids"]), T)
        out["input_ids"][i, :n] = e["input_ids"][:n]
        out["loss_mask"][i, :n] = e["loss_mask"][:n]
        out["pad_mask"][i, :n] = True
    return out


def batch_iterator(tokenizer, conversations: Iterable[Sequence[dict]],
                   batch_size: int, max_len: int = 2048,
                   pad_to: Optional[int] = None) -> Iterator[dict]:
    buf = []
    for conv in conversations:
        ex = build_example(tokenizer, conv, max_len)
        if ex is None:
            continue
        buf.append(ex)
        if len(buf) == batch_size:
            yield collate(buf, pad_to=pad_to or max_len)
            buf = []
    if buf:
        yield collate(buf, pad_to=pad_to or max_len)
