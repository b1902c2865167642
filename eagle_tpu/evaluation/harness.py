"""Benchmark harness — MT-bench-style evaluation of the engine.

One generic runner replaces the reference's six near-identical scripts
(/root/reference/eagle/evaluation/gen_ea_answer_*.py and
gen_baseline_answer_*.py): load a fastchat-format question file, run a few
warmup generations, then answer every question turn by turn, recording the
same jsonl fields the reference writes (`wall_time`, `new_tokens`, `idxs`;
gen_ea_answer_llama3chat.py:141-200) so τ and speed ratios are directly
comparable. Question sharding across hosts replaces ray
(gen_ea_answer_llama3chat.py:56-86) with a plain --shard i/n split.

Additionally records per-round accept lengths, fixing the reference's broken
per-depth acceptance-rate instrumentation (gen_ea_alpha_* imports a missing
module, gen_ea_alpha_vicuna.py:28).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable, List, Optional

import numpy as np


def load_questions(path: str, begin: Optional[int] = None,
                   end: Optional[int] = None) -> List[dict]:
    qs = []
    with open(path) as f:
        for line in f:
            if line.strip():
                qs.append(json.loads(line))
    return qs[begin:end]


def default_chat_template(turns: List[str], answers: List[str]) -> str:
    """Minimal vicuna-style template (webui.py:101-142 has per-model ones)."""
    sys_p = ("A chat between a curious user and an artificial intelligence "
             "assistant. The assistant gives helpful, detailed, and polite "
             "answers to the user's questions.")
    out = sys_p
    for i, turn in enumerate(turns):
        out += f" USER: {turn} ASSISTANT:"
        if i < len(answers):
            out += f" {answers[i]}</s>"
    return out


def template_llama2(turns: List[str], answers: List[str]) -> str:
    """llama-2-chat conversation format (the reference's
    gen_ea_answer_llama2chat.py uses fastchat's llama-2 template)."""
    sys_p = "You are a helpful, respectful and honest assistant."
    out = f"[INST] <<SYS>>\n{sys_p}\n<</SYS>>\n\n"
    for i, turn in enumerate(turns):
        out += (turn + " [/INST]") if i == 0 else f"[INST] {turn} [/INST]"
        if i < len(answers):
            out += f" {answers[i]} </s><s>"
    return out


def template_llama3(turns: List[str], answers: List[str]) -> str:
    """llama-3 instruct format (gen_ea_answer_llama3chat.py:147-165 via
    tokenizer.apply_chat_template)."""
    out = ("<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n"
           "You are a helpful assistant.<|eot_id|>")
    for i, turn in enumerate(turns):
        out += (f"<|start_header_id|>user<|end_header_id|>\n\n"
                f"{turn}<|eot_id|>")
        if i < len(answers):
            out += (f"<|start_header_id|>assistant<|end_header_id|>\n\n"
                    f"{answers[i]}<|eot_id|>")
    out += "<|start_header_id|>assistant<|end_header_id|>\n\n"
    return out


def template_qwen(turns: List[str], answers: List[str]) -> str:
    """ChatML format (qwen2/qwen3 targets; gen_ea_answer_qwen3.py uses
    fastchat's qwen3 conversation template)."""
    out = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n")
    for i, turn in enumerate(turns):
        out += f"<|im_start|>user\n{turn}<|im_end|>\n"
        if i < len(answers):
            out += f"<|im_start|>assistant\n{answers[i]}<|im_end|>\n"
    out += "<|im_start|>assistant\n"
    return out


CHAT_TEMPLATES = {
    "vicuna": default_chat_template,
    "llama2": template_llama2,
    "llama3": template_llama3,
    "mixtral": template_llama2,
    "qwen": template_qwen,
}


def hf_chat_template(tokenizer) -> Callable:
    """Use the tokenizer's own chat template (the reference's modern path,
    gen_ea_answer_ds.py:147/226 `tokenizer.apply_chat_template`)."""
    def fn(turns: List[str], answers: List[str]) -> str:
        msgs = []
        for i, t in enumerate(turns):
            msgs.append({"role": "user", "content": t})
            if i < len(answers):
                msgs.append({"role": "assistant", "content": answers[i]})
        return tokenizer.apply_chat_template(msgs, tokenize=False,
                                             add_generation_prompt=True)
    return fn


def run_benchmark(
    generate_fn: Callable,           # (prompt_ids, max_new) -> (ids, stats)
    encode_fn: Callable[[str], np.ndarray],
    decode_fn: Callable[[np.ndarray], str],
    questions: Iterable[dict],
    out_file: str,
    model_id: str = "eagle-tpu",
    max_new_tokens: int = 1024,
    num_warmup: int = 3,
    template: Callable = default_chat_template,
    shard: int = 0,
    num_shards: int = 1,
) -> List[dict]:
    """Answer questions; write fastchat-style jsonl; return the records.

    generate_fn returns (full_ids, stats) where stats carries new_tokens,
    rounds (= target forwards, `idx` in the reference), accept_lens.
    """
    questions = list(questions)[shard::num_shards]
    # warmup (3 rounds in the reference, gen_ea_answer_llama3chat.py:128-158)
    for q in questions[:1] * min(num_warmup, len(questions)):
        prompt = template(q["turns"][:1], [])
        generate_fn(encode_fn(prompt), max_new_tokens)

    records = []
    for q in questions:
        answers, wall_times, new_tokens, idxs, accept_lens = [], [], [], [], []
        for t in range(len(q["turns"])):
            prompt = template(q["turns"][: t + 1], answers)
            ids = encode_fn(prompt)
            t0 = time.time()
            out_ids, stats = generate_fn(ids, max_new_tokens)
            wall_times.append(time.time() - t0)
            answers.append(decode_fn(out_ids[len(ids):]))
            new_tokens.append(int(stats["new_tokens"]))
            idxs.append(int(stats["rounds"]))
            accept_lens.append([int(a) for a in stats.get("accept_lens", [])])
        rec = {
            "question_id": q.get("question_id"),
            "model_id": model_id,
            "choices": [{
                "index": 0,
                "turns": answers,
                "wall_time": wall_times,
                "new_tokens": new_tokens,
                "idxs": idxs,
                "accept_lens": accept_lens,
            }],
        }
        records.append(rec)
        if out_file:
            os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
            with open(out_file, "a") as f:
                f.write(json.dumps(rec) + "\n")
    return records


def summarize(records: List[dict]) -> dict:
    """τ, tokens/s, per-depth acceptance-rate α (speed.py + alpha.py analog)."""
    new_tokens = rounds = wall = 0.0
    depth_hist: dict = {}
    for r in records:
        c = r["choices"][0]
        new_tokens += sum(c["new_tokens"])
        rounds += sum(c["idxs"])
        wall += sum(c["wall_time"])
        for turn in c.get("accept_lens", []):
            for a in turn:
                depth_hist[a] = depth_hist.get(a, 0) + 1
    n = sum(depth_hist.values()) or 1
    # α_d = P(accept ≥ d+1 | accept ≥ d): per-depth acceptance rates
    max_d = max(depth_hist) if depth_hist else 0
    alpha = []
    at_least = [sum(v for k, v in depth_hist.items() if k >= d)
                for d in range(max_d + 2)]
    for d in range(max_d + 1):
        denom = at_least[d]
        alpha.append(at_least[d + 1] / denom if denom else 0.0)
    return {
        "tau": new_tokens / rounds if rounds else 0.0,
        "tokens_per_s": new_tokens / wall if wall else 0.0,
        "total_new_tokens": new_tokens,
        "total_rounds": rounds,
        "accept_len_hist": {str(k): v for k, v in sorted(depth_hist.items())},
        "alpha_per_depth": alpha,
    }


def speed_ratio(eagle_file: str, baseline_file: str) -> float:
    """tokens/s(EAGLE) ÷ tokens/s(baseline) (speed.py:16-50, with CLI paths
    instead of hardcoded ones)."""
    def tps(path):
        recs = [json.loads(l) for l in open(path) if l.strip()]
        s = summarize(recs)
        return s["tokens_per_s"]
    return tps(eagle_file) / tps(baseline_file)


def make_generate_fn(engine, mode: str = "eagle", fused: bool = False):
    """Adapt EagleEngine to the harness interface.

    fused=True uses the single-dispatch generation paths (one device
    round-trip per request instead of one per decode round) — the right
    timing mode on remote/high-RTT links and the realistic serving
    latency generally. Trade-off: the fused while_loop aggregates
    acceptance on device, so per-round accept_lens (the per-depth α
    detail) are not recorded; τ and the speed ratio are unaffected
    (new_tokens and rounds are exact)."""
    if mode == "eagle" and fused:
        def fn(ids, max_new):
            out, ntok, rounds = engine.generate_fused(
                ids, max_new_tokens=max_new, log=True)
            return out, {"new_tokens": int(ntok), "rounds": int(rounds),
                         "accept_lens": []}
    elif mode == "eagle":
        def fn(ids, max_new):
            out, stats = engine.generate(ids, max_new_tokens=max_new,
                                         details=True)
            return out, stats
    else:
        def fn(ids, max_new):
            out = engine.generate_vanilla(ids, max_new_tokens=max_new,
                                          fused=fused)
            n = len(out) - len(ids)
            return out, {"new_tokens": n, "rounds": n, "accept_lens": []}
    return fn
