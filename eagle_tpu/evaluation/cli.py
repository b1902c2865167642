"""Evaluation CLI — generic gen_ea_answer/gen_baseline_answer replacement.

    python -m eagle_tpu.evaluation.cli \
        --base-model-path ... --ea-model-path ... \
        --bench-name mt_bench --mode eagle --answer-file out.jsonl \
        --use-eagle3 --total-token 60 --depth 5 --top-k 10

One script covers what the reference spreads over 10 per-model files
(evaluation/gen_{ea,baseline}_answer_*.py); multi-host sharding via
--shard/--num-shards (replacing ray, gen_ea_answer_llama3chat.py:56-86).
Prints the τ / tokens-per-s / per-depth α summary at the end (speed.py +
alpha.py built in).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-model-path", required=True)
    ap.add_argument("--ea-model-path", default=None)
    ap.add_argument("--bench-name", default="mt_bench")
    ap.add_argument("--question-file", default=None)
    ap.add_argument("--question-begin", type=int, default=None)
    ap.add_argument("--question-end", type=int, default=None)
    ap.add_argument("--answer-file", required=True)
    ap.add_argument("--model-id", default="eagle-tpu")
    ap.add_argument("--mode", choices=["eagle", "baseline"], default="eagle")
    ap.add_argument("--model-type", default="vicuna",
                    choices=["vicuna", "llama2", "llama3", "mixtral", "qwen",
                             "hf"],
                    help="chat template; 'hf' uses the tokenizer's own "
                         "apply_chat_template")
    ap.add_argument("--use-eagle3", action="store_true")
    ap.add_argument("--total-token", type=int, default=60)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--max-new-tokens", type=int, default=1024)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--tokenizer", default="auto",
                    choices=["auto", "byte"],
                    help="'auto' = AutoTokenizer from --base-model-path; "
                         "'byte' = hermetic utf-8 byte tokenizer (ids = "
                         "byte+3), for environments without downloadable "
                         "tokenizers — exercises the full harness with "
                         "locally-built checkpoints")
    ap.add_argument("--fused", action="store_true",
                    help="single-dispatch generation (one device "
                         "round-trip per request) — realistic serving "
                         "latency, but per-depth alpha detail is not "
                         "recorded (tau/speed ratio unaffected)")
    ap.add_argument("--draft-quant", choices=["none", "int8", "int4"],
                    default="none",
                    help="weight-only draft quantization (lossless; "
                         "ops/quant.py, ops/quant4.py)")
    ap.add_argument("--target-quant", choices=["none", "int8", "int4"],
                    default="none",
                    help="weight-only TARGET quantization — a serving "
                         "operating point: outputs are bit-exact vs the "
                         "quantized target's own vanilla decode, not the "
                         "bf16 target's")
    ap.add_argument("--kv-quant", choices=["none", "int8"], default="none",
                    help="int8 KV-cache storage (its own greedy==vanilla "
                         "operating point; halves decode KV streaming)")
    args = ap.parse_args(argv)

    from transformers import AutoTokenizer

    from ..config import EngineConfig
    from ..engine.engine import EagleEngine
    from ..models.hf_loader import load_draft, load_target
    from . import harness

    qfile = args.question_file or os.path.join(
        os.path.dirname(__file__), "..", "data", args.bench_name,
        "question.jsonl")
    questions = harness.load_questions(qfile, args.question_begin,
                                       args.question_end)

    if args.tokenizer == "byte":
        import numpy as np

        if args.model_type == "hf":
            ap.error("--tokenizer byte has no HF tokenizer to take a chat "
                     "template from; pick a named --model-type")
        tok = None
        eos_id = None

        def encode_fn(s, add_special=True):
            return np.frombuffer(s.encode("utf-8"),
                                 np.uint8).astype(np.int32) + 3

        def decode_fn(ids):
            b = np.clip(np.asarray(ids) - 3, 0, 255).astype(np.uint8)
            return bytes(b).decode("utf-8", errors="replace")
    else:
        tok = AutoTokenizer.from_pretrained(args.base_model_path)
        eos_id = tok.eos_token_id
    params, cfg = load_target(args.base_model_path)
    if args.mode == "eagle":
        assert args.ea_model_path, "--ea-model-path required for eagle mode"
        dparams, dcfg = load_draft(args.ea_model_path,
                                   version=3 if args.use_eagle3 else 1,
                                   target_embed=params["embed"]["w"])
    else:
        from ..models import draft as draft_mod
        from ..config import DraftConfig
        import jax

        dcfg = DraftConfig(version=1, hidden_size=cfg.hidden_size,
                           intermediate_size=cfg.intermediate_size,
                           num_q_heads=cfg.num_q_heads,
                           num_kv_heads=cfg.num_kv_heads,
                           head_dim=cfg.head_dim, vocab_size=cfg.vocab_size)
        dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(0))

    if args.target_quant == "int8":
        from ..ops.quant import quantize_target_params
        params = quantize_target_params(params)
    elif args.target_quant == "int4":
        from ..ops.quant4 import quantize_target_params4
        params = quantize_target_params4(params)
    ecfg = EngineConfig(total_tokens=args.total_token, depth=args.depth,
                        top_k=args.top_k, max_len=args.max_len,
                        temperature=args.temperature,
                        draft_quant=args.draft_quant,
                        kv_quant=args.kv_quant)
    engine = EagleEngine(params, cfg, dparams, dcfg, ecfg,
                         eos_token_id=eos_id)

    template = (harness.hf_chat_template(tok) if args.model_type == "hf"
                else harness.CHAT_TEMPLATES[args.model_type])
    if args.tokenizer != "byte":
        # templates carry their own special tokens — don't re-add BOS
        def encode_fn(s):
            return tok(s, return_tensors="np",
                       add_special_tokens=(args.model_type
                                           in ("vicuna", "llama2",
                                               "mixtral"))).input_ids[0]

        def decode_fn(ids):
            return tok.decode(ids, skip_special_tokens=True)
    records = harness.run_benchmark(
        harness.make_generate_fn(engine, args.mode, fused=args.fused),
        encode_fn=encode_fn,
        decode_fn=decode_fn,
        questions=questions,
        out_file=args.answer_file,
        model_id=args.model_id,
        max_new_tokens=args.max_new_tokens,
        template=template,
        shard=args.shard,
        num_shards=args.num_shards,
    )
    print(json.dumps(harness.summarize(records), indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
