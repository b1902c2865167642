"""Run the MT-bench eval harness END-TO-END on the real TPU (VERDICT r3 #4).

The reference's acceptance benchmark is the eval-script pipeline
(gen_ea_answer_* + gen_baseline_answer_* + speed.py); this drives our
equivalent (evaluation/cli.py) through the full product surface on
hardware: HF-style checkpoint directories on disk -> loader -> engine ->
chat template -> fastchat jsonl -> speed_ratio + per-depth alpha.

Zero egress means no real checkpoints or tokenizers: the target is a
llama-3.2-1B-class random-weight model exported via
train.checkpoint.export_target_safetensors, the tokenizer is the CLI's
hermetic byte mode, and the draft is distilled on-device against the
target's own greedy continuations of the MT-bench prompts (the same
emulation methodology as bench.py, whose docstring explains why a
random-weight target caps free-running τ near 1: there is no language to
learn and bf16 argmax margins are ulp-scale — the POINT here is that the
eval surface runs on hardware and the ratio methodology works, not the
τ itself).

Stages (each skipped if its artifact already exists):
  1. export target checkpoint        -> eval_artifacts/target_1b/
  2. distill + export EAGLE-3 draft  -> eval_artifacts/draft_1b/
  3. evaluation.cli --mode eagle     -> eval_artifacts/mt_bench_eagle.jsonl
  4. evaluation.cli --mode baseline  -> eval_artifacts/mt_bench_baseline.jsonl
  5. speed ratio + summaries         -> eval_artifacts/summary.json

Run: python tools/run_mtbench_tpu.py [--questions 20] [--max-new 128]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ART = os.path.join(os.path.dirname(__file__), "..", "eval_artifacts")
TARGET_DIR = os.path.join(ART, "target_1b")
DRAFT_DIR = os.path.join(ART, "draft_1b")


def log(*a):
    print("[mtbench]", *a, flush=True)


def build_cfgs():
    from eagle_tpu.config import DraftConfig, ModelConfig, RopeConfig

    cfg = ModelConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=8192,
        num_layers=16, num_q_heads=32, num_kv_heads=8, head_dim=64,
        rope=RopeConfig(theta=500000.0), dtype=jnp.bfloat16,
    )
    dcfg = DraftConfig(
        version=3, hidden_size=2048, intermediate_size=8192, num_q_heads=32,
        num_kv_heads=8, head_dim=64, vocab_size=32000,
        target_hidden_size=2048, dtype=jnp.bfloat16,
    )
    return cfg, dcfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--questions", type=int, default=20)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--distill-steps", type=int, default=200)
    args = ap.parse_args()

    from eagle_tpu.config import EngineConfig
    from eagle_tpu.engine.engine import EagleEngine
    from eagle_tpu.evaluation import harness
    from eagle_tpu.models import draft as draft_mod
    from eagle_tpu.models import transformer
    from eagle_tpu.train import ttt
    from eagle_tpu.train.checkpoint import (export_draft_safetensors,
                                            export_target_safetensors)

    cfg, dcfg = build_cfgs()
    os.makedirs(ART, exist_ok=True)

    # ---- 1. target checkpoint
    if not os.path.exists(os.path.join(TARGET_DIR, "model.safetensors")):
        t0 = time.time()
        params = transformer.init_params(cfg, jax.random.PRNGKey(0))
        params["lm_head"] = params["lm_head"] * 8.0  # peaked head (bench.py)
        export_target_safetensors(params, cfg, TARGET_DIR)
        log(f"target exported {time.time()-t0:.0f}s -> {TARGET_DIR}")
    else:
        params = None
        log("target checkpoint exists")

    # ---- 2. draft distillation on MT-bench-prompt continuations
    if not os.path.exists(os.path.join(DRAFT_DIR, "model.safetensors")):
        if params is None:
            from eagle_tpu.models.hf_loader import load_target
            params, _ = load_target(TARGET_DIR)
        dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
        dparams["embed"]["w"] = params["embed"]["w"]
        qfile = os.path.join(os.path.dirname(__file__), "..", "eagle_tpu",
                             "data", "mt_bench", "question.jsonl")
        questions = harness.load_questions(qfile, None, args.questions)
        tmpl = harness.CHAT_TEMPLATES["vicuna"]
        texts = [tmpl([q["turns"][0]], []) for q in questions[:12]]

        def enc(s):
            return (np.frombuffer(s.encode("utf-8"), np.uint8)
                    .astype(np.int32) + 3)[:160]

        ecfg = EngineConfig(total_tokens=59, depth=5, top_k=10, max_len=512)
        eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
        T = 256  # prompt prefix + continuation per training row
        rows = []
        t0 = time.time()
        for s in texts:
            p = enc(s)
            out = eng.generate_vanilla(p, max_new_tokens=T - len(p) + 32,
                                       fused=True)
            rows.append(np.asarray(out[:T], np.int32))
        data = np.stack([np.pad(r, (0, T - len(r))) for r in rows])
        log(f"distill corpus {data.shape} {time.time()-t0:.0f}s")

        tcfg = ttt.TrainConfig(length=7, lr=3e-3, warmup_steps=10,
                               total_steps=2000)
        opt = ttt.make_optimizer(tcfg)
        step = jax.jit(lambda dp, os_, tp, b: ttt.train_step(
            dp, os_, tp, cfg, dcfg, tcfg, opt, b), donate_argnums=(0, 1))
        dparams_t = jax.tree.map(lambda x: jnp.array(x, copy=True),
                                 dict(dparams))
        opt_state = opt.init(ttt.partition_trainable(dparams_t)[0])
        halves = [data[:6], data[6:]]
        t0 = time.time()
        m = None
        for i in range(args.distill_steps):
            b = halves[i % 2]
            batch = {"input_ids": jnp.asarray(b),
                     "loss_mask": jnp.ones(b.shape, jnp.float32),
                     "pad_mask": jnp.ones(b.shape, bool)}
            dparams_t, opt_state, m = step(dparams_t, opt_state, params,
                                           batch)
            jax.block_until_ready(m.accs)
        log(f"distilled {args.distill_steps} steps {time.time()-t0:.0f}s "
            f"acc={np.asarray(m.accs)}")
        export_draft_safetensors(dparams_t, 3,
                                 os.path.join(DRAFT_DIR,
                                              "model.safetensors"))
        dconf = {
            "hidden_size": dcfg.hidden_size,
            "intermediate_size": dcfg.intermediate_size,
            "num_attention_heads": dcfg.num_q_heads,
            "num_key_value_heads": dcfg.num_kv_heads,
            "head_dim": dcfg.head_dim,
            "vocab_size": dcfg.vocab_size,
            "target_hidden_size": dcfg.target_hidden_size,
            "rope_theta": dcfg.rope.theta,
            "draft_vocab_size": 0,
        }
        with open(os.path.join(DRAFT_DIR, "config.json"), "w") as f:
            json.dump(dconf, f, indent=2)
        log(f"draft exported -> {DRAFT_DIR}")
        del dparams_t, opt_state, eng, params

    # ---- 3+4. the eval CLI, eagle then baseline (fresh process state is
    # not needed — the CLI builds its own engine; we call main() in-proc)
    from eagle_tpu.evaluation.cli import main as cli_main

    common = ["--base-model-path", TARGET_DIR,
              "--bench-name", "mt_bench",
              "--question-end", str(args.questions),
              "--model-type", "vicuna", "--tokenizer", "byte",
              "--total-token", "59", "--depth", "5", "--top-k", "10",
              "--max-new-tokens", str(args.max_new),
              "--max-len", "2048"]
    eagle_file = os.path.join(ART, "mt_bench_eagle.jsonl")
    base_file = os.path.join(ART, "mt_bench_baseline.jsonl")
    if not os.path.exists(eagle_file):
        t0 = time.time()
        log("eval: eagle pass ...")
        cli_main(common + ["--mode", "eagle", "--use-eagle3",
                           "--ea-model-path", DRAFT_DIR,
                           "--model-id", "eagle-tpu-1b",
                           "--answer-file", eagle_file])
        log(f"eagle pass {time.time()-t0:.0f}s")
    if not os.path.exists(base_file):
        t0 = time.time()
        log("eval: baseline pass ...")
        cli_main(common + ["--mode", "baseline",
                           "--model-id", "baseline-1b",
                           "--answer-file", base_file])
        log(f"baseline pass {time.time()-t0:.0f}s")

    # ---- 5. speed ratio + summaries (speed.py:16-50 + alpha.py analogs)
    ratio = harness.speed_ratio(eagle_file, base_file)
    summary = {
        "speed_ratio": ratio,
        "eagle": harness.summarize(
            [json.loads(l) for l in open(eagle_file)]),
        "baseline": harness.summarize(
            [json.loads(l) for l in open(base_file)]),
    }
    with open(os.path.join(ART, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log("summary:", json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
