"""End-to-end speculative-decoding benchmark on real TPU hardware.

Measures wall-clock speedup of the EAGLE engine over vanilla autoregressive
decoding — the reference's headline metric (speed ratio methodology:
/root/reference/eagle/evaluation/speed.py:16-50). No public checkpoints are
reachable in this environment, so the draft head is distilled on-device
against the target's own generations (the EAGLE-3 TTT objective) before
measuring; τ and both token rates are reported on stderr.

Prints exactly ONE JSON line on stdout:
  {"metric": "e2e_speedup_vs_vanilla", "value": S, "unit": "x",
   "vs_baseline": S / 3.0}
vs_baseline is relative to the BASELINE.md north-star (≥3× over vanilla).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig, RopeConfig
    from eagle_tpu.engine.engine import EagleEngine
    from eagle_tpu.models import draft as draft_mod
    from eagle_tpu.models import transformer
    from eagle_tpu.train import ttt

    t0 = time.time()
    # ~1B-class target (memory-bound decode → realistic speculation payoff)
    H = 2048
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=H, intermediate_size=8192,
        num_layers=16, num_q_heads=32, num_kv_heads=8, head_dim=64,
        rope=RopeConfig(theta=500000.0), dtype=jnp.bfloat16,
    )
    dcfg = DraftConfig(
        version=3, hidden_size=H, intermediate_size=8192, num_q_heads=32,
        num_kv_heads=8, head_dim=64, vocab_size=32000, target_hidden_size=H,
        dtype=jnp.bfloat16,
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    # sharpen the head so the random target is peaked (≈ a real LLM's
    # confidence profile); without this a random net is near-uniform and no
    # draft could speculate it.
    params["lm_head"] = params["lm_head"] * 8.0
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
    dparams["embed"]["w"] = params["embed"]["w"]
    ecfg = EngineConfig(total_tokens=48, depth=5, top_k=8, max_len=1024)
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    log(f"[bench] setup {time.time()-t0:.1f}s; devices={jax.devices()}")

    # ---- corpus: the target's own greedy continuations
    t1 = time.time()
    rng = np.random.default_rng(0)
    T_train = 128
    prompts = [rng.integers(0, cfg.vocab_size, size=(8,)) for _ in range(8)]
    corpus = []
    for p in prompts:
        seq = eng.generate_vanilla(p, max_new_tokens=T_train - len(p), fused=True)
        corpus.append(seq[:T_train])
    data = np.stack(corpus).astype(np.int32)
    log(f"[bench] corpus {time.time()-t1:.1f}s")

    # ---- distill the draft (TTT objective)
    t2 = time.time()
    tcfg = ttt.TrainConfig(length=4, lr=3e-3, warmup_steps=10,
                           total_steps=2000)
    opt = ttt.make_optimizer(tcfg)
    trainable, _ = ttt.partition_trainable(dparams)
    opt_state = opt.init(trainable)
    batch = {
        "input_ids": jnp.asarray(data),
        "loss_mask": jnp.ones(data.shape, jnp.float32),
        "pad_mask": jnp.ones(data.shape, bool),
    }
    step = jax.jit(lambda dp, os, tp, b: ttt.train_step(
        dp, os, tp, cfg, dcfg, tcfg, opt, b))
    m = None
    for i in range(150):
        dparams, opt_state, m = step(dparams, opt_state, params, batch)
    log(f"[bench] distill {time.time()-t2:.1f}s  acc={np.asarray(m.accs)}")
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)

    # ---- measure
    NEW = 256
    test_prompt = rng.integers(0, cfg.vocab_size, size=(16,))

    def timed(fn):
        fn()  # warmup/compile
        t = time.time()
        r = fn()
        return time.time() - t, r

    tv, _ = timed(lambda: eng.generate_vanilla(test_prompt,
                                               max_new_tokens=NEW,
                                               fused=True))
    te, (out, ntok, rounds) = timed(lambda: eng.generate(
        test_prompt, max_new_tokens=NEW, log=True))
    tau = ntok / max(rounds, 1)
    vanilla_tps = NEW / tv
    eagle_tps = ntok / te
    speedup = eagle_tps / vanilla_tps
    log(f"[bench] vanilla {vanilla_tps:.1f} tok/s | eagle {eagle_tps:.1f} "
        f"tok/s | tau={tau:.2f} | speedup={speedup:.2f}x | total "
        f"{time.time()-t0:.0f}s")

    print(json.dumps({
        "metric": "e2e_speedup_vs_vanilla",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 3.0, 3),
    }))


if __name__ == "__main__":
    main()
