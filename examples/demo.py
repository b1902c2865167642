"""Self-contained demo of the full framework on a tiny random model.

Runs anywhere (CPU or TPU):
  python examples/demo.py

1. Builds a tiny llama-style target + EAGLE-3 draft head.
2. Distills the draft on the target's own generations (TTT trainer).
3. Compares vanilla decoding vs speculative decoding (greedy must match
   bit-for-bit) and prints τ / per-round acceptance.
4. Shows sampled generation, batched generation, and the continuous-batching
   servers (dense slots + the paged-KV page-pool server, which must produce
   bit-identical outputs).
For real checkpoints, see EagleEngine.from_pretrained in the README.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if os.environ.get("DEMO_CPU"):
    # quick CPU drive (the environment's sitecustomize pins the remote TPU
    # plugin regardless of JAX_PLATFORMS; this is the documented override)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.engine.server import EagleServer
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer
from eagle_tpu.train import ttt


def main():
    H = 64
    cfg = ModelConfig(vocab_size=512, hidden_size=H, intermediate_size=128,
                      num_layers=4, num_q_heads=4, num_kv_heads=2,
                      head_dim=16, dtype=jnp.float32)
    dcfg = DraftConfig(version=3, hidden_size=H, intermediate_size=128,
                       num_q_heads=4, num_kv_heads=2, head_dim=16,
                       vocab_size=512, target_hidden_size=H,
                       dtype=jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = transformer.init_params(cfg, k1)
    params["lm_head"] = params["lm_head"] * 8.0   # peaked, LLM-like
    dparams = draft_mod.init_params(dcfg, k2)
    dparams["embed"]["w"] = params["embed"]["w"]
    ecfg = EngineConfig(total_tokens=23, depth=4, top_k=5, max_len=512)
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)

    print("== distilling draft head on target self-generations ...")
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, size=(4,)) for _ in range(8)]
    corpus = np.stack([
        eng.generate_vanilla(p, max_new_tokens=44)[:48] for p in prompts
    ]).astype(np.int32)
    tcfg = ttt.TrainConfig(length=4, lr=1e-2, warmup_steps=10,
                           total_steps=2000)
    opt = ttt.make_optimizer(tcfg)
    trainable, _ = ttt.partition_trainable(dparams)
    opt_state = opt.init(trainable)
    batch = {"input_ids": jnp.asarray(corpus),
             "loss_mask": jnp.ones(corpus.shape, jnp.float32),
             "pad_mask": jnp.ones(corpus.shape, bool)}
    step = jax.jit(lambda dp, os_, tp, b: ttt.train_step(
        dp, os_, tp, cfg, dcfg, tcfg, opt, b))
    for i in range(250):
        dparams, opt_state, m = step(dparams, opt_state, params, batch)
    print(f"   per-step draft accuracy: {np.round(np.asarray(m.accs), 3)}")
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)

    prompt = corpus[0, :6]
    print("\n== greedy: speculative vs vanilla (must match bit-for-bit)")
    t0 = time.time()
    ref = eng.generate_vanilla(prompt, max_new_tokens=40)
    t_v = time.time() - t0
    t0 = time.time()
    out, ntok, rounds = eng.generate(prompt, max_new_tokens=40, log=True)
    t_e = time.time() - t0
    assert np.array_equal(out[: len(ref)], ref[: len(out)]), "MISMATCH!"
    print(f"   match ✓  τ = {ntok / rounds:.2f} tokens/round "
          f"({rounds} rounds for {ntok} tokens)")
    print(f"   wall: vanilla {t_v*1e3:.0f}ms, eagle {t_e*1e3:.0f}ms "
          f"(tiny-model timings are dispatch-bound; see bench.py for real "
          f"hardware numbers)")

    print("\n== int4 draft quantization (lossless: outputs unchanged)")
    ecfg_q = EngineConfig(total_tokens=23, depth=4, top_k=5, max_len=512,
                          draft_quant="int4")
    eng_q = EagleEngine(params, cfg, dparams, dcfg, ecfg_q)
    out_q, ntok_q, rounds_q = eng_q.generate(prompt, max_new_tokens=40,
                                             log=True)
    assert np.array_equal(out_q[: len(ref)], ref[: len(out_q)]), "MISMATCH!"
    print(f"   match ✓  τ = {ntok_q / rounds_q:.2f} tokens/round with the "
          f"w4a8 draft (quantizing the PROPOSER can lower τ, never change "
          f"outputs)")

    print("\n== int8 target quantization (serving operating point)")
    from eagle_tpu.ops.quant import quantize_target_params
    qparams = quantize_target_params(params)
    eng_t = EagleEngine(qparams, cfg, dparams, dcfg, ecfg)
    ref_t = eng_t.generate_vanilla(prompt, max_new_tokens=30)
    out_t = eng_t.generate(prompt, max_new_tokens=30)
    assert np.array_equal(out_t[: len(ref_t)], ref_t[: len(out_t)])
    print("   match ✓  speculative == the int8 target's own vanilla decode "
          "(a different model than bf16, internally bit-exact)")

    print("\n== int8 KV cache (halves decode KV streaming)")
    ecfg_kv = EngineConfig(total_tokens=23, depth=4, top_k=5, max_len=512,
                           kv_quant="int8")
    eng_kv = EagleEngine(params, cfg, dparams, dcfg, ecfg_kv)
    ref_kv = eng_kv.generate_vanilla(prompt, max_new_tokens=30)
    out_kv = eng_kv.generate(prompt, max_new_tokens=30)
    assert np.array_equal(out_kv[: len(ref_kv)], ref_kv[: len(out_kv)])
    print("   match ✓  speculative == the int8-KV engine's own vanilla "
          "decode (KV rows stored int8 + per-row scales)")

    print("\n== sampled generation (temperature 0.8, lossless)")
    ecfg_s = EngineConfig(total_tokens=23, depth=4, top_k=5, max_len=512,
                          temperature=0.8)
    eng_s = EagleEngine(params, cfg, dparams, dcfg, ecfg_s)
    for seed in (1, 2):
        o = eng_s.generate(prompt, max_new_tokens=12, seed=seed)
        print(f"   seed {seed}: {o[len(prompt):]}")

    print("\n== sampled candidates + true-q acceptance on DYNAMIC trees")
    ecfg_tq = EngineConfig(total_tokens=23, depth=4, top_k=5, max_len=512,
                           temperature=0.8, acceptance="true_q_dynamic")
    eng_tq = EagleEngine(params, cfg, dparams, dcfg, ecfg_tq)
    o, ntq, rtq = eng_tq.generate(prompt, max_new_tokens=16, log=True)
    print(f"   two-pass drafting (shape from the deterministic beam, "
          f"candidates drawn without replacement): τ = {ntq / rtq:.2f}")

    print("\n== batched generation (one dispatch, per-sequence finish)")
    outs = eng.generate_batch_fused([corpus[0, :6], corpus[1, :4]],
                                    max_new_tokens=16)
    for i, o in enumerate(outs):
        print(f"   seq {i}: {len(o)} tokens")

    print("\n== continuous-batching server (staggered requests)")
    srv = EagleServer(eng, max_batch=2)
    r0 = srv.submit(corpus[0, :6], 12)
    srv.step()
    r1 = srv.submit(corpus[2, :6], 12)
    done = srv.run()
    print(f"   finished: { {k: len(v) for k, v in done.items()} }")

    print("\n== paged-KV server (shared page pool, same outputs)")
    from eagle_tpu.engine.paged import PagedEagleServer
    psrv = PagedEagleServer(eng, max_batch=2, page_size=16)
    p0 = psrv.submit(corpus[0, :6], 12)
    p1 = psrv.submit(corpus[2, :6], 12)
    pdone = psrv.run()
    assert all(np.array_equal(pdone[p], done[r])
               for p, r in ((p0, r0), (p1, r1))), "paged != dense outputs"
    print(f"   pool {psrv.pool_bytes / 1e6:.1f} MB, outputs bit-identical "
          "to the dense server")

    print("\n== automatic prefix caching (shared system prompt)")
    stem = corpus[1, :32]  # two full 16-row pages of shared prefix
    q1 = np.concatenate([stem, corpus[0, :3]])
    q2 = np.concatenate([stem, corpus[2, :2]])
    ref2 = eng.generate(q2, max_new_tokens=10)
    c1 = psrv.submit(q1, 10)
    psrv.run()
    c2 = psrv.submit(q2, 10)
    got = psrv.run()[c2]
    assert psrv.store.hits >= 1, "prefix not adopted"
    assert np.array_equal(got, ref2), "prefix-cached output differs"
    print(f"   request 2 adopted {psrv.store.reused_tokens} cached prefix "
          "tokens; output bit-identical to from-scratch")
    print("\nAll demo stages OK.")


if __name__ == "__main__":
    main()
