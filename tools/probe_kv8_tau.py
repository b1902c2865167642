"""Does int8 KV storage cost acceptance quality? (evidence probe)

The int8-KV operating point is bit-exact vs its own vanilla decode by
construction; the quality question is different: the target's features
(draft inputs) and its argmax trajectory shift slightly under KV
quantization. This probe loads the bench's cached corpus + 200-step
distilled draft (.bench_cache) and runs the forced-replay measurement
(bench.py methodology) with kv_quant none vs int8 on the SAME rows:

- τ (forced replay): sensitive to the draft's inputs — the EAGLE-3 taps
  come from the target forward, so int8-KV-perturbed features change what
  the draft proposes;
- live_agreement: how often the live target argmax agrees with the bf16
  reference trajectory — the direct target-fidelity signal under int8 KV.

Run AFTER a bench run has populated .bench_cache (same config key).
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from _probe_common import retry, timed
from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig, RopeConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer

# exactly bench.py's 4B config + corpus/draft cache keys
H, L, F, NQ, NKV, D, V = 3072, 28, 12288, 24, 8, 128, 32000
B, Lp, T_gen, TRAIN_ROWS = 16, 16, 160, 12
SNAPS = (12, 40, 200)
CACHE = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
LO, HI = 16, 112


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                      num_layers=L, num_q_heads=NQ, num_kv_heads=NKV,
                      head_dim=D, rope=RopeConfig(theta=500000.0),
                      dtype=jnp.bfloat16)
    dcfg = DraftConfig(version=3, hidden_size=H, intermediate_size=F,
                       num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
                       vocab_size=V, target_hidden_size=H,
                       dtype=jnp.bfloat16)
    cfg_key = hashlib.sha1(json.dumps(
        [H, L, F, NQ, NKV, D, V, B, Lp, T_gen, TRAIN_ROWS,
         list(SNAPS)]).encode()).hexdigest()[:12]
    corpus = np.load(os.path.join(CACHE, f"corpus_{cfg_key}.npz"))["data"]
    digest = hashlib.sha1(corpus.tobytes()).hexdigest()[:12]
    dz = np.load(os.path.join(CACHE, f"draft_s200_{digest}_{cfg_key}.npz"))

    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    params["lm_head"] = params["lm_head"] * 8.0
    dtempl = jax.eval_shape(
        lambda: draft_mod.init_params(dcfg, jax.random.PRNGKey(1)))
    import ml_dtypes
    tleaves, tdef = jax.tree.flatten(dtempl)
    leaves = []
    for i, sd in enumerate(tleaves):
        a = dz[f"a{i}"]
        if str(sd.dtype) == "bfloat16":
            a = a.view(ml_dtypes.bfloat16)
        assert tuple(a.shape) == tuple(sd.shape), (i, a.shape, sd.shape)
        leaves.append(jnp.asarray(a))
    dparams = jax.tree.unflatten(tdef, leaves)

    prompts = corpus[:, :Lp]
    out = {}
    for kvq in ("none", "int8"):
        ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10,
                            max_len=1024, kv_buckets=(256, 512),
                            compact_impl="xla", kv_quant=kvq)
        eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
        taus, rounds_ms, lives = [], [], []
        for pi in (0, 1, 2):
            fk = dict(force_tokens=corpus[pi])

            def run(budget, eng=eng, pi=pi, fk=fk):
                return retry(lambda: eng.generate_fused(
                    prompts[pi], max_new_tokens=budget, log=True, **fk))

            te_lo = timed(lambda: run(LO), n=2)
            te_hi = timed(lambda: run(HI), n=2)
            _, n_lo, r_lo, _ = run(LO)
            _, n_hi, r_hi, h_hi = run(HI)
            dr = max(r_hi - r_lo, 1)
            taus.append((n_hi - n_lo) / dr)
            rounds_ms.append(1e3 * (te_hi - te_lo) / dr)
            lives.append(h_hi / max(n_hi, 1))
        out[kvq] = {"tau": round(float(np.median(taus)), 2),
                    "round_ms": round(float(np.median(rounds_ms)), 2),
                    "live_agreement": round(float(np.median(lives)), 3)}
        log(f"[kv8tau] kv={kvq}: {out[kvq]}")
        del eng
    print(json.dumps({"metric": "kv_int8_quality", **out}))


if __name__ == "__main__":
    main()
