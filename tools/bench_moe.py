"""MoE decode on real TPU: dense vs capacity expert dispatch at a ~2B
Mixtral-style target (8 experts, top-2), bf16 vs int8-quantized expert
banks (ops/quant.quantize_target_params now covers we_gate/we_up/we_down).
Validates two PARITY claims:
- dense dispatch is the right default at decode: with 64 tree tokens x
  top-2 routing, essentially every expert is hit every round, so all
  expert weights stream from HBM either way and capacity dispatch only
  adds scatter/gather overhead;
- quantizing the expert banks (8x the FFN weight footprint) is where
  weight-only int8 pays most — the int8 decode step should approach half
  the bf16 step (weight-streaming bound).
Run: python tools/bench_moe.py  (real TPU, ~15 min cold)
Measured 2026-08-17 (PARITY.md): 3.97 GB 8-expert top-2 target —
dense vanilla 5.37 ms (MBU 0.90), round 7.09 ms; capacity 5.43/7.31.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np
import jax, jax.numpy as jnp

from _probe_common import retry, timed
from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig, RopeConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer

H, L, F, NQ, NKV, D, V, E = 1536, 12, 4096, 12, 4, 128, 32000, 8
rng = np.random.default_rng(0)

prompt = rng.integers(0, V, size=16).astype(np.int32)
LO, HI = 16, 112
results = {}
for impl in ("dense", "capacity"):
    cfg = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                      num_layers=L, num_q_heads=NQ, num_kv_heads=NKV,
                      head_dim=D, rope=RopeConfig(theta=500000.0),
                      dtype=jnp.bfloat16, num_experts=E, experts_per_token=2,
                      moe_impl=impl)
    if impl == "dense":
        params = transformer.init_params(cfg, jax.random.PRNGKey(0))
        dcfg = DraftConfig(version=3, hidden_size=H, intermediate_size=F,
                           num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
                           vocab_size=V, target_hidden_size=H,
                           dtype=jnp.bfloat16)
        dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
        dparams["embed"]["w"] = params["embed"]["w"]
        nbytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(params))
        print(f"MoE target {nbytes/1e9:.2f} GB bf16", flush=True)
    ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                        kv_buckets=(256, 512))
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    tv_lo = timed(lambda: retry(lambda: eng.generate_vanilla(
        prompt, max_new_tokens=LO, fused=True)))
    tv_hi = timed(lambda: retry(lambda: eng.generate_vanilla(
        prompt, max_new_tokens=HI, fused=True)))
    vstep = 1e3 * (tv_hi - tv_lo) / (HI - LO)

    def run(budget):
        return retry(lambda: eng.generate_fused(prompt,
                                                max_new_tokens=budget,
                                                log=True))

    te_lo = timed(lambda: run(LO)); o_lo = run(LO)
    te_hi = timed(lambda: run(HI)); o_hi = run(HI)
    dr = max(o_hi[2] - o_lo[2], 1)
    round_ms = 1e3 * (te_hi - te_lo) / dr
    mbu = (nbytes / (vstep / 1e3)) / 819e9
    results[impl] = (vstep, round_ms)
    print(f"moe_impl={impl}: vanilla step {vstep:.2f}ms (MBU {mbu:.2f}) | "
          f"round {round_ms:.2f}ms | speedup@tau6 = "
          f"{6 * vstep / round_ms:.2f}x", flush=True)

# bit-exactness across dispatch impls is NOT expected (different reduction
# grouping); greedy spec==vanilla within each impl is what the test suite
# asserts. Here we just report both times.

# ---- int8-quantized expert banks (dense dispatch, the decode default).
# Quantize on the host (same discipline as bench.py targets), free the
# bf16 tree first so both don't co-reside.
from eagle_tpu.ops import quant

host_params = jax.tree.map(np.asarray, params)
del params, eng
qparams_h = quant.quantize_target_params(host_params)
del host_params
qparams = jax.tree.map(jnp.asarray, qparams_h)
del qparams_h
qbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(qparams))
print(f"int8 MoE target {qbytes/1e9:.2f} GB", flush=True)
cfg = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                  num_layers=L, num_q_heads=NQ, num_kv_heads=NKV,
                  head_dim=D, rope=RopeConfig(theta=500000.0),
                  dtype=jnp.bfloat16, num_experts=E, experts_per_token=2,
                  moe_impl="dense")
ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                    kv_buckets=(256, 512), draft_quant="int8")
eng = EagleEngine(qparams, cfg, dparams, dcfg, ecfg)

# greedy spec vs the quantized target's own vanilla decode. On a
# RANDOM-weight target the agreement is not bitwise on TPU: XLA regroups
# reductions differently for T=1 vs T=64 programs, and random weights have
# ulp-scale argmax margins (the same effect the main bench discloses as
# live_agreement≈0.87; real trained targets have real margins). The
# bitwise invariant is pinned by the CPU suite
# (tests/test_quant.py::test_int8_moe_target_greedy_bit_exact_within_engine);
# here we sanity-check the agreement fraction only.
# ref long enough for prompt + replay budget + one round's commit window
ref = retry(lambda: eng.generate_vanilla(prompt, max_new_tokens=80,
                                         fused=True))
# forced replay pins the committed trajectory to the vanilla reference;
# `hits` counts live verify-argmax agreement per committed token (a
# sequence-prefix comparison would read as total divergence after the
# FIRST ulp flip and tell us nothing)
_, ntok, _, hits = retry(lambda: eng.generate_fused(
    prompt, max_new_tokens=48, log=True, force_tokens=np.asarray(ref)))
agree = hits / max(ntok, 1)
assert agree > 0.5, f"int8 MoE verify/vanilla agreement collapsed: {agree}"
print(f"int8 MoE verify/vanilla live agreement {agree:.3f} "
      f"(random-weight ulp flips expected; CPU suite pins bitwise)",
      flush=True)

tv_lo = timed(lambda: retry(lambda: eng.generate_vanilla(
    prompt, max_new_tokens=LO, fused=True)))
tv_hi = timed(lambda: retry(lambda: eng.generate_vanilla(
    prompt, max_new_tokens=HI, fused=True)))
vstep_q = 1e3 * (tv_hi - tv_lo) / (HI - LO)
te_lo = timed(lambda: run(LO)); o_lo = run(LO)
te_hi = timed(lambda: run(HI)); o_hi = run(HI)
dr = max(o_hi[2] - o_lo[2], 1)
round_q = 1e3 * (te_hi - te_lo) / dr
mbu_q = (qbytes / (vstep_q / 1e3)) / 819e9
print(f"moe int8 dense: vanilla step {vstep_q:.2f}ms (MBU {mbu_q:.2f}; "
      f"bf16 was {results['dense'][0]:.2f}ms) | round {round_q:.2f}ms | "
      f"speedup@tau6 = {6 * vstep_q / round_q:.2f}x", flush=True)

# ---- int4 experts (expert-axis fold, dense dispatch; ops/quant4.py)
del eng, qparams
from eagle_tpu.ops import quant4

# rebuild the bf16 tree to quantize int4 (the earlier host copy was
# freed); the deterministic seed reproduces it exactly
cfg_d = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                    num_layers=L, num_q_heads=NQ, num_kv_heads=NKV,
                    head_dim=D, rope=RopeConfig(theta=500000.0),
                    dtype=jnp.bfloat16, num_experts=E, experts_per_token=2,
                    moe_impl="dense")
params2 = transformer.init_params(cfg_d, jax.random.PRNGKey(0))
host2 = jax.tree.map(np.asarray, params2)
del params2
q4_h = quant4.quantize_target_params4(host2)
del host2
q4params = jax.tree.map(jnp.asarray, q4_h)
del q4_h
q4bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(q4params))
print(f"int4 MoE target {q4bytes/1e9:.2f} GB", flush=True)
ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                    kv_buckets=(256, 512), draft_quant="int4")
eng = EagleEngine(q4params, cfg_d, dparams, dcfg, ecfg)
ref = retry(lambda: eng.generate_vanilla(prompt, max_new_tokens=80,
                                         fused=True))
_, ntok, _, hits = retry(lambda: eng.generate_fused(
    prompt, max_new_tokens=48, log=True, force_tokens=np.asarray(ref)))
agree = hits / max(ntok, 1)
assert agree > 0.5, f"int4 MoE verify/vanilla agreement collapsed: {agree}"
print(f"int4 MoE verify/vanilla live agreement {agree:.3f}", flush=True)
tv_lo = timed(lambda: retry(lambda: eng.generate_vanilla(
    prompt, max_new_tokens=LO, fused=True)))
tv_hi = timed(lambda: retry(lambda: eng.generate_vanilla(
    prompt, max_new_tokens=HI, fused=True)))
vstep_q4 = 1e3 * (tv_hi - tv_lo) / (HI - LO)
te_lo = timed(lambda: run(LO)); o_lo = run(LO)
te_hi = timed(lambda: run(HI)); o_hi = run(HI)
dr = max(o_hi[2] - o_lo[2], 1)
round_q4 = 1e3 * (te_hi - te_lo) / dr
mbu_q4 = (q4bytes / (vstep_q4 / 1e3)) / 819e9
print(f"moe int4 dense: vanilla step {vstep_q4:.2f}ms (MBU {mbu_q4:.2f}; "
      f"int8 was {vstep_q:.2f}ms, bf16 {results['dense'][0]:.2f}ms) | "
      f"round {round_q4:.2f}ms | speedup@tau6 = "
      f"{6 * vstep_q4 / round_q4:.2f}x", flush=True)
