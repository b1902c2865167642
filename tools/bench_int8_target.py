"""int8-TARGET operating point at 4B scale — host-built weights.

Builds the target param tree directly on the host (numpy; the tunnel's
device->host pull of an 8GB tree is pathologically slow), quantizes on
host, uploads ONLY the int8 tree. Values differ from the bench target but
round/vanilla-step TIME is weight-value-independent.

Run: python tools/bench_int8_target.py  (real TPU, ~15 min cold)
Measured 2026-08-17 (PARITY.md): int8 target 4.17 GB, vanilla step
6.05 ms (MBU 0.84), round 9.5 ms with the int8 draft -> 811 tok/s at
tau=7.7 on one v5e chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import ml_dtypes
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig, RopeConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.ops.quant import quantize_target_params

H, L, F, NQ, NKV, D, V = 3072, 28, 12288, 24, 8, 128, 32000
cfg = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                  num_layers=L, num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
                  rope=RopeConfig(theta=500000.0), dtype=jnp.bfloat16)
dcfg = DraftConfig(version=3, hidden_size=H, intermediate_size=F,
                   num_q_heads=NQ, num_kv_heads=NKV, head_dim=D, vocab_size=V,
                   target_hidden_size=H, dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
bf16 = ml_dtypes.bfloat16


def rnd(*shape, scale=0.02):
    return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(bf16)


hp = {
    "embed": {"w": rnd(V, H)},
    "layers": {
        "ln1": np.ones((L, H), bf16), "ln2": np.ones((L, H), bf16),
        "wq": rnd(L, H, NQ * D), "wk": rnd(L, H, NKV * D),
        "wv": rnd(L, H, NKV * D), "wo": rnd(L, NQ * D, H),
        "w_gate": rnd(L, H, F), "w_up": rnd(L, H, F),
        "w_down": rnd(L, F, H),
    },
    "final_norm": np.ones((H,), bf16),
    "lm_head": (rnd(H, V, scale=0.16)),
}
t = time.time()
qhost = quantize_target_params(hp)
print(f"host quantize {time.time()-t:.0f}s", file=sys.stderr, flush=True)
del hp
t = time.time()
qparams = jax.tree.map(jnp.asarray, qhost)
jax.block_until_ready(qparams)
del qhost
qbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(qparams))
print(f"int8 target uploaded {qbytes/1e9:.2f} GB in {time.time()-t:.0f}s",
      flush=True)
dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]

prompt = rng.integers(0, V, size=16).astype(np.int32)
LO, HI = 16, 112
PEAK_BW = 819e9


def retry(fn, tries=3, wait=45):
    for i in range(tries):
        try:
            return fn()
        except Exception as e:
            if ("RESOURCE_EXHAUSTED" not in str(e)
                    and "FAILED_PRECONDITION" not in str(e)) or i == tries - 1:
                raise
            print(f"transient, retry in {wait}s", file=sys.stderr, flush=True)
            time.sleep(wait)


def timed(fn, n=3):
    fn()
    best = float("inf")
    for _ in range(n):
        t = time.time(); fn(); best = min(best, time.time() - t)
    return best


for dq in ("none", "int8"):
    ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                        kv_buckets=(256, 512), compact_impl="pallas",
                        draft_quant=dq)
    eng = EagleEngine(qparams, cfg, dparams, dcfg, ecfg)
    tv_lo = timed(lambda: retry(lambda: eng.generate_vanilla(
        prompt, max_new_tokens=LO, fused=True)))
    tv_hi = timed(lambda: retry(lambda: eng.generate_vanilla(
        prompt, max_new_tokens=HI, fused=True)))
    vstep = 1e3 * (tv_hi - tv_lo) / (HI - LO)
    mbu = (qbytes / (vstep / 1e3)) / PEAK_BW

    def run(budget):
        return retry(lambda: eng.generate_fused(prompt, max_new_tokens=budget,
                                                log=True))

    te_lo = timed(lambda: run(LO)); o_lo = run(LO)
    te_hi = timed(lambda: run(HI)); o_hi = run(HI)
    dr = max(o_hi[2] - o_lo[2], 1)
    round_ms = 1e3 * (te_hi - te_lo) / dr
    print(f"draft_quant={dq}: vanilla step {vstep:.2f}ms (MBU {mbu:.2f}) | "
          f"round {round_ms:.2f}ms | tok/s@tau7.7={7.7*1e3/round_ms:.0f} | "
          f"speedup@tau7.7={7.7*vstep/round_ms:.2f}x", flush=True)
