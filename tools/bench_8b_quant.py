"""LLaMA-3.1-8B-architecture serving from ONE v5e chip via quantization.

The BASELINE.md north star is an 8B-class target; bf16 8B weights
(~16.1 GB) do not fit a 16 GB v5e-1, so the reference's flagship model
can only be served single-chip through the quantized operating points:
int8 (ops/quant.py, XLA int8-MXU dots) at ~8.6 GB or int4 (ops/quant4.py,
Pallas w4a8 kernel) at ~4.8 GB. This probe builds random device-side
trees at exact LLaMA-3.1-8B dims (V=128256, H=4096, L=32, F=14336,
32q/8kv heads, d=128; EAGLE-3 draft with the published 32000-entry
reduced draft vocab) and prices vanilla decode + the speculative round.
Round/step TIME is weight-value-independent, so random weights measure
what a real checkpoint would.

Run (one bits-width per process — the tunnel's lagging server-side frees
make back-to-back 8.5 GB + 4.8 GB trees in one process OOM):
    python tools/bench_8b_quant.py 8
    python tools/bench_8b_quant.py 4
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax
import jax.numpy as jnp

from _probe_common import PEAK_BW, retry, timed
from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig, RopeConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod

# exact LLaMA-3.1-8B dims
H, L, F, NQ, NKV, D, V = 4096, 32, 14336, 32, 8, 128, 128256
DV = 32000  # EAGLE-3 reduced draft vocab (traineagle3/config.json:22-23)

CFG = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                  num_layers=L, num_q_heads=NQ, num_kv_heads=NKV,
                  head_dim=D, rope=RopeConfig(theta=500000.0),
                  dtype=jnp.bfloat16)
DCFG = DraftConfig(version=3, hidden_size=H, intermediate_size=F,
                   num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
                   vocab_size=V, draft_vocab_size=DV, target_hidden_size=H,
                   dtype=jnp.bfloat16)


def build_quant_target(bits: int, seed=0):
    from _probe_common import device_quant_tree
    return device_quant_tree(bits, dims=(H, L, F, NQ, NKV, D, V), seed=seed)


def main():
    prompt = np.random.default_rng(0).integers(0, V, size=16).astype(np.int32)
    LO, HI = 16, 112
    which = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    for bits, dq in [(which, f"int{which}")]:
        t = time.time()
        qparams = build_quant_target(bits)
        qbytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(qparams))
        dparams = draft_mod.init_params(DCFG, jax.random.PRNGKey(1))
        dparams["embed"]["w"] = qparams["embed"]["w"]
        dbytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(dparams)) \
            - qparams["embed"]["w"].size * 2
        print(f"[8b] int{bits} 8B target: {qbytes/1e9:.2f} GB (+ draft "
              f"{dbytes/1e9:.2f} GB bf16) built in {time.time()-t:.0f}s",
              flush=True)
        ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                            kv_buckets=(256, 512), compact_impl="pallas",
                            draft_quant=dq)
        eng = EagleEngine(qparams, CFG, dparams, DCFG, ecfg)
        tv_lo = timed(lambda: retry(lambda: eng.generate_vanilla(
            prompt, max_new_tokens=LO, fused=True)), n=2)
        tv_hi = timed(lambda: retry(lambda: eng.generate_vanilla(
            prompt, max_new_tokens=HI, fused=True)), n=2)
        vstep = 1e3 * (tv_hi - tv_lo) / (HI - LO)
        mbu = (qbytes / (vstep / 1e3)) / PEAK_BW

        def run(budget):
            return retry(lambda: eng.generate_fused(
                prompt, max_new_tokens=budget, log=True))

        te_lo = timed(lambda: run(LO), n=2); o_lo = run(LO)
        te_hi = timed(lambda: run(HI), n=2); o_hi = run(HI)
        dr = max(o_hi[2] - o_lo[2], 1)
        round_ms = 1e3 * (te_hi - te_lo) / dr
        print(f"[8b] int{bits}+{dq}-draft: vanilla step {vstep:.2f}ms "
              f"(MBU {mbu:.2f}) | round {round_ms:.2f}ms | "
              f"tok/s@tau5={5*1e3/round_ms:.0f} "
              f"tok/s@tau7.7={7.7*1e3/round_ms:.0f} | "
              f"speedup@tau5={5*vstep/round_ms:.2f}x", flush=True)
        del eng, qparams, dparams


if __name__ == "__main__":
    main()
