"""int8-TARGET operating point at 4B scale — device-built weights.

Builds a random int8 target tree directly on device
(tools/_probe_common.py:device_int8_params_4b — same leaf structure as
ops/quant.quantize_target_params). Values differ from the bench target but
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
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np
import jax

from _probe_common import (CFG_4B, DCFG_4B, PEAK_BW, V,
                           batched_round_ms,
                           device_int8_params_4b, retry, timed)
from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod

t = time.time()
qparams = device_int8_params_4b()
qbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(qparams))
print(f"int8 target built on device: {qbytes/1e9:.2f} GB in "
      f"{time.time()-t:.0f}s", flush=True)
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]

prompt = np.random.default_rng(0).integers(0, V, size=16).astype(np.int32)
LO, HI = 16, 112

for dq in ("none", "int8"):
    ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                        kv_buckets=(256, 512), compact_impl="pallas",
                        draft_quant=dq)
    eng = EagleEngine(qparams, CFG_4B, dparams, DCFG_4B, ecfg)
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

# ---- batched serving round (B=8): the batched verify is MXU-bound, so a
# quantized target's int8/int4 dots price it differently than bf16; report
# the round time and the aggregate tok/s it implies at tau=7.7
for B in (8,):
    rb = batched_round_ms(eng, V, B)
    print(f"B={B} serving round {rb:.2f}ms | aggregate tok/s@tau7.7="
          f"{B * 7.7 * 1e3 / rb:.0f}", flush=True)
