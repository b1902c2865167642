"""B=1 tree-shape frontier on the int4 target (fastest serving point).

The beam loop is ~2 ms of the int4-target round; each depth level costs
one sequential draft step but raises the per-round commit bound
(depth+2). This measures (round_ms, forced-replay τ) for several
total_tokens/depth shapes on the stacked-int4 engine and prints the
implied tok/s at the measured τ AND at realistic τ' = min(5, bound) —
the serving-calibration story (`calibrate_total_tokens`) at B=1.

Run: python tools/probe_tree_b1.py  (real TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax

from _probe_common import CFG_4B, DCFG_4B, V, device_quant_tree, retry, timed
from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod

t = time.time()
qparams = device_quant_tree(4)
print(f"int4 target built in {time.time()-t:.0f}s", flush=True)
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]
prompt = np.random.default_rng(0).integers(0, V, size=16).astype(np.int32)
LO, HI = 16, 112

# forced replay needs a reference trajectory from THIS engine family
ecfg0 = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                     kv_buckets=(256, 512), draft_quant="int4")
eng0 = EagleEngine(qparams, CFG_4B, dparams, DCFG_4B, ecfg0)
ref = np.asarray(retry(lambda: eng0.generate_vanilla(
    prompt, max_new_tokens=160, fused=True)))

for tt, dd in ((63, 7), (63, 6), (47, 6), (47, 5), (31, 5)):
    eng = eng0.with_tree(total_tokens=tt, depth=dd)

    def run(budget):
        out, ntok, rounds, hits = retry(lambda: eng.generate_fused(
            prompt, max_new_tokens=budget, log=True, force_tokens=ref))
        return ntok, rounds

    n_lo, r_lo = run(LO)
    t_lo = timed(lambda: run(LO))
    n_hi, r_hi = run(HI)
    t_hi = timed(lambda: run(HI))
    dr = max(r_hi - r_lo, 1)
    round_ms = 1e3 * (t_hi - t_lo) / dr
    tau = (n_hi - n_lo) / dr
    tps = tau * 1e3 / round_ms
    tau5 = min(5.0, dd + 2)
    print(f"[treeB1] {tt}/d{dd}: round {round_ms:.2f} ms | tau {tau:.2f} "
          f"-> {tps:.0f} tok/s | @tau'={tau5:.0f}: "
          f"{tau5 * 1e3 / round_ms:.0f} tok/s", flush=True)
