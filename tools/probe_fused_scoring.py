"""A/B the fused score+topk kernel (ops/score_topk.py) on the real TPU:
B=1 speculative round time with fuse_scoring on/off for int8 and int4
drafts. The kernel folds the beam loop's lm_head matmul + log_softmax +
k-pass top-k (~15 dispatch-bound XLA ops per beam step, profiled at
~0.4-0.5 ms/round, tools/profile_round.py) into one Pallas call per
scoring stage (root + depth beam steps).

Run: python tools/probe_fused_scoring.py  (real TPU)
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
qparams = device_quant_tree(8)  # int8 target: small resident tree
print(f"target built in {time.time()-t:.0f}s", flush=True)
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]
prompt = np.random.default_rng(0).integers(0, V, size=16).astype(np.int32)
LO, HI = 16, 112

for dq in ("int8", "int4"):
    row = {}
    outs = {}
    for fuse in (False, True):
        ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10,
                            max_len=1024, kv_buckets=(256, 512),
                            compact_impl="pallas", draft_quant=dq,
                            fuse_scoring=fuse)
        eng = EagleEngine(qparams, CFG_4B, dparams, DCFG_4B, ecfg)

        def run(budget):
            out, ntok, rounds = retry(lambda: eng.generate_fused(
                prompt, max_new_tokens=budget, log=True))
            return out, rounds

        o_lo, r_lo = run(LO)
        t_lo = timed(lambda: run(LO))
        o_hi, r_hi = run(HI)
        t_hi = timed(lambda: run(HI))
        round_ms = 1e3 * (t_hi - t_lo) / max(r_hi - r_lo, 1)
        row[fuse] = round_ms
        outs[fuse] = np.asarray(o_hi)
        print(f"[scoreAB] draft={dq} fuse_scoring={fuse}: "
              f"round {round_ms:.2f} ms", flush=True)
    # greedy outputs must agree (both equal the same vanilla trajectory;
    # near-tie rerank flips are possible on a random target but rare)
    n = min(len(outs[False]), len(outs[True]))
    agree = np.mean(outs[False][:n] == outs[True][:n])
    d = row[False] - row[True]
    print(f"[scoreAB] draft={dq}: fused is {d:+.2f} ms/round "
          f"({100*d/row[False]:+.1f}%), output agreement {agree:.3f}",
          flush=True)
