"""A/B the fused draft projections (models/draft.fuse_projections) on the
real TPU: B=1 speculative round time with fuse_draft on/off, at each draft
quantization level. The fusion targets the beam loop's dispatch overhead
(7 -> 4 projection streams per step), so the expected win is a fixed
~0.1-0.5 ms per round, largest for the Pallas int4 draft (per-call kernel
launch + grid overheads).

Run: python tools/probe_fused_draft.py  (real TPU)
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

# int8 target keeps the resident tree small; the draft-side delta under
# study is target-precision-independent
t = time.time()
qparams = device_quant_tree(8)
print(f"target built in {time.time()-t:.0f}s", flush=True)
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]
prompt = np.random.default_rng(0).integers(0, V, size=16).astype(np.int32)
LO, HI = 16, 112

for dq in ("none", "int8", "int4"):
    row = {}
    for fuse in (False, True):
        ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10,
                            max_len=1024, kv_buckets=(256, 512),
                            compact_impl="pallas", draft_quant=dq,
                            fuse_draft=fuse)
        eng = EagleEngine(qparams, CFG_4B, dparams, DCFG_4B, ecfg)

        def run(budget):
            out, ntok, rounds = retry(lambda: eng.generate_fused(
                prompt, max_new_tokens=budget, log=True))
            return rounds

        r_lo = run(LO)
        t_lo = timed(lambda: run(LO))
        r_hi = run(HI)
        t_hi = timed(lambda: run(HI))
        round_ms = 1e3 * (t_hi - t_lo) / max(r_hi - r_lo, 1)
        row[fuse] = round_ms
        print(f"[fuseAB] draft={dq:5s} fuse={fuse}: round {round_ms:.2f} ms",
              flush=True)
    d = row[False] - row[True]
    print(f"[fuseAB] draft={dq:5s}: fused is {d:+.2f} ms/round "
          f"({100*d/row[False]:+.1f}%)", flush=True)
