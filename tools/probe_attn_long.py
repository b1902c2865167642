"""Find the Pallas tree-attention kernel's winning regime — or retire it.

Rounds 2-3 A/B'd `attn_impl="pallas_tree"` only at S=1024/max_len=1024,
where it never beat XLA (17.45 vs 17.61+ ms r2; 18.04 vs 18.06+ r3). The
flash-style kernel's case is LONG live context: XLA's path materializes a
dense [T, S] f32 mask + scores for the whole cache window, so its HBM
traffic grows with S while the kernel streams KV once with the mask as
metadata. This probe measures B=1 speculative rounds at live contexts
~256 / ~1500 / ~3000 rows inside a max_len=4096 engine (int8 target so
the resident tree is small), attn xla vs pallas_tree.

kv_buckets quantize the attention window identically for both impls, so
the comparison is apples-to-apples at each context length.

Run: python tools/probe_attn_long.py  (real TPU)
"""
import dataclasses
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
qparams = device_quant_tree(8)
print(f"target built in {time.time()-t:.0f}s", flush=True)
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]
rng = np.random.default_rng(0)
LO, HI = 16, 112

for plen in (240, 1500, 3000):
    prompt = rng.integers(0, V, size=plen).astype(np.int32)
    row = {}
    for attn in ("xla", "pallas_tree"):
        cfg = dataclasses.replace(CFG_4B, attn_impl=attn)
        ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10,
                            max_len=4096, kv_buckets=(512, 2048, 4096),
                            compact_impl="pallas", draft_quant="int8")
        eng = EagleEngine(qparams, cfg, dparams, DCFG_4B, ecfg)

        def run(budget):
            out, ntok, rounds = retry(lambda: eng.generate_fused(
                prompt, max_new_tokens=budget, log=True))
            return rounds

        r_lo = run(LO)
        t_lo = timed(lambda: run(LO))
        r_hi = run(HI)
        t_hi = timed(lambda: run(HI))
        round_ms = 1e3 * (t_hi - t_lo) / max(r_hi - r_lo, 1)
        row[attn] = round_ms
        print(f"[attnAB] ctx~{plen} attn={attn}: round {round_ms:.2f} ms",
              flush=True)
    d = row["xla"] - row["pallas_tree"]
    print(f"[attnAB] ctx~{plen}: pallas_tree is {d:+.2f} ms/round "
          f"({100*d/row['xla']:+.1f}% of xla)", flush=True)
