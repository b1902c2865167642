"""Batched (vmapped) serving round on the int4 target — exercises the
Pallas w4a8 kernel under jax.vmap on real TPU and prices the B=8 round.

Run: python tools/probe_int4_b8.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

from _probe_common import (CFG_4B, DCFG_4B, V, batched_round_ms,
                           device_int4_params_4b)
from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod

qparams = device_int4_params_4b()
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]
ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                    kv_buckets=(256, 512), compact_impl="pallas",
                    draft_quant="int4")
eng = EagleEngine(qparams, CFG_4B, dparams, DCFG_4B, ecfg)
for B in (8,):
    rb = batched_round_ms(eng, V, B)
    print(f"int4 target B={B} serving round {rb:.2f}ms | aggregate "
          f"tok/s@tau7.7={B * 7.7 * 1e3 / rb:.0f}", flush=True)
