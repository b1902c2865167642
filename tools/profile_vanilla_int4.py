"""Where does the int4-target VANILLA step's time go?

The int4 4B target streams 2.31 GB -> 2.8 ms ideal, measures ~5.2 ms;
the int8 target (XLA dots, fusable with neighbors) shows only ~1 ms of
overhead at twice the bytes. Hypothesis: the ~112 Pallas matmul calls per
step (4 x 28 layers + lm_head) each pay un-fused XLA glue — activation
quantization (amax/scale/round/clip), rowsum precompute, f32->bf16 casts —
that XLA cannot fuse into a custom call. This profiles a few fused-vanilla
steps on the int4 target and prints top ops.

Run: python tools/profile_vanilla_int4.py
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax

from _probe_common import CFG_4B, DCFG_4B, V, device_quant_tree, retry
from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod

qparams = device_quant_tree(4)  # int4 target
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]
ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                    kv_buckets=(256, 512), draft_quant="int4")
eng = EagleEngine(qparams, CFG_4B, dparams, DCFG_4B, ecfg)
prompt = np.random.default_rng(0).integers(0, V, size=16).astype(np.int32)

retry(lambda: eng.generate_vanilla(prompt, max_new_tokens=48, fused=True))
tdir = "/tmp/vanilla_trace"
os.system(f"rm -rf {tdir}")
jax.profiler.start_trace(tdir)
retry(lambda: eng.generate_vanilla(prompt, max_new_tokens=48, fused=True))
jax.profiler.stop_trace()

files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
pd = jax.profiler.ProfileData.from_serialized_xspace(
    open(files[0], "rb").read())
tot = defaultdict(float)
for plane in pd.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    for line in plane.lines:
        for ev in line.events:
            tot[ev.name[:110]] += ev.duration_ns / 1e6
items = sorted(tot.items(), key=lambda kv: -kv[1])
print(f"[vprof] total device time {sum(tot.values()):.1f} ms over "
      f"{len(tot)} ops (48 tokens)", flush=True)
for name, ms in items[:30]:
    print(f"[vprof] {ms:9.3f} ms  {name}", flush=True)
