"""Profile the B=1 speculative round at 4B scale: where do the non-verify
milliseconds go? (verify forward is weight-streaming-bound and already at
~0.9 MBU; the question is the draft beam loop + accept/compact overhead.)

Captures a jax.profiler trace of a few generate_fused steps on the real
TPU, parses the xplane with jax.profiler.ProfileData, and prints the
top-k ops by total device time.

Run: python tools/profile_round.py [int8|int4|none]
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

dq = sys.argv[1] if len(sys.argv) > 1 else "int8"

# int8 target so the resident tree is small and the trace cheap; the
# draft/accept overhead under study is target-precision-independent
qparams = device_quant_tree(8)
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]
ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                    kv_buckets=(256, 512), compact_impl="pallas",
                    draft_quant=dq)
eng = EagleEngine(qparams, CFG_4B, dparams, DCFG_4B, ecfg)
prompt = np.random.default_rng(0).integers(0, V, size=16).astype(np.int32)

retry(lambda: eng.generate_fused(prompt, max_new_tokens=48))  # compile/warm
tdir = "/tmp/round_trace"
os.system(f"rm -rf {tdir}")
jax.profiler.start_trace(tdir)
retry(lambda: eng.generate_fused(prompt, max_new_tokens=48))
jax.profiler.stop_trace()

files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
print(f"[profile] trace files: {files}", flush=True)
pd = jax.profiler.ProfileData.from_serialized_xspace(
    open(files[0], "rb").read())
tot = defaultdict(float)
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        for ev in line.events:
            dur = ev.duration_ns / 1e6
            name = ev.name
            tot[name] += dur
top = sorted(tot.items(), key=lambda kv: -kv[1])[:28]
total = sum(tot.values())
print(f"[profile] total device time {total:.2f} ms across {len(tot)} ops")
for name, ms in top:
    print(f"[profile] {ms:8.3f} ms  {name[:110]}")
