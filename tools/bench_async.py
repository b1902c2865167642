"""Async scheduling: what the host-sync bubble costs the serving loop.

The sync server's step is dispatch → drain (block on device→host transfer)
→ process tokens → next dispatch: the device idles from drain-complete
until the next round lands. Async scheduling (EagleServer
async_schedule=True) dispatches round N+1 BEFORE draining round N, so the
device computes through the drain + host work — steady-state step time
drops from (round + sync-bubble) to max(round, host work). On this VM the
bubble is dominated by the remote-TPU tunnel's transfer latency, so the
win here is an upper bound of the colocated-host win; the mechanism
(overlap, wasted-round cost at refill) is identical either way.

Measures: steady-state median step time and aggregate committed tokens/s
at B=8 on the int8 4B target, serving-calibrated tree (31/d5), sync vs
async, continuous refill (every finish admits a queued successor — the
wasted-round price is in the measurement). Correctness is pinned by
tests/test_async_server.py; this is the perf leg.

Run: python tools/bench_async.py  (real TPU, ~10 min cold)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np
import jax

from _probe_common import CFG_4B, DCFG_4B, V, device_int8_params_4b, retry
from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.engine.paged import PagedEagleServer
from eagle_tpu.models import draft as draft_mod

B, PAGE, STEPS, WARM = 8, 128, 60, 12
rng = np.random.default_rng(0)

t = time.time()
qparams = device_int8_params_4b()
print(f"int8 target built on device in {time.time()-t:.0f}s",
      file=sys.stderr, flush=True)
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]

ecfg = EngineConfig(total_tokens=31, depth=5, top_k=10, max_len=1024,
                    draft_quant="int8")
eng = EagleEngine(qparams, CFG_4B, dparams, DCFG_4B, ecfg)
prompts = [rng.integers(0, V, size=96).astype(np.int32) for _ in range(48)]


def run_mode(depth):
    srv = PagedEagleServer(eng, max_batch=B, page_size=PAGE,
                           prefix_cache=False, async_schedule=depth)
    # finite budgets so finishes + refills happen during the measurement
    # (the wasted-round refill price is part of async's steady state)
    for i, p in enumerate(prompts):
        srv.submit(p, 48 + 16 * (i % 3))
    for _ in range(WARM):
        retry(srv.step)
    tok0 = sum(len(v) for v in srv.finished.values()) + sum(
        len(v) for v in srv.outputs.values())
    times = []
    for _ in range(STEPS):
        t0 = time.time()
        srv.step()
        times.append(time.time() - t0)
    tok1 = sum(len(v) for v in srv.finished.values()) + sum(
        len(v) for v in srv.outputs.values())
    med = float(np.median(times))
    tps = (tok1 - tok0) / sum(times)
    label = f"async depth {depth}" if depth else "sync         "
    print(f"{label}: median step {1e3*med:7.2f} ms | aggregate "
          f"{tps:7.1f} tok/s over {STEPS} steps", flush=True)
    return med, tps


med_s, tps_s = retry(lambda: run_mode(0))
best = (med_s, tps_s, 0)
for d in (1, 2, 4, 6):
    med_a, tps_a = retry(lambda: run_mode(d))
    if tps_a > best[1]:
        best = (med_a, tps_a, d)
print(f"async scheduling (best depth {best[2]}): step {1e3*med_s:.2f} -> "
      f"{1e3*best[0]:.2f} ms, serving throughput {tps_s:.0f} -> "
      f"{best[1]:.0f} tok/s ({best[1]/tps_s:.2f}x)", flush=True)
