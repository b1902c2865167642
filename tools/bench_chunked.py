"""Chunked prefill: what a long join costs the running batch (real TPU).

When a 960-token prompt joins a busy PagedEagleServer, one-shot admission
runs the whole bucket-1024 prefill inline between decode rounds — every
running request's next token waits behind it (head-of-line stall). With
`prefill_chunk=256` the prompt lands one 256-row chunk per scheduler step,
so the per-step stall is bounded by one chunk forward (engine/paged.py
`_advance_prefill`), at the price of a few extra dispatches total.

This probe measures both sides: per-step wall times around the join for
mode A (one-shot) and mode B (chunked), reporting the max step-time spike
over the pre-join baseline (the TBT hit the running requests see) and the
total added wall time (the throughput price). Correctness (bit-exactness
vs unchunked admission, greedy + sampled) is pinned by
tests/test_chunked_prefill.py; this is the perf leg.

Run: python tools/bench_chunked.py  (real TPU, ~10 min cold)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np
import jax

from _probe_common import CFG_4B, DCFG_4B, device_int8_params_4b, retry
from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.engine.paged import PagedEagleServer
from eagle_tpu.models import draft as draft_mod

B_RUN, PAGE, CHUNK, LONG = 4, 128, 256, 960
V = CFG_4B.vocab_size
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
shorts = [rng.integers(0, V, size=16).astype(np.int32)
          for _ in range(B_RUN)]
long_warm = rng.integers(0, V, size=LONG).astype(np.int32)
long_live = rng.integers(0, V, size=LONG).astype(np.int32)


def run_mode(prefill_chunk):
    srv = PagedEagleServer(eng, max_batch=B_RUN + 1, page_size=PAGE,
                           prefix_cache=False, prefill_chunk=prefill_chunk)
    for p in shorts:
        srv.submit(p, 10 ** 6)
    retry(srv.step)  # admit shorts + compile the steady round
    # warm every long-admission program (one-shot prefill / all chunk
    # shapes) on a throwaway request so the measured join is compile-free
    rw = srv.submit(long_warm, 2)
    for _ in range(64):
        srv.step()
        if rw in srv.finished:
            break
    assert rw in srv.finished, "warm long request never finished"
    for _ in range(3):
        srv.step()  # settle back to the steady B=4 round

    times, join_at, joined_done = [], 5, None
    rid = None
    for i in range(40):
        if i == join_at:
            rid = srv.submit(long_live, 16)
        t0 = time.time()
        srv.step()
        times.append(time.time() - t0)
        if rid is not None and rid in srv.finished and joined_done is None:
            joined_done = i
    assert joined_done is not None, "live long request never finished"
    base = float(np.median(times[:join_at]))
    window = times[join_at:joined_done + 1]
    spike = max(window) - base
    extra = sum(max(0.0, x - base) for x in window)
    label = f"chunked C={prefill_chunk}" if prefill_chunk else "one-shot"
    print(f"{label:16s}: baseline step {1e3*base:7.1f} ms | "
          f"join spike +{1e3*spike:7.1f} ms | total added "
          f"{1e3*extra:7.1f} ms over {len(window)} steps | "
          f"long TTLT {joined_done - join_at + 1} steps", flush=True)
    return base, spike, extra


base_a, spike_a, extra_a = retry(lambda: run_mode(None))
base_b, spike_b, extra_b = retry(lambda: run_mode(CHUNK))
print(f"join-induced max stall: one-shot +{1e3*spike_a:.1f} ms -> chunked "
      f"+{1e3*spike_b:.1f} ms ({spike_a / max(spike_b, 1e-9):.2f}x lower "
      f"TBT spike; throughput price {1e3*(extra_b - extra_a):+.1f} ms "
      f"total)", flush=True)
