"""Paged-KV serving overhead at 4B scale — dense vs paged batched round.

PagedEagleServer's XLA read path gathers each slot's logical KV window into
contiguous scratch before the (unmodified) round and scatters the accepted
rows back after it (ops/paged_kv.py). That costs one extra window-sized HBM
write per round over the dense server. This probe measures that price
directly: it times the jitted B=8 batched round — dense (kv_limit slice) vs
paged (gather → round → scatter, block tables fully populated) — at the
serving-calibrated tree (31/d5) and window 512, on the int8-quantized 4B
target (device-built weights, tools/_probe_common.py; round TIME is
weight-value-independent). Correctness (bit-exactness vs the dense
server) is pinned by tests/test_paged_server.py; this is the perf leg.

Run: python tools/bench_paged.py  (real TPU, ~10 min cold)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np
import jax, jax.numpy as jnp

from _probe_common import (CFG_4B, DCFG_4B, D, L, NKV, V,
                           device_int8_params_4b, retry)
from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.engine.paged import PagedEagleServer
from eagle_tpu.engine.server import EagleServer
from eagle_tpu.models import draft as draft_mod

B, WINDOW, PAGE = 8, 512, 128
rng = np.random.default_rng(0)

t = time.time()
qparams = device_int8_params_4b()
print(f"int8 target built on device in {time.time()-t:.0f}s",
      file=sys.stderr, flush=True)
dparams = draft_mod.init_params(DCFG_4B, jax.random.PRNGKey(1))
dparams["embed"]["w"] = qparams["embed"]["w"]

# serving-calibrated tree (BENCH r2 serving_tree_b8 winner); window fixed at
# 512 for both paths via kv_buckets
ecfg = EngineConfig(total_tokens=31, depth=5, top_k=10, max_len=1024,
                    kv_buckets=(WINDOW,), draft_quant="int8")
eng = EagleEngine(qparams, CFG_4B, dparams, DCFG_4B, ecfg)
prompts = [rng.integers(0, V, size=16).astype(np.int32) for _ in range(B)]


def slope_ms(step_once, k_lo=8, k_hi=32):
    """Per-round ms as a slope between two chained-dispatch counts (the
    fixed ~90 ms tunnel dispatch overhead cancels)."""
    def run(k):
        t0 = time.time()
        for _ in range(k):
            step_once()
        step_once.block()
        return time.time() - t0
    run(2)  # warm/compile
    t_lo = min(run(k_lo) for _ in range(2))
    t_hi = min(run(k_hi) for _ in range(2))
    return 1e3 * (t_hi - t_lo) / (k_hi - k_lo)


# ---- dense batched round ------------------------------------------------
srv_d = EagleServer(eng, max_batch=B)
for p in prompts:
    srv_d.submit(p, 10 ** 6)
retry(srv_d.step)  # admit + one warm round


class DenseStep:
    def __init__(self):
        self.fn = srv_d._round_b[WINDOW]
        self.st = srv_d._states[0]

    def __call__(self):
        self.st, _ = self.fn(eng.params, eng.dparams, self.st)

    def block(self):
        jax.block_until_ready(self.st.length)


dense = DenseStep()
dense_ms = retry(lambda: slope_ms(dense))
print(f"dense  B={B} round: {dense_ms:.2f} ms", flush=True)
del dense, srv_d

# ---- paged batched round ------------------------------------------------
srv_p = PagedEagleServer(eng, max_batch=B, page_size=PAGE)
for p in prompts:
    srv_p.submit(p, 10 ** 6)
retry(srv_p.step)
# fully populate each slot's block table over the window so the gather reads
# real (non-trash) pages — worst-case page indirection
npg = WINDOW // PAGE
for i in range(B):
    have = srv_p._pages[(0, i)]
    extra = srv_p.allocator.alloc(npg - len(have))
    if extra is None:
        raise SystemExit(
            f"pool too small to pad slot {i} to {npg} pages "
            f"({srv_p.allocator.free_pages} free) — raise num_pages")
    have.extend(extra)
    srv_p._bt[0][i, :npg] = have[:npg]


class PagedStep:
    def __init__(self):
        self.fn = srv_p._round_p.get(WINDOW) or srv_p._make_round(WINDOW)
        self.pool = srv_p._pool
        self.st = srv_p._states[0]
        self.bt = jnp.asarray(srv_p._bt[0])

    def __call__(self):
        self.pool, self.st, _ = self.fn(eng.params, eng.dparams, self.pool,
                                        self.st, self.bt)

    def block(self):
        jax.block_until_ready(self.st.length)


paged = PagedStep()
paged_ms = retry(lambda: slope_ms(paged))
gather_gb = 2 * 2 * B * L * NKV * WINDOW * D / 1e9  # bf16 k+v window r+w
print(f"paged  B={B} round: {paged_ms:.2f} ms "
      f"(+{paged_ms - dense_ms:.2f} ms, "
      f"{100 * (paged_ms / dense_ms - 1):.1f}% over dense; window gather "
      f"moves {gather_gb:.2f} GB/round)", flush=True)
print(f"pool = {srv_p.pool_bytes / 1e9:.2f} GB for {B} slots; dense KV = "
      f"{2 * 2 * B * L * NKV * eng._tgt_len() * D / 1e9:.2f} GB", flush=True)
del paged, srv_p

# ---- prefix-cache admission A/B: full prefill of a ~1000-token prompt vs
# adopting its cached 896-row prefix (suffix window only)
srv3 = PagedEagleServer(eng, max_batch=2, page_size=PAGE)
base = rng.integers(0, V, size=1000).astype(np.int32)
srv3.submit(base, 4)
retry(srv3.run)
adopt = np.concatenate([base, rng.integers(0, V, size=8).astype(np.int32)])
entry = srv3.store.lookup(adopt)
npre = entry.rows // PAGE
m = len(adopt) - (entry.rows - 1)
Te = eng._bucket(m)
rid2 = srv3.submit(adopt, 4)
retry(srv3.run)  # warm/compile both adoption + full-prefill programs
entry = srv3.store.lookup(adopt)

Tp = eng._bucket(len(adopt))
f_full = srv3._prefill_p[Tp]
f_px = srv3._prefill_px[(npre, Te)]
padded = np.zeros((1, Tp), np.int32); padded[0, :len(adopt)] = adopt
win = np.zeros((1, Te), np.int32); win[0, :m] = adopt[entry.rows - 1:]
full_buf = np.zeros((1, srv3._S_tok), np.int32)
full_buf[0, :len(adopt)] = adopt
scratch_pages = jnp.arange(1, Tp // PAGE + 1, dtype=jnp.int32)
bt_row = np.zeros((srv3.pages_per_slot,), np.int32)
bt_row[:npre] = entry.all_pages()
bt_row[npre:npre + Te // PAGE] = range(npre + 1, npre + 1 + Te // PAGE)


class FullAdmit:
    def __init__(self, pool):
        self.pool = pool  # donated + rethreaded; do NOT reuse elsewhere

    def __call__(self):
        self.pool, self.st = f_full(
            eng.params, eng.dparams, jnp.asarray(padded),
            jnp.int32(len(adopt)), eng.init_target_cache(rows=Tp),
            eng.init_draft_cache(), jax.random.PRNGKey(0), eng._temp(None),
            self.pool, scratch_pages)

    def block(self):
        jax.block_until_ready(self.st.length)


class PrefixAdmit:
    def __init__(self, pool):
        self.pool = pool

    def __call__(self):
        self.pool, self.st = f_px(
            eng.params, eng.dparams, jnp.asarray(full_buf),
            jnp.asarray(win), jnp.int32(m), self.pool,
            jnp.asarray(bt_row), entry.dk, entry.dv,
            jax.random.PRNGKey(0), eng._temp(None))

    def block(self):
        jax.block_until_ready(self.st.length)


fa = FullAdmit(srv3._pool)
full_ms = retry(lambda: slope_ms(fa, k_lo=4, k_hi=12))
pa = PrefixAdmit(fa.pool)  # the live (rethreaded) pool after donation
px_ms = retry(lambda: slope_ms(pa, k_lo=4, k_hi=12))
print(f"admission: full prefill ({len(adopt)} tokens) {full_ms:.2f} ms vs "
      f"prefix adoption (reuse {entry.rows - 1} rows, forward {Te}) "
      f"{px_ms:.2f} ms -> {full_ms / px_ms:.2f}x faster time-to-first-token",
      flush=True)
