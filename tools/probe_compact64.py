"""Does compact_rows work natively at head_dim=64? (VERDICT r3 #8)

The kernel guards on head_dim % 128 == 0 ("Mosaic lane-aligned HBM DMAs"),
so llama-3.2-class targets (d=64, the __graft_entry__ flagship) silently
fall back to XLA compaction on TPU. This probe (a) tries the kernel with
force=True at d=64 on small shapes and checks output identity vs the XLA
compaction, and (b) if it works, times both at a 1B-class d=64 config; if
Mosaic rejects it, prints the error for the wontfix record.

Run: python tools/probe_compact64.py  (real TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax
import jax.numpy as jnp

from eagle_tpu.ops.kv_cache import KVCache, compact_accepted
from eagle_tpu.ops.pallas_attn import compact_rows

L, n_kv, S, d = 4, 8, 512, 64
T, P = 64, 16
rng = np.random.default_rng(0)
k = jnp.asarray(rng.normal(size=(L, 1, n_kv, S, d)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(L, 1, n_kv, S, d)), jnp.bfloat16)
path = jnp.asarray(rng.choice(T, size=P, replace=False).astype(np.int32))
start = jnp.int32(100)

ref = compact_accepted(KVCache(k=k, v=v, length=jnp.array([100], jnp.int32)),
                       path[None], jnp.array([P], jnp.int32))

try:
    t0 = time.time()
    ck, cv = compact_rows(k, v, path, start, tree_size=T, force=True)
    ck, cv = np.asarray(ck), np.asarray(cv)
    print(f"d=64 kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)
    rk = np.asarray(ref.k)
    # compare the moved window rows [start, start+P)
    ok = np.array_equal(ck[:, :, :, 100:100 + P, :],
                        rk[:, :, :, 100:100 + P, :])
    print(f"d=64 output identical to XLA compaction in the moved window: "
          f"{ok}", flush=True)
    # prefix untouched
    ok2 = np.array_equal(ck[:, :, :, :100, :], np.asarray(k)[:, :, :, :100, :])
    print(f"d=64 prefix rows untouched: {ok2}", flush=True)
except Exception as e:
    print(f"d=64 kernel FAILED: {type(e).__name__}: {str(e)[:600]}",
          flush=True)
    # wontfix evidence: time the XLA fallback compaction at flagship
    # (1B-class, d=64) shapes — its marginal cost vs a ~6 ms round decides
    # whether a d=64 kernel would matter at all
    L2, n_kv2, S2, d2 = 16, 8, 2048, 64
    rng2 = np.random.default_rng(1)
    k2 = jnp.asarray(rng2.normal(size=(L2, 1, n_kv2, S2, d2)), jnp.bfloat16)
    v2 = jnp.asarray(rng2.normal(size=(L2, 1, n_kv2, S2, d2)), jnp.bfloat16)
    path2 = jnp.asarray(rng2.choice(64, size=10, replace=False)
                        .astype(np.int32))

    cfn = jax.jit(lambda kk, vv: compact_accepted(
        KVCache(k=kk, v=vv, length=jnp.array([512], jnp.int32)),
        path2[None], jnp.array([10], jnp.int32)))

    def t(n):
        t0 = time.time()
        r = None
        for _ in range(n):
            r = cfn(k2, v2)
        np.asarray(r.k[0, 0, 0, 0])  # host sync through the relay
        return time.time() - t0

    cfn(k2, v2)
    lo, hi = t(5), t(25)
    per = (hi - lo) / 20
    print(f"d=64 XLA compact_accepted at 1B-class shapes: {1e3*per:.3f} ms "
          f"per call (slope, dispatch cancelled) — vs ~6 ms rounds",
          flush=True)
    sys.exit(0)

# ---- timing at 1B-class d=64 shapes (only reached if the above worked)
L2, n_kv2, S2, d2 = 16, 8, 1024, 64
k2 = jnp.asarray(rng.normal(size=(L2, 1, n_kv2, S2, d2)), jnp.bfloat16)
v2 = jnp.asarray(rng.normal(size=(L2, 1, n_kv2, S2, d2)), jnp.bfloat16)
path2 = jnp.asarray(rng.choice(64, size=10, replace=False).astype(np.int32))


def timed(fn, n=20):
    fn()
    t0 = time.time()
    for _ in range(n):
        r = fn()
    np.asarray(jax.tree.leaves(r)[0][0, 0, 0, 0])  # host sync
    return (time.time() - t0) / n


tk = timed(lambda: compact_rows(k2, v2, path2, jnp.int32(512), tree_size=64,
                                force=True))
ck2 = jax.jit(lambda kk, vv: compact_accepted(
    KVCache(k=kk, v=vv, length=jnp.array([512], jnp.int32)),
    path2[None], jnp.array([10], jnp.int32)))
tx = timed(lambda: ck2(k2, v2))
print(f"d=64 1B-class: kernel {1e3*tk:.3f} ms vs XLA compact {1e3*tx:.3f} "
      f"ms per call (incl. dispatch)", flush=True)
