"""Correctness check of the w4 Pallas kernel on real TPU vs the XLA path
(byte/nibble order of the i32-word storage must agree between the host
packer, the XLA unpack, and Mosaic's sublane-expanding bitcast).

Run: python tools/probe_w4_check.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from eagle_tpu.ops import quant4 as q4

rng = np.random.default_rng(0)
ok = True
for (M, K, N) in [(16, 1024, 512), (64, 3072, 12288), (300, 3072, 32000)]:
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    # HOST-packed tree (the real deployment path) through both compute
    # paths. NOTE: device pack_w4 may differ from the host packer by a few
    # boundary nibbles (TPU f32 amax/round ulps) — each is self-consistent,
    # so the check is kernel-vs-XLA on the SAME packed bits.
    qw = jax.tree.map(jnp.asarray, q4._pack_w4_host(w))
    y = np.asarray(q4.qdense4(x, qw, out_dtype=jnp.float32))
    yref = np.asarray(q4.qdense4_xla(x, qw, out_dtype=jnp.float32))
    rel = np.max(np.abs(y - yref) / (np.abs(yref) + 1e-2))
    print(f"[w4check] M={M} K={K} N={N}: rel {rel:.2e}", flush=True)
    ok &= rel < 1e-3
print("[w4check]", "OK" if ok else "MISMATCH", flush=True)
sys.exit(0 if ok else 1)
