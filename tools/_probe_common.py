"""Shared plumbing for the real-TPU probe scripts in tools/.

One copy of: the persistent-compile-cache setup, the transient-error retry
wrapper, the min-of-n timer, and the host-built 4B llama-class param tree
(numpy on host — the tunnel's device->host pull of an 8 GB tree is
pathologically slow, so probes build weights host-side and upload once;
round/step TIME is weight-value-independent).
"""
import sys
import time

import jax
import ml_dtypes
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from eagle_tpu.config import DraftConfig, ModelConfig, RopeConfig

# the 4B llama-class probe target (matches bench.py's flagship scale)
H, L, F, NQ, NKV, D, V = 3072, 28, 12288, 24, 8, 128, 32000
PEAK_BW = 819e9  # v5e HBM

CFG_4B = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                     num_layers=L, num_q_heads=NQ, num_kv_heads=NKV,
                     head_dim=D, rope=RopeConfig(theta=500000.0),
                     dtype=jnp.bfloat16)
DCFG_4B = DraftConfig(version=3, hidden_size=H, intermediate_size=F,
                      num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
                      vocab_size=V, target_hidden_size=H, dtype=jnp.bfloat16)


def retry(fn, tries=3, wait=45):
    """Retry `fn` across the tunnel's transient device errors."""
    for i in range(tries):
        try:
            return fn()
        except Exception as e:
            if ("RESOURCE_EXHAUSTED" not in str(e)
                    and "FAILED_PRECONDITION" not in str(e)) or i == tries - 1:
                raise
            print(f"transient, retry in {wait}s", file=sys.stderr, flush=True)
            time.sleep(wait)


def timed(fn, n=3):
    """Best-of-n wall time of fn() after one warmup call."""
    fn()
    best = float("inf")
    for _ in range(n):
        t = time.time(); fn(); best = min(best, time.time() - t)
    return best


def host_params_4b(seed=0):
    """Host-built (numpy bf16) 4B target param tree; random values."""
    rng = np.random.default_rng(seed)
    bf16 = ml_dtypes.bfloat16

    def rnd(*shape, scale=0.02):
        return (rng.standard_normal(shape, dtype=np.float32)
                * scale).astype(bf16)

    return {
        "embed": {"w": rnd(V, H)},
        "layers": {
            "ln1": np.ones((L, H), bf16), "ln2": np.ones((L, H), bf16),
            "wq": rnd(L, H, NQ * D), "wk": rnd(L, H, NKV * D),
            "wv": rnd(L, H, NKV * D), "wo": rnd(L, NQ * D, H),
            "w_gate": rnd(L, H, F), "w_up": rnd(L, H, F),
            "w_down": rnd(L, F, H),
        },
        "final_norm": np.ones((H,), bf16),
        "lm_head": rnd(H, V, scale=0.16),
    }
