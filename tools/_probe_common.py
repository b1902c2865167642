"""Shared plumbing for the real-TPU probe scripts in tools/.

One copy of: the malloc tuning + persistent-compile-cache setup, the
transient-error retry wrapper, the min-of-n timer, and the 4B llama-class
param tree builders. Weights are built ON DEVICE (this VM's host memory
demand-faults fresh pages at ~6 MB/s — a host-built 8 GB tree costs ~25
minutes of page faulting before the first upload byte moves; probe TIME is
weight-value-independent, so random device-side values are exactly as
good).
"""
import os
import sys
import time

# keep freed glibc pages resident — see bench.py's matching block
if os.environ.get("MALLOC_MMAP_MAX_") != "0":
    os.execve(sys.executable, [sys.executable] + sys.argv,
              dict(os.environ, MALLOC_MMAP_MAX_="0",
                   MALLOC_TRIM_THRESHOLD_="-1"))

import jax
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


def device_quant_tree(bits: int, dims=None, seed=0, group=128):
    """Random quantized target tree built directly on device.

    Leaf structure matches ops/quant.quantize_target_params (bits=8:
    {"q8": int8 [..., K, N], "scale": f32 [..., N]}) or
    ops/quant4.quantize_target_params4 (bits=4: {"q4": i32 words
    [..., K/8, N], "scale": f32 [..., K/group, N]}) for the seven layer
    projections + lm_head; embed/norms bf16 — so the engine's quantized
    matmul paths run unchanged. Scales put effective weight std ~= 0.02
    (int8 uniform std ~= 73; nibble-8 uniform std ~= 4.3) — values only
    need to be finite, not meaningful. `dims` = (H, L, F, NQ, NKV, D, V),
    default the 4B flagship.
    """
    h, l, f, nq, nkv, d, v = dims or (H, L, F, NQ, NKV, D, V)
    key = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(key, 16))

    def q8(*shape):
        q = jax.random.randint(next(ks), shape, -127, 128, jnp.int8)
        scale = jnp.full(shape[:-2] + (shape[-1],), 0.02 / 73.0, jnp.float32)
        return {"q8": q, "scale": scale}

    def q4(*shape):
        K, N = shape[-2], shape[-1]
        q = jax.random.randint(next(ks), shape[:-2] + (K // 8, N),
                               -2**31, 2**31 - 1, jnp.int32)
        scale = jnp.full(shape[:-2] + (K // group, N), 0.02 / 4.3,
                         jnp.float32)
        return {"q4": q, "scale": scale}

    qw = q8 if bits == 8 else q4
    params = {
        "embed": {"w": jax.random.normal(next(ks), (v, h), jnp.bfloat16)
                  * 0.02},
        "layers": {
            "ln1": jnp.ones((l, h), jnp.bfloat16),
            "ln2": jnp.ones((l, h), jnp.bfloat16),
            "wq": qw(l, h, nq * d), "wk": qw(l, h, nkv * d),
            "wv": qw(l, h, nkv * d), "wo": qw(l, nq * d, h),
            "w_gate": qw(l, h, f), "w_up": qw(l, h, f),
            "w_down": qw(l, f, h),
        },
        "final_norm": jnp.ones((h,), jnp.bfloat16),
        "lm_head": qw(h, v),
    }
    params["lm_head"]["scale"] = params["lm_head"]["scale"] * 8.0
    jax.block_until_ready(params)
    return params


def device_fused_quant_tree4(dims=None, seed=0, group=512):
    """device_quant_tree(bits=4) with the quantize_target_params4
    fuse=True leaf layout (one wqkv + one w_gateup call per layer) —
    the measured-best single-chip int4 serving layout
    (tools/probe_fuse_target.py: −6.4% vanilla step, −5.4% round at 4B
    with group=512)."""
    h, l, f, nq, nkv, d, v = dims or (H, L, F, NQ, NKV, D, V)
    params = device_quant_tree(4, dims=dims, seed=seed, group=group)
    layers = dict(params["layers"])
    key = jax.random.PRNGKey(seed + 77)

    def q4(*shape):
        K, N = shape[-2], shape[-1]
        q = jax.random.randint(key, shape[:-2] + (K // 8, N),
                               -2**31, 2**31 - 1, jnp.int32)
        scale = jnp.full(shape[:-2] + (K // group, N), 0.02 / 4.3,
                         jnp.float32)
        return {"q4": q, "scale": scale}

    for k in ("wq", "wk", "wv"):
        layers.pop(k)
    layers["wqkv"] = q4(l, h, (nq + 2 * nkv) * d)
    for k in ("w_gate", "w_up"):
        layers.pop(k)
    layers["w_gateup"] = q4(l, h, 2 * f)
    params["layers"] = layers
    jax.block_until_ready(params)
    return params


def device_int8_params_4b(seed=0):
    return device_quant_tree(8, seed=seed)


def device_int4_params_4b(seed=0, group=128):
    return device_quant_tree(4, seed=seed, group=group)


def batched_round_ms(eng, V_, B, lo=16, hi=112, seed=0):
    """Slope-timed batched decode round (ms) via generate_batch_fused:
    round time is tau-independent (fixed shapes), so this prices the
    serving round without needing a trained draft."""
    rng = np.random.default_rng(seed)
    prompts = [rng.integers(0, V_, size=16).astype(np.int32)
               for _ in range(B)]

    rounds = {}

    def run(budget):
        out = retry(lambda: eng.generate_batch_fused(
            prompts, max_new_tokens=budget, log=True))
        rounds[budget] = out[2]  # stash from the timed runs themselves
        return out

    t_lo = timed(lambda: run(lo), n=2)
    t_hi = timed(lambda: run(hi), n=2)
    return 1e3 * (t_hi - t_lo) / max(rounds[hi] - rounds[lo], 1)
