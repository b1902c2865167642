"""A/B: fused qkv + gate|up int4 target projections, and group=512 scales.

quantize_target_params4(fuse=True) turns 7 Pallas kernel calls per layer
into 4 (wqkv, wo, w_gateup, w_down) — the per-call XLA glue the custom
call cannot absorb (activation amax/round/clip quantization + rowsum
precompute over the SAME x) runs once per input instead of per
projection, attacking the ~0.5 ms/step of profiled non-matmul overhead in
the 4B int4 vanilla step (tools/profile_vanilla_int4.py). Outputs are
bit-identical to unfused (tests/test_quant4.py). group=512 trades scale
granularity for fewer per-group scale passes in the kernel (+8% matmul
throughput per the probe_w4_ablate sweep).

Weights are random device-side trees (time is weight-value-independent).
One variant per process (the tunnel's lagging frees OOM back-to-back
multi-GB trees):
    python tools/probe_fuse_target.py base     # group=128, unfused
    python tools/probe_fuse_target.py fuse     # group=128, fused
    python tools/probe_fuse_target.py g512     # group=512, unfused
    python tools/probe_fuse_target.py fuse512  # group=512, fused
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax
import jax.numpy as jnp

from _probe_common import PEAK_BW, retry, timed
from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig, RopeConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod

H, L, F, NQ, NKV, D, V = 3072, 28, 12288, 24, 8, 128, 32000
CFG = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                  num_layers=L, num_q_heads=NQ, num_kv_heads=NKV,
                  head_dim=D, rope=RopeConfig(theta=500000.0),
                  dtype=jnp.bfloat16)
DCFG = DraftConfig(version=3, hidden_size=H, intermediate_size=F,
                   num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
                   vocab_size=V, target_hidden_size=H, dtype=jnp.bfloat16)
LO, HI = 32, 480  # wide slope: relative noise ~3x lower than 16->112


def fused_quant_tree(group=128, fuse=True, seed=0):
    """device_quant_tree with the fuse=True leaf layout."""
    from _probe_common import device_fused_quant_tree4, device_quant_tree
    dims = (H, L, F, NQ, NKV, D, V)
    if not fuse:
        return device_quant_tree(4, dims=dims, seed=seed, group=group)
    return device_fused_quant_tree4(dims=dims, seed=seed, group=group)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    group = 512 if "512" in variant else 128
    fuse = "fuse" in variant
    t0 = time.time()
    qparams = fused_quant_tree(group=group, fuse=fuse)
    qbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree.leaves(qparams))
    dparams = draft_mod.init_params(DCFG, jax.random.PRNGKey(1))
    dparams["embed"]["w"] = qparams["embed"]["w"]
    dg = 512 if os.environ.get("PROBE_DRAFT_G512") else 128
    ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                        kv_buckets=(256, 512), draft_quant="int4",
                        draft_quant_group=dg)
    eng = EagleEngine(qparams, CFG, dparams, DCFG, ecfg)
    prompt = np.random.default_rng(0).integers(0, V, size=16).astype(np.int32)

    tv_lo = timed(lambda: retry(lambda: eng.generate_vanilla(
        prompt, max_new_tokens=LO, fused=True)), n=3)
    tv_hi = timed(lambda: retry(lambda: eng.generate_vanilla(
        prompt, max_new_tokens=HI, fused=True)), n=3)
    vstep = 1e3 * (tv_hi - tv_lo) / (HI - LO)
    mbu = (qbytes / (vstep / 1e3)) / PEAK_BW

    def run(budget):
        return retry(lambda: eng.generate_fused(prompt,
                                                max_new_tokens=budget,
                                                log=True))

    te_lo = timed(lambda: run(LO), n=3)
    te_hi = timed(lambda: run(HI), n=3)
    _, _, r_lo = run(LO)
    _, _, r_hi = run(HI)
    round_ms = 1e3 * (te_hi - te_lo) / max(r_hi - r_lo, 1)
    print(json.dumps({
        "variant": variant, "group": group, "fuse": fuse,
        "target_gb": round(qbytes / 1e9, 2),
        "vanilla_step_ms": round(vstep, 3), "mbu": round(mbu, 3),
        "round_ms": round(round_ms, 2),
        "total_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    main()
