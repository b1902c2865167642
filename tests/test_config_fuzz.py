"""Configuration fuzz: random engine/tree/model geometries must all keep the
greedy bit-exactness guarantee (shape edge cases in the fixed-shape
machinery are the risk surface: tiny/lopsided trees, deep-narrow beams,
odd head counts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer


def _rand_cfgs(seed):
    rng = np.random.default_rng(seed)
    nq = int(rng.choice([2, 4, 6, 8]))
    nkv = int(rng.choice([g for g in (1, 2, nq) if nq % g == 0]))
    hd = int(rng.choice([4, 8]))  # rope needs even head_dim
    H = nq * hd
    cfg = ModelConfig(
        vocab_size=int(rng.choice([96, 128, 200])), hidden_size=H,
        intermediate_size=int(rng.choice([48, 64])),
        num_layers=int(rng.choice([3, 4, 5])),
        num_q_heads=nq, num_kv_heads=nkv, head_dim=hd, dtype=jnp.float32,
    )
    version = int(rng.choice([1, 3]))
    dcfg = DraftConfig(
        version=version, hidden_size=H, intermediate_size=64,
        num_q_heads=nq, num_kv_heads=nkv, head_dim=hd,
        vocab_size=cfg.vocab_size,
        target_hidden_size=H if version == 3 else 0,
        num_layers=int(rng.choice([1, 2])) if version == 1 else 1,
        dtype=jnp.float32,
    )
    k = int(rng.choice([2, 3, 5]))
    depth = int(rng.choice([1, 2, 4]))
    total = int(rng.integers(depth, min(depth * k * 2, k + depth * k * k)))
    ecfg = EngineConfig(total_tokens=total, depth=depth, top_k=k,
                        max_len=192,
                        draft_quant=str(rng.choice(["none", "int8",
                                                    "int4"])),
                        kv_quant=str(rng.choice(["none", "int8"])))
    return cfg, dcfg, ecfg


@pytest.mark.parametrize("seed", range(6))
def test_fuzzed_config_bit_exact(seed):
    cfg, dcfg, ecfg = _rand_cfgs(seed)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 100))
    params = transformer.init_params(cfg, k1)
    dparams = draft_mod.init_params(dcfg, k2)
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    prompt = np.asarray([3, 11, 5, 2], np.int32) % cfg.vocab_size
    ref = eng.generate_vanilla(prompt, max_new_tokens=20)
    out, ntok, rounds = eng.generate(prompt, max_new_tokens=20, log=True)
    np.testing.assert_array_equal(
        out[: len(ref)], ref[: len(out)],
        err_msg=f"cfg={cfg} dcfg.version={dcfg.version} ecfg={ecfg}")
    assert rounds >= 1
