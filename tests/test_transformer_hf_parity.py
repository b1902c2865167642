"""Target-model parity vs HuggingFace transformers (torch CPU).

The reference's backends are forked HF models; our single generic
transformer must reproduce stock-HF logits for each architecture
(prerequisite for loading real checkpoints and for greedy bit-exactness).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import ModelConfig
from eagle_tpu.models import transformer
from eagle_tpu.models.hf_loader import convert_target
from eagle_tpu.ops.kv_cache import init_cache
from eagle_tpu.ops.masks import prefill_mask

MAX_LEN = 64


def _hf_tiny(arch: str):
    import torch

    torch.manual_seed(0)
    common = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    if arch == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(**common, rope_theta=10000.0)
        model = LlamaForCausalLM(cfg)
    elif arch == "llama31":
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            **common,
            rope_theta=500000.0,
            rope_scaling={
                "rope_type": "llama3",
                "factor": 8.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 64,
            },
        )
        model = LlamaForCausalLM(cfg)
    elif arch == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = Qwen2Config(**common)
        model = Qwen2ForCausalLM(cfg)
    elif arch == "qwen3":
        from transformers import Qwen3Config, Qwen3ForCausalLM

        cfg = Qwen3Config(**common, head_dim=16)
        model = Qwen3ForCausalLM(cfg)
    elif arch == "mixtral":
        from transformers import MixtralConfig, MixtralForCausalLM

        cfg = MixtralConfig(**common, num_local_experts=4, num_experts_per_tok=2)
        model = MixtralForCausalLM(cfg)
    else:
        raise ValueError(arch)
    model.eval()
    return model, cfg


@pytest.mark.parametrize("arch", ["llama", "llama31", "qwen2", "qwen3", "mixtral"])
def test_logits_match_hf(arch):
    import torch

    model, hf_cfg = _hf_tiny(arch)
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype=jnp.float32)
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    params = convert_target(sd, cfg, dtype=jnp.float32)

    T = 12
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, T))
    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens)).logits.numpy()

    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, MAX_LEN, cfg.head_dim,
                       dtype=jnp.float32)
    positions = jnp.arange(T, dtype=jnp.int32)[None]
    mask = prefill_mask(T, MAX_LEN, cache.length)
    res = transformer.forward(params, cfg, jnp.asarray(tokens), cache, positions, mask)
    logits = transformer.lm_head(params, cfg, res.hidden)

    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=2e-4, atol=2e-4)


def test_incremental_decode_matches_full_forward():
    """KV-cache decode path must agree with a single full forward."""
    model, hf_cfg = _hf_tiny("llama")
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype=jnp.float32)
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    params = convert_target(sd, cfg, dtype=jnp.float32)

    T = 10
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, T)))

    # full forward
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, MAX_LEN, cfg.head_dim,
                       dtype=jnp.float32)
    positions = jnp.arange(T, dtype=jnp.int32)[None]
    full = transformer.forward(params, cfg, tokens, cache, positions,
                               prefill_mask(T, MAX_LEN, cache.length))

    # prefill 6 then decode 4 one-by-one
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, MAX_LEN, cfg.head_dim,
                       dtype=jnp.float32)
    res = transformer.forward(params, cfg, tokens[:, :6], cache,
                              positions[:, :6], prefill_mask(6, MAX_LEN, cache.length))
    cache = res.cache
    outs = [res.hidden]
    for t in range(6, T):
        res = transformer.forward(params, cfg, tokens[:, t:t + 1], cache,
                                  positions[:, t:t + 1],
                                  prefill_mask(1, MAX_LEN, cache.length))
        cache = res.cache
        outs.append(res.hidden)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full.hidden),
                               rtol=1e-5, atol=1e-5)


def test_feature_taps_are_layer_inputs():
    """Taps must equal the hidden-state inputs of layers {2, L//2, L-3}."""
    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=6,
        num_q_heads=4, num_kv_heads=2, head_dim=8, dtype=jnp.float32,
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    T = 5
    tokens = jnp.arange(T, dtype=jnp.int32)[None]
    positions = jnp.arange(T, dtype=jnp.int32)[None]

    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, MAX_LEN, cfg.head_dim,
                       dtype=jnp.float32)
    res = transformer.forward(params, cfg, tokens, cache, positions,
                              prefill_mask(T, MAX_LEN, cache.length))
    H = cfg.hidden_size
    taps = np.asarray(res.taps)

    # recompute manually layer by layer
    h = np.asarray(jnp.take(params["embed"]["w"], tokens, axis=0))
    from eagle_tpu.models.transformer import _layer
    from eagle_tpu.models.rope import rope_tables

    cos, sin = rope_tables(cfg.rope, cfg.head_dim, positions)
    cache2 = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, MAX_LEN, cfg.head_dim,
                        dtype=jnp.float32)
    mask = prefill_mask(T, MAX_LEN, cache2.length)
    hj = jnp.asarray(h)
    expected = {}
    for i in range(cfg.num_layers):
        if i in cfg.tap_layers:
            expected[i] = np.asarray(hj)
        lp = jax.tree.map(lambda x: x[i], params["layers"])
        hj, _, _, _, _ = _layer(hj, lp, cfg, cache2.k[i], cache2.v[i], cos,
                                sin, mask, cache2.length)
    lo, mid, hi = cfg.tap_layers
    np.testing.assert_allclose(taps[..., :H], expected[lo], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(taps[..., H:2 * H], expected[mid], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(taps[..., 2 * H:], expected[hi], rtol=1e-6, atol=1e-6)


def test_qwen2_sliding_window_matches_hf():
    """Per-layer sliding-window attention (qwen2 style) vs HF."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        use_sliding_window=True, sliding_window=8, max_window_layers=2,
    )
    model = Qwen2ForCausalLM(hf_cfg)
    model.eval()
    d = hf_cfg.to_dict()
    if getattr(hf_cfg, "layer_types", None):
        d["layer_types"] = list(hf_cfg.layer_types)
    cfg = ModelConfig.from_hf_dict(d, dtype=jnp.float32)
    assert cfg.sliding_window == 8
    assert cfg.sliding_layer_flags is not None and any(cfg.sliding_layer_flags)
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    params = convert_target(sd, cfg, dtype=jnp.float32)

    T = 24  # > window so the mask actually truncates
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, T))
    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens)).logits.numpy()
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, MAX_LEN,
                       cfg.head_dim, dtype=jnp.float32)
    positions = jnp.arange(T, dtype=jnp.int32)[None]
    mask = prefill_mask(T, MAX_LEN, cache.length)
    res = transformer.forward(params, cfg, jnp.asarray(tokens), cache,
                              positions, mask)
    logits = transformer.lm_head(params, cfg, res.hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-4, atol=2e-4)
