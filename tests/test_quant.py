"""int8 draft quantization: numeric closeness, and the losslessness
guarantee — a quantized draft must still produce bit-exact greedy output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.ops import quant

from test_engine_greedy import PROMPT, make_engine


def test_qdense_close_to_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 96)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(96,)), jnp.float32)
    ref = x @ w + b
    out = quant.qdense(x, quant.quantize_linear(w), b)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_quantize_draft_params_structure():
    from eagle_tpu.models import draft as draft_mod
    from test_engine_greedy import tiny_dcfg

    dcfg = tiny_dcfg(3)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(0))
    qp = quant.quantize_draft_params(dparams)
    assert qp["layers"][0]["wq"]["q8"].dtype == jnp.int8
    assert qp["lm_head"]["q8"].dtype == jnp.int8
    assert qp["fc"]["w"]["q8"].dtype == jnp.int8
    # untouched leaves
    assert qp["embed"]["w"].dtype == dparams["embed"]["w"].dtype
    assert qp["norm"].dtype == dparams["norm"].dtype


@pytest.mark.parametrize("version", [1, 3])
def test_int8_draft_still_bit_exact_greedy(version):
    eng0 = make_engine(version)
    ref = eng0.generate_vanilla(PROMPT, max_new_tokens=30)
    ecfg_q = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                          draft_quant="int8")
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg_q)
    out, ntok, rounds = eng.generate(PROMPT, max_new_tokens=30, log=True)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
    assert ntok / rounds >= 1.0


def test_quantize_target_params_structure():
    eng0 = make_engine(3)
    qp = quant.quantize_target_params(eng0.params)
    # stacked [L, in, out] layer weights quantize per layer
    assert qp["layers"]["wq"]["q8"].dtype == jnp.int8
    assert qp["layers"]["wq"]["q8"].shape == eng0.params["layers"]["wq"].shape
    assert qp["layers"]["wq"]["scale"].shape == (
        eng0.params["layers"]["wq"].shape[0],
        eng0.params["layers"]["wq"].shape[2])
    assert qp["lm_head"]["q8"].dtype == jnp.int8
    assert qp["embed"]["w"].dtype == eng0.params["embed"]["w"].dtype
    assert qp["layers"]["ln1"].dtype == eng0.params["layers"]["ln1"].dtype


@pytest.mark.parametrize("version", [1, 3])
def test_int8_target_greedy_bit_exact_within_engine(version):
    """int8 TARGET serving mode: outputs must match the int8 target's OWN
    vanilla decode bit-for-bit (the greedy invariant holds inside the
    quantized engine; the bf16 target's trajectory is a different model's)."""
    eng0 = make_engine(version)
    qparams = quant.quantize_target_params(eng0.params)
    eng = EagleEngine(qparams, eng0.cfg, eng0.dparams, eng0.dcfg, eng0.ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=30)
    out = eng.generate(PROMPT, max_new_tokens=30)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
    out_f = eng.generate_fused(PROMPT, max_new_tokens=30)
    np.testing.assert_array_equal(out_f[: len(ref)], ref[: len(out_f)])


def test_int8_target_fused_vanilla_consistent():
    """Host-loop vanilla == fused vanilla scan on the int8 target (both
    decode paths share the quantized matmul path)."""
    eng0 = make_engine(3)
    qparams = quant.quantize_target_params(eng0.params)
    eng = EagleEngine(qparams, eng0.cfg, eng0.dparams, eng0.dcfg, eng0.ecfg)
    a = eng.generate_vanilla(PROMPT, max_new_tokens=24)
    b = eng.generate_vanilla(PROMPT, max_new_tokens=24, fused=True)
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Mixtral expert-bank quantization (VERDICT r3 #3): the E× FFN weight
# footprint is exactly where weight-only int8 matters most
# (modeling_mixtral_kv.py:449-517)
# ---------------------------------------------------------------------------

def _moe_setup(moe_impl="dense", n_experts=8):
    import dataclasses
    from eagle_tpu.config import ModelConfig
    from eagle_tpu.models import draft as draft_mod
    from eagle_tpu.models import transformer
    from test_engine_greedy import tiny_dcfg

    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_q_heads=8, num_kv_heads=4, head_dim=8, num_experts=n_experts,
        experts_per_token=2, moe_impl=moe_impl, dtype=jnp.float32,
    )
    if moe_impl == "capacity":
        cfg = dataclasses.replace(cfg, moe_capacity_factor=8.0)
    dcfg = tiny_dcfg(3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    from eagle_tpu.models import transformer as tr
    params = tr.init_params(cfg, k1)
    dparams = draft_mod.init_params(dcfg, k2)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    return cfg, dcfg, params, dparams, ecfg


def test_quantize_target_params_moe_structure():
    cfg, _, params, _, _ = _moe_setup()
    qp = quant.quantize_target_params(params)
    wg = params["layers"]["we_gate"]                      # [L, E, H, F]
    assert qp["layers"]["we_gate"]["q8"].dtype == jnp.int8
    assert qp["layers"]["we_gate"]["q8"].shape == wg.shape
    assert qp["layers"]["we_gate"]["scale"].shape == (
        wg.shape[0], wg.shape[1], wg.shape[3])            # [L, E, F]
    wd = params["layers"]["we_down"]                      # [L, E, F, H]
    assert qp["layers"]["we_down"]["scale"].shape == (
        wd.shape[0], wd.shape[1], wd.shape[3])            # [L, E, H]
    # router (tiny) stays unquantized
    assert not isinstance(qp["layers"]["router"], dict)


@pytest.mark.parametrize("moe_impl", ["dense", "capacity"])
def test_int8_moe_target_greedy_bit_exact_within_engine(moe_impl):
    """int8-quantized Mixtral target (expert banks included): speculative
    greedy output bit-identical to the quantized target's OWN vanilla
    decode, in both MoE dispatch modes."""
    cfg, dcfg, params, dparams, ecfg = _moe_setup(moe_impl)
    qparams = quant.quantize_target_params(params)
    eng = EagleEngine(qparams, cfg, dparams, dcfg, ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=24)
    out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_int8_moe_dispatch_modes_close():
    """Quantized capacity dispatch ≈ quantized dense dispatch with ample
    capacity (same int8 banks, same per-token activation scales — only the
    gather/scatter route differs), and both ≈ the bf16 model."""
    import dataclasses
    from eagle_tpu.models import transformer
    from eagle_tpu.ops.kv_cache import init_cache
    from eagle_tpu.ops.masks import prefill_mask

    cfg, _, params, _, _ = _moe_setup()
    cfg_cap = dataclasses.replace(cfg, moe_impl="capacity",
                                  moe_capacity_factor=8.0)
    qparams = quant.quantize_target_params(params)
    T, S = 12, 32
    tokens = jnp.asarray(np.random.default_rng(5).integers(
        0, cfg.vocab_size, size=(1, T)), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]

    def run(c, p):
        cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S,
                           cfg.head_dim, dtype=jnp.float32)
        res = transformer.forward(p, c, tokens, cache, pos,
                                  prefill_mask(T, S, cache.length))
        return np.asarray(transformer.lm_head(p, c, res.hidden))

    q_dense = run(cfg, qparams)
    q_cap = run(cfg_cap, qparams)
    np.testing.assert_allclose(q_cap, q_dense, rtol=2e-5, atol=2e-5)
    bf = run(cfg, params)
    rel = np.linalg.norm(q_dense - bf) / np.linalg.norm(bf)
    assert rel < 0.05, rel


@pytest.mark.parametrize("moe_impl", ["dense", "capacity"])
def test_int8_moe_target_ep_sharded(moe_impl):
    """int8 MoE target under expert-parallel sharding on the CPU mesh:
    sharded speculative greedy == the sharded engine's own vanilla decode,
    and sharded prefill logits match unsharded (mirrors
    test_quant4_tp.py::test_int4_target_engine_tp8)."""
    from jax.sharding import NamedSharding
    from eagle_tpu.parallel import sharding as shd

    cfg, dcfg, params, dparams, ecfg = _moe_setup(moe_impl)
    qparams = quant.quantize_target_params(params)
    eng_ref = EagleEngine(qparams, cfg, dparams, dcfg, ecfg)
    ref_v = eng_ref.generate_vanilla(PROMPT, max_new_tokens=24)

    mesh = shd.make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
    qparams_s = shd.shard_params(qparams, mesh,
                                 shd.quantized_target_param_specs(cfg))
    dparams_s = shd.replicate(dparams, mesh)
    eng = EagleEngine(qparams_s, cfg, dparams_s, dcfg, ecfg)
    with jax.set_mesh(mesh):
        out_v = eng.generate_vanilla(PROMPT, max_new_tokens=24)
        out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(out_v)], out_v[: len(out)])
    # cross-config: int8 dots are exact; the f32 expert-sum reduction
    # order may differ under sharding -> allclose, not bitwise
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v))
