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
