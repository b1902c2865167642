"""Fused draft projections (models/draft.fuse_projections): the engine
concatenates q|k|v and gate|up at init so each beam step streams one
weight tensor per group instead of three. Numerics must be unchanged and
the fusion must compose with draft quantization (per-output-column scales
commute with concatenation)."""

import dataclasses

import numpy as np
import pytest

import jax

from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod

from test_engine_greedy import PROMPT, make_engine


@pytest.mark.parametrize("version", [1, 3])
def test_fused_engine_matches_unfused(version):
    eng = make_engine(version)                    # fuse_draft=True default
    assert "wqkv" in eng.dparams["layers"][0]
    assert "wgu" in eng.dparams["layers"][0]
    assert "wq" not in eng.dparams["layers"][0]
    ecfg_u = dataclasses.replace(eng.ecfg, fuse_draft=False)
    eng_u = make_engine(version)
    eng_u = EagleEngine(eng_u.params, eng_u.cfg,
                        draft_unfused(version), eng_u.dcfg, ecfg_u)
    out = eng.generate(PROMPT, max_new_tokens=24)
    out_u = eng_u.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out, out_u)
    # vanilla never touches the draft; greedy invariant holds regardless
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def draft_unfused(version):
    from test_engine_greedy import tiny_dcfg

    dcfg = tiny_dcfg(version)
    return draft_mod.init_params(dcfg, jax.random.PRNGKey(1))


def test_fuse_is_idempotent_and_quant_composes():
    from test_engine_greedy import tiny_dcfg

    dcfg = tiny_dcfg(3)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
    fused = draft_mod.fuse_projections(dparams)
    assert draft_mod.fuse_projections(fused) is fused

    # quantize(concat) == concat(quantize): per-output-column scales
    from eagle_tpu.ops.quant import quantize_draft_params

    qf = quantize_draft_params(fused)["layers"][0]["wqkv"]
    qu = quantize_draft_params(dparams)["layers"][0]
    np.testing.assert_array_equal(
        np.asarray(qf["q8"]),
        np.concatenate([np.asarray(qu[k]["q8"]) for k in ("wq", "wk", "wv")],
                       axis=-1))
    np.testing.assert_array_equal(
        np.asarray(qf["scale"]),
        np.concatenate([np.asarray(qu[k]["scale"])
                        for k in ("wq", "wk", "wv")], axis=-1))


@pytest.mark.parametrize("dq", ["int8", "int4"])
def test_fused_quantized_draft_bit_exact_greedy(dq):
    eng0 = make_engine(3)
    ref = eng0.generate_vanilla(PROMPT, max_new_tokens=24)
    from eagle_tpu.config import EngineConfig

    ecfg = dataclasses.replace(eng0.ecfg, draft_quant=dq)
    eng = EagleEngine(eng0.params, eng0.cfg, draft_unfused(3), eng0.dcfg,
                      ecfg)
    assert isinstance(eng.dparams["layers"][0]["wqkv"], dict)
    out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
