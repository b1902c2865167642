"""Length-bucketed decode attention: fused spec and vanilla paths share the
bucket formula, so greedy outputs stay bit-exact — and match the unbucketed
engine."""

import numpy as np

from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine

from test_engine_greedy import PROMPT, make_engine


def test_bucketed_fused_bit_exact():
    eng0 = make_engine(1)
    ref_full = eng0.generate_fused(PROMPT, max_new_tokens=48)

    ecfg_b = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                          kv_buckets=(64, 128))
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg_b)
    out = eng.generate_fused(PROMPT, max_new_tokens=48)
    # generation crosses the 64-row bucket boundary (7 prompt + 48 + tree)
    np.testing.assert_array_equal(out, ref_full)

    van_b = eng.generate_vanilla(PROMPT, max_new_tokens=48, fused=True)
    van_full = eng0.generate_vanilla(PROMPT, max_new_tokens=48, fused=True)
    np.testing.assert_array_equal(van_b, van_full)
    np.testing.assert_array_equal(out[: len(van_b)], van_b[: len(out)])


def test_bucketed_sampled_runs():
    ecfg_b = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                          kv_buckets=(64,), temperature=0.9)
    eng0 = make_engine(1, temperature=0.9)
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg_b)
    out, ntok, rounds = eng.generate_fused(PROMPT, max_new_tokens=20,
                                           seed=3, log=True)
    assert ntok >= 20 and rounds >= 1


def test_bucketed_batch_fused_matches_unbucketed():
    eng0 = make_engine(1)
    prompts = [np.array([5, 17, 92, 3], np.int32),
               np.array([7, 1], np.int32)]
    ref = eng0.generate_batch_fused(prompts, max_new_tokens=24)

    ecfg_b = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                          kv_buckets=(64, 128))
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg_b)
    outs = eng.generate_batch_fused(prompts, max_new_tokens=24)
    for a, b in zip(outs, ref):
        np.testing.assert_array_equal(a, b)
