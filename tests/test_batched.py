"""Batched speculative generation: each sequence in the batch must exactly
reproduce its single-sequence (and vanilla) greedy output, with ragged
prompt lengths and per-sequence EOS finishes."""

import numpy as np

from test_engine_greedy import make_engine


def test_batch_matches_single():
    eng = make_engine(1)
    prompts = [
        np.array([5, 17, 92, 3], np.int32),
        np.array([7, 1], np.int32),
        np.array([44, 8, 21, 9, 62, 13], np.int32),
    ]
    singles = [eng.generate(p, max_new_tokens=24) for p in prompts]
    batched = eng.generate_batch(prompts, max_new_tokens=24)
    assert len(batched) == 3
    for s, b in zip(singles, batched):
        np.testing.assert_array_equal(b, s)


def test_batch_eos_per_sequence():
    eng0 = make_engine(1)
    prompts = [np.array([5, 17, 92, 3], np.int32),
               np.array([9, 2, 77], np.int32)]
    refs = [eng0.generate_vanilla(p, max_new_tokens=30) for p in prompts]
    # choose an EOS that appears early in sequence 0's continuation only
    eos = int(refs[0][len(prompts[0]) + 4])
    from eagle_tpu.engine.engine import EagleEngine
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg,
                      eng0.ecfg, eos_token_id=eos)
    outs = eng.generate_batch(prompts, max_new_tokens=30)
    exp0 = eng0.generate_vanilla(prompts[0], max_new_tokens=30,
                                 eos_token_id=eos)
    exp1 = eng0.generate_vanilla(prompts[1], max_new_tokens=30,
                                 eos_token_id=eos)
    np.testing.assert_array_equal(outs[0], exp0)
    np.testing.assert_array_equal(outs[1], exp1)


def test_batch_fused_matches_batch():
    from eagle_tpu.engine.engine import EagleEngine
    eng0 = make_engine(1)
    prompts = [np.array([5, 17, 92, 3], np.int32),
               np.array([7, 1], np.int32)]
    refs = [eng0.generate_vanilla(p, max_new_tokens=20) for p in prompts]
    eos = int(refs[0][len(prompts[0]) + 6])
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg,
                      eng0.ecfg, eos_token_id=eos)
    outs = eng.generate_batch_fused(prompts, max_new_tokens=20)
    for p, o in zip(prompts, outs):
        exp = eng0.generate_vanilla(p, max_new_tokens=20, eos_token_id=eos)
        np.testing.assert_array_equal(o, exp)
