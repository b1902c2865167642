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


def test_batch_fused_forced_replay():
    """Batched forced replay: every sequence must walk exactly its own
    reference trajectory (incl. where it diverges from the live argmax),
    mirroring generate_fused's force_tokens contract."""
    eng = make_engine(1)
    prompts = [np.array([5, 17, 92, 3], np.int32),
               np.array([7, 1], np.int32)]
    fulls = [np.asarray(eng.generate_fused(p, max_new_tokens=64))
             for p in prompts]
    # corrupt sequence 1's reference so replay != free-running there
    refs = [fulls[0].copy(), fulls[1].copy()]
    flip = len(prompts[1]) + 5
    refs[1][flip] = (refs[1][flip] + 1) % eng.cfg.vocab_size
    outs, committed, rounds = eng.generate_batch_fused(
        prompts, max_new_tokens=24, force_tokens=refs, log=True)
    for r, o in zip(refs, outs):
        np.testing.assert_array_equal(o, r[: len(o)])
    assert outs[1][flip] == refs[1][flip] != fulls[1][flip]
    assert rounds >= 1
    # committed counts are untrimmed: at least the requested budget
    assert all(c >= 24 for c in committed)


def test_batch_fused_forced_replay_rejects_bad_inputs():
    eng = make_engine(1)
    prompts = [np.array([5, 17, 92, 3], np.int32)]
    full = np.asarray(eng.generate_fused(prompts[0], max_new_tokens=64))
    with np.testing.assert_raises(ValueError):  # too short
        eng.generate_batch_fused(prompts, max_new_tokens=60,
                                 force_tokens=[full[:30]])
    with np.testing.assert_raises(ValueError):  # row-count mismatch
        eng.generate_batch_fused(prompts, max_new_tokens=8,
                                 force_tokens=[full, full])
    sampled = make_engine(1, temperature=0.8)
    with np.testing.assert_raises(ValueError):
        sampled.generate_batch_fused(prompts, max_new_tokens=8,
                                     force_tokens=[full])


def test_batch_int4_target_stacked_matches_single(monkeypatch):
    """Batched (vmapped) rounds over a STACKED int4 target: the layer
    index rides in the scan's xs so it stays unbatched under vmap, and
    the stacked kernel's custom_vmap rule flattens the batch into M —
    exactly the B=8 serving composition on TPU. Forced through the
    interpreted kernel; each sequence must reproduce its single-sequence
    output bit-for-bit."""
    from eagle_tpu.engine.engine import EagleEngine
    from eagle_tpu.ops import quant4

    eng0 = make_engine(3)
    qparams = quant4.quantize_target_params4(eng0.params)
    monkeypatch.setattr(quant4, "FORCE_INTERPRET", True)
    eng = EagleEngine(qparams, eng0.cfg, eng0.dparams, eng0.dcfg, eng0.ecfg)
    prompts = [
        np.array([5, 17, 92, 3], np.int32),
        np.array([7, 1], np.int32),
        np.array([44, 8, 21, 9, 62, 13], np.int32),
    ]
    singles = [eng.generate(p, max_new_tokens=16) for p in prompts]
    batched = eng.generate_batch(prompts, max_new_tokens=16)
    for s, b in zip(singles, batched):
        np.testing.assert_array_equal(b, s)
