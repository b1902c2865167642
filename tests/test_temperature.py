"""Per-request sampling temperature as traced data.

Reference behavior: the webui passes sampling settings into every request
(/root/reference/eagle/application/webui.py:253-280) and eagenerate builds a
logits processor per call (ea_model.py:199-231). Here temperature rides in
EngineState as a traced fp32 scalar — distinct t>0 values reuse one compiled
program; t=0 uses the structurally different greedy program via
`EagleEngine.with_sampling`.
"""

import numpy as np

from eagle_tpu.engine.server import EagleServer

from test_engine_greedy import PROMPT, make_engine


def test_temperatures_share_one_program():
    """Different t>0 values on the same sampled engine must not retrace:
    the jitted round cache has exactly one entry afterward."""
    eng = make_engine(3, temperature=0.9)
    o1 = eng.generate(PROMPT, max_new_tokens=16, seed=3, temperature=0.5)
    o2 = eng.generate(PROMPT, max_new_tokens=16, seed=3, temperature=5.0)
    # same seed, different temperature → different samples (almost surely)
    assert not np.array_equal(o1, o2)
    n_compiles = eng._round_jit._cache_size()
    assert n_compiles == 1, f"temperature retraced the round: {n_compiles}"


def test_high_vs_low_temperature_distributions():
    eng = make_engine(3, temperature=1.0)
    # near-zero temperature on the sampled program ≈ argmax: must equal the
    # greedy sibling's output
    greedy = eng.with_sampling(False)
    ref = greedy.generate(PROMPT, max_new_tokens=24)
    out = eng.generate(PROMPT, max_new_tokens=24, seed=11,
                       temperature=1e-4)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_with_sampling_roundtrip():
    eng = make_engine(1)  # greedy mode
    assert eng.with_sampling(False) is eng
    samp = eng.with_sampling(True)
    assert samp.params is eng.params and samp.dparams is eng.dparams
    assert samp.ecfg.temperature > 0
    assert samp.with_sampling(True) is samp
    out = samp.generate(PROMPT, max_new_tokens=8, seed=2, temperature=2.0)
    assert len(out) == len(PROMPT) + 8


def test_server_mixed_temperatures():
    """Two requests with different temperatures share one batched round
    program; the near-zero-t request reproduces greedy output."""
    eng = make_engine(3, temperature=1.0)
    greedy_ref = eng.with_sampling(False).generate(PROMPT, max_new_tokens=16)
    srv = EagleServer(eng, max_batch=2)
    r_cold = srv.submit(PROMPT, max_new_tokens=16, temperature=1e-4)
    r_hot = srv.submit(PROMPT, max_new_tokens=16, seed=9, temperature=4.0)
    outs = srv.run()
    np.testing.assert_array_equal(outs[r_cold][: len(greedy_ref)],
                                  greedy_ref[: len(outs[r_cold])])
    assert not np.array_equal(outs[r_hot], outs[r_cold])


def test_vanilla_temperature_plumbed():
    eng = make_engine(3, temperature=1.0)
    greedy = eng.with_sampling(False)
    ref = greedy.generate_vanilla(PROMPT, max_new_tokens=16)
    cold = eng.generate_vanilla(PROMPT, max_new_tokens=16, temperature=1e-4)
    np.testing.assert_array_equal(cold, ref)
    hot = eng.generate_vanilla(PROMPT, max_new_tokens=16, seed=5,
                               temperature=5.0)
    assert not np.array_equal(hot, ref)


def test_static_tree_true_q_per_request_temperature():
    """Sampled static trees (true-q acceptance, sampled-without-replacement
    candidates) honor the traced per-request temperature: near-zero t
    reproduces the greedy static-tree engine; same seed at different t>0
    gives different samples without retracing."""
    from eagle_tpu.ops.tree import MC_SIM_7B_63

    eng = make_engine(3, tree_paths=MC_SIM_7B_63, temperature=0.9,
                      acceptance="true_q")
    greedy = make_engine(3, tree_paths=MC_SIM_7B_63)
    ref = greedy.generate(PROMPT, max_new_tokens=20)
    cold = eng.generate(PROMPT, max_new_tokens=20, seed=4, temperature=1e-4)
    np.testing.assert_array_equal(cold[: len(ref)], ref[: len(cold)])
    h1 = eng.generate(PROMPT, max_new_tokens=20, seed=4, temperature=1.0)
    h2 = eng.generate(PROMPT, max_new_tokens=20, seed=4, temperature=6.0)
    assert not np.array_equal(h1, h2)
    assert eng._round_jit._cache_size() == 1


def test_dynamic_sampled_batched_and_per_request_temperature():
    """true_q_dynamic: batched-fused generation runs (vmapped two-pass
    drafting + true-q walks), per-request temperatures ride as traced
    data (one compiled program), and seeds reproduce."""
    eng = make_engine(3, temperature=0.9, acceptance="true_q_dynamic")
    outs = eng.generate_batch_fused([PROMPT, PROMPT[:4]], max_new_tokens=10,
                                    seed=2)
    assert len(outs) == 2 and all(len(o) > 4 for o in outs)
    a = eng.generate(PROMPT, max_new_tokens=12, seed=7, temperature=0.7)
    b = eng.generate(PROMPT, max_new_tokens=12, seed=7, temperature=0.7)
    np.testing.assert_array_equal(a, b)  # same seed reproduces
    c = eng.generate(PROMPT, max_new_tokens=12, seed=7, temperature=5.0)
    assert not np.array_equal(a, c)      # temperature actually plumbs
    assert eng._round_jit._cache_size() == 1
