"""Engine-level sampled generation: runs end-to-end, emits valid tokens, and
its per-prompt first-token marginal tracks the target distribution (the
statistical heavy lifting lives in test_losslessness_mc.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.sampling import process_logits
from eagle_tpu.models import transformer
from eagle_tpu.ops.kv_cache import init_cache
from eagle_tpu.ops.masks import prefill_mask

from test_engine_greedy import PROMPT, make_engine


def test_sampled_generation_runs():
    eng = make_engine(3, temperature=0.9, top_p=0.9)
    out, new_tok, rounds = eng.generate(PROMPT, max_new_tokens=32, log=True,
                                        seed=7)
    assert new_tok == 32
    assert rounds >= 1
    assert np.all(out >= 0) and np.all(out < eng.cfg.vocab_size)
    # different seed → (almost surely) different sample
    out2 = eng.generate(PROMPT, max_new_tokens=32, seed=8)
    assert not np.array_equal(out, out2)


def test_engine_first_token_marginal():
    eng = make_engine(1, temperature=1.0, seed=5)
    n = 400
    firsts = np.array([
        eng.generate(PROMPT, max_new_tokens=1, seed=1000 + i)[len(PROMPT)]
        for i in range(n)
    ])
    # ground-truth distribution from a direct forward
    cfg, e = eng.cfg, eng.ecfg
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim,
                       dtype=cfg.dtype)
    T = len(PROMPT)
    res = transformer.forward(
        eng.params, cfg, jnp.asarray(PROMPT)[None], cache,
        jnp.arange(T, dtype=jnp.int32)[None], prefill_mask(T, 64, cache.length))
    logits = transformer.lm_head(eng.params, cfg, res.hidden[0, T - 1])
    p = np.asarray(jax.nn.softmax(process_logits(logits, e.temperature)))
    emp = np.bincount(firsts, minlength=cfg.vocab_size) / n
    # crude agreement: top-1 token frequency within 5 sigma
    t = int(p.argmax())
    sigma = np.sqrt(p[t] * (1 - p[t]) / n)
    assert abs(emp[t] - p[t]) < 5 * sigma + 0.02


def test_engine_second_token_conditional():
    """Full-pipeline conditional check: among generations whose first token
    is the modal one, the second token must follow the model's true
    conditional (testbug/vis.py per-position histogram analog)."""
    eng0 = make_engine(1, temperature=1.0, seed=5)
    # sharpen the head so conditionals are concentrated enough to test
    params = dict(eng0.params)
    params["lm_head"] = params["lm_head"] * 8.0
    from eagle_tpu.engine.engine import EagleEngine
    eng = EagleEngine(params, eng0.cfg, eng0.dparams, eng0.dcfg, eng0.ecfg)
    cfg, e = eng.cfg, eng.ecfg
    n = 500
    seqs = np.stack([
        eng.generate(PROMPT, max_new_tokens=2, seed=2000 + i)[len(PROMPT):]
        for i in range(n)
    ])
    # exact conditionals via direct forwards
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim,
                       dtype=cfg.dtype)
    T = len(PROMPT)
    res = transformer.forward(
        eng.params, cfg, jnp.asarray(PROMPT)[None], cache,
        jnp.arange(T, dtype=jnp.int32)[None], prefill_mask(T, 64, cache.length))
    logits = transformer.lm_head(eng.params, cfg, res.hidden[0, T - 1])
    p1 = np.asarray(jax.nn.softmax(process_logits(logits, e.temperature)))
    # condition on the most frequent OBSERVED first token (selection is
    # independent of position-2 values, so the conditional is unbiased)
    t1 = int(np.bincount(seqs[:, 0], minlength=cfg.vocab_size).argmax())
    sel = seqs[:, 0] == t1
    assert sel.sum() >= 30  # concentrated head → modal token is frequent
    # marginal of t1 must match too
    sigma1 = np.sqrt(p1[t1] * (1 - p1[t1]) / n)
    assert abs(sel.mean() - p1[t1]) < 5 * sigma1 + 0.03

    ext = np.concatenate([PROMPT, [t1]])
    T2 = len(ext)
    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim,
                       dtype=cfg.dtype)
    res2 = transformer.forward(
        eng.params, cfg, jnp.asarray(ext)[None], cache,
        jnp.arange(T2, dtype=jnp.int32)[None],
        prefill_mask(T2, 64, cache.length))
    logits2 = transformer.lm_head(eng.params, cfg, res2.hidden[0, T2 - 1])
    p2 = np.asarray(jax.nn.softmax(process_logits(logits2, e.temperature)))
    t2 = int(p2.argmax())
    emp = (seqs[sel, 1] == t2).mean()
    sigma = np.sqrt(p2[t2] * (1 - p2[t2]) / sel.sum())
    assert abs(emp - p2[t2]) < 5 * sigma + 0.03, (emp, p2[t2], sel.sum())


def test_fused_sampled_generation_runs():
    """generate_fused under temperature>0 (the while_loop carries PRNG keys
    through rounds)."""
    eng = make_engine(3, temperature=0.9, top_p=0.9)
    out, ntok, rounds = eng.generate_fused(PROMPT, max_new_tokens=24,
                                           seed=3, log=True)
    assert ntok >= 24 and rounds >= 1
    out2 = eng.generate_fused(PROMPT, max_new_tokens=24, seed=4)
    assert not np.array_equal(out, out2)


def test_true_q_dynamic_reduced_draft_vocab():
    """true_q_dynamic with a reduced draft vocab (d2t/t2d): candidate
    draws map through d2t and node_probs scatter to TARGET-vocab ids
    (the accept walk indexes them by target token)."""
    eng = make_engine(3, draft_vocab=64, temperature=0.9,
                      acceptance="true_q_dynamic")
    out, st = eng.generate(PROMPT, max_new_tokens=16, details=True)
    assert st["rounds"] >= 1 and len(out) > len(PROMPT)
    # the tree carries target-vocab-sized sampled distributions
    import jax.numpy as jnp
    cache, dcache = eng.init_caches()
    padded = np.zeros((1, 128), np.int32)
    padded[0, : len(PROMPT)] = PROMPT
    state = jax.jit(eng._prefill)(
        eng.params, eng.dparams, jnp.asarray(padded),
        jnp.int32(len(PROMPT)), cache, dcache, jax.random.PRNGKey(0),
        jnp.float32(0.9))
    assert state.tree.node_probs.shape[-1] == eng.cfg.vocab_size
    probs0 = np.asarray(state.tree.node_probs[0])
    np.testing.assert_allclose(probs0.sum(), 1.0, atol=1e-4)
    # mass lives only on d2t-mapped target ids (64 of 128)
    assert (probs0 > 0).sum() <= 64
