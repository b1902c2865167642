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
