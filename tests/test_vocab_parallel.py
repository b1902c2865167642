"""TP decode must not materialize full-vocab logits.

The lm_head is column-sharded over "model" (parallel/sharding.py:17); the
decode round's [V]-wide ops (argmax walks, softmax, bonus sampling) must
compile to partitioned reduces — never a [V]-sized all-gather. Greedy was
already clean; the sampled path's bonus draw uses Gumbel-max (argmax, a
partitionable reduce) instead of CDF-inversion cumsum precisely for this.
Companion guarantees: sharded greedy output stays bit-exact
(test_sharding.py::test_engine_runs_sharded); sampled distribution
preservation (test_losslessness_mc.py).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer
from eagle_tpu.parallel import sharding as shd

V = 4096  # large enough that a V-sized all-gather is unmistakable in HLO


def _compiled_round(version: int, temperature: float) -> str:
    cfg = ModelConfig(vocab_size=V, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_q_heads=8, num_kv_heads=8, head_dim=8,
                      dtype=jnp.float32)
    dcfg = DraftConfig(version=version, hidden_size=64, intermediate_size=128,
                       num_q_heads=8, num_kv_heads=8, head_dim=8,
                       vocab_size=V, num_layers=1, dtype=jnp.float32,
                       target_hidden_size=64 if version == 3 else 0)
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
    mesh = shd.make_mesh(n_data=1, n_model=8)
    params_s = shd.shard_params(params, mesh, shd.target_param_specs(cfg))
    dparams_s = shd.replicate(dparams, mesh)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                        temperature=temperature)
    eng = EagleEngine(params_s, cfg, dparams_s, dcfg, ecfg)
    cache, dcache = eng.init_caches()
    with jax.set_mesh(mesh):
        st = jax.jit(eng._prefill)(
            params_s, dparams_s, jnp.zeros((1, 128), jnp.int32),
            jnp.int32(8), cache, dcache, jax.random.PRNGKey(0),
            jnp.float32(temperature))
        return jax.jit(eng._round).lower(
            params_s, dparams_s, st).compile().as_text()


@pytest.mark.parametrize("version,temperature",
                         [(3, 0.0), (3, 1.0), (1, 0.0), (1, 1.0)])
def test_round_has_no_vocab_sized_all_gather(version, temperature):
    txt = _compiled_round(version, temperature)
    offenders = [l.strip()[:160] for l in txt.splitlines()
                 if "all-gather" in l and re.search(rf"\b{V}\b", l)]
    assert not offenders, "\n".join(offenders)


def test_gumbel_categorical_matches_distribution():
    """categorical() is exactly categorical in distribution (chi-square on a
    skewed 5-way distribution, 20k draws)."""
    from eagle_tpu.engine.sampling import categorical

    p = jnp.asarray([0.5, 0.25, 0.125, 0.1, 0.025], jnp.float32)
    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    draws = np.asarray(jax.vmap(lambda k: categorical(k, p))(keys))
    counts = np.bincount(draws, minlength=5)
    expected = np.asarray(p) * n
    chi2 = float(np.sum((counts - expected) ** 2 / expected))
    # df=4; P(chi2 > 23.5) ≈ 1e-4
    assert chi2 < 23.5, (chi2, counts)
    # zero-probability entries are never drawn
    p0 = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    draws0 = np.asarray(jax.vmap(lambda k: categorical(k, p0))(keys[:200]))
    assert (draws0 == 1).all()
