"""Structural validation of the dynamic beam drafter.

With top_k=1 the EAGLE-2 dynamic tree degenerates to a greedy chain, so
three independent implementations must agree token-for-token:
1. the dynamic beam drafter (`draft_round`, flat-score bookkeeping),
2. the static-tree drafter on a chain topology (`draft_round_static`),
3. a hand-rolled greedy rollout of the draft net.
This locks down the beam/parent index arithmetic (cnets.py:728-764).
"""

import numpy as np

import jax
import jax.numpy as jnp

from eagle_tpu.config import DraftConfig, EngineConfig
from eagle_tpu.engine.drafter import (StaticTreeSpec, draft_round,
                                      draft_round_static)
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.ops.kv_cache import init_cache
from eagle_tpu.ops.masks import prefill_mask
from eagle_tpu.ops.tree import chain_paths

from test_engine_greedy import tiny_dcfg

DEPTH = 4


def _setup(seed=0):
    dcfg = tiny_dcfg(1)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(seed),
                                    dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    T = 6
    ext_tokens = jnp.asarray(rng.integers(0, dcfg.vocab_size, T), jnp.int32)
    ext_feats = jnp.asarray(rng.normal(size=(T, dcfg.hidden_size)),
                            jnp.float32)
    head_w = jnp.asarray(rng.normal(size=(dcfg.hidden_size,
                                          dcfg.vocab_size)) * 0.3,
                         jnp.float32)
    return dcfg, dparams, ext_tokens, ext_feats, jnp.int32(T), head_w


def _fresh_cache(dcfg, S=128):
    return init_cache(dcfg.num_layers, 1, dcfg.num_kv_heads, S,
                      dcfg.head_dim, dtype=jnp.float32)


def test_dynamic_k1_equals_static_chain_equals_manual():
    dcfg, dparams, ext_tokens, ext_feats, n_new, head_w = _setup()

    # 1. dynamic beam drafter, k=1
    ecfg = EngineConfig(total_tokens=DEPTH, depth=DEPTH, top_k=1, max_len=64)
    dr_dyn = draft_round(dparams, dcfg, ecfg, ext_tokens, ext_feats, n_new,
                         _fresh_cache(dcfg), head_w)

    # 2. static chain drafter
    spec = StaticTreeSpec(chain_paths(DEPTH))
    dr_st = draft_round_static(dparams, dcfg, spec, ext_tokens, ext_feats,
                               n_new, _fresh_cache(dcfg), head_w)

    # 3. manual greedy rollout
    cache = _fresh_cache(dcfg)
    S = cache.max_len
    T = int(n_new)
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    res = draft_mod.forward(dparams, dcfg, ext_tokens[None], ext_feats[None],
                            cache, pos, prefill_mask(T, S, cache.length))
    hidden = res.hidden[0, T - 1]
    cache = res.cache
    manual = [int(ext_tokens[T - 1])]
    dlen = T
    for i in range(DEPTH):
        logits = draft_mod.draft_logits(dparams, dcfg, hidden, head_w)
        tok = int(jnp.argmax(logits))
        manual.append(tok)
        cache = cache._replace(length=jnp.asarray([dlen + i]))
        posi = jnp.asarray([[dlen + i]], jnp.int32)
        mask = prefill_mask(1, S, cache.length)
        r = draft_mod.forward(dparams, dcfg, jnp.asarray([[tok]]),
                              hidden[None, None], cache, posi, mask)
        hidden = r.hidden[0, 0]
        cache = r.cache

    chain_dyn = np.asarray(dr_dyn.tree.tokens)
    chain_st = np.asarray(dr_st.tree.tokens)
    np.testing.assert_array_equal(chain_dyn, manual)
    np.testing.assert_array_equal(chain_st, manual)
    np.testing.assert_array_equal(np.asarray(dr_dyn.tree.parents),
                                  np.arange(DEPTH + 1) - 1 + (np.arange(DEPTH + 1) == 0))
    np.testing.assert_array_equal(np.asarray(dr_dyn.tree.positions),
                                  np.arange(DEPTH + 1))


def test_dynamic_tree_invariants_topk():
    """General k: parents precede children; depths consistent; scores of the
    selected frontier decrease along each root path (children never outscore
    parents in cumulative logprob)."""
    dcfg, dparams, ext_tokens, ext_feats, n_new, head_w = _setup(seed=3)
    ecfg = EngineConfig(total_tokens=14, depth=3, top_k=4, max_len=64)
    dr = draft_round(dparams, dcfg, ecfg, ext_tokens, ext_feats, n_new,
                     _fresh_cache(dcfg), head_w)
    tree = dr.tree
    parents = np.asarray(tree.parents)
    depths = np.asarray(tree.positions)
    N = len(parents)
    assert parents[0] == 0 and depths[0] == 0
    for i in range(1, N):
        assert parents[i] < i
        assert depths[i] == depths[parents[i]] + 1
    # children table consistency
    ch = np.asarray(tree.children)
    for n in range(N):
        for c in ch[n]:
            if c >= 0:
                assert parents[c] == n


def test_topk_rows_matches_lax_top_k():
    """topk_rows (iterative argmax — immune to XLA's vmapped-TopK sort
    fallback) must match lax.top_k exactly, including descending value
    order, for 1-D and batched inputs."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eagle_tpu.engine.drafter import topk_rows

    rng = np.random.default_rng(0)
    for shape in ((1000,), (7, 1000), (2, 5, 333)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        v0, i0 = jax.lax.top_k(x, 6)
        v1, i1 = topk_rows(x, 6)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # ties: both must order equal values by ascending index
    xt = jnp.asarray([3.0, 7.0, 7.0, 1.0, 7.0], jnp.float32)
    _, it = topk_rows(xt, 3)
    np.testing.assert_array_equal(np.asarray(it), [1, 2, 4])


def test_sampled_dynamic_shares_deterministic_shape():
    """true_q_dynamic two-pass drafting: the sampled tree's SHAPE (parents,
    hence depths/children) must equal the deterministic beam's — that
    context-measurability is what makes true-q acceptance lossless on
    dynamic trees (pruning sampled candidates by their own scores would
    bias the conditional draw law). Tokens differ (Gumbel draws);
    node_probs rows used for children are normalized distributions."""
    dcfg, dparams, ext_tokens, ext_feats, n_new, head_w = _setup(seed=5)
    ecfg_det = EngineConfig(total_tokens=14, depth=3, top_k=4, max_len=64)
    ecfg_s = EngineConfig(total_tokens=14, depth=3, top_k=4, max_len=64,
                          temperature=0.8, acceptance="true_q_dynamic")
    det = draft_round(dparams, dcfg, ecfg_det, ext_tokens, ext_feats, n_new,
                      _fresh_cache(dcfg), head_w)
    smp = draft_round(dparams, dcfg, ecfg_s, ext_tokens, ext_feats, n_new,
                      _fresh_cache(dcfg), head_w,
                      key=jax.random.PRNGKey(42), temperature=jnp.float32(0.8))
    np.testing.assert_array_equal(np.asarray(det.tree.parents),
                                  np.asarray(smp.tree.parents))
    assert det.tree.node_probs is None
    assert smp.tree.node_probs is not None
    # root token is the pinned pending token in both
    assert int(det.tree.tokens[0]) == int(smp.tree.tokens[0])
    probs = np.asarray(smp.tree.node_probs)
    ch = np.asarray(smp.tree.children)
    toks = np.asarray(smp.tree.tokens)
    for n in range(len(toks)):
        kids = ch[n][ch[n] >= 0]
        if len(kids):
            # the distribution children were drawn from is normalized and
            # assigns positive mass to every drawn child
            np.testing.assert_allclose(probs[n].sum(), 1.0, atol=1e-4)
            assert np.all(probs[n][toks[kids]] > 0)
    # draw-order prefix: two different keys give shape-identical trees
    smp2 = draft_round(dparams, dcfg, ecfg_s, ext_tokens, ext_feats, n_new,
                       _fresh_cache(dcfg), head_w,
                       key=jax.random.PRNGKey(7),
                       temperature=jnp.float32(0.8))
    np.testing.assert_array_equal(np.asarray(smp.tree.parents),
                                  np.asarray(smp2.tree.parents))
