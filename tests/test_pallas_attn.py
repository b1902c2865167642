"""Pallas tree-attention kernel vs XLA reference (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.ops import pallas_attn
from eagle_tpu.ops.tree import ancestor_mask


def _rand_tree_mask(N, rng):
    parents = np.zeros(N, np.int64)
    for i in range(1, N):
        parents[i] = rng.integers(0, i)
    return np.asarray(ancestor_mask(jnp.asarray(parents, jnp.int32), N))


def _setup(T, nq, nkv, d, S, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(T, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(nkv, S, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(nkv, S, d)), jnp.float32)
    kt = jnp.asarray(rng.normal(size=(T, nkv, d)), jnp.float32)
    vt = jnp.asarray(rng.normal(size=(T, nkv, d)), jnp.float32)
    tm = jnp.asarray(_rand_tree_mask(T, rng))
    return q, k, v, kt, vt, tm


@pytest.mark.parametrize("T,nq,nkv,d,S,start", [
    (16, 4, 2, 8, 128, 37),
    (61, 8, 4, 64, 512, 0),
    (61, 8, 8, 64, 512, 500),
    (26, 4, 4, 32, 256, 100),
])
def test_tree_attention_matches_xla(T, nq, nkv, d, S, start):
    q, k, v, kt, vt, tm = _setup(T, nq, nkv, d, S)
    st = jnp.int32(start)
    ref = pallas_attn.tree_attention_xla(q, k, v, kt, vt, tm, st)
    out = pallas_attn.tree_attention(q, k, v, kt, vt, tm, st, blk=128,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tree_attention_xla_matches_transformer_attention():
    """The split prefix+tree formulation must agree with the in-model dense
    attention over a cache that has the tree rows written at `start`."""
    from eagle_tpu.models.transformer import attention
    from eagle_tpu.ops.masks import tree_mask_full

    rng = np.random.default_rng(1)
    T, nq, nkv, d, S, start = 13, 4, 2, 16, 64, 21
    q, k, v, kt, vt, tm = _setup(T, nq, nkv, d, S, seed=1)
    # write the tree K/V into the cache at [start, start+T) (dense layout)
    kc = k.at[:, start:start + T, :].set(jnp.swapaxes(kt, 0, 1))
    vc = v.at[:, start:start + T, :].set(jnp.swapaxes(vt, 0, 1))
    mask = tree_mask_full(tm[None], S, jnp.asarray([start], jnp.int32))
    ref = attention(q[None], kc[None], vc[None], mask)[0]
    out = pallas_attn.tree_attention_xla(q, k, v, kt, vt, tm,
                                         jnp.int32(start))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_engine_greedy_with_pallas_attention():
    """End-to-end greedy bit-exactness with the Pallas verify kernel
    (interpret mode on CPU; compiled on TPU)."""
    import dataclasses

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_engine_greedy import PROMPT, make_engine
    from eagle_tpu.engine.engine import EagleEngine

    eng0 = make_engine(1)
    ref = eng0.generate_vanilla(PROMPT, max_new_tokens=24)
    cfg_p = dataclasses.replace(eng0.cfg, attn_impl="pallas_tree")
    eng = EagleEngine(eng0.params, cfg_p, eng0.dparams, eng0.dcfg, eng0.ecfg)
    out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_compact_rows_matches_reference():
    from eagle_tpu.ops.kv_cache import KVCache, compact_accepted

    rng = np.random.default_rng(4)
    L, n_kv, S, d, P, start = 3, 2, 64, 8, 5, 20
    k = jnp.asarray(rng.normal(size=(L, 1, n_kv, S, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(L, 1, n_kv, S, d)), jnp.float32)
    path = jnp.asarray([0, 3, 7, 12, 12], jnp.int32)
    alen = jnp.asarray([4], jnp.int32)

    cache = KVCache(k=k, v=v, length=jnp.asarray([start], jnp.int32))
    ref = compact_accepted(cache, path[None], alen)
    ok, ov = pallas_attn.compact_rows(k, v, path, jnp.int32(start),
                                      tree_size=16, interpret=True)
    # rows [start+P, start+Ppad) are pad scratch (beyond the accepted
    # length — never attended); compare everything else exactly
    Ppad = 8
    for got, exp in ((ok, ref.k), (ov, ref.v)):
        np.testing.assert_array_equal(np.asarray(got[..., :start + P, :]),
                                      np.asarray(exp[..., :start + P, :]))
        np.testing.assert_array_equal(
            np.asarray(got[..., start + Ppad:, :]),
            np.asarray(exp[..., start + Ppad:, :]))


def test_tree_attention_nonsquare_mask_draft_beam_shape():
    """The kernel also covers the draft beam-step shape: k queries vs a
    depth·k ancestor slab (mask [k, slab]) + committed prefix."""
    rng = np.random.default_rng(5)
    Tq, slab, nq, nkv, d, S, start = 10, 40, 4, 2, 16, 128, 77
    q = jnp.asarray(rng.normal(size=(Tq, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(nkv, S, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(nkv, S, d)), jnp.float32)
    kt = jnp.asarray(rng.normal(size=(slab, nkv, d)), jnp.float32)
    vt = jnp.asarray(rng.normal(size=(slab, nkv, d)), jnp.float32)
    tm = jnp.asarray(rng.random((Tq, slab)) < 0.3)
    tm = tm.at[:, 0].set(True)  # every row attends something
    st = jnp.int32(start)
    ref = pallas_attn.tree_attention_xla(q, k, v, kt, vt, tm, st)
    out = pallas_attn.tree_attention(q, k, v, kt, vt, tm, st, blk=64,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
