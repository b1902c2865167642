"""Ring attention (sequence-parallel prefill) vs dense single-device
reference on the 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from eagle_tpu.parallel import sharding as shd
from eagle_tpu.parallel.ring_attention import ring_self_attention


def _dense_causal(q, k, v):
    B, T, nq, d = q.shape
    if k.shape[2] != nq:
        rep = nq // k.shape[2]
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) * (q.shape[-1] ** -0.5)
    mask = jnp.tril(jnp.ones((T, T), bool))
    s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)


def test_ring_attention_matches_dense():
    rng = np.random.default_rng(0)
    B, T, nq, nkv, d = 2, 64, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, T, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, nkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, nkv, d)), jnp.float32)
    ref = _dense_causal(q, k, v)
    mesh = shd.make_mesh(n_data=8, n_model=1)
    out = ring_self_attention(q, k, v, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_under_jit():
    rng = np.random.default_rng(1)
    B, T, nq, d = 1, 32, 2, 8
    q = jnp.asarray(rng.normal(size=(B, T, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, nq, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, nq, d)), jnp.float32)
    mesh = shd.make_mesh(n_data=8, n_model=1)
    out = jax.jit(lambda q, k, v: ring_self_attention(q, k, v, mesh,
                                                      axis="data"))(q, k, v)
    ref = _dense_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prefill_sp_matches_standard_forward():
    """Full sequence-parallel prefill (activations sharded over 8 devices)
    must reproduce the standard forward's hidden states, taps and KV."""
    from eagle_tpu.models import transformer
    from eagle_tpu.ops.kv_cache import init_cache
    from eagle_tpu.ops.masks import prefill_mask
    from eagle_tpu.parallel.ring_attention import prefill_sp
    from test_engine_greedy import tiny_cfg

    cfg = tiny_cfg()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    T = 64
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)

    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, T, cfg.head_dim,
                       dtype=jnp.float32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    ref = transformer.forward(params, cfg, tokens, cache, pos,
                              prefill_mask(T, T, cache.length))

    mesh = shd.make_mesh(n_data=8, n_model=1)
    with jax.set_mesh(mesh):
        hidden, taps, ks, vs = jax.jit(
            lambda p, t: prefill_sp(p, cfg, t, mesh, axis="data")
        )(params, tokens)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref.hidden),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(taps), np.asarray(ref.taps),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(ref.cache.k),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(ref.cache.v),
                               rtol=2e-5, atol=2e-5)


def test_engine_with_sp_prefill():
    """EagleEngine with sequence-parallel prefill: greedy output matches a
    standard-prefill engine (ring-softmax fp rounding differs, so compare
    token sequences — fp32+highest makes argmax flips vanishingly rare)."""
    from eagle_tpu.config import EngineConfig
    from eagle_tpu.engine.engine import EagleEngine
    from eagle_tpu.models import draft as draft_mod
    from eagle_tpu.models import transformer
    from test_engine_greedy import tiny_cfg, tiny_dcfg

    cfg = tiny_cfg()
    dcfg = tiny_dcfg(3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(17))
    params = transformer.init_params(cfg, k1)
    dparams = draft_mod.init_params(dcfg, k2)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)

    eng_std = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    mesh = shd.make_mesh(n_data=8, n_model=1)
    eng_sp = EagleEngine(params, cfg, dparams, dcfg, ecfg, sp_mesh=mesh,
                         sp_axis="data")
    prompt = np.arange(10, dtype=np.int32) * 7 % cfg.vocab_size
    with jax.set_mesh(mesh):
        out_sp = eng_sp.generate(prompt, max_new_tokens=24)
    out_std = eng_std.generate(prompt, max_new_tokens=24)
    ref = eng_std.generate_vanilla(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(out_std[: len(ref)], ref[: len(out_std)])
    np.testing.assert_array_equal(out_sp, out_std)


def test_sliding_window_engine_skips_sp_prefill():
    """A sliding-window target with sp_mesh configured must take the
    STANDARD prefill (ring attention is pure-causal and would silently
    change attention extents vs the decode path — ADVICE r1): greedy
    speculative output must stay bit-identical to vanilla decode, which
    applies the window in both phases."""
    import dataclasses
    from eagle_tpu.config import EngineConfig
    from eagle_tpu.engine.engine import EagleEngine
    from eagle_tpu.models import draft as draft_mod
    from eagle_tpu.models import transformer
    from test_engine_greedy import tiny_cfg, tiny_dcfg

    cfg = dataclasses.replace(
        tiny_cfg(), sliding_window=8,
        sliding_layer_flags=(True,) * tiny_cfg().num_layers)
    dcfg = tiny_dcfg(3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(23))
    params = transformer.init_params(cfg, k1)
    dparams = draft_mod.init_params(dcfg, k2)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)

    mesh = shd.make_mesh(n_data=8, n_model=1)
    eng_sp = EagleEngine(params, cfg, dparams, dcfg, ecfg, sp_mesh=mesh,
                         sp_axis="data")
    # prompt long enough that the window actually truncates attention
    prompt = (np.arange(24, dtype=np.int32) * 11) % cfg.vocab_size
    with jax.set_mesh(mesh):
        out_sp = eng_sp.generate(prompt, max_new_tokens=20)
        ref = eng_sp.generate_vanilla(prompt, max_new_tokens=20)
    np.testing.assert_array_equal(out_sp[: len(ref)], ref[: len(out_sp)])
