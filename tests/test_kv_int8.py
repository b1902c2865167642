"""int8 KV cache (EngineConfig.kv_quant="int8") — the serving operating
point that halves decode-round KV streaming (ops/kv_cache.py row
quantization, scale-folded attention reads in models/transformer.py).

Invariant (CLAUDE.md #1, per-operating-point like target weight quant):
greedy speculative output is bit-identical to `generate_vanilla` *within*
the int8-KV point, across dense / fused / bucketed / batched / paged /
static-tree / TP configurations. Reference frame: the contiguous slab this
generalizes is /root/reference/eagle/model/kv_cache.py:69-157.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.engine.paged import PagedEagleServer
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer
from eagle_tpu.ops.kv_cache import init_cache, quantize_kv_rows
from eagle_tpu.ops.masks import prefill_mask
from eagle_tpu.parallel import sharding as shd

from test_engine_greedy import PROMPT, make_engine, tiny_cfg, tiny_dcfg
from test_sharding import tp_cfg

PROMPTS = [
    np.array([5, 17, 92, 3], np.int32),
    np.array([7, 1], np.int32),
    np.array([44, 8, 21, 9], np.int32),
]


@pytest.mark.parametrize("version", [1, 3])
def test_greedy_matches_vanilla_int8_kv(version):
    eng = make_engine(version, kv_quant="int8")
    assert eng.init_target_cache().k.dtype == jnp.int8
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=32)
    out = eng.generate(PROMPT, max_new_tokens=32)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_fused_and_buckets_int8_kv():
    eng = make_engine(3, kv_quant="int8", kv_buckets=(64, 128))
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=30, fused=True)
    out = eng.generate_fused(PROMPT, max_new_tokens=30)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_batch_fused_matches_singles_int8_kv():
    eng = make_engine(3, kv_quant="int8")
    singles = [eng.generate(p, max_new_tokens=18) for p in PROMPTS]
    outs = eng.generate_batch_fused(PROMPTS, max_new_tokens=18)
    for o, ref in zip(outs, singles):
        np.testing.assert_array_equal(o, ref)


def test_static_tree_int8_kv():
    paths = ((0,), (1,), (0, 0), (0, 1), (0, 0, 0))
    eng = make_engine(1, tree_paths=paths, kv_quant="int8")
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=25)
    out = eng.generate(PROMPT, max_new_tokens=25)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_paged_server_int8_kv_bit_exact():
    """Paged pool stores int8 + scales; gather/scatter move them losslessly
    (pages halve in bytes). Includes chunked prefill + prefix adoption."""
    eng = make_engine(3, kv_quant="int8")
    budgets = [18, 25, 11]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(PROMPTS, budgets)]
    srv = PagedEagleServer(eng, max_batch=2, page_size=16)
    assert srv._pool.k.dtype == jnp.int8 and srv._pool.ks is not None
    rids = [srv.submit(p, b) for p, b in zip(PROMPTS, budgets)]
    outs = srv.run()
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_paged_chunked_and_prefix_int8_kv():
    eng = make_engine(3, kv_quant="int8")
    rng = np.random.default_rng(0)
    p_long = rng.integers(1, 127, 180).astype(np.int32)
    ref = eng.generate(p_long, max_new_tokens=15)
    srv = PagedEagleServer(eng, max_batch=2, page_size=16,
                           prefill_chunk=64, prefix_cache=True)
    r0 = srv.submit(p_long, 15)
    outs = srv.run()
    np.testing.assert_array_equal(outs[r0], ref)
    assert srv.chunked_prefills >= 1
    # prefix adoption: a continuation of the finished request's context
    p2 = np.concatenate([outs[r0], np.array([9, 4], np.int32)])
    ref2 = eng.generate(p2, max_new_tokens=10)
    r1 = srv.submit(p2, 10)
    outs2 = srv.run()
    np.testing.assert_array_equal(outs2[r1], ref2)
    assert srv.store.hits >= 1


def test_tp_engine_int8_kv():
    """int8 KV under the 8-way TP mesh == unsharded int8-KV vanilla."""
    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(1))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(2))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                        kv_quant="int8")
    eng_ref = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    ref = eng_ref.generate_vanilla(PROMPT, max_new_tokens=20)

    mesh = shd.make_mesh(n_data=1, n_model=8)
    params_s = shd.shard_params(params, mesh, shd.target_param_specs(cfg))
    dparams_s = shd.replicate(dparams, mesh)
    eng = EagleEngine(params_s, cfg, dparams_s, dcfg, ecfg)
    with jax.set_mesh(mesh):
        out = eng.generate(PROMPT, max_new_tokens=20)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_session_extend_int8_kv():
    """Multi-turn KV reuse (engine/session.py _extend contract) under
    int8 KV: continuing == prefilling the whole history from scratch."""
    from eagle_tpu.engine.session import EagleSession

    eng = make_engine(3, kv_quant="int8")
    sess = EagleSession(eng)
    out1 = sess.send(PROMPT, max_new_tokens=11)
    p2 = np.concatenate([out1, np.array([3, 9, 1], np.int32)])
    out2, st2 = sess.send(p2, max_new_tokens=11, log=True)
    assert st2["reused_prefix"] == len(out1) - 1
    np.testing.assert_array_equal(out2, eng.generate(p2, max_new_tokens=11))


def test_quantize_kv_rows_roundtrip_accuracy():
    """Row absmax int8: dequant error bounded by half a quant step per
    element, and the attention output stays close to the bf16-KV output."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 4, 64)) * 3.0, jnp.float32)
    q, s = quantize_kv_rows(x)
    deq = q.astype(jnp.float32) * s[..., None]
    step = np.asarray(s)[..., None]
    assert np.all(np.abs(np.asarray(deq - x)) <= 0.5 * step + 1e-7)
    # full-forward accuracy: int8-KV logits within ~1% of bf16-KV logits
    cfg = tiny_cfg()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    T, S = 12, 64
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]

    def run(cache):
        mask = prefill_mask(T, S, cache.length)
        res = transformer.forward(params, cfg, tokens, cache, pos, mask)
        return transformer.lm_head(params, cfg, res.hidden)

    ref = np.asarray(run(init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S,
                                    cfg.head_dim, dtype=jnp.float32)))
    out = np.asarray(run(init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S,
                                    cfg.head_dim, kv_quant="int8")))
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.abs(out - ref).max() / denom < 0.02


def test_kv_quant_typo_rejected():
    with pytest.raises(ValueError):
        make_engine(3, kv_quant="int-8")


def test_merge_rows_window_matches_full_merge():
    """merge_rows_window == merge_rows restricted to the modified window,
    for B==1 (direct 5-D path) and B>1 (vmap fallback), bf16 and int8."""
    from eagle_tpu.ops.kv_cache import (init_cache, merge_rows,
                                        merge_rows_window, slice_rows)

    rng = np.random.default_rng(0)
    for Bsz in (1, 3):
        for kvq in ("none", "int8"):
            full = init_cache(2, Bsz, 2, 32, 8, dtype=jnp.float32,
                              kv_quant=kvq)
            small = slice_rows(full, 16)
            # fabricate an updated small cache: new rows at per-seq starts
            starts = jnp.asarray(rng.integers(0, 10, Bsz), jnp.int32)
            newk = jnp.asarray(rng.normal(size=small.k.shape),
                               jnp.float32).astype(small.k.dtype)
            newv = jnp.asarray(rng.normal(size=small.v.shape),
                               jnp.float32).astype(small.v.dtype)
            upd = small._replace(k=newk, v=newv,
                                 length=starts + 4)
            if kvq == "int8":
                upd = upd._replace(
                    ks=jnp.asarray(rng.normal(size=small.ks.shape),
                                   jnp.float32),
                    vs=jnp.asarray(rng.normal(size=small.vs.shape),
                                   jnp.float32))
            out = merge_rows_window(full, upd, starts, 4)
            # reference: full merge, then restrict expectations to windows
            ref = merge_rows(full, upd, 16)
            for b in range(Bsz):
                s = int(starts[b])
                np.testing.assert_array_equal(
                    np.asarray(out.k[:, b, :, s:s + 4]),
                    np.asarray(ref.k[:, b, :, s:s + 4]))
                # rows OUTSIDE the window must be untouched (zeros)
                np.testing.assert_array_equal(
                    np.asarray(out.k[:, b, :, :s]),
                    np.asarray(full.k[:, b, :, :s]))
                if kvq == "int8":
                    np.testing.assert_array_equal(
                        np.asarray(out.ks[:, b, :, s:s + 4]),
                        np.asarray(ref.ks[:, b, :, s:s + 4]))
            np.testing.assert_array_equal(np.asarray(out.length),
                                          np.asarray(upd.length))


def test_sampled_dynamic_runs_sharded():
    """true_q_dynamic two-pass drafting under the 8-way TP mesh: the
    sampled program (Gumbel draws, node_probs threading, true-q walk)
    compiles and commits tokens with sharded target params."""
    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(1))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(2))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                        temperature=0.9, acceptance="true_q_dynamic")
    mesh = shd.make_mesh(n_data=1, n_model=8)
    eng = EagleEngine(
        shd.shard_params(params, mesh, shd.target_param_specs(cfg)),
        cfg, shd.replicate(dparams, mesh), dcfg, ecfg)
    with jax.set_mesh(mesh):
        out = eng.generate(np.asarray([5, 17, 92, 3], np.int32),
                           max_new_tokens=12)
    assert len(out) >= 16


def test_pallas_tree_attn_falls_back_under_int8_kv():
    """attn_impl="pallas_tree" + kv_quant="int8": the Pallas tree kernel
    reads raw bf16 KV, so int8 caches must take the XLA scale-folded path
    — and stay bit-exact vs vanilla."""
    import dataclasses

    from eagle_tpu.models import draft as draft_mod

    cfg = dataclasses.replace(tiny_cfg(), attn_impl="pallas_tree")
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                        kv_quant="int8")
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=20)
    out = eng.generate(PROMPT, max_new_tokens=20)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_sliding_window_int8_kv():
    """qwen2-style sliding-window target + int8 KV: the per-layer window
    mask composes with scale-folded attention reads; greedy == vanilla."""
    import dataclasses

    from eagle_tpu.models import draft as draft_mod

    cfg = dataclasses.replace(tiny_cfg(), sliding_window=24,
                              sliding_layer_flags=(True, True, False, True),
                              attn_qkv_bias=True)
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(5))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(6))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                        kv_quant="int8")
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=40)
    out = eng.generate(PROMPT, max_new_tokens=40)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_paged_int8_full_stack_soak():
    """Composition soak: int8 KV + async scheduling + chunked prefill +
    prefix cache + a pool small enough to force preemption, with
    staggered joins — every output bit-equal to the single-request
    engine. The int8 analog of the bf16 serving-stack tests, all features
    at once."""
    rng = np.random.default_rng(3)
    eng = make_engine(3, kv_quant="int8")
    prompts = [
        rng.integers(1, 127, n).astype(np.int32)
        for n in (150, 6, 40, 90, 12, 60)
    ]
    # two requests share a long prefix (prefix-cache candidates)
    prompts[3] = np.concatenate([prompts[0][:96],
                                 rng.integers(1, 127, 8).astype(np.int32)])
    budgets = [12, 20, 9, 14, 11, 10]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(prompts, budgets)]

    srv = PagedEagleServer(eng, max_batch=2, page_size=16, num_pages=40,
                           prefill_chunk=32, prefix_cache=True,
                           async_schedule=True)
    rids = []
    for i, (p, b) in enumerate(zip(prompts, budgets)):
        rids.append(srv.submit(p, b))
        for _ in range(int(rng.integers(0, 3))):
            srv.step()
    outs = srv.run()
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)
    assert srv.chunked_prefills >= 1
