"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that (a) the target forward under full TP produces the same logits
as the unsharded path, (b) the whole speculative engine runs with sharded
params/caches, and (c) the TTT training step compiles and runs under dp×tp.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eagle_tpu.config import EngineConfig, ModelConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer
from eagle_tpu.ops.kv_cache import init_cache
from eagle_tpu.ops.masks import prefill_mask
from eagle_tpu.parallel import sharding as shd
from eagle_tpu.train import ttt

from test_engine_greedy import PROMPT, tiny_cfg, tiny_dcfg


def tp_cfg():
    # 4 kv heads / 8 q heads so the model axis (4) divides both
    return ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=4,
        num_q_heads=8, num_kv_heads=4, head_dim=8, dtype=jnp.float32,
    )


def test_tp_forward_matches_unsharded():
    cfg = tp_cfg()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    T, S = 12, 64
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, size=(1, T)), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]

    def run(params, cache):
        mask = prefill_mask(T, S, cache.length)
        res = transformer.forward(params, cfg, tokens, cache, pos, mask)
        return transformer.lm_head(params, cfg, res.hidden)

    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S, cfg.head_dim,
                       dtype=jnp.float32)
    ref = run(params, cache)

    mesh = shd.make_mesh(n_data=2, n_model=4)
    specs = shd.target_param_specs(cfg)
    params_s = shd.shard_params(params, mesh, specs)
    cache_s = jax.device_put(
        init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S, cfg.head_dim,
                   dtype=jnp.float32),
        jax.tree.map(lambda s: NamedSharding(mesh, s),
                     shd.kv_cache_specs(shard_batch=False)))
    with jax.set_mesh(mesh):
        out = jax.jit(run)(params_s, cache_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_engine_runs_sharded():
    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(1))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(2))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)

    eng_ref = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    ref = eng_ref.generate_vanilla(PROMPT, max_new_tokens=24)

    mesh = shd.make_mesh(n_data=1, n_model=8)
    params_s = shd.shard_params(params, mesh, shd.target_param_specs(cfg))
    dparams_s = shd.replicate(dparams, mesh)
    eng = EagleEngine(params_s, cfg, dparams_s, dcfg, ecfg)
    with jax.set_mesh(mesh):
        out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_servers_run_sharded():
    """Continuous-batching servers (dense slots AND the paged page pool)
    with a TP-sharded engine reproduce the unsharded engine's greedy
    outputs bit-exactly — the multi-chip serving configuration."""
    from eagle_tpu.engine.paged import PagedEagleServer
    from eagle_tpu.engine.server import EagleServer

    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(1))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(2))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    eng_ref = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    prompts = [PROMPT, PROMPT[:4]]
    refs = [eng_ref.generate(p, max_new_tokens=16) for p in prompts]

    mesh = shd.make_mesh(n_data=1, n_model=8)
    params_s = shd.shard_params(params, mesh, shd.target_param_specs(cfg))
    dparams_s = shd.replicate(dparams, mesh)
    eng = EagleEngine(params_s, cfg, dparams_s, dcfg, ecfg)
    with jax.set_mesh(mesh):
        for srv in (EagleServer(eng, max_batch=2),
                    PagedEagleServer(eng, max_batch=2, page_size=16)):
            rids = [srv.submit(p, 16) for p in prompts]
            outs = srv.run()
            for rid, ref in zip(rids, refs):
                np.testing.assert_array_equal(outs[rid], ref)


def test_train_step_dp_tp():
    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(3))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(4))
    tcfg = ttt.TrainConfig(length=3)
    opt = ttt.make_optimizer(tcfg)
    trainable, _ = ttt.partition_trainable(dparams)
    opt_state = opt.init(trainable)

    mesh = shd.make_mesh(n_data=2, n_model=4)
    params_s = shd.shard_params(params, mesh, shd.target_param_specs(cfg))
    dparams_s = shd.replicate(dparams, mesh)
    opt_state_s = shd.replicate(opt_state, mesh)
    B, T = 4, 16
    rng = np.random.default_rng(5)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)),
                                 jnp.int32),
        "loss_mask": jnp.ones((B, T), jnp.float32),
        "pad_mask": jnp.ones((B, T), bool),
    }
    batch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        batch)
    with jax.set_mesh(mesh):
        step = jax.jit(lambda dp, os, b: ttt.train_step(
            dp, os, params_s, cfg, dcfg, tcfg, opt, b))
        dparams2, opt_state2 = dparams_s, opt_state_s
        for _ in range(3):  # warmup starts at lr=0; step a few times
            dparams2, opt_state2, m = step(dparams2, opt_state2, batch)
    assert np.isfinite(float(m.loss))
    # params actually updated
    delta = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        dparams2["fc"], dparams_s["fc"])
    assert max(jax.tree.leaves(delta)) > 0


def test_mixtral_ep_forward_matches_unsharded():
    """Mixtral MoE under expert-parallel sharding (experts over "model")
    must reproduce the unsharded logits."""
    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_q_heads=8, num_kv_heads=4, head_dim=8, num_experts=8,
        experts_per_token=2, dtype=jnp.float32,
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(7))
    T, S = 10, 64
    tokens = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, size=(1, T)), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]

    def run(params, cache):
        mask = prefill_mask(T, S, cache.length)
        res = transformer.forward(params, cfg, tokens, cache, pos, mask)
        return transformer.lm_head(params, cfg, res.hidden)

    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S, cfg.head_dim,
                       dtype=jnp.float32)
    ref = run(params, cache)

    mesh = shd.make_mesh(n_data=2, n_model=4)
    params_s = shd.shard_params(params, mesh, shd.target_param_specs(cfg))
    cache_s = jax.device_put(
        init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S, cfg.head_dim,
                   dtype=jnp.float32),
        jax.tree.map(lambda s: NamedSharding(mesh, s),
                     shd.kv_cache_specs(shard_batch=False)))
    with jax.set_mesh(mesh):
        out = jax.jit(run)(params_s, cache_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_generation_runs_sharded():
    """generate_fused (prefill + while_loop rounds) under full TP."""
    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(9))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(10))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    eng_ref = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    ref = eng_ref.generate_vanilla(PROMPT, max_new_tokens=16)

    mesh = shd.make_mesh(n_data=1, n_model=8)
    params_s = shd.shard_params(params, mesh, shd.target_param_specs(cfg))
    dparams_s = shd.replicate(dparams, mesh)
    eng = EagleEngine(params_s, cfg, dparams_s, dcfg, ecfg)
    with jax.set_mesh(mesh):
        out = eng.generate_fused(PROMPT, max_new_tokens=16)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_moe_capacity_dispatch_matches_dense():
    """Capacity-based ragged dispatch == dense dispatch when capacity is
    ample (no drops), unsharded and under expert-parallel sharding."""
    import dataclasses

    base = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_q_heads=8, num_kv_heads=4, head_dim=8, num_experts=8,
        experts_per_token=2, dtype=jnp.float32,
    )
    cfg_cap = dataclasses.replace(base, moe_impl="capacity",
                                  moe_capacity_factor=8.0)
    params = transformer.init_params(base, jax.random.PRNGKey(13))
    T, S = 16, 32
    tokens = jnp.asarray(np.random.default_rng(6).integers(
        0, base.vocab_size, size=(2, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (2, T))

    def run(cfg, params, cache):
        mask = prefill_mask(T, S, cache.length)
        res = transformer.forward(params, cfg, tokens, cache, pos, mask)
        return transformer.lm_head(params, cfg, res.hidden)

    def mk_cache():
        return init_cache(base.num_layers, 2, base.num_kv_heads, S,
                          base.head_dim, dtype=jnp.float32)

    ref = run(base, params, mk_cache())
    out = run(cfg_cap, params, mk_cache())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    mesh = shd.make_mesh(n_data=1, n_model=8)
    params_s = shd.shard_params(params, mesh, shd.target_param_specs(base))
    with jax.set_mesh(mesh):
        out_s = jax.jit(lambda p, c: run(cfg_cap, p, c))(params_s, mk_cache())
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_train_step_zero_sharded_opt_state():
    """ZeRO-analog optimizer-state sharding (ds_config.json:32-41): AdamW
    moments sharded over "data" produce numerically identical updates to
    the replicated run, and the output state keeps the input shardings
    (no silent re-replication across steps)."""
    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(3))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(4))
    tcfg = ttt.TrainConfig(length=3)
    opt = ttt.make_optimizer(tcfg)
    trainable, _ = ttt.partition_trainable(dparams)

    B, T = 4, 16
    rng = np.random.default_rng(8)
    batch_np = {
        "input_ids": rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32),
        "loss_mask": np.ones((B, T), np.float32),
        "pad_mask": np.ones((B, T), bool),
    }

    def run(mesh, zero):
        params_s = shd.shard_params(params, mesh, shd.target_param_specs(cfg))
        dparams_s = shd.replicate(dparams, mesh)
        # zero path: state born sharded (jitted init with out_shardings —
        # the replicated fp32 moments never materialize)
        os_s = (shd.init_sharded_zero_state(opt, trainable, mesh) if zero
                else shd.replicate(opt.init(trainable), mesh))
        batch = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), NamedSharding(
                mesh, P("data", *([None] * (x.ndim - 1))))), batch_np)
        with jax.set_mesh(mesh):
            step = jax.jit(lambda dp, os, b: ttt.train_step(
                dp, os, params_s, cfg, dcfg, tcfg, opt, b))
            dp, os_ = dparams_s, os_s
            for _ in range(3):
                dp, os_, m = step(dp, os_, batch)
        return dp, os_, m

    mesh = shd.make_mesh(n_data=2, n_model=4)
    dp_ref, _, m_ref = run(mesh, zero=False)
    dp_z, os_z, m_z = run(mesh, zero=True)

    np.testing.assert_allclose(float(m_z.loss), float(m_ref.loss),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(dp_ref), jax.tree.leaves(dp_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # moments must still be data-sharded after 3 steps
    specs = shd.zero_state_specs(os_z, mesh)
    sharded = replicated = 0
    for leaf, spec in zip(jax.tree.leaves(os_z), jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, P))):
        if "data" in tuple(spec):
            got = tuple(leaf.sharding.spec)
            assert "data" in got, (spec, got)
            sharded += 1
        else:
            replicated += 1
    assert sharded > 4  # every 2-D moment tensor (mu+nu per weight)


def test_int8_target_engine_runs_sharded():
    """int8-quantized target under TP=8: greedy output bit-identical to
    the unsharded int8 engine (int32 partial-dot psums are exact, so TP
    cannot perturb the quantized matmul — see
    sharding.quantized_target_param_specs)."""
    from eagle_tpu.ops.quant import quantize_target_params

    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(1))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(2))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    qparams = quantize_target_params(params)

    eng_ref = EagleEngine(qparams, cfg, dparams, dcfg, ecfg)
    ref_v = eng_ref.generate_vanilla(PROMPT, max_new_tokens=24)
    ref = eng_ref.generate(PROMPT, max_new_tokens=24)

    mesh = shd.make_mesh(n_data=1, n_model=8)
    qspecs = shd.quantized_target_param_specs(cfg)
    qparams_s = shd.shard_params(qparams, mesh, qspecs)
    dparams_s = shd.replicate(dparams, mesh)
    eng = EagleEngine(qparams_s, cfg, dparams_s, dcfg, ecfg)
    with jax.set_mesh(mesh):
        out_v = eng.generate_vanilla(PROMPT, max_new_tokens=24)
        out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out_v, ref_v)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
