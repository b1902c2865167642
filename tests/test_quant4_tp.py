"""int4 (w4a8) under tensor parallelism.

Covers the three layers of the TP story (ops/quant4.py + parallel/sharding
.quantized_target_param_specs4):
1. the blocked packing layout (pack_w4 blocks=t) is bit-identical to the
   single-block layout when run unsharded — K-ordered group accumulation;
2. the kernel's custom_partitioning rules: column-sharded weights are
   bit-exact vs unsharded (pure N split), row-sharded weights psum f32
   shard partials (exact up to reduction order when activation scales
   agree per shard);
3. the full int4-target engine under TP=8 on the CPU mesh keeps the
   greedy == vanilla invariant and matches the unsharded int4 engine.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer
from eagle_tpu.ops import quant4
from eagle_tpu.parallel import sharding as shd

from test_engine_greedy import PROMPT, tiny_dcfg
from test_sharding import tp_cfg


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape) * scale, jnp.float32)


def test_blocked_packing_bit_identical_unsharded():
    """blocks=1 vs blocks=8 layouts: same scales (group 128 divides both
    half-block sizes), same K-ordered accumulation -> bitwise-equal output
    through BOTH the interpret kernel and the XLA fallback."""
    x = _rand((5, 2048), 0)
    w = _rand((2048, 256), 1, 0.1)
    q1 = quant4.pack_w4(w)
    q8 = quant4.pack_w4(w, blocks=8)
    assert q8["q4"].shape == (8, 32, 256)
    assert q8["scale"].shape == (8, 2, 256)
    np.testing.assert_array_equal(
        np.asarray(quant4.qdense4(x, q1, interpret=True)),
        np.asarray(quant4.qdense4(x, q8, interpret=True)))
    np.testing.assert_array_equal(
        np.asarray(quant4.qdense4_xla(x, q1)),
        np.asarray(quant4.qdense4_xla(x, q8)))
    # the blocked layout literally re-orders the words of the flat one
    # (per-block halves); dequantization agrees exactly
    np.testing.assert_array_equal(np.asarray(quant4.unpack_w4(q1)),
                                  np.asarray(quant4.unpack_w4(q8)))


def test_host_packer_blocked_matches_device():
    w = np.random.default_rng(2).normal(size=(2048, 128)).astype(np.float32)
    qd = quant4.pack_w4(jnp.asarray(w), blocks=4)
    qh = quant4._pack_w4_host(w, blocks=4)
    np.testing.assert_array_equal(np.asarray(qd["q4"]), qh["q4"])
    np.testing.assert_allclose(np.asarray(qd["scale"]), qh["scale"],
                               rtol=1e-6)
    # stacked layers keep the leading axis before the block axis
    qs = quant4._pack_w4_host(np.stack([w, 2 * w]), blocks=4)
    assert qs["q4"].shape == (2, 4, 64, 128)
    np.testing.assert_array_equal(qs["q4"][0], qh["q4"])


def test_partitioned_column_sharded_bit_exact():
    """q4/scale sharded on N over the 8-device mesh: each shard computes
    its own output columns with the full K — bitwise equal to unsharded."""
    mesh = shd.make_mesh(n_data=1, n_model=8)
    x = _rand((4, 1024), 3)
    w = _rand((1024, 512), 4, 0.1)
    qw = quant4.pack_w4(w)
    ref = np.asarray(quant4.qdense4(x, qw, interpret=True))

    q4s = jax.device_put(qw["q4"], NamedSharding(mesh, P(None, "model")))
    scs = jax.device_put(qw["scale"], NamedSharding(mesh, P(None, "model")))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda x, q, s: quant4.qdense4(
            x, {"q4": q, "scale": s}, interpret=True))(x, q4s, scs)
    assert out.sharding.spec == P(None, "model")
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_partitioned_row_sharded_psum():
    """Blocked q4 sharded on the block axis (row-parallel): shards run
    standalone packings of contiguous K ranges and psum f32 partials.
    x is constructed so every K-block shares the row's absmax — then the
    per-shard activation scales equal the global one and the only
    sharded/unsharded difference is f32 reduction order."""
    mesh = shd.make_mesh(n_data=1, n_model=8)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(4, 2048)).astype(np.float32)
    x = np.clip(x, -2.5, 2.5)
    x[:, ::256] = 3.0          # one absmax anchor per 256-wide block
    x = jnp.asarray(x)
    w = _rand((2048, 256), 6, 0.1)
    qw = quant4.pack_w4(w, blocks=8)
    ref = np.asarray(quant4.qdense4(x, qw, interpret=True))

    q4s = jax.device_put(qw["q4"], NamedSharding(mesh, P("model", None, None)))
    scs = jax.device_put(qw["scale"],
                         NamedSharding(mesh, P("model", None, None)))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda x, q, s: quant4.qdense4(
            x, {"q4": q, "scale": s}, interpret=True))(x, q4s, scs)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_int4_target_engine_tp8_pallas_interpret(monkeypatch):
    """Engine-level (interpret=None) qdense4 calls fall back to qdense4_xla
    off-TPU, so the custom_vmap + custom_partitioning + lax.scan composition
    never executed inside a real decode round on the CPU mesh — only
    kernel-level interpret tests did (ADVICE r3). FORCE_INTERPRET routes the
    engine's own calls through the interpreted, partitioned Pallas kernel;
    the TP engine must keep greedy == vanilla through it.

    tp=4 (= num_kv_heads), not 8: with tp > num_kv_heads the partitioner
    propagates a kv-head-replicated activation tiling (4-way split x 2-way
    replicated) into the custom call, which custom_partitioning cannot
    parse into mesh axes. tp <= num_kv_heads is already the engine's TP
    envelope (the KV cache shards by kv head), so the kernel documents the
    same bound rather than supporting a degenerate mesh."""
    monkeypatch.setattr(quant4, "FORCE_INTERPRET", True)
    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(1))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(2))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    qparams = quant4.quantize_target_params4(params, tp=4)
    mesh = shd.make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
    qparams_s = shd.shard_params(qparams, mesh,
                                 shd.quantized_target_param_specs4(cfg))
    dparams_s = shd.replicate(dparams, mesh)
    eng = EagleEngine(qparams_s, cfg, dparams_s, dcfg, ecfg)
    with jax.set_mesh(mesh):
        out_v = eng.generate_vanilla(PROMPT, max_new_tokens=16)
        out = eng.generate(PROMPT, max_new_tokens=16)
    np.testing.assert_array_equal(out[: len(out_v)], out_v[: len(out)])


def test_int4_target_engine_tp8():
    """int4-quantized target under TP=8 on the CPU mesh: the sharded
    engine's greedy speculative output is bit-identical to its OWN vanilla
    decode (the invariant). Cross-config (sharded vs unsharded) output is
    checked at the LOGITS level: row-parallel layers psum f32 partials, so
    reduction order differs by design (~1 ulp) — token paths can diverge
    at near-ties on a random tiny model, exactly like bf16 TP elsewhere."""
    cfg = tp_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(1))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(2))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    qparams = quant4.quantize_target_params4(params, tp=8)
    assert qparams["layers"]["wo"]["q4"].ndim == 4   # [L, blocks, Kw, N]

    # tp=8 packing run UNSHARDED must equal the tp=1 packing (layout only)
    eng_ref = EagleEngine(quant4.quantize_target_params4(params), cfg,
                          dparams, dcfg, ecfg)
    ref_v = eng_ref.generate_vanilla(PROMPT, max_new_tokens=24)
    ref = eng_ref.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(ref[: len(ref_v)], ref_v[: len(ref)])

    mesh = shd.make_mesh(n_data=1, n_model=8)
    qspecs = shd.quantized_target_param_specs4(cfg)
    qparams_s = shd.shard_params(qparams, mesh, qspecs)
    dparams_s = shd.replicate(dparams, mesh)
    eng = EagleEngine(qparams_s, cfg, dparams_s, dcfg, ecfg)
    with jax.set_mesh(mesh):
        out_v = eng.generate_vanilla(PROMPT, max_new_tokens=24)
        out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(out_v)], out_v[: len(out)])

    # cross-config: sharded prefill logits match unsharded to f32
    # reduction-order noise
    from eagle_tpu.ops.kv_cache import init_cache
    from eagle_tpu.ops.masks import prefill_mask

    tokens = jnp.asarray(np.asarray(PROMPT)[None], jnp.int32)
    T, S = tokens.shape[1], 64
    pos = jnp.arange(T, dtype=jnp.int32)[None]

    def logits_of(p, cache):
        res = transformer.forward(p, cfg, tokens, cache,
                                  pos, prefill_mask(T, S, cache.length))
        return transformer.lm_head(p, cfg, res.hidden)

    cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S,
                       cfg.head_dim, dtype=jnp.float32)
    ref_logits = np.asarray(logits_of(qparams, cache))
    cache_s = shd.replicate(cache, mesh)  # 4 kv heads don't divide tp=8
    with jax.set_mesh(mesh):
        sh_logits = np.asarray(jax.jit(logits_of)(qparams_s, cache_s))
    np.testing.assert_allclose(sh_logits, ref_logits, rtol=2e-4, atol=2e-4)
