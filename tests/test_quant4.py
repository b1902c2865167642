"""int4 (w4a8) quantization: packing round-trip, Pallas-kernel vs XLA-path
equivalence, QAT coverage, and the losslessness guarantees — an int4 draft
must still produce bit-exact greedy output; an int4 TARGET must be
bit-exact against its own vanilla decode (same contracts as int8,
tests/test_quant.py)."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.ops import quant4

from test_engine_greedy import PROMPT, make_engine


def test_pack_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(512, 384)).astype(np.float32) * 0.05
    qw = quant4.pack_w4(jnp.asarray(w))
    assert qw["q4"].dtype == jnp.int32 and qw["q4"].shape == (64, 384)
    assert qw["scale"].shape == (512 // quant4.GROUP, 384)
    dq = np.asarray(quant4.unpack_w4(qw))
    half_step = np.asarray(qw["scale"]).repeat(quant4.GROUP, axis=0) / 2
    assert np.all(np.abs(dq - w) <= half_step + 1e-6)


def test_group_adapts_to_small_dims():
    # K/2 = 16 not divisible by 128 -> group falls back to gcd = 16
    w = jnp.asarray(np.random.default_rng(1).normal(size=(32, 64)),
                    jnp.float32)
    qw = quant4.pack_w4(w)
    assert qw["scale"].shape == (2, 64)
    assert quant4._group_of(qw) == 16


def test_qdense4_close_to_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 96)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(96,)), jnp.float32)
    ref = x @ w + b
    out = quant4.qdense4_xla(x, quant4.pack_w4(w), b)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    # int4 is coarse (the point of QAT); group-128 amax scaling on gaussian
    # weights lands ~10% output error — assert sane, not tight
    assert rel < 0.15, rel
    # ... and strictly worse than int8 on the same weights (sanity that the
    # two paths are what they claim)
    from eagle_tpu.ops import quant
    out8 = quant.qdense(x, quant.quantize_linear(w), b)
    rel8 = float(jnp.linalg.norm(out8 - ref) / jnp.linalg.norm(ref))
    assert rel8 < rel


@pytest.mark.parametrize("M,K,N", [(5, 512, 384), (1, 256, 128),
                                   (33, 256, 640), (300, 256, 384)])
def test_pallas_kernel_matches_xla_path(M, K, N):
    """The interpret-mode kernel and the XLA fallback share group order and
    int accumulation — results must agree to f32 summation noise."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    qw = quant4.pack_w4(jnp.asarray(rng.normal(size=(K, N)) * 0.1,
                                    jnp.float32))
    y_xla = quant4.qdense4_xla(x, qw, out_dtype=jnp.float32)
    y_pl = quant4.qdense4(x, qw, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               rtol=1e-5, atol=1e-5)


def test_host_packer_matches_device():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.1
    qd = quant4.pack_w4(jnp.asarray(w))
    qh = quant4._pack_w4_host(w)
    np.testing.assert_array_equal(np.asarray(qd["q4"]), qh["q4"])
    np.testing.assert_allclose(np.asarray(qd["scale"]), qh["scale"],
                               rtol=1e-6)
    # stacked [L, K, N] packs per layer
    ws = np.stack([w, 2 * w])
    qs = quant4._pack_w4_host(ws)
    np.testing.assert_array_equal(qs["q4"][0], qh["q4"])
    assert qs["scale"].shape == (2, 256 // quant4.GROUP, 128)


def test_fake_quant_matches_dequant():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(256, 64)) * 0.1, jnp.float32)
    fq = quant4.fake_quantize4_linear(w)
    dq = quant4.unpack_w4(quant4.pack_w4(w))
    np.testing.assert_allclose(np.asarray(fq), np.asarray(dq), atol=1e-6)


def test_quantize_draft_params4_structure():
    from eagle_tpu.models import draft as draft_mod
    from test_engine_greedy import tiny_dcfg

    dcfg = tiny_dcfg(3)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(0))
    qp = quant4.quantize_draft_params4(dparams)
    assert qp["layers"][0]["wq"]["q4"].dtype == jnp.int32
    assert qp["lm_head"]["q4"].dtype == jnp.int32
    assert qp["fc"]["w"]["q4"].dtype == jnp.int32
    assert qp["embed"]["w"].dtype == dparams["embed"]["w"].dtype
    assert qp["norm"].dtype == dparams["norm"].dtype


@pytest.mark.parametrize("version", [1, 3])
def test_int4_draft_still_bit_exact_greedy(version):
    eng0 = make_engine(version)
    ref = eng0.generate_vanilla(PROMPT, max_new_tokens=30)
    ecfg_q = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                          draft_quant="int4")
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg_q)
    out, ntok, rounds = eng.generate(PROMPT, max_new_tokens=30, log=True)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
    assert ntok / rounds >= 1.0


@pytest.mark.parametrize("version", [1, 3])
def test_int4_target_greedy_bit_exact_within_engine(version):
    """int4 TARGET serving mode: outputs must match the int4 target's OWN
    vanilla decode bit-for-bit (same contract as the int8 target)."""
    eng0 = make_engine(version)
    qparams = quant4.quantize_target_params4(eng0.params)
    eng = EagleEngine(qparams, eng0.cfg, eng0.dparams, eng0.dcfg, eng0.ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=30)
    out = eng.generate(PROMPT, max_new_tokens=30)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
    out_f = eng.generate_fused(PROMPT, max_new_tokens=30)
    np.testing.assert_array_equal(out_f[: len(ref)], ref[: len(out_f)])


def test_int4_qat_train_step_runs():
    """quant_aware='int4' TTT distillation step produces finite loss and
    grads that change the params."""
    import dataclasses

    from eagle_tpu.train import ttt
    from test_engine_greedy import tiny_cfg, tiny_dcfg
    from eagle_tpu.models import draft as draft_mod
    from eagle_tpu.models import transformer

    cfg = tiny_cfg()
    dcfg = tiny_dcfg(3)
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
    tcfg = ttt.TrainConfig(length=2, lr=1e-3, warmup_steps=1,
                           total_steps=10, quant_aware="int4")
    opt = ttt.make_optimizer(tcfg)
    opt_state = opt.init(ttt.partition_trainable(dparams)[0])
    batch = {
        "input_ids": jnp.asarray(
            np.random.default_rng(0).integers(0, 128, (2, 24)), jnp.int32),
        "loss_mask": jnp.ones((2, 24), jnp.float32),
        "pad_mask": jnp.ones((2, 24), bool),
    }
    # two steps: warmup starts at lr=0, so step 0 alone can't move params
    dp2, opt_state, m = ttt.train_step(dparams, opt_state, params, cfg,
                                       dcfg, tcfg, opt, batch)
    dp2, _, m = ttt.train_step(dp2, opt_state, params, cfg, dcfg,
                               tcfg, opt, batch)
    assert np.isfinite(float(m.loss))
    assert not np.array_equal(np.asarray(dp2["fc"]["w"]),
                              np.asarray(dparams["fc"]["w"]))


def test_custom_vmap_flatten_bit_exact():
    """vmap of qdense4 must flatten the batch into M (one kernel call,
    weights streamed once) and return exactly the per-example results."""
    rng = np.random.default_rng(7)
    B, M, K, N = 3, 8, 256, 128
    x = jnp.asarray(rng.normal(size=(B, M, K)), jnp.float32)
    qw = quant4.pack_w4(jnp.asarray(rng.normal(size=(K, N)) * 0.1,
                                    jnp.float32))

    def f(xi):
        return quant4.qdense4(xi, qw, out_dtype=jnp.float32,
                              interpret=True)

    yv = np.asarray(jax.vmap(f)(x))
    ys = np.stack([np.asarray(f(x[i])) for i in range(B)])
    np.testing.assert_array_equal(yv, ys)


def test_int4_draft_batched_matches_singles():
    """Batched fused generation with an int4 draft stays bit-identical to
    per-sequence generation (the kernel's vmap flatten is invisible)."""
    import dataclasses

    eng0 = make_engine(3)
    ecfg_q = dataclasses.replace(eng0.ecfg, draft_quant="int4")
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg_q)
    prompts = [PROMPT, PROMPT[:5], np.array([9, 2, 77, 31], np.int32)]
    singles = [eng.generate(p, max_new_tokens=16) for p in prompts]
    outs = eng.generate_batch_fused(prompts, max_new_tokens=16)
    for o, s in zip(outs, singles):
        np.testing.assert_array_equal(o, s)


def test_int4_draft_sampled_generation_runs():
    """Sampled decoding with an int4 draft: the rejection rule is valid
    for ANY proposal distribution, so a quantized q(x) stays lossless by
    construction — this pins that the sampled path runs and produces
    in-vocab tokens with seed-dependent variety."""
    eng = make_engine(3, temperature=0.9, top_p=0.9, draft_quant="int4")
    out, new_tok, rounds = eng.generate(PROMPT, max_new_tokens=24,
                                        log=True, seed=7)
    assert new_tok == 24 and rounds >= 1
    assert np.all(out >= 0) and np.all(out < eng.cfg.vocab_size)
    out2 = eng.generate(PROMPT, max_new_tokens=24, seed=8)
    assert not np.array_equal(out, out2)


# ---------------------------------------------------------------------------
# Stacked-weight kernel path (in-kernel layer select via scalar prefetch):
# eliminates the per-layer dynamic-slice copies the scan otherwise
# materializes before every Pallas custom call (profiled at ~2.9 ms/step
# on the 4B int4 target, tools/profile_vanilla_int4.py)
# ---------------------------------------------------------------------------

def test_stacked_kernel_matches_sliced():
    """qdense4_stacked(interpret) == slice + qdense4(interpret), bitwise,
    for every layer index."""
    rng = np.random.default_rng(7)
    L, K, N = 3, 256, 384
    ws = [jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.float32)
          for _ in range(L)]
    packed = [quant4.pack_w4(w) for w in ws]
    q4 = jnp.stack([p["q4"] for p in packed])
    sc = jnp.stack([p["scale"] for p in packed])
    x = jnp.asarray(rng.normal(size=(5, K)), jnp.float32)
    for l in range(L):
        got = quant4.qdense4_stacked(
            x, quant4.Stacked4(q4, sc, jnp.int32(l)), interpret=True)
        ref = quant4.qdense4(x, packed[l], interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_stacked_vmap_flattens_batch():
    """vmapped stacked calls with a shared (unbatched) layer index flatten
    into M — bit-identical to per-slot calls."""
    rng = np.random.default_rng(8)
    B, M, L, K, N = 3, 4, 2, 128, 256
    w = [jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.float32)
         for _ in range(L)]
    packed = [quant4.pack_w4(v) for v in w]
    q4 = jnp.stack([p["q4"] for p in packed])
    sc = jnp.stack([p["scale"] for p in packed])
    x = jnp.asarray(rng.normal(size=(B, M, K)), jnp.float32)
    st = quant4.Stacked4(q4, sc, jnp.int32(1))
    out_b = jax.vmap(lambda xb: quant4.qdense4_stacked(xb, st,
                                                       interpret=True))(x)
    for b in range(B):
        ref = quant4.qdense4_stacked(x[b], st, interpret=True)
        np.testing.assert_array_equal(np.asarray(out_b[b]), np.asarray(ref))


def test_int4_target_engine_stacked_interpret(monkeypatch):
    """FORCE_INTERPRET routes the engine's int4 target through the STACKED
    interpret kernel (in-scan layer select): greedy == vanilla must hold,
    and the output must equal the slicing-fallback engine's."""
    eng0 = make_engine(3)
    qparams = quant4.quantize_target_params4(eng0.params)
    eng_ref = EagleEngine(qparams, eng0.cfg, eng0.dparams, eng0.dcfg,
                          eng0.ecfg)
    ref = eng_ref.generate(PROMPT, max_new_tokens=24)

    monkeypatch.setattr(quant4, "FORCE_INTERPRET", True)
    eng = EagleEngine(qparams, eng0.cfg, eng0.dparams, eng0.dcfg, eng0.ecfg)
    out_v = eng.generate_vanilla(PROMPT, max_new_tokens=24)
    out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(out_v)], out_v[: len(out)])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


# ---------------------------------------------------------------------------
# int4 MoE expert banks via the expert-axis fold (dense-dispatch decode):
# gate/up fold experts into N, down folds experts into K with the router
# combine pre-applied to the activations (one matmul = projection + sum)
# ---------------------------------------------------------------------------

def _moe4():
    from test_quant import _moe_setup
    return _moe_setup("dense")


def test_quantize_target_params4_moe_structure():
    cfg, _, params, _, _ = _moe4()
    qp = quant4.quantize_target_params4(params)
    L, E, H, F = params["layers"]["we_gate"].shape
    assert "we_gate" not in qp["layers"]
    assert qp["layers"]["we_gate4"]["q4"].shape == (L, H // 8, E * F)
    assert qp["layers"]["we_down4"]["q4"].shape == (L, E * F // 8, H)
    # expert-contiguous N fold: expert e's columns are [e*F, (e+1)*F)
    dq = np.asarray(quant4.unpack_w4(
        {"q4": qp["layers"]["we_gate4"]["q4"][0],
         "scale": qp["layers"]["we_gate4"]["scale"][0]}))
    ref = np.asarray(params["layers"]["we_gate"][0])  # [E, H, F]
    for e in range(E):
        got = dq[:, e * F:(e + 1) * F]
        np.testing.assert_allclose(got, ref[e], atol=np.abs(ref).max() / 7)


def test_int4_moe_dense_close_to_bf16():
    from eagle_tpu.models import transformer
    from eagle_tpu.ops.kv_cache import init_cache
    from eagle_tpu.ops.masks import prefill_mask

    cfg, _, params, _, _ = _moe4()
    qp = quant4.quantize_target_params4(params)
    T, S = 10, 32
    tokens = jnp.asarray(np.random.default_rng(9).integers(
        0, cfg.vocab_size, size=(1, T)), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]

    def run(p):
        cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, S,
                           cfg.head_dim, dtype=jnp.float32)
        res = transformer.forward(p, cfg, tokens, cache, pos,
                                  prefill_mask(T, S, cache.length))
        return np.asarray(transformer.lm_head(p, cfg, res.hidden))

    bf = run(params)
    q4 = run(qp)
    rel = np.linalg.norm(q4 - bf) / np.linalg.norm(bf)
    assert rel < 0.15, rel


def test_int4_moe_target_greedy_bit_exact_within_engine():
    cfg, dcfg, params, dparams, ecfg = _moe4()
    qp = quant4.quantize_target_params4(params)
    eng = EagleEngine(qp, cfg, dparams, dcfg, ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=24)
    out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_int4_moe_capacity_raises():
    import dataclasses
    cfg, dcfg, params, dparams, ecfg = _moe4()
    cfg_cap = dataclasses.replace(cfg, moe_impl="capacity",
                                  moe_capacity_factor=8.0)
    qp = quant4.quantize_target_params4(params)
    eng = EagleEngine(qp, cfg_cap, dparams, dcfg, ecfg)
    with pytest.raises(NotImplementedError):
        eng.generate_vanilla(PROMPT, max_new_tokens=4)


def test_int4_moe_target_engine_stacked_interpret(monkeypatch):
    """Stacked interpret kernels through the MoE forward: greedy==vanilla
    and equal to the slicing-fallback engine."""
    cfg, dcfg, params, dparams, ecfg = _moe4()
    qp = quant4.quantize_target_params4(params)
    ref = EagleEngine(qp, cfg, dparams, dcfg, ecfg).generate(
        PROMPT, max_new_tokens=16)
    monkeypatch.setattr(quant4, "FORCE_INTERPRET", True)
    eng = EagleEngine(qp, cfg, dparams, dcfg, ecfg)
    out_v = eng.generate_vanilla(PROMPT, max_new_tokens=16)
    out = eng.generate(PROMPT, max_new_tokens=16)
    np.testing.assert_array_equal(out[: len(out_v)], out_v[: len(out)])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int4_moe_target_ep_sharded():
    """EP/TP-sharded int4 MoE (expert-fold leaves sharded on the folded
    axes): sharded greedy == the sharded engine's own vanilla."""
    from eagle_tpu.parallel import sharding as shd

    cfg, dcfg, params, dparams, ecfg = _moe4()
    qp = quant4.quantize_target_params4(params, tp=4)
    mesh = shd.make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
    qp_s = shd.shard_params(qp, mesh, shd.quantized_target_param_specs4(cfg))
    dparams_s = shd.replicate(dparams, mesh)
    eng = EagleEngine(qp_s, cfg, dparams_s, dcfg, ecfg)
    with jax.set_mesh(mesh):
        out_v = eng.generate_vanilla(PROMPT, max_new_tokens=16)
        out = eng.generate(PROMPT, max_new_tokens=16)
    np.testing.assert_array_equal(out[: len(out_v)], out_v[: len(out)])


def test_fused_qkv_gateup_bit_identical():
    """quantize_target_params4(fuse=True): one wqkv + one w_gateup kernel
    call per layer (7 -> 4 calls, one activation-quant pass per input).
    Per-column kernel math is independent and K-group order unchanged, so
    fused logits must be BIT-identical to unfused — and fuse composes with
    the greedy==vanilla invariant."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_engine_greedy import tiny_cfg, tiny_dcfg, PROMPT
    from eagle_tpu.config import EngineConfig
    from eagle_tpu.engine.engine import EagleEngine
    from eagle_tpu.models import draft as draft_mod, transformer
    from eagle_tpu.ops.kv_cache import init_cache
    from eagle_tpu.ops.masks import prefill_mask
    from eagle_tpu.ops.quant4 import quantize_target_params4

    cfg = tiny_cfg()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)
    q_unf = quantize_target_params4(params, group=16)
    q_fus = quantize_target_params4(params, group=16, fuse=True)
    assert "wqkv" in q_fus["layers"] and "w_gateup" in q_fus["layers"]

    tok = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, 8)), jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)[None]

    def run(p):
        c = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64,
                       cfg.head_dim, dtype=jnp.float32)
        res = transformer.forward(p, cfg, tok, c, pos,
                                  prefill_mask(8, 64, c.length))
        return np.asarray(transformer.lm_head(p, cfg, res.hidden))

    np.testing.assert_array_equal(run(q_unf), run(q_fus))

    dcfg = tiny_dcfg(3)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    eng = EagleEngine(q_fus, cfg, dparams, dcfg, ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=24)
    out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])

    with pytest.raises(ValueError):
        quantize_target_params4(params, group=16, fuse=True, tp=2)
