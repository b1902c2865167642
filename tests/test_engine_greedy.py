"""End-to-end greedy speculative decoding must reproduce vanilla decoding
exactly — the core losslessness guarantee (BASELINE.md north star; the
reference only guarantees this implicitly via evaluate_posterior's argmax
match, utils.py:360-373).

The draft head is random (useless), which exercises low-acceptance paths; a
distilled-from-target draft exercises high-acceptance paths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer


def tiny_cfg(vocab=128, H=32, L=4):
    return ModelConfig(
        vocab_size=vocab, hidden_size=H, intermediate_size=64, num_layers=L,
        num_q_heads=4, num_kv_heads=2, head_dim=8, dtype=jnp.float32,
    )


def tiny_dcfg(version, vocab=128, H=32, draft_vocab=0):
    return DraftConfig(
        version=version, hidden_size=H, intermediate_size=64, num_q_heads=4,
        num_kv_heads=2, head_dim=8, vocab_size=vocab,
        draft_vocab_size=draft_vocab, num_layers=1, dtype=jnp.float32,
        target_hidden_size=H if version == 3 else 0,
    )


def make_engine(version, draft_vocab=0, seed=0, **ecfg_kw):
    cfg = tiny_cfg()
    dcfg = tiny_dcfg(version, draft_vocab=draft_vocab)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = transformer.init_params(cfg, k1)
    dparams = draft_mod.init_params(dcfg, k2)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                        **ecfg_kw)
    return EagleEngine(params, cfg, dparams, dcfg, ecfg)


PROMPT = np.array([5, 17, 92, 3, 44, 8, 21], np.int32)


@pytest.mark.parametrize("version", [1, 3])
def test_greedy_matches_vanilla(version):
    eng = make_engine(version)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=40)
    out, new_tok, rounds = eng.generate(PROMPT, max_new_tokens=40, log=True)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
    assert rounds >= 1
    assert new_tok >= 40 or len(out) >= len(ref)


def test_greedy_matches_vanilla_reduced_draft_vocab():
    eng = make_engine(3, draft_vocab=64)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=30)
    out = eng.generate(PROMPT, max_new_tokens=30)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_distilled_draft_accepts_more():
    """A draft head can't beat τ=1 with random weights; sanity-check that the
    engine reports τ (=new_tokens/rounds) ≥ 1 and that acceptance with a
    *perfect* proposal source is exercised via eos-free long generation."""
    eng = make_engine(1, seed=3)
    out, new_tok, rounds = eng.generate(PROMPT, max_new_tokens=60, log=True)
    tau = new_tok / rounds
    assert tau >= 1.0
    assert new_tok == 60


def test_eos_stop():
    eng = make_engine(1)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=40)
    # pick the 10th generated token as a fake EOS: both paths must stop there
    eos = int(ref[len(PROMPT) + 9])
    a = eng.generate_vanilla(PROMPT, max_new_tokens=40, eos_token_id=eos)
    b = eng.generate(PROMPT, max_new_tokens=40, eos_token_id=eos)
    np.testing.assert_array_equal(a, b)


def test_fused_generation_matches_host_loop():
    """One-dispatch lax.while_loop generation == per-round host loop."""
    eng = make_engine(1)
    ref = eng.generate(PROMPT, max_new_tokens=40)
    out, ntok, rounds = eng.generate_fused(PROMPT, max_new_tokens=40, log=True)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
    assert rounds >= 1

    # with EOS configured on-device
    from eagle_tpu.engine.engine import EagleEngine
    eos = int(ref[len(PROMPT) + 7])
    eng2 = EagleEngine(eng.params, eng.cfg, eng.dparams, eng.dcfg, eng.ecfg,
                       eos_token_id=eos)
    a = eng.generate_vanilla(PROMPT, max_new_tokens=40, eos_token_id=eos)
    b = eng2.generate_fused(PROMPT, max_new_tokens=40)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("variant", ["qwen2", "qwen3", "mixtral", "llama31"])
def test_greedy_matches_vanilla_all_architectures(variant):
    """Engine bit-exactness across every backend variant the model zoo
    supports (the reference forks a modeling file per architecture)."""
    from eagle_tpu.config import ModelConfig, RopeConfig
    from eagle_tpu.models import transformer as tr

    kw = dict(vocab_size=128, hidden_size=32, intermediate_size=64,
              num_layers=4, num_q_heads=4, num_kv_heads=2, head_dim=8,
              dtype=jnp.float32)
    if variant == "qwen2":
        kw["attn_qkv_bias"] = True
    elif variant == "qwen3":
        kw["qk_norm"] = True
    elif variant == "mixtral":
        kw.update(num_experts=4, experts_per_token=2)
    elif variant == "llama31":
        kw["rope"] = RopeConfig(theta=500000.0, scaling_type="llama3",
                                scaling_factor=8.0,
                                original_max_position=64)
    cfg = ModelConfig(**kw)
    dcfg = tiny_dcfg(3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    params = tr.init_params(cfg, k1)
    dparams = draft_mod.init_params(dcfg, k2)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=24)
    out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_greedy_matches_vanilla_sliding_window():
    """Engine bit-exactness with per-layer sliding-window attention: tree
    verification and vanilla decode must apply identical window masks."""
    from eagle_tpu.config import ModelConfig
    from eagle_tpu.models import transformer as tr

    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=4,
        num_q_heads=4, num_kv_heads=2, head_dim=8, dtype=jnp.float32,
        attn_qkv_bias=True, sliding_window=12,
        sliding_layer_flags=(True, True, False, False),
    )
    dcfg = tiny_dcfg(1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    params = tr.init_params(cfg, k1)
    dparams = draft_mod.init_params(dcfg, k2)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=30)  # crosses window
    out = eng.generate(PROMPT, max_new_tokens=30)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_tied_embeddings_engine():
    """tie_word_embeddings models (e.g. llama-3.2-1B): lm_head = embedᵀ for
    both target logits and v1 draft scoring."""
    import dataclasses

    from eagle_tpu.models import transformer as tr

    cfg = dataclasses.replace(tiny_cfg(), tie_embeddings=True)
    dcfg = tiny_dcfg(1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(31))
    params = tr.init_params(cfg, k1)
    assert "lm_head" not in params
    dparams = draft_mod.init_params(dcfg, k2)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256)
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=24)
    out = eng.generate(PROMPT, max_new_tokens=24)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


def test_calibrate_total_tokens_runs():
    from eagle_tpu.engine.engine import calibrate_total_tokens

    cfg = tiny_cfg()
    params = __import__("eagle_tpu.models.transformer",
                        fromlist=["init_params"]).init_params(
        cfg, jax.random.PRNGKey(0))
    n = calibrate_total_tokens(params, cfg, candidates=(8, 16),
                               weights=(1.0, 1.05), max_len=64, reps=2)
    assert n in (8, 16)
    # batched-serving calibration (compute-bound regime)
    nb = calibrate_total_tokens(params, cfg, candidates=(8, 16),
                                weights=(1.0, 1.05), max_len=64, reps=2,
                                batch=4)
    assert nb in (8, 16)


def test_pallas_compaction_bit_exact():
    """compact_impl="pallas" (in-place DMA kernel, interpreted off-TPU) must
    reproduce the XLA-compaction engine's greedy output exactly — plain,
    fused, and length-bucketed rounds."""
    eng_ref = make_engine(3)
    ref = eng_ref.generate_vanilla(PROMPT, max_new_tokens=40)

    eng_p = make_engine(3, compact_impl="pallas")
    out = eng_p.generate(PROMPT, max_new_tokens=40)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])

    out_f = eng_p.generate_fused(PROMPT, max_new_tokens=40)
    np.testing.assert_array_equal(out_f[: len(ref)], ref[: len(out_f)])

    eng_b = make_engine(3, compact_impl="pallas", kv_buckets=(128,))
    out_b = eng_b.generate_fused(PROMPT, max_new_tokens=40)
    np.testing.assert_array_equal(out_b[: len(ref)], ref[: len(out_b)])


def test_forced_replay_matches_free_running():
    """Forced-replay mode (force_tokens=) on the free-running trajectory must
    reproduce it exactly, with full live-argmax agreement: on CPU fp32 the
    live target argmax IS the reference, so pinning acceptance to it changes
    nothing. The engine-level getkacc (train/main.py:240-293)."""
    eng = make_engine(1)
    free, n_free, r_free = eng.generate_fused(PROMPT, max_new_tokens=24,
                                              log=True)
    # extend the reference far enough to cover budget + commit window
    full = eng.generate_fused(PROMPT, max_new_tokens=64)
    out, n, rounds, live = eng.generate_fused(
        PROMPT, max_new_tokens=24, log=True, force_tokens=full)
    np.testing.assert_array_equal(out, free[: len(out)])
    assert rounds == r_free
    assert live > 0  # live argmax agreed wherever the walk inspected it


def test_forced_replay_follows_corrupted_reference():
    """When the reference diverges from the live argmax, forced replay must
    follow the REFERENCE (that is its contract), not the live target."""
    eng = make_engine(1)
    full = np.asarray(eng.generate_fused(PROMPT, max_new_tokens=64))
    ref = full.copy()
    flip = len(PROMPT) + 5
    ref[flip] = (ref[flip] + 1) % eng.cfg.vocab_size
    out, n, rounds, live = eng.generate_fused(
        PROMPT, max_new_tokens=24, log=True, force_tokens=ref)
    np.testing.assert_array_equal(out, ref[: len(out)])
    assert out[flip] == ref[flip] != full[flip]


def test_forced_replay_rejects_bad_inputs():
    eng = make_engine(1)
    full = eng.generate_fused(PROMPT, max_new_tokens=64)
    with np.testing.assert_raises(ValueError):  # too short
        eng.generate_fused(PROMPT, max_new_tokens=60, force_tokens=full[:30])
    bad = np.asarray(full).copy()
    bad[0] += 1  # prompt mismatch
    with np.testing.assert_raises(ValueError):
        eng.generate_fused(PROMPT, max_new_tokens=8, force_tokens=bad)
    sampled = make_engine(1, temperature=0.8)
    with np.testing.assert_raises(ValueError):
        sampled.generate_fused(PROMPT, max_new_tokens=8, force_tokens=full)
