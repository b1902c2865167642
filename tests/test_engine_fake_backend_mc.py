"""Full-engine Monte-Carlo losslessness with a fake target backend — the
literal analog of the reference harness (/root/reference/eagle/testbug/
testbbug.py), which swaps the base model for fixed categorical
distributions and histograms 500k generations.

Here the target forward is monkeypatched so that position t's logits depend
only on the previous token (a [V, V] conditional table) while the draft
stays a real (arbitrary-quality) draft net. Every engine code path runs —
prefill root sampling, tree verify plumbing, multi-round rejection, bonus
sampling, KV compaction, round chaining — and the emitted chains must
follow the table's Markov distribution exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import DraftConfig, EngineConfig, ModelConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer
from eagle_tpu.ops.kv_cache import KVCache

V = 16
H = V  # hidden = one-hot(token) so the fake lm_head reads the table row


def _install_fake_target(monkeypatch, table_logits):
    def fake_forward(params, cfg, tokens, cache, positions, mask):
        B, T = tokens.shape
        onehot = jax.nn.one_hot(tokens, H, dtype=cfg.dtype)      # [B, T, H]
        taps = jnp.concatenate([onehot] * 3, axis=-1)
        new_cache = KVCache(k=cache.k, v=cache.v,
                            length=cache.length + T)
        return transformer.ForwardResult(hidden=onehot,
                                         pre_norm_hidden=onehot,
                                         taps=taps, cache=new_cache)

    def fake_lm_head(params, cfg, hidden):
        return jnp.dot(hidden.astype(jnp.float32), table_logits)

    monkeypatch.setattr(transformer, "forward", fake_forward)
    monkeypatch.setattr(transformer, "lm_head", fake_lm_head)


@pytest.mark.parametrize("version", [1, 3])
def test_full_engine_chain_distribution(monkeypatch, version):
    rng = np.random.default_rng(9)
    table = jnp.asarray(rng.normal(0, 1.5, size=(V, V)), jnp.float32)
    _install_fake_target(monkeypatch, table)

    cfg = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=32,
                      num_layers=2, num_q_heads=2, num_kv_heads=2,
                      head_dim=4, dtype=jnp.float32)
    dcfg = DraftConfig(version=version, hidden_size=H, intermediate_size=32,
                       num_q_heads=2, num_kv_heads=2, head_dim=4,
                       vocab_size=V, target_hidden_size=H if version == 3 else 0,
                       dtype=jnp.float32)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
    params = {"embed": {"w": jnp.zeros((V, H), jnp.float32)},
              "lm_head": jnp.zeros((H, V), jnp.float32)}
    ecfg = EngineConfig(total_tokens=7, depth=2, top_k=3, max_len=64,
                        temperature=1.0)
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)

    prompt = np.asarray([3], np.int32)
    n = 1500
    L = 3
    seqs = np.stack([
        eng.generate(prompt, max_new_tokens=L, seed=5000 + i)[1:]
        for i in range(n)
    ])
    assert seqs.shape == (n, L)

    # position 0: ~ p(·|3)
    p1 = np.asarray(jax.nn.softmax(table[3]))
    emp1 = np.bincount(seqs[:, 0], minlength=V) / n
    tol1 = 4 * np.sqrt(np.maximum(p1 * (1 - p1), 1e-12) / n)
    assert np.all(np.abs(emp1 - p1) <= tol1 + 0.01), (
        f"pos0 max dev {np.max(np.abs(emp1 - p1)):.4f}")

    # position 1 conditioned on the most common first token
    t1 = int(emp1.argmax())
    sel = seqs[:, 0] == t1
    p2 = np.asarray(jax.nn.softmax(table[t1]))
    emp2 = np.bincount(seqs[sel, 1], minlength=V) / sel.sum()
    tol2 = 4 * np.sqrt(np.maximum(p2 * (1 - p2), 1e-12) / sel.sum())
    assert np.all(np.abs(emp2 - p2) <= tol2 + 0.02), (
        f"pos1|{t1} max dev {np.max(np.abs(emp2 - p2)):.4f}")


@pytest.mark.parametrize("acceptance", ["true_q_dynamic", "q1"])
def test_full_engine_chain_distribution_dynamic_sampled(monkeypatch,
                                                        acceptance):
    """The dynamic-tree sampled-candidate matrix cell: acceptance=
    "true_q_dynamic" routes EAGLE-2/3 dynamic trees through two-pass
    drafting (drafter.draft_round sampled mode → Tree.node_probs →
    accept.accept_sampled_true_q). The emitted chains must follow the
    Markov table exactly — the same gate the q=1 dynamic path ("q1"
    parametrization, run as the control) and the static true_q path
    already pass."""
    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.normal(0, 1.5, size=(V, V)), jnp.float32)
    _install_fake_target(monkeypatch, table)

    cfg = ModelConfig(vocab_size=V, hidden_size=H, intermediate_size=32,
                      num_layers=2, num_q_heads=2, num_kv_heads=2,
                      head_dim=4, dtype=jnp.float32)
    dcfg = DraftConfig(version=3, hidden_size=H, intermediate_size=32,
                       num_q_heads=2, num_kv_heads=2, head_dim=4,
                       vocab_size=V, target_hidden_size=H,
                       dtype=jnp.float32)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(2))
    params = {"embed": {"w": jnp.zeros((V, H), jnp.float32)},
              "lm_head": jnp.zeros((H, V), jnp.float32)}
    ecfg = EngineConfig(total_tokens=7, depth=2, top_k=3, max_len=64,
                        temperature=1.0, acceptance=acceptance)
    eng = EagleEngine(params, cfg, dparams, dcfg, ecfg)

    prompt = np.asarray([3], np.int32)
    n = 1500
    L = 3
    seqs = np.stack([
        eng.generate(prompt, max_new_tokens=L, seed=7000 + i)[1:]
        for i in range(n)
    ])
    assert seqs.shape == (n, L)
    if acceptance == "true_q_dynamic":
        # the sampled path must actually be exercised: multi-token accepts
        # happen (true-q accepts beyond the root with positive probability)
        _, st = eng.generate(prompt, max_new_tokens=24, seed=1,
                             details=True)
        assert max(st["accept_lens"]) >= 1

    p1 = np.asarray(jax.nn.softmax(table[3]))
    emp1 = np.bincount(seqs[:, 0], minlength=V) / n
    tol1 = 4 * np.sqrt(np.maximum(p1 * (1 - p1), 1e-12) / n)
    assert np.all(np.abs(emp1 - p1) <= tol1 + 0.01), (
        f"pos0 max dev {np.max(np.abs(emp1 - p1)):.4f}")

    t1 = int(emp1.argmax())
    sel = seqs[:, 0] == t1
    p2 = np.asarray(jax.nn.softmax(table[t1]))
    emp2 = np.bincount(seqs[sel, 1], minlength=V) / sel.sum()
    tol2 = 4 * np.sqrt(np.maximum(p2 * (1 - p2), 1e-12) / sel.sum())
    assert np.all(np.abs(emp2 - p2) <= tol2 + 0.02), (
        f"pos1|{t1} max dev {np.max(np.abs(emp2 - p2)):.4f}")
