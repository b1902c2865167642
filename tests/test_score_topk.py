"""Fused draft-scoring kernel (ops/score_topk.py): lm_head matmul +
log-softmax top-k in one Pallas call.

Contract vs the unfused XLA path (draft_logits → log_softmax → topk_rows):
- candidate ids BIT-IDENTICAL (same logit values — the kernel reuses the
  exact int-dot math of qdense/qdense4 — and the same value-desc /
  index-asc tie rule);
- scores equal up to logsumexp reduction order (~1 ulp);
- batched (vmapped) calls flatten into M, bit-identical to per-row calls;
- the engine keeps greedy == vanilla with fused scoring forced on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.config import EngineConfig
from eagle_tpu.engine import drafter
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.ops import quant, quant4, score_topk as stk

from test_engine_greedy import PROMPT, make_engine


def _ref_scores(h2d, qw, k):
    """The unfused path on the SAME quantized weights."""
    if "q4" in qw:
        logits = quant4.qdense4(h2d, qw, out_dtype=jnp.float32,
                                interpret=True)
    else:
        logits = quant.qdense(h2d, qw, out_dtype=jnp.float32)
    lp = jax.nn.log_softmax(logits, axis=-1)
    return drafter.topk_rows(lp, k)


@pytest.mark.parametrize("kind", ["w8", "w4"])
@pytest.mark.parametrize("V", [512, 448])  # 448: ragged last N-block
def test_kernel_matches_xla(kind, V):
    rng = np.random.default_rng(0)
    M, K, k = 10, 256, 4
    h = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, V)) * 0.1, jnp.float32)
    qw = quant4.pack_w4(w) if kind == "w4" else quant.quantize_linear(w)
    lp, ids = stk.score_topk_quant(h, qw, k, interpret=True)
    ref_lp, ref_ids = _ref_scores(h, qw, k)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref_lp),
                               rtol=1e-5, atol=1e-5)
    # descending values, rows independent
    assert np.all(np.diff(np.asarray(lp), axis=1) <= 0)


def test_kernel_tie_order():
    """Duplicate logit values must resolve by ascending index (the
    topk_rows rule)."""
    M, K, V, k = 2, 64, 256, 5
    h = jnp.ones((M, K), jnp.float32)
    w = np.zeros((K, V), np.float32)
    w[:, 100] = w[:, 7] = w[:, 200] = 0.5   # three exactly-equal columns
    qw = quant.quantize_linear(jnp.asarray(w))
    _, ids = stk.score_topk_quant(h, qw, k, interpret=True)
    _, ref_ids = _ref_scores(h, qw, k)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    assert list(np.asarray(ids)[0][:3]) == [7, 100, 200]


def test_vmap_flattens_batch():
    rng = np.random.default_rng(1)
    B, M, K, V, k = 3, 4, 128, 384, 4
    h = jnp.asarray(rng.normal(size=(B, M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, V)) * 0.1, jnp.float32)
    qw = quant.quantize_linear(w)
    fn = lambda hb: stk.score_topk_quant(hb, qw, k, interpret=True)
    lp_b, ids_b = jax.vmap(fn)(h)
    for b in range(B):
        lp, ids = fn(h[b])
        np.testing.assert_array_equal(np.asarray(ids_b[b]), np.asarray(ids))
        np.testing.assert_array_equal(np.asarray(lp_b[b]), np.asarray(lp))


@pytest.mark.parametrize("dq", ["int8", "int4"])
def test_engine_greedy_bit_exact_with_fused_scoring(dq, monkeypatch):
    """Quantized draft + fused scoring forced through the interpreter:
    greedy speculative output must still equal vanilla bit-for-bit."""
    monkeypatch.setattr(stk, "FORCE_INTERPRET", True)
    eng0 = make_engine(3)
    ref = eng0.generate_vanilla(PROMPT, max_new_tokens=24)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                        draft_quant=dq, fuse_scoring=True)
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg)
    out, ntok, rounds = eng.generate(PROMPT, max_new_tokens=24, log=True)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
    assert ntok / rounds >= 1.0


def test_engine_same_tree_fused_vs_xla(monkeypatch):
    """With a near-tie-free random head, fused and XLA scoring build the
    same trees → identical speculative output AND round counts."""
    eng0 = make_engine(3)
    ecfg_x = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                          draft_quant="int8", fuse_scoring=False)
    eng_x = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg,
                        ecfg_x)
    out_x, n_x, r_x = eng_x.generate(PROMPT, max_new_tokens=24, log=True)
    monkeypatch.setattr(stk, "FORCE_INTERPRET", True)
    ecfg_f = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                          draft_quant="int8", fuse_scoring=True)
    eng_f = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg,
                        ecfg_f)
    out_f, n_f, r_f = eng_f.generate(PROMPT, max_new_tokens=24, log=True)
    np.testing.assert_array_equal(np.asarray(out_x), np.asarray(out_f))
    assert (n_x, r_x) == (n_f, r_f)


def test_kernel_matches_xla_bf16_rows():
    """Production drafts are bf16: the unfused path rounds qdense output
    through bf16 before the f32 cast, and the kernel must replicate that
    rounding — candidate ids and tie order bit-identical at bf16 too."""
    rng = np.random.default_rng(3)
    M, K, V, k = 10, 256, 512, 4
    h = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, V)) * 0.1, jnp.float32)
    qw = quant.quantize_linear(w)
    lp, ids = stk.score_topk_quant(h, qw, k, interpret=True)
    # unfused reference exactly as drafter's fallback computes it
    logits = quant.qdense(h, qw).astype(jnp.float32)  # bf16 out -> f32
    ref_lp, ref_ids = drafter.topk_rows(
        jax.nn.log_softmax(logits, axis=-1), k)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref_lp),
                               rtol=1e-5, atol=1e-5)


def test_engine_v1_draft_quantized_target_head_fused(monkeypatch):
    """EAGLE-1 drafts score with the TARGET's lm_head (cnets1.py:702,732);
    with an int8 target that head is a quantized dict, so fused scoring
    applies to v1 + quantized-target engines too — greedy must equal the
    quantized engine's own vanilla decode."""
    monkeypatch.setattr(stk, "FORCE_INTERPRET", True)
    eng0 = make_engine(1)
    qparams = quant.quantize_target_params(eng0.params)
    ecfg = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                        fuse_scoring=True)
    eng = EagleEngine(qparams, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=20)
    out = eng.generate(PROMPT, max_new_tokens=20)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
