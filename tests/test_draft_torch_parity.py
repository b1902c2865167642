"""Numerical parity of the JAX draft heads vs the reference torch modules.

Instantiates the reference's cnets1.Model (EAGLE-1/2) and cnets.Model
(EAGLE-3) — /root/reference/eagle/model/cnets1.py:472, cnets.py:478 — with
tiny random configs, routes their state dicts through
`hf_loader.convert_draft` (the exact code path real published checkpoints
take), and asserts the JAX `draft.forward` hidden states and `draft_logits`
match torch to fp32 tolerance. This closes the biggest untested external
interface: a conversion bug or head-math mismatch would silently crater τ on
real checkpoints without breaking any losslessness test.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
try:
    from eagle.model.configs import EConfig
    from eagle.model import cnets1 as ref_cnets1
    from eagle.model import cnets as ref_cnets3
except Exception as e:  # pragma: no cover - reference tree unavailable
    pytest.skip(f"reference EAGLE not importable: {e}", allow_module_level=True)

from eagle_tpu.config import DraftConfig
from eagle_tpu.models import draft
from eagle_tpu.models.hf_loader import convert_draft
from eagle_tpu.ops.kv_cache import init_cache
from eagle_tpu.ops.masks import prefill_mask

V, H, F, T, S = 120, 32, 64, 7, 16
NQ, NKV, D = 4, 2, 8


def _sd_np(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def _jax_forward(params, dcfg, ids_np, feat_np, num_layers):
    cache = init_cache(num_layers, 1, NKV, S, D, dtype=jnp.float32)
    mask = prefill_mask(T, S, cache.length)
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    return draft.forward(params, dcfg, jnp.asarray(ids_np),
                         jnp.asarray(feat_np), cache, pos, mask)


@pytest.mark.parametrize("qkv_bias", [False, True])
def test_v1_hidden_parity(qkv_bias):
    torch.manual_seed(0)
    kw = dict(vocab_size=V, hidden_size=H, intermediate_size=F,
              num_hidden_layers=2, num_attention_heads=NQ,
              num_key_value_heads=NKV, max_position_embeddings=64,
              rms_norm_eps=1e-5)
    if qkv_bias:
        kw["qkv_bias"] = True
    m = ref_cnets1.Model(EConfig(**kw), bias=True).float().eval()
    dcfg = DraftConfig(version=1, hidden_size=H, intermediate_size=F,
                       num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
                       vocab_size=V, num_layers=2, rms_eps=1e-5,
                       attn_qkv_bias=qkv_bias, dtype=jnp.float32)
    params = convert_draft(_sd_np(m), dcfg, dtype=jnp.float32)

    ids = torch.randint(0, V, (1, T))
    feats = torch.randn(1, T, H)
    with torch.no_grad():
        ref_h = m(feats, ids).numpy()
    out = _jax_forward(params, dcfg, ids.numpy(), feats.numpy(), 2)
    np.testing.assert_allclose(np.asarray(out.hidden), ref_h,
                               rtol=2e-4, atol=2e-4)

    # v1 drafting scores = target lm_head on the raw hidden (cnets1.py:702)
    head = torch.randn(V, H) * 0.05
    with torch.no_grad():
        ref_logits = (torch.from_numpy(ref_h) @ head.T).numpy()
    got = draft.draft_logits(params, dcfg, out.hidden,
                             target_lm_head=jnp.asarray(head.numpy().T))
    np.testing.assert_allclose(np.asarray(got), ref_logits,
                               rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("reduced_vocab", [False, True])
def test_v3_hidden_and_logits_parity(reduced_vocab):
    torch.manual_seed(1)
    dv = 80 if reduced_vocab else V
    cfg = EConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                  num_hidden_layers=1, num_attention_heads=NQ,
                  num_key_value_heads=NKV, max_position_embeddings=64,
                  rms_norm_eps=1e-5, draft_vocab_size=dv)
    m = ref_cnets3.Model(cfg).float().eval()
    if reduced_vocab:
        with torch.no_grad():
            m.d2t.copy_(torch.arange(dv, dtype=torch.long) % 3)
            m.t2d.copy_(torch.zeros(V, dtype=torch.bool))
            m.t2d[:dv] = True
    dcfg = DraftConfig(version=3, hidden_size=H, intermediate_size=F,
                       num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
                       vocab_size=V, draft_vocab_size=dv if reduced_vocab else 0,
                       rms_eps=1e-5, dtype=jnp.float32)
    params = convert_draft(_sd_np(m), dcfg, dtype=jnp.float32)

    ids = torch.randint(0, V, (1, T))
    # fused 3-tap feature (3H wide) → exercises the fc projection
    feats = torch.randn(1, T, 3 * H)
    with torch.no_grad():
        ref_h = m(feats, ids)
        ref_logits = m.lm_head(m.norm(ref_h)).numpy()
        ref_h = ref_h.numpy()
    out = _jax_forward(params, dcfg, ids.numpy(), feats.numpy(), 1)
    np.testing.assert_allclose(np.asarray(out.hidden), ref_h,
                               rtol=2e-4, atol=2e-4)
    got = draft.draft_logits(params, dcfg, out.hidden)
    np.testing.assert_allclose(np.asarray(got), ref_logits,
                               rtol=2e-4, atol=2e-3)
    if reduced_vocab:
        dids = jnp.arange(dv, dtype=jnp.int32)
        want = np.arange(dv) + (np.arange(dv) % 3)
        np.testing.assert_array_equal(
            np.asarray(draft.map_draft_to_target(params, dcfg, dids)), want)


def test_v3_beam_step_parity():
    """Second draft call (H-wide prior hidden, KV cache from the first):
    the beam-expansion shape — no fc, cache append at offset."""
    torch.manual_seed(2)
    cfg = EConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                  num_hidden_layers=1, num_attention_heads=NQ,
                  num_key_value_heads=NKV, max_position_embeddings=64,
                  rms_norm_eps=1e-5, draft_vocab_size=V)
    m = ref_cnets3.Model(cfg).float().eval()
    dcfg = DraftConfig(version=3, hidden_size=H, intermediate_size=F,
                       num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
                       vocab_size=V, rms_eps=1e-5, dtype=jnp.float32)
    params = convert_draft(_sd_np(m), dcfg, dtype=jnp.float32)

    ids1 = torch.randint(0, V, (1, T))
    feats1 = torch.randn(1, T, 3 * H)
    T2 = 3
    ids2 = torch.randint(0, V, (1, T2))
    with torch.no_grad():
        h1, pkv = m(feats1, ids1, use_cache=True)
        feats2 = h1[:, -1:].repeat(1, T2, 1)
        ref_h2 = m(feats2, ids2, past_key_values=pkv, use_cache=True)[0].numpy()

    cache = init_cache(1, 1, NKV, S, D, dtype=jnp.float32)
    mask1 = prefill_mask(T, S, cache.length)
    pos1 = jnp.arange(T, dtype=jnp.int32)[None]
    out1 = draft.forward(params, dcfg, jnp.asarray(ids1.numpy()),
                         jnp.asarray(feats1.numpy()), cache, pos1, mask1)
    mask2 = prefill_mask(T2, S, out1.cache.length)
    pos2 = (T + jnp.arange(T2, dtype=jnp.int32))[None]
    out2 = draft.forward(params, dcfg, jnp.asarray(ids2.numpy()),
                         jnp.asarray(feats2.numpy()), out1.cache, pos2, mask2)
    np.testing.assert_allclose(np.asarray(out2.hidden), ref_h2,
                               rtol=2e-4, atol=2e-4)
