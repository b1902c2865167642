"""Weight-only int8 quantization for the draft head.

The draft runs 7-8 small sequential forwards per decode round; at 1B-class
scale its weight streaming (~2ms) is a large share of the ~5ms round. int8
weights halve those HBM reads. Activations are quantized dynamically
per-row so the matmul runs on the int8 MXU path (int32 accumulation), then
rescaled — otherwise XLA would materialize a dequantized bf16 copy and the
bandwidth win would vanish.

Correctness note: quantizing the DRAFT never breaks losslessness — the
acceptance rule only commits tokens the TARGET verifies (greedy: argmax
match; sampled: rejection against target probabilities). A worse draft can
only lower τ, never change the output distribution. Enforced by
tests/test_quant.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_linear(w: jnp.ndarray) -> dict:
    """[in, out] weight → {"q8": int8 [in,out], "scale": f32 [out]}
    (symmetric per-output-channel)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale}


def qdense(x: jnp.ndarray, qw: dict, b: Optional[jnp.ndarray] = None,
           out_dtype=None) -> jnp.ndarray:
    """x [.., in] @ int8 weights → [.., out] in x.dtype (or out_dtype).

    Dynamic symmetric per-row activation quantization (quantize_rows —
    the ONE copy of the rule every int8/int4 path shares); int8×int8
    matmul with int32 accumulation on the MXU; output rescaled by
    (row_scale ⊗ col_scale)."""
    shape = x.shape
    xq, sx = quantize_rows(x.reshape(-1, shape[-1]))
    acc = jax.lax.dot_general(
        xq, qw["q8"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * qw["scale"][None, :]
    y = y.astype(out_dtype or x.dtype).reshape(
        shape[:-1] + (qw["q8"].shape[1],))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
# drafts may carry fused projections (models/draft.fuse_projections);
# per-output-column scales make quantize(concat) == concat(quantize)
_DRAFT_QUANT_KEYS = _QUANT_KEYS + ("wqkv", "wgu")
# Mixtral expert banks ([.., E, K, N] — batched-einsum path, not _dense):
# exactly where weight-only quantization matters most (E× the FFN weight
# footprint streams every decode step, modeling_mixtral_kv.py:449-517)
_EXPERT_QUANT_KEYS = ("we_gate", "we_up", "we_down")


def quantize_rows(x: jnp.ndarray):
    """Per-row dynamic symmetric int8 activation quantization over the
    LAST axis — the single definition of the rule (qdense, the expert-bank
    einsums, and quant4._quantize_acts all route here; the losslessness
    invariants depend on every path applying it identically):
    x [.., K] -> (int8 [.., K], f32 scales [.., 1])."""
    xf = x.astype(jnp.float32)
    xmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    sx = xmax / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def quantize_draft_params(dparams: dict) -> dict:
    """Quantize every large 2-D matrix of a draft-head param tree (layers'
    projections + fc + lm_head); embeddings, norms and vocab maps stay as-is
    (embedding is a gather — no matmul bandwidth to save)."""
    out = dict(dparams)
    layers = []
    for lp in dparams["layers"]:
        nlp = dict(lp)
        for k in _DRAFT_QUANT_KEYS:
            if k in nlp:
                nlp[k] = quantize_linear(nlp[k])
        layers.append(nlp)
    out["layers"] = layers
    if "fc" in out:
        fc = dict(out["fc"])
        fc["w"] = quantize_linear(fc["w"])
        out["fc"] = fc
    if "lm_head" in out:
        out["lm_head"] = quantize_linear(out["lm_head"])
    return out


def _quantize_linear_host(w) -> dict:
    """Host (numpy) quantization for 2-D [in, out] or stacked [L, in, out]
    weights — per-output-channel scales along axis -2, matching
    quantize_linear / vmap(quantize_linear) exactly."""
    import numpy as np

    wf = np.asarray(w, np.float32)
    amax = np.max(np.abs(wf), axis=-2)
    scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
    q = np.clip(np.round(wf / scale[..., None, :]), -127, 127).astype(np.int8)
    return {"q8": q, "scale": scale}


def quantize_target_params(params: dict) -> dict:
    """Weight-only int8 quantization for a TARGET param tree (the serving
    operating point: nearly halves both the vanilla step's and the verify
    forward's weight streaming).

    The target's layer weights are stacked [L, in, out] (scanned in
    transformer.forward); after the scan slices them, `_dense` sees the
    same {"q8", "scale"} dicts as the draft path. MoE expert banks
    ([L, E, K, N] — _EXPERT_QUANT_KEYS) quantize the same way with
    per-(expert, output-channel) scales; the batched-einsum consumers in
    transformer._mlp_moe{,_capacity} run int8×int8 dots. Embeddings,
    norms, biases and the MoE router (tiny) stay unquantized.
    Quantization runs on the HOST (numpy): a one-time offline
    conversion — doing it eagerly on-device would stage ~fp32 copies of
    every stacked weight next to the resident bf16 tree and OOM a 4B+
    model on one chip.

    Correctness note: this CHANGES the target (unlike draft quantization) —
    outputs match the int8 target's own vanilla decode bit-for-bit (the
    greedy invariant holds within the quantized engine; enforced by
    tests/test_quant.py), not the bf16 target's.

    Works under TP: shard the quantized tree with
    `parallel.sharding.quantized_target_param_specs` (q8 inherits the bf16
    spec; scale drops the contraction axis). Sharded int8 is bit-exact vs
    unsharded — int32 partial-dot psums are exact integers.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for k in _QUANT_KEYS + _EXPERT_QUANT_KEYS:
        if k in layers and not isinstance(layers[k], dict):
            layers[k] = _quantize_linear_host(layers[k])
    out["layers"] = layers
    if "lm_head" in out and not isinstance(out["lm_head"], dict):
        out["lm_head"] = _quantize_linear_host(out["lm_head"])
    return out


# ---------------------------------------------------------------------------
# Quantization-aware training (straight-through fake quantization)
# ---------------------------------------------------------------------------

def fake_quantize_linear(w: jnp.ndarray) -> jnp.ndarray:
    """Quantize→dequantize with a straight-through gradient estimator.

    Training the draft through this makes its weights robust to the int8
    deployment path (quantize_draft_params), recovering the τ the
    post-training-quantized draft loses."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    dq = jnp.clip(jnp.round(wf / scale), -127, 127) * scale
    return (wf + jax.lax.stop_gradient(dq - wf)).astype(w.dtype)


def fake_quantize_draft_params(dparams: dict) -> dict:
    """Apply STE fake quantization to exactly the matrices
    quantize_draft_params would quantize (same coverage, same per-channel
    scaling), leaving embeddings/norms/vocab maps untouched."""
    out = dict(dparams)
    if "layers" in out:
        layers = []
        for lp in out["layers"]:
            nlp = dict(lp)
            for k in _QUANT_KEYS:
                if k in nlp and not isinstance(nlp[k], dict):
                    nlp[k] = fake_quantize_linear(nlp[k])
            layers.append(nlp)
        out["layers"] = layers
    if "fc" in out and not isinstance(out["fc"].get("w"), dict):
        fc = dict(out["fc"])
        fc["w"] = fake_quantize_linear(fc["w"])
        out["fc"] = fc
    if "lm_head" in out and not isinstance(out["lm_head"], dict):
        out["lm_head"] = fake_quantize_linear(out["lm_head"])
    return out
