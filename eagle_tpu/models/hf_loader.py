"""HuggingFace checkpoint → eagle_tpu param pytrees.

Loads target models (Llama / Qwen2 / Qwen3 / Mixtral safetensors or
pytorch_model.bin shards) and EAGLE draft-head checkpoints
(cf. /root/reference/eagle/model/ea_model.py:120-135 weight-format
fallbacks) into the functional param layouts of
eagle_tpu.models.transformer / eagle_tpu.models.draft.

Linear weights are transposed from torch's [out, in] to [in, out]; layer
weights are stacked on a leading L axis for the `lax.scan` layer loop.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..config import DraftConfig, ModelConfig

try:  # safetensors ships with transformers
    from safetensors import safe_open
except ImportError:  # pragma: no cover
    safe_open = None


# ---------------------------------------------------------------------------
# Raw state-dict loading
# ---------------------------------------------------------------------------

def _torch_to_np(t) -> np.ndarray:
    import torch

    if t.dtype == torch.bfloat16:
        return t.float().numpy()
    return t.numpy()


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a local HF checkpoint directory (or single file).

    Handles: model.safetensors, sharded safetensors via index json,
    pytorch_model.bin (the same fallback ladder as ea_model.py:124-135).
    bf16 tensors are upcast to fp32 numpy (numpy has no bf16); the caller
    casts to the final jnp dtype.
    """
    out: Dict[str, np.ndarray] = {}
    if os.path.isfile(path):
        files = [path]
    else:
        st_index = os.path.join(path, "model.safetensors.index.json")
        pt_index = os.path.join(path, "pytorch_model.bin.index.json")
        if os.path.exists(st_index):
            with open(st_index) as f:
                shard_names = sorted(set(json.load(f)["weight_map"].values()))
            files = [os.path.join(path, s) for s in shard_names]
        elif os.path.exists(os.path.join(path, "model.safetensors")):
            files = [os.path.join(path, "model.safetensors")]
        elif os.path.exists(pt_index):
            with open(pt_index) as f:
                shard_names = sorted(set(json.load(f)["weight_map"].values()))
            files = [os.path.join(path, s) for s in shard_names]
        elif os.path.exists(os.path.join(path, "pytorch_model.bin")):
            files = [os.path.join(path, "pytorch_model.bin")]
        else:
            raise FileNotFoundError(f"no recognized checkpoint in {path}")

    for f in files:
        if f.endswith(".safetensors"):
            assert safe_open is not None, "safetensors unavailable"
            with safe_open(f, framework="numpy") as sf:
                for k in sf.keys():
                    try:
                        out[k] = sf.get_tensor(k)
                    except TypeError:
                        # bf16 unsupported by numpy framework → go through torch
                        with safe_open(f, framework="pt") as sft:
                            out[k] = _torch_to_np(sft.get_tensor(k))
        else:
            import torch

            sd = torch.load(f, map_location="cpu", weights_only=True)
            for k, t in sd.items():
                out[k] = _torch_to_np(t)
    return out


# ---------------------------------------------------------------------------
# Target model conversion
# ---------------------------------------------------------------------------

def convert_target(sd: Dict[str, np.ndarray], cfg: ModelConfig, dtype=None) -> dict:
    """Convert an HF causal-LM state dict to the transformer param pytree."""
    dtype = dtype or cfg.dtype
    L = cfg.num_layers

    def g(name: str) -> np.ndarray:
        return np.asarray(sd[name])

    def stack(fmt: str, transpose: bool = True) -> jnp.ndarray:
        ws = [g(fmt.format(i=i)) for i in range(L)]
        ws = [w.T if transpose and w.ndim == 2 else w for w in ws]
        return jnp.asarray(np.stack(ws), dtype=dtype)

    p = "model.layers.{i}."
    layers = {
        "ln1": stack(p + "input_layernorm.weight", transpose=False),
        "ln2": stack(p + "post_attention_layernorm.weight", transpose=False),
        "wq": stack(p + "self_attn.q_proj.weight"),
        "wk": stack(p + "self_attn.k_proj.weight"),
        "wv": stack(p + "self_attn.v_proj.weight"),
        "wo": stack(p + "self_attn.o_proj.weight"),
    }
    if cfg.attn_qkv_bias:
        layers["bq"] = stack(p + "self_attn.q_proj.bias", transpose=False)
        layers["bk"] = stack(p + "self_attn.k_proj.bias", transpose=False)
        layers["bv"] = stack(p + "self_attn.v_proj.bias", transpose=False)
    if cfg.qk_norm:
        layers["q_norm"] = stack(p + "self_attn.q_norm.weight", transpose=False)
        layers["k_norm"] = stack(p + "self_attn.k_norm.weight", transpose=False)
    if cfg.num_experts > 0:
        E = cfg.num_experts

        def stack_experts(w_name: str, transpose=True) -> jnp.ndarray:
            ws = [
                np.stack([
                    g(f"model.layers.{i}.block_sparse_moe.experts.{e}.{w_name}.weight").T
                    if transpose else
                    g(f"model.layers.{i}.block_sparse_moe.experts.{e}.{w_name}.weight")
                    for e in range(E)
                ])
                for i in range(L)
            ]
            return jnp.asarray(np.stack(ws), dtype=dtype)

        layers["router"] = stack(p + "block_sparse_moe.gate.weight")
        layers["we_gate"] = stack_experts("w1")   # gate
        layers["we_down"] = stack_experts("w2")   # down
        layers["we_up"] = stack_experts("w3")     # up
    else:
        layers["w_gate"] = stack(p + "mlp.gate_proj.weight")
        layers["w_up"] = stack(p + "mlp.up_proj.weight")
        layers["w_down"] = stack(p + "mlp.down_proj.weight")

    params = {
        "embed": {"w": jnp.asarray(g("model.embed_tokens.weight"), dtype=dtype)},
        "layers": layers,
        "final_norm": jnp.asarray(g("model.norm.weight"), dtype=dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(g("lm_head.weight").T, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# Draft head conversion
# ---------------------------------------------------------------------------

def convert_draft(sd: Dict[str, np.ndarray], cfg: DraftConfig, dtype=None,
                  target_embed: np.ndarray | None = None) -> dict:
    """Convert an EAGLE draft checkpoint (cnets/cnets1 naming) to the draft
    param pytree. EAGLE checkpoints often omit embed_tokens (loaded from the
    base model, cnets.py:488-519) — pass `target_embed` in that case."""
    dtype = dtype or cfg.dtype

    def g(name: str) -> np.ndarray:
        return np.asarray(sd[name])

    def lin(name: str) -> jnp.ndarray:
        return jnp.asarray(g(name).T, dtype=dtype)

    def vec(name: str) -> jnp.ndarray:
        return jnp.asarray(g(name), dtype=dtype)

    if "embed_tokens.weight" in sd:
        embed = jnp.asarray(g("embed_tokens.weight"), dtype=dtype)
    else:
        assert target_embed is not None, "draft ckpt lacks embed_tokens"
        embed = jnp.asarray(target_embed, dtype=dtype)

    params: dict = {"embed": {"w": embed}}

    if cfg.version == 3:
        p = "midlayer."
        lp = {
            "wq": lin(p + "self_attn.q_proj.weight"),
            "wk": lin(p + "self_attn.k_proj.weight"),
            "wv": lin(p + "self_attn.v_proj.weight"),
            "wo": lin(p + "self_attn.o_proj.weight"),
        }
        if p + "self_attn.q_proj.bias" in sd:  # qwen2-target EAGLE-3 heads
            lp["bq"] = vec(p + "self_attn.q_proj.bias")
            lp["bk"] = vec(p + "self_attn.k_proj.bias")
            lp["bv"] = vec(p + "self_attn.v_proj.bias")
        lp |= {
            "hidden_norm": vec(p + "hidden_norm.weight"),
            "ln1": vec(p + "input_layernorm.weight"),
            "ln2": vec(p + "post_attention_layernorm.weight"),
            "w_gate": lin(p + "mlp.gate_proj.weight"),
            "w_up": lin(p + "mlp.up_proj.weight"),
            "w_down": lin(p + "mlp.down_proj.weight"),
        }
        params["layers"] = [lp]
        params["fc"] = {"w": lin("fc.weight")}
        params["norm"] = vec("norm.weight")
        params["lm_head"] = lin("lm_head.weight")
        if "d2t" in sd:
            params["d2t"] = jnp.asarray(g("d2t"), jnp.int32)
        if "t2d" in sd:
            params["t2d"] = jnp.asarray(g("t2d"), bool)
        return params

    # version 1 — cnets1 naming
    layers = []
    i = 0
    while f"layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"layers.{i}."
        lp = {
            "wq": lin(p + "self_attn.q_proj.weight"),
            "wk": lin(p + "self_attn.k_proj.weight"),
            "wv": lin(p + "self_attn.v_proj.weight"),
            "wo": lin(p + "self_attn.o_proj.weight"),
            "ln2": vec(p + "post_attention_layernorm.weight"),
            "w_gate": lin(p + "mlp.gate_proj.weight"),
            "w_up": lin(p + "mlp.up_proj.weight"),
            "w_down": lin(p + "mlp.down_proj.weight"),
        }
        if i != 0:
            lp["ln1"] = vec(p + "input_layernorm.weight")
        if p + "self_attn.q_proj.bias" in sd:
            lp["bq"] = vec(p + "self_attn.q_proj.bias")
            lp["bk"] = vec(p + "self_attn.k_proj.bias")
            lp["bv"] = vec(p + "self_attn.v_proj.bias")
        layers.append(lp)
        i += 1
    params["layers"] = layers
    params["fc"] = {"w": lin("fc.weight")}
    if "fc.bias" in sd:
        params["fc"]["b"] = vec("fc.bias")
    return params


def load_target(path: str, dtype=jnp.bfloat16) -> tuple[dict, ModelConfig]:
    cfg = ModelConfig.from_hf_json(path, dtype=dtype)
    return convert_target(load_state_dict(path), cfg, dtype=dtype), cfg


def load_draft(path: str, version: int | None = None, dtype=jnp.bfloat16,
               target_embed=None) -> tuple[dict, DraftConfig]:
    cfg = DraftConfig.from_hf_json(path, version=version, dtype=dtype)
    return convert_draft(load_state_dict(path), cfg, dtype=dtype,
                         target_embed=target_embed), cfg
