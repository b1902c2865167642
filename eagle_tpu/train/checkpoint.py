"""Training checkpoint / resume + draft-head export.

The reference checkpoints via accelerate `save_state` per epoch
(/root/reference/eagle/train/main.py:469) and DeepSpeed `save_16bit_model` +
`save_checkpoint` with directory-scan auto-resume
(traineagle3/main.py:244-262,349-351). Here: orbax for full train state
(params + optimizer + step), with the same newest-step auto-resume scan, and
a safetensors exporter that writes trained draft heads in the reference's
cnets naming so they are loadable by either framework
(models/hf_loader.convert_draft is the inverse).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def save_train_state(ckpt_dir: str, step: int, dparams: dict, opt_state: Any,
                     metadata: Optional[dict] = None) -> str:
    """Write state_{step}/ under ckpt_dir (traineagle3 naming)."""
    assert ocp is not None, "orbax unavailable"
    path = os.path.join(os.path.abspath(ckpt_dir), f"state_{step}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {"dparams": dparams, "opt_state": opt_state,
                      "step": step, "metadata": metadata or {}})
    return path


def find_latest_state(ckpt_dir: str) -> Optional[int]:
    """Newest state_N dir (find_max_state_with_file, traineagle3/main.py:244)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"state_(\d+)", name)
        if m:
            s = int(m.group(1))
            best = s if best is None or s > best else best
    return best


def restore_train_state(ckpt_dir: str, step: Optional[int] = None,
                        like: Optional[dict] = None) -> Optional[dict]:
    assert ocp is not None, "orbax unavailable"
    if step is None:
        step = find_latest_state(ckpt_dir)
        if step is None:
            return None
    path = os.path.join(os.path.abspath(ckpt_dir), f"state_{step}")
    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        restored = ckptr.restore(path, item=like)
    else:
        restored = ckptr.restore(path)
    return restored


# ---------------------------------------------------------------------------
# HF-format draft export (inverse of hf_loader.convert_draft)
# ---------------------------------------------------------------------------

def export_draft_safetensors(dparams: dict, version: int, out_path: str,
                             include_embed: bool = False) -> None:
    """Write a draft head as safetensors with the reference's cnets/cnets1
    key naming, so the checkpoint round-trips through hf_loader.load_draft
    and is loadable by the reference implementation too."""
    from safetensors.numpy import save_file

    sd = {}

    def put(name, x, transpose=False):
        a = np.asarray(jax.device_get(x)).astype(np.float32)
        sd[name] = a.T.copy() if transpose and a.ndim == 2 else a

    if include_embed:
        put("embed_tokens.weight", dparams["embed"]["w"])
    put("fc.weight", dparams["fc"]["w"], transpose=True)
    if "b" in dparams.get("fc", {}):
        put("fc.bias", dparams["fc"]["b"])

    if version == 3:
        lp = dparams["layers"][0]
        p = "midlayer."
        put(p + "self_attn.q_proj.weight", lp["wq"], transpose=True)
        put(p + "self_attn.k_proj.weight", lp["wk"], transpose=True)
        put(p + "self_attn.v_proj.weight", lp["wv"], transpose=True)
        put(p + "self_attn.o_proj.weight", lp["wo"], transpose=True)
        put(p + "hidden_norm.weight", lp["hidden_norm"])
        put(p + "input_layernorm.weight", lp["ln1"])
        put(p + "post_attention_layernorm.weight", lp["ln2"])
        put(p + "mlp.gate_proj.weight", lp["w_gate"], transpose=True)
        put(p + "mlp.up_proj.weight", lp["w_up"], transpose=True)
        put(p + "mlp.down_proj.weight", lp["w_down"], transpose=True)
        put("norm.weight", dparams["norm"])
        put("lm_head.weight", dparams["lm_head"], transpose=True)
        if "d2t" in dparams:
            sd["d2t"] = np.asarray(jax.device_get(dparams["d2t"]),
                                   np.int64)
            sd["t2d"] = np.asarray(jax.device_get(dparams["t2d"]), bool)
    else:
        for i, lp in enumerate(dparams["layers"]):
            p = f"layers.{i}."
            put(p + "self_attn.q_proj.weight", lp["wq"], transpose=True)
            put(p + "self_attn.k_proj.weight", lp["wk"], transpose=True)
            put(p + "self_attn.v_proj.weight", lp["wv"], transpose=True)
            put(p + "self_attn.o_proj.weight", lp["wo"], transpose=True)
            put(p + "post_attention_layernorm.weight", lp["ln2"])
            put(p + "mlp.gate_proj.weight", lp["w_gate"], transpose=True)
            put(p + "mlp.up_proj.weight", lp["w_up"], transpose=True)
            put(p + "mlp.down_proj.weight", lp["w_down"], transpose=True)
            if i != 0:
                put(p + "input_layernorm.weight", lp["ln1"])
            if "bq" in lp:
                put(p + "self_attn.q_proj.bias", lp["bq"])
                put(p + "self_attn.k_proj.bias", lp["bk"])
                put(p + "self_attn.v_proj.bias", lp["bv"])

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    save_file(sd, out_path)


def export_target_safetensors(params: dict, cfg, out_dir: str) -> None:
    """Write a TARGET param tree as an HF-style llama checkpoint directory
    (model.safetensors + config.json) that hf_loader.load_target round-trips.

    Inverse of hf_loader.convert_target for the llama layout (no MoE /
    qk-norm variants — this exists so hermetic environments can exercise
    the checkpoint-loading product surface, e.g. the MT-bench eval CLI,
    with locally-built models)."""
    import json

    from safetensors.numpy import save_file

    sd = {}

    def put(name, x, transpose=False):
        a = np.asarray(jax.device_get(x)).astype(np.float32)
        sd[name] = a.T.copy() if transpose and a.ndim == 2 else a

    put("model.embed_tokens.weight", params["embed"]["w"])
    put("model.norm.weight", params["final_norm"])
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"], transpose=True)
    L = cfg.num_layers
    lay = params["layers"]
    if "bq" in lay:
        # the emitted config says model_type=llama, which the loader reads
        # as bias-free — silently dropping biases on the round-trip would
        # be worse than refusing
        raise NotImplementedError(
            "export_target_safetensors emits the llama layout only; "
            "qkv-bias (qwen2-style) targets are not round-trippable here")
    names = (("ln1", "input_layernorm.weight", False),
             ("ln2", "post_attention_layernorm.weight", False),
             ("wq", "self_attn.q_proj.weight", True),
             ("wk", "self_attn.k_proj.weight", True),
             ("wv", "self_attn.v_proj.weight", True),
             ("wo", "self_attn.o_proj.weight", True),
             ("w_gate", "mlp.gate_proj.weight", True),
             ("w_up", "mlp.up_proj.weight", True),
             ("w_down", "mlp.down_proj.weight", True))
    for i in range(L):
        for key, hf_name, tr in names:
            put(f"model.layers.{i}.{hf_name}", lay[key][i], transpose=tr)
    os.makedirs(out_dir, exist_ok=True)
    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    conf = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_q_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rms_norm_eps": cfg.rms_eps,
        "rope_theta": cfg.rope.theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": "lm_head" not in params,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(conf, f, indent=2)
