"""Unified typed configuration tree for eagle_tpu.

The reference spreads configuration over four ad-hoc mechanisms (argparse,
in-file dicts, HF PretrainedConfig JSON, DeepSpeed JSON — see
/root/reference/eagle/model/configs.py and eagle/train/main.py:13-41). Here a
single set of frozen dataclasses covers the target model, the draft head, and
the speculation engine. Everything that affects compiled XLA shapes is a
static field on these configs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    """Rotary embedding settings.

    Covers the reference's rope variants: default, linear scaling, dynamic
    NTK (eagle/model/cnets.py:146-188) and LLaMA-3.1 frequency warping
    (eagle/model/modeling_llama_kv.py:208-292).
    """

    theta: float = 10000.0
    # one of: "default", "linear", "dynamic", "llama3"
    scaling_type: str = "default"
    scaling_factor: float = 1.0
    # llama3-only knobs
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position: int = 8192

    @staticmethod
    def from_hf(rope_theta: float, rope_scaling: Optional[dict]) -> "RopeConfig":
        if not rope_scaling:
            return RopeConfig(theta=rope_theta)
        stype = rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
        if stype in ("default", None):
            return RopeConfig(theta=rope_theta)
        if stype == "llama3":
            return RopeConfig(
                theta=rope_theta,
                scaling_type="llama3",
                scaling_factor=float(rope_scaling.get("factor", 8.0)),
                low_freq_factor=float(rope_scaling.get("low_freq_factor", 1.0)),
                high_freq_factor=float(rope_scaling.get("high_freq_factor", 4.0)),
                original_max_position=int(
                    rope_scaling.get("original_max_position_embeddings", 8192)
                ),
            )
        if stype in ("linear", "dynamic"):
            return RopeConfig(
                theta=rope_theta,
                scaling_type=stype,
                scaling_factor=float(rope_scaling.get("factor", 1.0)),
            )
        raise ValueError(f"unsupported rope scaling type: {stype}")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Target-model architecture config.

    One config class covers all four reference backends
    (modeling_{llama,qwen2,qwen3,mixtral}_kv.py) via feature flags instead of
    forked modeling files.
    """

    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    rms_eps: float = 1e-5
    rope: RopeConfig = dataclasses.field(default_factory=RopeConfig)
    max_position_embeddings: int = 4096

    # qwen2: bias on q/k/v projections (modeling_qwen2_kv.py qkv bias)
    attn_qkv_bias: bool = False
    # qwen3: per-head RMSNorm on q and k (modeling_qwen3_kv.py:249-250)
    qk_norm: bool = False
    # tie lm_head to embedding
    tie_embeddings: bool = False
    # mixtral MoE (modeling_mixtral_kv.py:449-517). 0 experts = dense MLP.
    num_experts: int = 0
    experts_per_token: int = 0
    # "dense" runs every expert on every token (weight-bound-optimal decode);
    # "capacity" does GShard-style ragged dispatch (compute-bound prefill /
    # training; may drop overflow tokens — size with moe_capacity_factor)
    moe_impl: str = "dense"
    moe_capacity_factor: float = 2.0
    # qwen2-style sliding-window attention: window size + per-layer flags
    # (True = sliding layer). None/empty → full attention everywhere.
    sliding_window: Optional[int] = None
    sliding_layer_flags: Optional[Tuple[bool, ...]] = None

    # activations dtype; params dtype chosen at load time
    dtype: Any = jnp.bfloat16
    # attention implementation for tree verification:
    #   "xla"          — dense-mask attention (default, portable)
    #   "pallas_tree"  — fused flash-style Pallas kernel (ops/pallas_attn.py);
    #                    interpreted automatically off-TPU
    attn_impl: str = "xla"

    @property
    def q_dim(self) -> int:
        return self.num_q_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def tap_layers(self) -> Tuple[int, int, int]:
        """EAGLE-3 feature-tap layers: hidden-state *inputs* of layers
        {2, L//2, L-3} (modeling_llama_kv.py:1137-1139)."""
        return (2, self.num_layers // 2, self.num_layers - 3)

    @staticmethod
    def from_hf_dict(d: dict, dtype=jnp.bfloat16) -> "ModelConfig":
        arch = (d.get("architectures") or [""])[0] + "/" + d.get("model_type", "llama")
        num_q = d["num_attention_heads"]
        head_dim = d.get("head_dim") or d["hidden_size"] // num_q
        arch_l = arch.lower()
        is_qwen2 = "qwen2" in arch_l
        is_qwen3 = "qwen3" in arch_l
        is_mixtral = "mixtral" in arch_l
        # sliding-window parsing (qwen2/qwen3 style): explicit layer_types,
        # or max_window_layers (layers >= mwl are full attention)
        sw = None
        sw_flags = None
        L = d["num_hidden_layers"]
        if d.get("use_sliding_window") and d.get("sliding_window"):
            sw = int(d["sliding_window"])
            if d.get("layer_types"):
                sw_flags = tuple(t == "sliding_attention"
                                 for t in d["layer_types"])
            else:
                mwl = int(d.get("max_window_layers", L))
                sw_flags = tuple(i < mwl for i in range(L))
            if not any(sw_flags):
                sw = None
                sw_flags = None
        return ModelConfig(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_q_heads=num_q,
            num_kv_heads=d.get("num_key_value_heads", num_q),
            head_dim=head_dim,
            rms_eps=d.get("rms_norm_eps", 1e-5),
            rope=RopeConfig.from_hf(d.get("rope_theta", 10000.0), d.get("rope_scaling")),
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            attn_qkv_bias=is_qwen2,
            qk_norm=is_qwen3,
            tie_embeddings=d.get("tie_word_embeddings", False),
            num_experts=d.get("num_local_experts", 0) if is_mixtral else 0,
            experts_per_token=d.get("num_experts_per_tok", 0) if is_mixtral else 0,
            sliding_window=sw,
            sliding_layer_flags=sw_flags,
            dtype=dtype,
        )

    @staticmethod
    def from_hf_json(path: str, dtype=jnp.bfloat16) -> "ModelConfig":
        with open(os.path.join(path, "config.json") if os.path.isdir(path) else path) as f:
            return ModelConfig.from_hf_dict(json.load(f), dtype=dtype)


@dataclasses.dataclass(frozen=True)
class DraftConfig:
    """Draft-head ("cnet") architecture config.

    version=1 → EAGLE-1/2 head (cnets1.py): fc(2h→h) feature fusion before
    the decoder layer; drafting scores use the *target's* lm_head.
    version=3 → EAGLE-3 head (cnets.py): fc(3h→h) fusion of the three tapped
    features, decoder layer whose QKV projects from concat(norm(emb),
    norm(hidden)) (2h inputs, cnets.py:209-211), its own reduced-vocab
    lm_head with d2t/t2d vocab maps.
    """

    version: int
    hidden_size: int
    intermediate_size: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    vocab_size: int
    draft_vocab_size: int = 0  # 0 → same as vocab_size (no d2t/t2d)
    # EAGLE-3 checkpoints may fuse from a different target width
    target_hidden_size: int = 0  # 0 → same as hidden_size
    num_layers: int = 1  # cnets1 supports N layers; shipped configs use 1
    rms_eps: float = 1e-5
    rope: RopeConfig = dataclasses.field(default_factory=RopeConfig)
    max_position_embeddings: int = 4096
    attn_qkv_bias: bool = False  # qwen2-style draft heads
    dtype: Any = jnp.bfloat16

    @property
    def q_dim(self) -> int:
        return self.num_q_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def effective_draft_vocab(self) -> int:
        return self.draft_vocab_size or self.vocab_size

    @property
    def fuse_in_dim(self) -> int:
        """Input width of the feature-fusion fc."""
        t = self.target_hidden_size or self.hidden_size
        return (3 * t) if self.version == 3 else (2 * self.hidden_size)

    @staticmethod
    def from_hf_dict(d: dict, version: Optional[int] = None, dtype=jnp.bfloat16) -> "DraftConfig":
        if version is None:
            # EAGLE-3 configs carry draft_vocab_size (traineagle3/config.json:22-23)
            version = 3 if "draft_vocab_size" in d else 1
        num_q = d["num_attention_heads"]
        head_dim = d.get("head_dim") or d["hidden_size"] // num_q
        return DraftConfig(
            version=version,
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_q_heads=num_q,
            num_kv_heads=d.get("num_key_value_heads", num_q),
            head_dim=head_dim,
            vocab_size=d["vocab_size"],
            draft_vocab_size=d.get("draft_vocab_size", 0),
            target_hidden_size=d.get("target_hidden_size", 0),
            num_layers=d.get("num_hidden_layers", 1),
            rms_eps=d.get("rms_norm_eps", 1e-5),
            rope=RopeConfig.from_hf(d.get("rope_theta", 10000.0), d.get("rope_scaling")),
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            attn_qkv_bias=bool(d.get("attention_bias", False) or d.get("bias", False)),
            dtype=dtype,
        )

    @staticmethod
    def from_hf_json(path: str, version: Optional[int] = None, dtype=jnp.bfloat16) -> "DraftConfig":
        with open(os.path.join(path, "config.json") if os.path.isdir(path) else path) as f:
            return DraftConfig.from_hf_dict(json.load(f), version=version, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Speculation-engine operating point.

    Mirrors the reference defaults: total_tokens=60, depth, top_k=10
    (ea_model.py:94-97). All fields are static — they fix the compiled
    shapes of the per-round program.
    """

    total_tokens: int = 60   # tree nodes excluding root
    depth: int = 5           # draft expansion steps
    top_k: int = 10          # beam width / children per node
    max_len: int = 2048      # preallocated KV slots
    # acceptance rule under temperature>0 (all are lossless — validated by
    # the Monte-Carlo harnesses, tests/test_losslessness_mc.py +
    # test_engine_fake_backend_mc.py):
    #   "q1"     — deterministic top-k candidates + the q(x)=1 multi-round
    #              rejection rule everywhere, which is exactly correct for
    #              deterministic candidates (utils.py:398-399 — not a
    #              simplification in that regime);
    #   "true_q" — additionally switches STATIC trees to sampled-without-
    #              replacement candidates + true-q(x) rejection
    #              (modeling_eagle.py:842-860, 1352-1459 semantics);
    #   "true_q_dynamic" — true_q everywhere, including EAGLE-2/3 DYNAMIC
    #              trees, via two-pass drafting (engine/drafter.py
    #              draft_round sampled mode): the deterministic beam fixes
    #              the tree SHAPE (context-measurable — the condition the
    #              true-q conditional law needs; adaptive pruning of
    #              sampled candidates would bias it), then the shape is
    #              re-expanded with Gumbel without-replacement draws.
    #              Costs ~one extra draft pass per round; higher acceptance
    #              when the draft models the target's sampling distribution
    #              well. Greedy (temperature=0) paths are unaffected.
    acceptance: str = "true_q"
    # draft-head weight quantization: "none" | "int8" (ops/quant.py) |
    # "int4" (group-128 packed nibbles + Pallas matmul kernel,
    # ops/quant4.py). The draft only proposes; quantizing it can lower τ
    # but never changes the output distribution.
    draft_quant: str = "none"
    # int4 scale-group size along K for the DRAFT head quantization
    # (ops/quant4.pack_w4). 128 is the GPTQ/AWQ-standard granularity; 512
    # trades scale resolution for fewer per-group passes in the w4a8
    # kernel. Lossless either way (the draft only proposes).
    draft_quant_group: int = 128
    # target KV-cache storage: "none" (model dtype) | "int8" (per-row absmax
    # int8 + fp32 scale side arrays, ops/kv_cache.py). Halves decode-round
    # KV streaming and doubles paged-pool capacity; a serving operating
    # point — greedy spec output stays bit-identical to generate_vanilla
    # *within* the int8-KV point (both paths share quantize-on-write +
    # scale-folded reads). The draft KV stays bf16 (it is ~1 layer).
    kv_quant: str = "none"
    # accepted-branch KV compaction:
    #   "xla"    — gather + dynamic_update_slice (ops/kv_cache.py)
    #   "pallas" — in-place DMA kernel (ops/pallas_attn.py:compact_rows),
    #              B=1 rounds only; needs head_dim % 128 == 0 on real TPU
    #              (Mosaic lane alignment) — falls back to XLA otherwise.
    compact_impl: str = "xla"
    temperature: float = 0.0
    top_p: float = 0.0
    sampling_top_k: int = 0
    # length-bucketed decode attention: ascending KV-row bucket sizes (the
    # full cache size is appended automatically). Each fused decode round /
    # vanilla step only reads the smallest bucket that holds the committed
    # context plus one round's tree+commit window — attention HBM traffic
    # scales with the live context instead of the preallocated max_len.
    # Both paths use the same bucket formula, preserving greedy
    # bit-exactness. None → always read the full cache.
    kv_buckets: Optional[Tuple[int, ...]] = None
    # EAGLE-1 static topology: a choices-style tuple of child-rank paths
    # (eagle/model/choices.py mc_sim_7b_63). None → dynamic EAGLE-2/3 trees.
    tree_paths: Optional[Tuple[Tuple[int, ...], ...]] = None
    # fuse the draft head's q/k/v (and gate/up) projections into single
    # concatenated matmuls at engine init (models/draft.fuse_projections).
    # One weight stream + one kernel dispatch instead of three per beam
    # step; bitwise-identical for quantized drafts (per-output-column
    # scales), numerically identical for bf16. Off switch for A/B only.
    fuse_draft: bool = True
    # fuse the beam loop's draft scoring (lm_head matmul + log_softmax +
    # top-k) into one Pallas call (ops/score_topk.py) — quantized draft
    # heads on TPU; candidate ids bit-identical to the XLA path, scores
    # within ~1 ulp (block-sequential logsumexp); greedy == vanilla
    # unaffected. Default OFF by measurement: the kernel's online
    # top-k/logsumexp passes serialize against the matmul pipeline and
    # cost MORE than the ~15 XLA dispatches they replace (A/B at 4B scale,
    # tools/probe_fused_scoring.py: +0.2 ms/round for int8 AND int4
    # drafts, even with guarded merges + f32-tile row slicing). Kept as an
    # A/B-able experiment; the beam loop is DMA/latency-bound, not
    # dispatch-bound, on this stack.
    fuse_scoring: bool = False

    @property
    def tree_size(self) -> int:
        if self.tree_paths is not None:
            return len(self.tree_paths) + 1  # paths + root
        return self.total_tokens + 1  # + root
