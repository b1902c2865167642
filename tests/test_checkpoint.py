"""Checkpoint round-trips: orbax train-state save/resume and the
safetensors draft export → hf_loader re-import (reference cnets naming)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models.hf_loader import convert_draft, load_state_dict
from eagle_tpu.train import checkpoint as ckpt
from eagle_tpu.train import ttt

from test_engine_greedy import tiny_dcfg


@pytest.mark.parametrize("version", [1, 3])
def test_safetensors_export_roundtrip(tmp_path, version):
    dcfg = tiny_dcfg(version)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(0),
                                    dtype=jnp.float32)
    path = str(tmp_path / "model.safetensors")
    ckpt.export_draft_safetensors(dparams, version, path, include_embed=True)

    sd = load_state_dict(path)
    re_params = convert_draft(sd, dcfg, dtype=jnp.float32)

    flat1 = jax.tree.leaves(dparams)
    flat2 = jax.tree.leaves(re_params)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-6)


def test_orbax_train_state_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    dcfg = tiny_dcfg(3)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1),
                                    dtype=jnp.float32)
    tcfg = ttt.TrainConfig()
    opt = ttt.make_optimizer(tcfg)
    trainable, _ = ttt.partition_trainable(dparams)
    opt_state = opt.init(trainable)

    d = str(tmp_path / "ckpts")
    ckpt.save_train_state(d, 3, dparams, opt_state)
    ckpt.save_train_state(d, 7, dparams, opt_state)
    assert ckpt.find_latest_state(d) == 7

    restored = ckpt.restore_train_state(
        d, like={"dparams": dparams, "opt_state": opt_state, "step": 0,
                 "metadata": {}})
    assert restored["step"] == 7
    for a, b in zip(jax.tree.leaves(restored["dparams"]),
                    jax.tree.leaves(dparams)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_from_pretrained_roundtrip(tmp_path):
    """Export tiny target+draft checkpoints to disk, then boot an engine via
    EagleEngine.from_pretrained and generate (full load path)."""
    import json
    from safetensors.numpy import save_file

    import jax
    import jax.numpy as jnp

    from eagle_tpu.engine.engine import EagleEngine
    from eagle_tpu.models import transformer
    from test_engine_greedy import tiny_cfg, PROMPT

    cfg = tiny_cfg()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)

    # write target checkpoint in HF naming
    base = tmp_path / "target"
    base.mkdir()
    sd = {}

    def put(name, x, transpose=False):
        a = np.asarray(x, np.float32)
        sd[name] = a.T.copy() if transpose and a.ndim == 2 else a

    put("model.embed_tokens.weight", params["embed"]["w"])
    put("model.norm.weight", params["final_norm"])
    put("lm_head.weight", params["lm_head"], transpose=True)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        L = params["layers"]
        put(p + "input_layernorm.weight", L["ln1"][i])
        put(p + "post_attention_layernorm.weight", L["ln2"][i])
        put(p + "self_attn.q_proj.weight", L["wq"][i], transpose=True)
        put(p + "self_attn.k_proj.weight", L["wk"][i], transpose=True)
        put(p + "self_attn.v_proj.weight", L["wv"][i], transpose=True)
        put(p + "self_attn.o_proj.weight", L["wo"][i], transpose=True)
        put(p + "mlp.gate_proj.weight", L["w_gate"][i], transpose=True)
        put(p + "mlp.up_proj.weight", L["w_up"][i], transpose=True)
        put(p + "mlp.down_proj.weight", L["w_down"][i], transpose=True)
    save_file(sd, str(base / "model.safetensors"))
    with open(base / "config.json", "w") as f:
        json.dump({
            "architectures": ["LlamaForCausalLM"], "model_type": "llama",
            "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_q_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "head_dim": cfg.head_dim, "rms_norm_eps": cfg.rms_eps,
            "rope_theta": 10000.0, "max_position_embeddings": 128,
            "tie_word_embeddings": False,
        }, f)

    # draft checkpoint (v1, cnets1 naming) via the exporter
    dcfg = tiny_dcfg(1)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1),
                                    dtype=jnp.float32)
    draft_dir = tmp_path / "draft"
    draft_dir.mkdir()
    ckpt.export_draft_safetensors(dparams, 1,
                                  str(draft_dir / "model.safetensors"))
    with open(draft_dir / "config.json", "w") as f:
        json.dump({
            "vocab_size": dcfg.vocab_size, "hidden_size": dcfg.hidden_size,
            "intermediate_size": dcfg.intermediate_size,
            "num_hidden_layers": 1,
            "num_attention_heads": dcfg.num_q_heads,
            "num_key_value_heads": dcfg.num_kv_heads,
            "head_dim": dcfg.head_dim, "rms_norm_eps": dcfg.rms_eps,
        }, f)

    eng = EagleEngine.from_pretrained(str(base), str(draft_dir),
                                      total_tokens=15, depth=3, top_k=4,
                                      max_len=256, dtype=jnp.float32)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=20)
    out = eng.generate(PROMPT, max_new_tokens=20)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])


@pytest.mark.parametrize("tq", ["int8", "int4"])
def test_from_pretrained_quantized(tmp_path, tq):
    """from_pretrained(target_quant=..., draft_quant=...) quantizes on
    load; greedy == the quantized engine's own vanilla decode. Target
    checkpoint written by train.checkpoint.export_target_safetensors (the
    round-trip the exporter advertises)."""
    import json

    import jax
    import jax.numpy as jnp

    from eagle_tpu.engine.engine import EagleEngine
    from eagle_tpu.models import transformer
    from test_engine_greedy import tiny_cfg, PROMPT

    cfg = tiny_cfg()
    params = transformer.init_params(cfg, jax.random.PRNGKey(3),
                                     dtype=jnp.float32)
    base = tmp_path / "target"
    ckpt.export_target_safetensors(params, cfg, str(base))

    dcfg = tiny_dcfg(1)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(4),
                                    dtype=jnp.float32)
    draft_dir = tmp_path / "draft"
    draft_dir.mkdir()
    ckpt.export_draft_safetensors(dparams, 1,
                                  str(draft_dir / "model.safetensors"))
    with open(draft_dir / "config.json", "w") as f:
        json.dump({
            "vocab_size": dcfg.vocab_size, "hidden_size": dcfg.hidden_size,
            "intermediate_size": dcfg.intermediate_size,
            "num_hidden_layers": 1,
            "num_attention_heads": dcfg.num_q_heads,
            "num_key_value_heads": dcfg.num_kv_heads,
            "head_dim": dcfg.head_dim, "rms_norm_eps": dcfg.rms_eps,
        }, f)

    eng = EagleEngine.from_pretrained(str(base), str(draft_dir),
                                      total_tokens=15, depth=3, top_k=4,
                                      max_len=256, dtype=jnp.float32,
                                      target_quant=tq, draft_quant="int8",
                                      kv_quant="int8",
                                      quant_group=16 if tq == "int4"
                                      else 128)
    assert isinstance(eng.params["lm_head"], dict)
    assert eng.ecfg.kv_quant == "int8"
    assert eng.init_target_cache().k.dtype == jnp.int8
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=20)
    out = eng.generate(PROMPT, max_new_tokens=20)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
