"""EAGLE-1 offline trainer: feature dump → dataset → training improves
top-1 head agreement; getkacc runs."""

import numpy as np

import jax
import jax.numpy as jnp

from eagle_tpu.train import offline

from test_engine_greedy import tiny_cfg, tiny_dcfg
from eagle_tpu.models import draft as draft_mod
from eagle_tpu.models import transformer


def test_dump_and_train(tmp_path):
    cfg = tiny_cfg()
    dcfg = tiny_dcfg(1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = transformer.init_params(cfg, k1)
    params["lm_head"] = params["lm_head"] * 8.0
    dparams = draft_mod.init_params(dcfg, k2)
    dparams["embed"]["w"] = params["embed"]["w"]

    rng = np.random.default_rng(0)
    seqs = [{"input_ids": rng.integers(0, cfg.vocab_size, size=(24,)),
             "loss_mask": np.ones(24)} for _ in range(3)]
    n = offline.dump_features(params, cfg, seqs, str(tmp_path), batch_pad=8)
    assert n == 3

    batches = list(offline.load_feature_dataset(str(tmp_path)))
    assert len(batches) == 3
    b = batches[0]
    assert b["feats"].shape == (1, 24, cfg.hidden_size)
    # shifted pairing: input_ids[t] == original token t+1
    np.testing.assert_array_equal(
        np.asarray(b["input_ids"][0, :-1]), seqs[0]["input_ids"][1:])

    ocfg = offline.OfflineTrainConfig(lr=3e-3, warmup_steps=5,
                                      total_steps=1000, noise="uniform")
    opt = offline.make_optimizer(ocfg)
    trainable, _ = offline.partition_trainable(dparams)
    opt_state = opt.init(trainable)
    head_w = params["lm_head"]
    step = jax.jit(lambda dp, os_, b, k: offline.train_step(
        dp, os_, head_w, dcfg, ocfg, opt, b, k))

    key = jax.random.PRNGKey(1)
    first_m = last_m = None
    for epoch in range(40):
        for b in batches:
            key, k = jax.random.split(key)
            dparams, opt_state, m = step(dparams, opt_state, b, k)
            if first_m is None:
                first_m = m
            last_m = m
    assert float(last_m.loss) < float(first_m.loss)
    assert float(last_m.top1) > float(first_m.top1) + 0.2, (
        f"top1 {float(first_m.top1):.3f} -> {float(last_m.top1):.3f}")

    accs = offline.getkacc(dparams, dcfg, head_w, batches[0], k=3)
    assert accs.shape == (3,)
    assert np.isfinite(accs).all()


def test_batched_loader(tmp_path):
    """load_feature_dataset_batched: fixed shapes, padded tail has zero loss
    mask, shifted pairing preserved."""
    cfg = tiny_cfg()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    lens = [24, 17, 31]
    seqs = [{"input_ids": rng.integers(0, cfg.vocab_size, size=(L,)),
             "loss_mask": np.ones(L)} for L in lens]
    offline.dump_features(params, cfg, seqs, str(tmp_path), batch_pad=8)

    batches = list(offline.load_feature_dataset_batched(str(tmp_path), 2))
    assert len(batches) == 2
    b0, b1 = batches
    assert b0["input_ids"].shape == b1["input_ids"].shape == (2, 128)
    # second batch holds one real sample + one repeat with zeroed loss mask
    assert float(jnp.sum(b1["loss_mask"][1])) == 0.0
    assert float(jnp.sum(b1["loss_mask"][0])) > 0.0
    # shifted pairing on the first row
    np.testing.assert_array_equal(
        np.asarray(b0["input_ids"][0, : lens[0] - 1]),
        seqs[0]["input_ids"][1:])
    # training step runs on the batched shape
    dcfg = tiny_dcfg(1)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(2))
    dparams["embed"]["w"] = params["embed"]["w"]
    ocfg = offline.OfflineTrainConfig(lr=1e-3, warmup_steps=2,
                                      total_steps=100, noise="none")
    opt = offline.make_optimizer(ocfg)
    trainable, _ = offline.partition_trainable(dparams)
    opt_state = opt.init(trainable)
    _, _, m = offline.train_step(dparams, opt_state, params["lm_head"],
                                 dcfg, ocfg, opt, b0, jax.random.PRNGKey(3))
    assert np.isfinite(float(m.loss))


def test_cli_offline_end_to_end(tmp_path):
    """The runnable offline trainer: tiny HF checkpoint on disk → dumped
    shards → `cli_offline train` main() → checkpoint + metrics written."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_dir = tmp_path / "target"
    LlamaForCausalLM(LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )).save_pretrained(str(hf_dir))

    from eagle_tpu.models.hf_loader import load_target
    params, cfg = load_target(str(hf_dir), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats"
    seqs = [{"input_ids": rng.integers(0, 128, size=(16,)),
             "loss_mask": np.ones(16)} for _ in range(2)]
    offline.dump_features(params, cfg, seqs, str(feat_dir), batch_pad=8)

    import json
    cfg_json = tmp_path / "draft_config.json"
    cfg_json.write_text(json.dumps({
        "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "num_hidden_layers": 1, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 64,
    }))

    from eagle_tpu.train import cli_offline
    metrics = tmp_path / "metrics.jsonl"
    rc = cli_offline.main([
        "train", "--basepath", str(hf_dir), "--tmpdir", str(feat_dir),
        "--configpath", str(cfg_json), "--cpdir", str(tmp_path / "ckpt"),
        "--bs", "2", "--epochs", "2", "--max-len", "64", "--save-freq", "1",
        "--getkacc-every", "1", "--metrics-file", str(metrics),
    ])
    assert not rc
    assert (tmp_path / "ckpt").exists() and any(
        p.name.startswith("state_") for p in (tmp_path / "ckpt").iterdir())


def test_offline_quant_aware_step(tmp_path):
    """quant_aware='int4' (and int8) offline training steps run: finite
    loss, params move after warmup — the QAT analog of the TTT trainer's
    flag for int8/int4-deployed v1 heads."""
    import pytest

    cfg = tiny_cfg()
    dcfg = tiny_dcfg(1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = transformer.init_params(cfg, k1)
    dparams = draft_mod.init_params(dcfg, k2)
    dparams["embed"]["w"] = params["embed"]["w"]
    rng = np.random.default_rng(0)
    seqs = [{"input_ids": rng.integers(0, cfg.vocab_size, size=(24,)),
             "loss_mask": np.ones(24)}]
    offline.dump_features(params, cfg, seqs, str(tmp_path), batch_pad=8)
    batch = next(iter(offline.load_feature_dataset(str(tmp_path))))

    for qmode in ("int8", "int4"):
        ocfg = offline.OfflineTrainConfig(lr=3e-3, warmup_steps=1,
                                          total_steps=100, noise="none",
                                          quant_aware=qmode)
        opt = offline.make_optimizer(ocfg)
        dp = dparams
        trainable, _ = offline.partition_trainable(dp)
        opt_state = opt.init(trainable)
        key = jax.random.PRNGKey(1)
        for _ in range(2):  # warmup starts at lr=0
            dp, opt_state, m = offline.train_step(
                dp, opt_state, params["lm_head"], dcfg, ocfg, opt,
                batch, key)
        assert np.isfinite(float(m.loss)), qmode
        assert not np.array_equal(np.asarray(dp["fc"]["w"]),
                                  np.asarray(dparams["fc"]["w"])), qmode
