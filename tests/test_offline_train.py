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
