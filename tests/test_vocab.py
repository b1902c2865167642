"""Draft-vocab scandata: top-k selection, d2t/t2d invariants, and end-to-end
use in a reduced-vocab TTT training step."""

import numpy as np

import jax
import jax.numpy as jnp

from eagle_tpu.train import vocab


def test_build_draft_vocab_invariants():
    counts = np.array([5, 0, 9, 1, 7, 7, 0, 3], np.int64)
    d2t, t2d = vocab.build_draft_vocab(counts, 4)
    keep = d2t + np.arange(4)
    # top-4 by count: tokens 2(9), 4(7), 5(7), 0(5) → sorted {0,2,4,5}
    np.testing.assert_array_equal(keep, [0, 2, 4, 5])
    assert t2d.sum() == 4
    assert t2d[[0, 2, 4, 5]].all()
    # round trip: draft id r maps to target keep[r]
    for r, t in enumerate(keep):
        assert r + d2t[r] == t


def test_count_tokens_respects_loss_mask():
    batches = [{
        "input_ids": np.array([[1, 2, 3], [2, 2, 4]]),
        "loss_mask": np.array([[1, 1, 0], [1, 0, 1]], np.float32),
    }]
    c = vocab.count_tokens(batches, 8)
    np.testing.assert_array_equal(c, [0, 1, 2, 0, 1, 0, 0, 0])


def test_reduced_vocab_ttt_step_runs():
    from eagle_tpu.models import draft as draft_mod
    from eagle_tpu.models import transformer
    from eagle_tpu.train import ttt
    from test_engine_greedy import tiny_cfg, tiny_dcfg

    cfg = tiny_cfg()
    dcfg = tiny_dcfg(3, draft_vocab=64)
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    data = rng.integers(0, cfg.vocab_size, size=(2, 16)).astype(np.int32)
    batch = {"input_ids": jnp.asarray(data),
             "loss_mask": jnp.ones(data.shape, jnp.float32),
             "pad_mask": jnp.ones(data.shape, bool)}
    d2t, t2d = vocab.scan_dataset([batch], cfg.vocab_size, 64)
    dparams["d2t"] = jnp.asarray(d2t, jnp.int32)
    dparams["t2d"] = jnp.asarray(t2d)

    tcfg = ttt.TrainConfig(length=2)
    opt = ttt.make_optimizer(tcfg)
    trainable, _ = ttt.partition_trainable(dparams)
    opt_state = opt.init(trainable)
    dparams2, _, m = jax.jit(lambda dp, os_, b: ttt.train_step(
        dp, os_, params, cfg, dcfg, tcfg, opt, b))(dparams, opt_state, batch)
    assert np.isfinite(float(m.loss))
    np.testing.assert_array_equal(np.asarray(dparams2["d2t"]), d2t)
