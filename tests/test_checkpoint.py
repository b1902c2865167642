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
