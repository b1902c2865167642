"""EAGLE-1 static-tree drafting: greedy must stay bit-exact vs vanilla for
both the published mc_sim topology and a plain chain."""

import numpy as np
import pytest

from eagle_tpu.config import EngineConfig
from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.ops.tree import CHAIN_5, MC_SIM_7B_63

from test_engine_greedy import PROMPT, make_engine


@pytest.mark.parametrize("paths,version", [
    (MC_SIM_7B_63, 1),
    (MC_SIM_7B_63, 3),
    (CHAIN_5, 1),
])
def test_static_tree_greedy_matches_vanilla(paths, version):
    eng = make_engine(version, tree_paths=paths)
    ref = eng.generate_vanilla(PROMPT, max_new_tokens=32)
    out, ntok, rounds = eng.generate(PROMPT, max_new_tokens=32, log=True)
    np.testing.assert_array_equal(out[: len(ref)], ref[: len(out)])
    assert ntok / rounds >= 1.0


def test_static_tree_sampled_runs():
    eng = make_engine(1, tree_paths=MC_SIM_7B_63, temperature=0.9)
    out = eng.generate(PROMPT, max_new_tokens=16, seed=3)
    assert len(out) == len(PROMPT) + 16


def test_static_tree_true_q_sampled_runs():
    """Sampled-candidate static trees + true-q acceptance end-to-end."""
    eng = make_engine(1, tree_paths=MC_SIM_7B_63, temperature=0.9,
                      acceptance="true_q")
    out, ntok, rounds = eng.generate(PROMPT, max_new_tokens=24, log=True,
                                     seed=11)
    assert ntok == 24
    out2 = eng.generate(PROMPT, max_new_tokens=24, seed=12)
    assert not np.array_equal(out, out2)
