"""Multi-turn KV reuse: EagleSession's incremental prefill must be
invisible in the output — greedy turns are bit-identical to a from-scratch
`generate` over the same full context (which is itself bit-identical to
vanilla decoding), across engine versions, rewinds (budget trimming,
edited histories) and reduced draft vocab."""

import numpy as np
import pytest

from eagle_tpu.engine.session import EagleSession, _common_prefix

from test_engine_greedy import make_engine

P1 = np.array([5, 17, 92, 3, 44, 8, 21], np.int32)
TURN2 = np.array([9, 4, 30, 2], np.int32)
TURN3 = np.array([61, 7], np.int32)


def test_common_prefix():
    a = np.array([1, 2, 3, 4], np.int32)
    assert _common_prefix(a, a) == 4
    assert _common_prefix(a, np.array([1, 2, 9, 4], np.int32)) == 2
    assert _common_prefix(a, np.zeros((0,), np.int32)) == 0
    assert _common_prefix(a, np.array([1, 2], np.int32)) == 2


@pytest.mark.parametrize("version", [1, 3])
def test_session_multiturn_bit_exact(version):
    """Three chat turns through one session == three from-scratch
    generations over the growing context. max_new_tokens=11 forces host
    trimming mid-path (device commits past the budget), so turns 2/3 also
    exercise the rewind (start < state.length)."""
    eng = make_engine(version)
    sess = EagleSession(eng)

    out1, st1 = sess.send(P1, max_new_tokens=11, log=True)
    assert st1["reused_prefix"] == 0
    np.testing.assert_array_equal(out1, eng.generate(P1, max_new_tokens=11))

    p2 = np.concatenate([out1, TURN2])
    out2, st2 = sess.send(p2, max_new_tokens=11, log=True)
    assert st2["reused_prefix"] == len(out1) - 1
    np.testing.assert_array_equal(out2, eng.generate(p2, max_new_tokens=11))

    p3 = np.concatenate([out2, TURN3])
    out3, st3 = sess.send(p3, max_new_tokens=11, log=True)
    assert st3["reused_prefix"] == len(out2) - 1
    np.testing.assert_array_equal(out3, eng.generate(p3, max_new_tokens=11))


def test_session_reduced_draft_vocab():
    eng = make_engine(3, draft_vocab=64)
    sess = EagleSession(eng)
    out1 = sess.send(P1, max_new_tokens=10)
    p2 = np.concatenate([out1, TURN2])
    out2 = sess.send(p2, max_new_tokens=10)
    np.testing.assert_array_equal(out2, eng.generate(p2, max_new_tokens=10))


def test_session_edited_history_rewinds():
    """Editing a token mid-context shrinks the reusable prefix; the session
    must rewind to the true common prefix and still match from-scratch."""
    eng = make_engine(1)
    sess = EagleSession(eng)
    out1 = sess.send(P1, max_new_tokens=10)
    edited = np.concatenate([out1, TURN2])
    edited[3] = 77  # diverge inside the committed context
    out2, st = sess.send(edited, max_new_tokens=10, log=True)
    assert st["reused_prefix"] == 2  # common prefix 3 -> resume row 2
    np.testing.assert_array_equal(out2,
                                  eng.generate(edited, max_new_tokens=10))


def test_session_fresh_context_full_prefill():
    """A prompt sharing nothing with the stored context falls back to a
    full prefill (reused_prefix == 0) and still matches from-scratch."""
    eng = make_engine(1)
    sess = EagleSession(eng)
    sess.send(P1, max_new_tokens=8)
    other = np.array([50, 51, 52, 53, 54], np.int32)
    out, st = sess.send(other, max_new_tokens=8, log=True)
    assert st["reused_prefix"] == 0
    np.testing.assert_array_equal(out, eng.generate(other, max_new_tokens=8))


def test_session_sampled_turns_run():
    """Sampled engines: turns run end-to-end and commit past the context
    (losslessness of the acceptance rule is covered by the MC tests; a
    resumed turn is a fresh draw conditioned on committed text)."""
    eng = make_engine(1, temperature=1.0)
    sess = EagleSession(eng, seed=3)
    out1 = sess.send(P1, max_new_tokens=9, temperature=0.8)
    assert len(out1) > len(P1)
    p2 = np.concatenate([out1, TURN2])
    out2, st = sess.send(p2, max_new_tokens=9, log=True, temperature=0.8)
    assert st["reused_prefix"] == len(out1) - 1
    assert len(out2) > len(p2)
    np.testing.assert_array_equal(out2[: len(p2)], p2)


def test_session_streaming_matches_send():
    eng = make_engine(1)
    s1, s2 = EagleSession(eng), EagleSession(eng)
    ref = s1.send(P1, max_new_tokens=10)
    last = None
    for all_ids, st in s2.stream(P1, max_new_tokens=10):
        last = all_ids
    np.testing.assert_array_equal(last, ref)


def test_session_context_too_long_raises():
    eng = make_engine(1)
    sess = EagleSession(eng)
    with pytest.raises(ValueError, match="max_len"):
        sess.send(np.arange(eng.ecfg.max_len, dtype=np.int32) % 100)
