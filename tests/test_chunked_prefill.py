"""Chunked prefill: long prompts prefill one fixed-size chunk per scheduler
step (vLLM-style), so running decode rounds never stall for more than one
chunk forward — while outputs stay bit-identical to unchunked admission
(chunked prefill is repeated incremental prefill, the engine/session.py
`_extend` contract)."""

import numpy as np
import pytest

import jax

from eagle_tpu.engine.paged import PagedEagleServer

from test_engine_greedy import make_engine

rng = np.random.default_rng(7)
LONG_A = rng.integers(1, 128, size=90).astype(np.int32)    # 2 chunks + tail
LONG_B = rng.integers(1, 128, size=129).astype(np.int32)   # crosses a bucket
SHORT = np.array([5, 17, 92, 3], np.int32)


def test_chunked_bit_exact_vs_single():
    """Chunked admission reproduces single-request greedy output exactly,
    for both a chunk-aligned-ish and a bucket-crossing prompt length."""
    eng = make_engine(1)
    budgets = [20, 16]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip([LONG_A, LONG_B], budgets)]
    srv = PagedEagleServer(eng, max_batch=2, page_size=16, prefill_chunk=32)
    rids = [srv.submit(p, b) for p, b in zip([LONG_A, LONG_B], budgets)]
    outs = srv.run()
    assert srv.chunked_prefills == 2
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_chunked_mixed_with_short_prompts():
    """Short prompts below the chunk size take the one-shot path; mixing
    both in one batch changes nothing."""
    eng = make_engine(3)
    prompts = [SHORT, LONG_A, SHORT + 1]
    budgets = [18, 14, 11]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(prompts, budgets)]
    srv = PagedEagleServer(eng, max_batch=2, page_size=16, prefill_chunk=32)
    rids = [srv.submit(p, b) for p, b in zip(prompts, budgets)]
    outs = srv.run()
    assert srv.chunked_prefills == 1
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_chunked_overlaps_running_decode():
    """A long prompt joining a busy batch chunks in the background: the
    already-running request keeps emitting tokens on the very steps the
    join is still prefilling (the head-of-line-blocking fix)."""
    eng = make_engine(1)
    ref_short = eng.generate(SHORT, max_new_tokens=40)
    ref_long = eng.generate(LONG_B, max_new_tokens=12)
    srv = PagedEagleServer(eng, max_batch=1, page_size=16, prefill_chunk=32)
    r0 = srv.submit(SHORT, 40)
    srv.step()  # admits r0
    r1 = srv.submit(LONG_B, 12)
    emitted_during_chunking = 0
    saw_job = False
    while srv._job is not None or not saw_job:
        out = srv.step()
        if srv._job is not None:
            saw_job = True
            emitted_during_chunking += len(out.get(r0, ()))
        if srv._idle():
            break
    assert saw_job
    # the single slot is busy with r0 the whole time LONG_B chunks, and r0
    # keeps emitting on those steps
    assert emitted_during_chunking > 0
    outs = srv.run()
    np.testing.assert_array_equal(outs[r0], ref_short)
    np.testing.assert_array_equal(outs[r1], ref_long)


def test_chunked_sampled_matches_unchunked():
    """The final chunk replays _prefill's PRNG stream (split 3), so sampled
    outputs are bit-identical to unchunked admission at the same seed."""
    eng = make_engine(1, temperature=0.8)
    srv_a = PagedEagleServer(eng, max_batch=1, page_size=16)
    ra = srv_a.submit(LONG_A, 15, seed=11)
    ref = srv_a.run()[ra]
    srv_b = PagedEagleServer(eng, max_batch=1, page_size=16,
                             prefill_chunk=32)
    rb = srv_b.submit(LONG_A, 15, seed=11)
    got = srv_b.run()[rb]
    assert srv_b.chunked_prefills == 1
    np.testing.assert_array_equal(got, ref)


def test_chunked_prefix_cache_preempts_chunking():
    """A prompt whose prefix is cached adopts the cached pages instead of
    chunking (adoption is cheaper than even one chunk forward)."""
    eng = make_engine(1)
    srv = PagedEagleServer(eng, max_batch=1, page_size=16, prefill_chunk=32)
    r0 = srv.submit(LONG_B, 10)
    srv.run()
    assert srv.chunked_prefills == 1
    # same prompt again: served from the prefix store, not chunked
    r1 = srv.submit(LONG_B, 10)
    outs = srv.run()
    assert srv.chunked_prefills == 1
    assert srv.store.hits == 1
    np.testing.assert_array_equal(outs[r1], srv.finished[r0])


def test_chunked_job_cancelled_under_pool_pressure():
    """When a running request's growth and an in-flight chunk job compete
    for the last pages, the job is cancelled (running requests outrank
    waiting prefills) and its request restarts chunking later — output
    still bit-exact (chunked prefill replays the same PRNG stream)."""
    eng = make_engine(1)
    ref_short = eng.generate(SHORT, max_new_tokens=130)
    ref_long = eng.generate(LONG_B, max_new_tokens=12)
    # 16 usable pages: r0's bucket takes 8, the job needs up to 16 —
    # r0's growth past 128 rows forces the cancellation path
    srv = PagedEagleServer(eng, max_batch=1, page_size=16,
                           prefill_chunk=32, num_pages=17,
                           prefix_cache=False)
    r0 = srv.submit(SHORT, 130)
    srv.step()  # admits r0
    r1 = srv.submit(LONG_B, 12)
    outs = srv.run()
    assert srv.cancelled_prefills >= 1
    assert srv.preemptions == 0  # job cancel spared the running request
    np.testing.assert_array_equal(outs[r0], ref_short)
    np.testing.assert_array_equal(outs[r1], ref_long)


def test_chunk_must_be_page_multiple():
    eng = make_engine(1)
    with pytest.raises(ValueError, match="prefill_chunk"):
        PagedEagleServer(eng, max_batch=1, page_size=16, prefill_chunk=24)
