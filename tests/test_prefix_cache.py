"""Automatic prefix caching in the paged server: adopting a finished
request's KV pages must be invisible in the output — greedy results stay
bit-identical to single-request `generate` (== generate_vanilla) — while
measurably skipping prefill work (store hits / reused tokens) and
surviving eviction under pool pressure."""

import numpy as np
import pytest

from eagle_tpu.engine.paged import PagedEagleServer
from eagle_tpu.engine.prefix_cache import PrefixStore

from test_engine_greedy import make_engine

SYS = np.arange(1, 49, dtype=np.int32) % 90 + 1        # 48-token shared stem
REQ_A = np.concatenate([SYS, np.array([7, 3, 9], np.int32)])
REQ_B = np.concatenate([SYS, np.array([11, 5], np.int32)])


def test_store_lookup_insert_evict():
    freed = []
    st = PrefixStore(4, freed.extend, max_entries=2)
    toks = np.arange(16, dtype=np.int32)
    e1 = st.insert(toks[:8], [3, 4], None, "dk1", "dv1")
    assert st.insert(toks[:8], [9, 9], None, "x", "x") is None  # duplicate
    e2 = st.insert(toks[:12], [5], e1, "dk2", "dv2")
    assert e2.parent is e1 and e1.borrowers == 1
    # deepest match wins; diverging token kills the match
    assert st.lookup(toks) == (e2, 12)
    assert st.lookup(toks[:11]) == (e1, 8)
    # page-granular: a prompt sharing only the first page still matches
    assert st.lookup(toks[:7]) == (e1, 4)
    other = toks.copy()
    other[2] = 77
    assert st.lookup(other) is None
    # ...even when it diverges inside the entry's deeper coverage
    mid = toks[:12].copy()
    mid[9] = 77
    assert st.lookup(mid) == (e1, 8)
    # a small request stops after the LRU child: e1 still holds a child
    # borrower when e2 is picked, and freeing e2's one page satisfies it
    assert st.evict(1) == 1
    assert sorted(freed) == [5]
    assert len(st) == 1 and st.lookup(toks[:8]) == (e1, 8)
    # a large request cascades within one pass: freeing e2 dropped e1's
    # borrower hold, so e1 must become evictable in the SAME call —
    # otherwise pool-pressure callers abort with reclaimable pages stranded
    e2b = st.insert(toks[:12], [6], e1, "dk2", "dv2")
    assert e2b.parent is e1 and e1.borrowers == 1
    assert st.evict(10) == 3  # e2b's page AND e1's two, one pass
    assert sorted(freed) == [3, 4, 5, 6]
    assert len(st) == 0


def test_store_boundary_reregistration_after_evict():
    """Evicting a shallow entry must not orphan a deeper live entry's
    interior boundaries — the rows are still cached under the deeper
    entry, so its boundaries are re-registered and stay matchable."""
    freed = []
    st = PrefixStore(4, freed.extend, max_entries=8)
    toks = np.arange(16, dtype=np.int32)
    e1 = st.insert(toks[:8], [1, 2], None, "dk1", "dv1")
    e3 = st.insert(toks, [5, 6, 7, 8], None, "dk3", "dv3")
    # e1 owns boundaries R=4,8; e3 registered only R=12,16
    assert st.lookup(toks[:8]) == (e1, 8)
    assert st.lookup(toks) == (e3, 16)      # e3 now more recently used
    assert st.evict(2) == 2                 # e1 is LRU and borrower-less
    assert sorted(freed) == [1, 2]
    assert st.lookup(toks[:8]) == (e3, 8)   # re-registered to e3
    assert st.lookup(toks[:5]) == (e3, 4)


def test_prefix_adoption_bit_exact():
    """Second request sharing a 48-token stem adopts the first's pages;
    outputs match single-request generation exactly."""
    eng = make_engine(1)
    singles = [eng.generate(p, max_new_tokens=12) for p in (REQ_A, REQ_B)]
    srv = PagedEagleServer(eng, max_batch=2, page_size=16)
    ra = srv.submit(REQ_A, 12)
    srv.run()
    assert len(srv.store) == 1          # finished request donated its pages
    rb = srv.submit(REQ_B, 12)
    outs = srv.run()
    assert srv.store.hits == 1
    assert srv.store.reused_tokens > 0
    np.testing.assert_array_equal(srv.finished[ra], singles[0])
    np.testing.assert_array_equal(outs[rb], singles[1])


def test_prefix_partial_adoption_bit_exact():
    """Page-granular matching: the donor's cached prefix is DEEPER than
    the shared stem (it includes the donor's own continuation + generated
    tokens), so whole-entry matching would miss; the adopter shares only
    the first 3 of the donor's 5 pages and must adopt exactly those,
    bit-exact vs single-request generation."""
    eng = make_engine(1)
    donor = np.concatenate([SYS, (np.arange(20, dtype=np.int32) % 80) + 5])
    adopter = np.concatenate([SYS, np.array([71, 72, 73, 74, 75], np.int32)])
    singles = [eng.generate(p, max_new_tokens=12) for p in (donor, adopter)]
    srv = PagedEagleServer(eng, max_batch=2, page_size=16)
    rd = srv.submit(donor, 12)
    srv.run()
    entries = {id(e): e for e, _ in srv.store._by_hash.values()}
    assert len(entries) == 1
    entry = next(iter(entries.values()))
    assert entry.rows > len(SYS)        # donated depth exceeds the stem
    ra = srv.submit(adopter, 12)
    outs = srv.run()
    assert srv.store.hits == 1
    assert srv.store.reused_tokens == len(SYS) - 1   # 3 pages, boundary row
    np.testing.assert_array_equal(srv.finished[rd], singles[0])
    np.testing.assert_array_equal(outs[ra], singles[1])
    # the adopter's own finish donates a chain entry spliced at 3 pages —
    # a third request extending the adopter's context adopts the chain
    p3 = np.concatenate([srv.finished[ra], np.array([9], np.int32)])
    r3 = srv.submit(p3, 10)
    out3 = srv.run()[r3]
    assert srv.store.hits == 2
    np.testing.assert_array_equal(out3, eng.generate(p3, max_new_tokens=10))


def test_prefix_chain_multiturn_bit_exact():
    """Multi-turn through the server: each turn's prompt extends the last
    turn's full output, adopting ever-deeper cached prefixes (entry
    chains)."""
    eng = make_engine(3)
    srv = PagedEagleServer(eng, max_batch=2, page_size=16)
    r1 = srv.submit(REQ_A, 14)
    out1 = srv.run()[r1]
    p2 = np.concatenate([out1, np.array([2, 8], np.int32)])
    r2 = srv.submit(p2, 14)
    out2 = srv.run()[r2]
    assert srv.store.hits >= 1
    np.testing.assert_array_equal(out2, eng.generate(p2, max_new_tokens=14))
    p3 = np.concatenate([out2, np.array([4], np.int32)])
    r3 = srv.submit(p3, 10)
    out3 = srv.run()[r3]
    assert srv.store.hits >= 2
    np.testing.assert_array_equal(out3, eng.generate(p3, max_new_tokens=10))


def test_prefix_adoption_mixed_batch():
    """Adopters and fresh prompts in the same running batch stay
    bit-exact."""
    eng = make_engine(1)
    fresh = np.array([60, 61, 62, 63, 64], np.int32)
    singles = {0: eng.generate(REQ_A, max_new_tokens=10),
               1: eng.generate(REQ_B, max_new_tokens=10),
               2: eng.generate(fresh, max_new_tokens=10)}
    srv = PagedEagleServer(eng, max_batch=3, page_size=16)
    ra = srv.submit(REQ_A, 10)
    srv.run()
    rb = srv.submit(REQ_B, 10)
    rf = srv.submit(fresh, 10)
    outs = srv.run()
    np.testing.assert_array_equal(srv.finished[ra], singles[0])
    np.testing.assert_array_equal(outs[rb], singles[1])
    np.testing.assert_array_equal(outs[rf], singles[2])


def test_prefix_eviction_under_pool_pressure():
    """A tight pool evicts cached prefixes (instead of failing admission)
    and still serves everything correctly."""
    eng = make_engine(1)
    # pages_per_slot pages per active request; leave barely 1.5 slots' room
    srv = PagedEagleServer(eng, max_batch=2, page_size=16, num_pages=21,
                           prefix_entries=8)
    prompts = [REQ_A, REQ_B,
               np.concatenate([SYS, np.array([17], np.int32)]),
               np.array([91, 92, 93, 94], np.int32)]
    budgets = [10, 12, 9, 11]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(prompts, budgets)]
    rids = [srv.submit(p, b) for p, b in zip(prompts, budgets)]
    outs = srv.run()
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_prefix_cache_off():
    eng = make_engine(1)
    srv = PagedEagleServer(eng, max_batch=2, page_size=16,
                           prefix_cache=False)
    assert srv.store is None
    ra = srv.submit(REQ_A, 10)
    srv.run()
    rb = srv.submit(REQ_B, 10)
    outs = srv.run()
    np.testing.assert_array_equal(outs[rb],
                                  eng.generate(REQ_B, max_new_tokens=10))


def test_prefix_adoption_sampled_mode():
    """Sampled engines: adoption runs end-to-end; prefix tokens are
    preserved verbatim and generation proceeds past the prompt."""
    eng = make_engine(1, temperature=1.0)
    srv = PagedEagleServer(eng, max_batch=2, page_size=16)
    ra = srv.submit(REQ_A, 10, seed=1)
    srv.run()
    rb = srv.submit(REQ_B, 10, seed=2)
    out = srv.run()[rb]
    assert srv.store.hits == 1
    np.testing.assert_array_equal(out[: len(REQ_B)], REQ_B)
    assert len(out) > len(REQ_B)