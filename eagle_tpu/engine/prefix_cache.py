"""Automatic prefix caching for the paged-KV server (vLLM-style).

Finished requests donate their full KV pages back to a host-side store
keyed by the token prefix they cover; a new request whose prompt starts
with a cached prefix adopts those pages read-only instead of re-prefilling
them. The reference has no analog (every request prefills its whole prompt,
modeling_eagle.py:1258); production serving workloads share system prompts
and multi-turn histories, where this removes most prefill work.

Why sharing is safe and bit-exact:
- Target KV rows are a deterministic function of the token prefix, so any
  request with the same prefix would compute identical rows.
- Entries cover only FULL pages (R = npre·page_size rows). An adopter's
  committed length is ≥ R at all times, and decode rounds only write rows
  ≥ length, so shared pages are never written by adopters. (The one
  recomputed boundary row R−1 is NOT scattered back — engine/paged.py.)
- EAGLE needs the draft-head KV for the prefix too: each entry retains the
  draft rows [0, R) as a small device slab (one layer for EAGLE-3 — a few
  MB), restored into the adopting slot's draft cache. The boundary draft
  pair (whose input token differs per continuation) is recomputed at
  adoption via the same incremental-prefill trick as engine/session.py.

Ownership model: an entry owns the pages it added beyond its parent entry
(entries form chains when a request that adopted prefix E finishes and
donates a deeper prefix). `borrowers` counts live slot adoptions plus child
entries; eviction marks an entry dead and frees its own pages once
borrowers drain (parents are released recursively).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional

import numpy as np


def _digest(tokens: np.ndarray) -> bytes:
    return hashlib.sha1(np.ascontiguousarray(tokens, np.int32)
                        .tobytes()).digest()


class PrefixEntry:
    __slots__ = ("rows", "tokens", "pages_own", "parent", "dk", "dv",
                 "borrowers", "dead", "last_used")

    def __init__(self, rows: int, tokens: np.ndarray, pages_own: List[int],
                 parent: Optional["PrefixEntry"], dk, dv, stamp: int):
        self.rows = rows            # R: logical rows covered (page multiple)
        self.tokens = tokens        # the R prefix tokens (collision guard)
        self.pages_own = pages_own  # pages beyond the parent's coverage
        self.parent = parent
        self.dk, self.dv = dk, dv   # draft KV rows [0, R) (device)
        self.borrowers = 0          # live adopters + child entries
        self.dead = False
        self.last_used = stamp

    def all_pages(self) -> List[int]:
        chain = self.parent.all_pages() if self.parent is not None else []
        return chain + self.pages_own


class PrefixStore:
    """Host-side prefix → entry map with LRU eviction. Page frees go
    through `release_pages` (the server's allocator)."""

    def __init__(self, page_size: int, release_pages,
                 max_entries: int = 32):
        self.P = page_size
        self.release_pages = release_pages
        self.max_entries = max_entries
        self._by_hash: Dict[bytes, PrefixEntry] = {}
        self._clock = 0
        self.hits = 0
        self.reused_tokens = 0

    def __len__(self):
        return len(self._by_hash)

    def _tick(self) -> int:
        self._clock += 1
        return self._clock

    def lookup(self, prompt: np.ndarray) -> Optional[PrefixEntry]:
        """Deepest live entry whose prefix the prompt starts with."""
        for npre in range(len(prompt) // self.P, 0, -1):
            R = npre * self.P
            e = self._by_hash.get(_digest(prompt[:R]))
            if e is not None and not e.dead and \
                    np.array_equal(e.tokens, prompt[:R]):
                e.last_used = self._tick()
                return e
        return None

    def acquire(self, entry: PrefixEntry):
        entry.borrowers += 1

    def release(self, entry: PrefixEntry):
        entry.borrowers -= 1
        assert entry.borrowers >= 0
        if entry.dead and entry.borrowers == 0:
            self._free(entry)

    def insert(self, tokens: np.ndarray, pages_own: List[int],
               parent: Optional[PrefixEntry], dk, dv
               ) -> Optional[PrefixEntry]:
        """Register a prefix of len(tokens) rows (page multiple). Returns
        the entry, or None if this exact prefix is already cached (caller
        keeps ownership of pages_own). Takes ownership of pages_own and a
        borrower hold on `parent`."""
        h = _digest(tokens)
        if h in self._by_hash and not self._by_hash[h].dead:
            return None
        e = PrefixEntry(len(tokens), np.asarray(tokens, np.int32).copy(),
                        list(pages_own), parent, dk, dv, self._tick())
        if parent is not None:
            self.acquire(parent)
        self._by_hash[h] = e
        if len(self._by_hash) > self.max_entries:
            self.evict(1)
        return e

    # ------------------------------------------------------------------

    def _free(self, entry: PrefixEntry):
        """Free a dead, borrower-less entry's own pages; drop the parent
        hold (cascading if the parent was already dead)."""
        self.release_pages(entry.pages_own)
        entry.pages_own = []
        entry.dk = entry.dv = None
        if entry.parent is not None:
            self.release(entry.parent)
            entry.parent = None

    def evict(self, want_pages: int) -> int:
        """Mark LRU borrower-less entries dead until `want_pages` of their
        own pages have been freed (or nothing evictable remains). Returns
        pages freed immediately.

        Re-scans candidates after every eviction rather than snapshotting
        them once: freeing a child entry drops its parent's borrower count,
        and a parent whose only borrower WAS that child must become
        evictable within the same pass — otherwise callers see a shortfall
        and abort ("page pool too small") with reclaimable pages still
        held by the chain."""
        freed = 0
        while freed < want_pages:
            cands = [e for e in self._by_hash.values()
                     if not e.dead and e.borrowers == 0]
            if not cands:
                break
            e = min(cands, key=lambda c: c.last_used)
            e.dead = True
            freed += len(e.pages_own)
            self._free(e)
        self._by_hash = {h: e for h, e in self._by_hash.items()
                         if not e.dead}
        return freed
