"""Bounded driver-side caches for per-store metadata.

The persisted-store operators (minhash index, CC labels, DSIR,
classifier, IVF, LM, decontam) memoize tiny per-store facts on the
driver — band geometry, node types, footer manifests, centroid
blocks — so the per-micro-batch hot paths don't re-pay a parquet
meta read per call. Keys are store paths / generation roots, so a
job-scoped driver holds a handful of entries; only a LONG-LIVED
serving driver hosting many stores could grow one without bound
(VERDICT r14 hygiene note). :class:`BoundedCache` puts a hard cap on
that: inserting past the cap evicts the oldest-inserted entry.
Eviction is always safe — every consumer treats a miss as "re-read
the store's meta", so a capped cache trades a rare re-read for a
bounded footprint.
"""

from __future__ import annotations


class BoundedCache(dict):
    """Dict with FIFO-by-insertion eviction past ``cap`` entries.

    Supports exactly the operations the meta caches use: ``in``,
    ``[]``/``get``, ``[]= ``, ``pop``. Re-setting an existing key
    does not evict (its insertion position is kept — fine for
    immutable-per-key metadata, which these all are)."""

    def __init__(self, cap: int = 256):
        super().__init__()
        self.cap = cap

    def __setitem__(self, key, value):
        if key not in self and len(self) >= self.cap:
            # tolerant eviction: concurrent foreachBatch threads share
            # these module-global caches, and the check-then-act here
            # can race — both threads picking the same oldest key, or
            # the iterator seeing a mutation. Evicting is best-effort
            # (a miss just re-reads store meta), so never let it throw
            # where the plain dict this replaced could not.
            try:
                super().pop(next(iter(self)), None)
            except (StopIteration, RuntimeError):
                pass
        super().__setitem__(key, value)
