"""Shared write-mode pinning for the persisted index stores.

The session default is DYNAMIC partition overwrite (session.py — the
right default for the warehouse's day-partition merges), but the two
index write classes need opposite pins, both scoped to the write and
restored after:

- FULL-STORE writes (``save_*_index``, compact/retrain generation
  writes) must be STATIC: under dynamic overwrite a partitioned
  "overwrite" only replaces the partitions present in the written
  data, so a fresh save over a store that ever took appends would
  leave the old ``ingest_key=<batch>`` partitions alive — the store
  would keep serving retired batches' grams/signatures/vectors
  (caught live in round 8; pinned by the ``*_resave_after_append``
  tests).
- PER-BATCH appends must be DYNAMIC: a replayed batch overwrites only
  its own ``ingest_key`` partitions (the effectively-once trick);
  static would wipe every other batch.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def overwrite_mode(spark, mode: str):
    """Pin ``spark.sql.sources.partitionOverwriteMode`` to ``mode``
    for the duration, restoring the caller's setting (or unsetting)
    after — the scoped-conf pattern of the bronze offset-replay
    writer."""
    conf = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, mode)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)
