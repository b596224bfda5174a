"""BoundedCache (r15 hygiene, VERDICT r14 #7): the driver-side meta
caches must stay bounded in a long-lived serving driver hosting many
stores, and eviction must be safe (consumers re-read on miss)."""

from sensor_data_pipeline___spark.operators._caches import BoundedCache


def test_bounded_cache_evicts_fifo_past_cap():
    c = BoundedCache(cap=3)
    for i in range(5):
        c[i] = i * 10
    assert list(c) == [2, 3, 4]  # oldest-inserted evicted first
    assert len(c) == 3


def test_bounded_cache_reset_existing_key_does_not_evict():
    c = BoundedCache(cap=2)
    c["a"] = 1
    c["b"] = 2
    c["a"] = 99  # re-set: immutable-per-key metadata rewrite
    assert dict(c) == {"a": 99, "b": 2}


def test_bounded_cache_pop_and_membership():
    c = BoundedCache(cap=2)
    c["a"] = 1
    assert "a" in c and c.pop("a", None) == 1
    assert c.pop("missing", "dflt") == "dflt"
    c["b"] = 2
    c["c"] = 3
    c["d"] = 4
    assert list(c) == ["c", "d"]


def test_module_caches_are_bounded():
    """Every per-store meta/manifest cache in the package is a
    BoundedCache (the r14 hygiene note's fix is structural, not
    one-off)."""
    from sensor_data_pipeline___spark.operators import (
        classifier,
        decontam,
        dedup,
        dsir,
        similarity,
        text,
    )

    for cache in (
        dsir._META_CACHE,
        dedup._MANIFEST_CACHE,
        dedup._META_CACHE,
        dedup._CC_META_CACHE,
        text._LM_META_CACHE,
        decontam._META_CACHE,
        similarity._CENT_CACHE,
        classifier._META_CACHE,
    ):
        assert isinstance(cache, BoundedCache)
        assert cache.cap >= 8
