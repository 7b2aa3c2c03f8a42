"""Session-keyed cache hygiene (ADVICE r3): dead-session entries are
evicted on access, and a handle re-marked after ``catalog.clearCache()``
is stored BACK into the dict so later calls reuse it instead of
re-caching every time."""

from __future__ import annotations

from kafka_bigdata_jobs_spark import suite

SF = "/root/testdata/sf0.001"


def test_dead_session_entries_evicted(spark):
    cache = {("dead-app-123", SF): object(), ("dead-app-456", "/x"): object()}
    suite._evict_dead_sessions(cache, spark.sparkContext.applicationId)
    assert cache == {}


def test_recache_handle_stored_back(spark):
    suite._NEAR_DUP_PAIRS_CACHE.clear()
    df1 = suite._shared_near_dup_pairs(spark, SF)
    key = (spark.sparkContext.applicationId, SF)
    assert key in suite._NEAR_DUP_PAIRS_CACHE
    df1.count()  # materialize the cache
    spark.catalog.clearCache()  # bench isolation drops CacheManager entry
    df2 = suite._shared_near_dup_pairs(spark, SF)
    lvl = df2.storageLevel
    assert lvl.useMemory or lvl.useDisk  # re-marked
    # The re-marked handle is the dict entry now — a third call must not
    # find an uncached handle again.
    assert suite._NEAR_DUP_PAIRS_CACHE[key] is df2
    df3 = suite._shared_near_dup_pairs(spark, SF)
    assert df3 is df2


def test_dead_entry_evicted_via_shared_accessor(spark):
    suite._EMB_PAIRS_CACHE[("dead-app-789", SF)] = object()
    suite._shared_embedding_pairs(spark, SF)
    assert ("dead-app-789", SF) not in suite._EMB_PAIRS_CACHE
