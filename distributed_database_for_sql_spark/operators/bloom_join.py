"""Runtime bloom-filter–pruned join: Spark's row-level runtime filtering.

At 100 TB the classic pain is a fact-fact join where one side is cut by a
selective predicate the other side can't see: every surviving fact row
still shuffles.  Spark's runtime bloom filter (Catalyst's
InjectRuntimeFilter, `spark.sql.optimizer.runtime.bloomFilter.*`) builds
a bloom filter over the creation side's join keys and pushes a
`might_contain` predicate into the application side's SCAN — rows that
cannot match are dropped before the shuffle, typically cutting shuffle
bytes by the predicate's selectivity.

This module only *scopes* the feature: the confs are session-level, so
`bloom_scope` sets them for the duration of an action and restores the
previous values (the engine's default sessions keep Spark defaults —
broadcast joins don't need bloom filters, and the oracle-gate session
must stay pristine).  The plan/result guarantees are pinned in
tests/test_plans.py::test_bloom_filter_prunes_application_side.

The reference has no joins at all (SURVEY.md §2.D); this is 100 TB
engineering for the engine's own surface, same as salted_join.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Test-scale thresholds: production leaves these at their defaults
    # (10 MB creation side / 10 GB application side) — the point of the
    # overrides is only to exercise the injected plan on fixture data.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "1KB",
    # Bloom filters apply to shuffle joins; a broadcast join already
    # prunes via the broadcast hash table.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def bloom_scope(spark: SparkSession, confs: dict[str, str] | None = None):
    """Temporarily enable runtime bloom-filter injection.

    Confs are read at ACTION time, not DataFrame-build time, so the
    action (count/collect/write) must run inside this scope for the
    filter to inject."""
    confs = {**_BLOOM_CONFS, **(confs or {})}
    old: dict[str, str | None] = {}
    for k_, v in confs.items():
        try:
            old[k_] = spark.conf.get(k_)
        except Exception:  # noqa: BLE001 — unset conf
            old[k_] = None
        spark.conf.set(k_, v)
    try:
        yield spark
    finally:
        for k_, v in old.items():
            if v is None:
                spark.conf.unset(k_)
            else:
                spark.conf.set(k_, v)
