"""Session- and plan-keyed persist registry for operators that cache an
upstream frame.

``keyed_persist(df, name)`` persists ``df`` (MEMORY_AND_DISK) under the key
``(applicationId, name, df.semanticHash())`` and returns the registered frame.
A later call with a semantically-equal plan returns the SAME persisted frame
instead of re-persisting a duplicate — and, unlike the earlier one-slot
registry, a call with a DIFFERENT plan (e.g. interleaved
``ngram_jaccard_pairs`` / ``lsh_candidate_pairs`` over different corpora)
gets its own slot rather than silently evicting a frame that previously
returned DataFrames still reference lazily (correct results, but the cached
kernel pass the registry exists to avoid would re-run).

Bounded: an LRU of ``_CAP`` entries per process; evicted frames are
unpersisted best-effort (a frame from an already-stopped SparkSession is
simply dropped).  If an external ``spark.catalog.clearCache()`` wiped the
cache entry (bench reps do exactly that), the frame is re-persisted on the
next request instead of silently recomputing per downstream branch.
Thread-safe via a module lock.

CONTRACT: inputs must be immutable for the key's lifetime.  The key is a
PLAN hash — two semantically-equal plans over a path whose files were
rewritten in between would alias to one (stale) cached frame.  Every
current caller reads immutable inputs (seeded datagen, sf-dir parquet);
an operator over warehouse tables that are rewritten in place must NOT
route through this registry (persist locally and unpersist when done).
"""

from __future__ import annotations

import threading
from collections import OrderedDict

from pyspark.sql import DataFrame

_CAP = 8
_LOCK = threading.Lock()
_REG: "OrderedDict[tuple, DataFrame]" = OrderedDict()


def _is_cached(df: DataFrame) -> bool:
    try:
        lvl = df.storageLevel
        return bool(lvl.useMemory or lvl.useDisk)
    except Exception:
        return False


def keyed_persist(df: DataFrame, name: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    try:
        app_id = df.sparkSession.sparkContext.applicationId
    except Exception:
        return df  # dead session — uncached frame
    try:
        key = (app_id, name, df.semanticHash())
    except Exception:
        # hash failure — still persist (the whole point of the registry is
        # avoiding the measured duplicate kernel pass), registered under a
        # per-frame key so the LRU cap still bounds and unpersists it
        key = (app_id, name, "nohash", id(df))

    with _LOCK:
        cached = _REG.get(key)
        if cached is not None:
            if not _is_cached(cached):
                # cache cleared externally (spark.catalog.clearCache());
                # re-register so downstream diamond branches share one pass
                cached.persist(StorageLevel.MEMORY_AND_DISK)
            _REG.move_to_end(key)
            return cached
        try:
            df.persist(StorageLevel.MEMORY_AND_DISK)
        except Exception:
            return df  # session died mid-call — degrade to uncached
        _REG[key] = df
        while len(_REG) > _CAP:
            _, victim = _REG.popitem(last=False)
            try:
                victim.unpersist()
            except Exception:
                pass  # victim's session is gone — nothing to release
        return df
