"""One-slot persist registry shared by the operators that cache an upstream.

``swap_persisted(registry, df)`` persists ``df`` (MEMORY_AND_DISK) and
unpersists the registry's previous occupant, so repeated operator calls in
one session keep exactly ONE cached upstream alive instead of accumulating
cached RDDs for the session lifetime.  The unpersist is best-effort: a
frame from an already-stopped SparkSession (multi-session drivers) is
simply dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def swap_persisted(registry: list[DataFrame], df: DataFrame) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    prev = registry.pop(0) if registry else None
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # previous frame's session is gone — nothing to release
    registry.append(df)
    return df
