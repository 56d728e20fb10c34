"""etl_cms_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the semantics of OHDSI/ETL-CMS
(reference at /root/reference, surveyed in SURVEY.md) as a replayable
change-event pipeline over lake tables of source-code repositories:

    changelog tail -> max-LSN dedup -> broadcast-dict mapping
    (vectorized Arrow UDF) -> domain demux -> key-partitioned
    copy-on-write MERGE with schema evolution -> (partition, epoch)
    commit manifest + lineage/metrics

Design rules (scale-first):
  * DataFrame/SQL only — no RDDs, no per-row Python UDFs.
  * Every lookup side that fits in memory is broadcast.
  * The merge sink touches only the hash-buckets that received
    changes in an epoch (copy-on-write at bucket granularity), so
    upsert cost scales with the change volume, not the table size.
  * Surrogate identity is content/key-hash derived (xxhash64/sha2),
    never a mutable counter, so replays converge byte-for-byte
    (the reference's Table_ID_Values counters — see
    reference python_etl/utility_classes.py:5-100 — are exactly
    what this design removes).
"""

__version__ = "0.1.0"
