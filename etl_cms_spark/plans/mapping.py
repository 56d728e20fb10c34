"""Broadcast concept-dictionary mapping (SURVEY.md §2.J1-J3).

The reference loads CONCEPT.csv / CONCEPT_RELATIONSHIP.csv into
in-process hash maps and probes them per row
(reference CMS_SynPuf_ETL_CDM_v5.py:389-498); probe misses go to an
unmapped-code log (:1306-1308).  Here the dictionary is a Spark
broadcast variable probed inside a vectorized Arrow pandas UDF
(BASELINE.json north_star: "broadcast concept-lookup dictionaries
inside vectorized pandas/Arrow UDFs — no per-row Python"), and the
misses become a quarantine domain routed by the demux stage.

A pure-join variant is provided too (``map_concepts_join``) — for a
plain equi-lookup Catalyst's broadcast hash join is the idiomatic
form; the UDF form is the extension point for lookups that are NOT
equi-joins (longest-prefix, versioned code systems, normalization
chains like the reference's CPT4→HCPCS rewrite at :448-453).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from etl_cms_spark.fixtures.generator import LANG_VOCAB

# Deterministic concept dictionary: lang -> (concept_id, domain).
# Two vocabulary values ('lua', 'proto') are deliberately absent so
# the unmapped/quarantine path is always exercised (J7 anti-join
# analogue; reference's unmapped_code_log at CMS_SynPuf_ETL_CDM_v5.py:2038).
_DOMAINS = {
    "sql": "query", "r": "query", "julia": "query",
    "html": "markup", "css": "markup", "markdown": "markup",
    "yaml": "config", "json": "config", "toml": "config", "dockerfile": "config",
    "shell": "script", "perl": "script", "ruby": "script", "php": "script",
}
UNMAPPED_LANGS = {"lua", "proto"}
CONCEPT_MAP: dict[str, tuple[int, str]] = {
    lang: (9000 + i, _DOMAINS.get(lang, "code"))
    for i, lang in enumerate(LANG_VOCAB)
    if lang not in UNMAPPED_LANGS
}


# Broadcast cache: one broadcast per (SparkContext, mapping) — a
# long-running stream calls make_concept_mapper every micro-batch, and
# an uncached broadcast per epoch accumulates on the driver and
# executors for the life of the context.
_MAPPER_CACHE: dict[tuple, object] = {}


def make_concept_mapper(spark: SparkSession, mapping: dict[str, tuple[int, str]] | None = None):
    """Returns a pandas UDF closing over a broadcast of the dict.
    The broadcast is cached per (SparkContext, mapping contents)."""
    m = mapping if mapping is not None else CONCEPT_MAP
    cache_key = (id(spark.sparkContext), tuple(sorted(m.items())))
    bc = _MAPPER_CACHE.get(cache_key)
    if bc is None:
        bc = spark.sparkContext.broadcast(dict(m))
        _MAPPER_CACHE[cache_key] = bc

    @pandas_udf("struct<concept_id:int,domain:string>")
    def map_lang(langs: pd.Series) -> pd.DataFrame:
        m = bc.value
        # two dict-backed Series.map calls (C-level hash probes) per
        # batch instead of three per-row Python lambdas (guide §4.2).
        ids = {k: v[0] for k, v in m.items()}
        doms = {k: v[1] for k, v in m.items()}
        return pd.DataFrame(
            {
                "concept_id": langs.map(ids).fillna(0).astype("int32"),
                "domain": langs.map(doms).fillna("unmapped"),
            }
        )

    return map_lang


def map_concepts_udf(
    spark: SparkSession,
    df: DataFrame,
    lang_col: str = "lang",
    mapping: dict[str, tuple[int, str]] | None = None,
) -> DataFrame:
    """Attach (concept_id, domain) via the broadcast-dict Arrow UDF;
    also stamps the per-row sha256 content invariant.  ``mapping``
    overrides the default concept dictionary (vocabulary updates —
    e.g. the quarantine repair flow after a code system gained the
    missing entries)."""
    mapper = make_concept_mapper(spark, mapping)
    out = df.withColumn("_m", mapper(F.col(lang_col)))
    return (
        out.withColumn("concept_id", F.col("_m.concept_id"))
        .withColumn("domain", F.col("_m.domain"))
        .drop("_m")
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
    )


def map_concepts_join(
    spark: SparkSession,
    df: DataFrame,
    lang_col: str = "lang",
    mapping: dict[str, tuple[int, str]] | None = None,
) -> DataFrame:
    """Equivalent broadcast-hash-join form (Catalyst-visible).

    Idempotent like the UDF form: pre-existing concept_id/domain/
    content_sha columns (a re-mapped frame — e.g. hydrated partial
    rows carry the table's previous mapping) are dropped and
    recomputed instead of colliding with the dim's column names."""
    m = mapping if mapping is not None else CONCEPT_MAP
    df = df.drop("concept_id", "domain", "content_sha")
    dim = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in m.items()],
        f"{lang_col} string, concept_id int, domain string",
    )
    out = df.join(F.broadcast(dim), lang_col, "left")
    return (
        out.withColumn("concept_id", F.coalesce(F.col("concept_id"), F.lit(0)))
        .withColumn("domain", F.coalesce(F.col("domain"), F.lit("unmapped")))
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
    )
