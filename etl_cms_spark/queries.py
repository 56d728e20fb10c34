"""Query catalog: every operator from SURVEY.md §2 as a (Spark
callable, DuckDB oracle SQL) pair over the driver's testdata tables.

Conventions that make the driver's order-insensitive value-hash
comparison exact:
* money/double aggregations run in DECIMAL (exact) and cast the final
  value to DOUBLE — both engines then produce bit-identical doubles;
* embedding math uses explicit double folds in the same evaluation
  order on both sides;
* every top-k has a deterministic tie-break;
* every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cms_spark.functions import text as X
from etl_cms_spark.operators.dedup import (
    first_write_wins,
    latest_by_lsn,
)
from etl_cms_spark.operators.demux import route
from etl_cms_spark.operators.eras import build_eras, build_eras_faithful, sessionize


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(c, p=12, s=2):
    return F.col(c).cast(f"decimal({p},{s})")


def _one():
    return F.lit(1).cast("decimal(9,2)")

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# =====================================================================
# A. TPC-H-style relational suite (scan, filter, join, agg — SURVEY §2
#    S1, P*, J1-J6, G5; reference's era SQL uses the same shapes)
# =====================================================================

@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2))) * (CAST(1 AS DECIMAL(9,2)) + CAST(l_tax AS DECIMAL(9,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (_one() - F.col("l_discount").cast("decimal(9,2)"))
    charge = disc_price * (_one() + F.col("l_tax").cast("decimal(9,2)"))
    n = F.count("*")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(_dec("l_quantity")).cast("double") / n).alias("avg_qty"),
        (F.sum(_dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
        (F.sum(F.col("l_discount").cast("decimal(9,2)")).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@q(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey AS orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue,
      o.o_orderdate AS orderdate, o.o_orderpriority AS orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (_one() - F.col("l_discount").cast("decimal(9,2)"))
    joined = (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
    )
    return (
        joined.groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


@q(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    disc_price = _dec("l_extendedprice") * (_one() - F.col("l_discount").cast("decimal(9,2)"))
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(disc_price).cast("double").alias("revenue")
    )


# =====================================================================
# B. Broadcast dictionary lookups / anti-join / fan-out (J1, J2, J7)
# =====================================================================

_TYPE_DIM = [
    ("click", 1, "engagement"),
    ("view", 2, "engagement"),
    ("purchase", 3, "revenue"),
    ("signup", 4, "growth"),
]  # 'error' deliberately unmapped.


@q(
    "concept_lookup_broadcast",
    """
    WITH dim(event_type, type_id, class) AS (
      VALUES ('click', 1, 'engagement'), ('view', 2, 'engagement'),
             ('purchase', 3, 'revenue'), ('signup', 4, 'growth'))
    SELECT e.event_type AS event_type,
           COALESCE(d.type_id, 0) AS type_id,
           COALESCE(d.class, 'unmapped') AS class,
           COUNT(*) AS n
    FROM events e LEFT JOIN dim d ON e.event_type = d.event_type
    GROUP BY 1, 2, 3
    """,
)
def concept_lookup_broadcast(spark, sf_dir):
    """J1 — the reference's source_code_concept_dict probe
    (CMS_SynPuf_ETL_CDM_v5.py:437-498) as a broadcast hash join."""
    e = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(_TYPE_DIM, "event_type string, type_id int, class string")
    return (
        e.join(F.broadcast(dim), "event_type", "left")
        .groupBy(
            "event_type",
            F.coalesce("type_id", F.lit(0)).alias("type_id"),
            F.coalesce("class", F.lit("unmapped")).alias("class"),
        )
        .agg(F.count("*").alias("n"))
    )


@q(
    "unmapped_anti_join",
    """
    WITH dim(event_type) AS (VALUES ('click'), ('view'), ('purchase'), ('signup'))
    SELECT event_type, COUNT(*) AS n FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.event_type = e.event_type)
    GROUP BY 1
    """,
)
def unmapped_anti_join(spark, sf_dir):
    """J7 — unmapped-code quarantine channel
    (reference CMS_SynPuf_ETL_CDM_v5.py:1306-1308)."""
    e = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame([(t,) for t, _, _ in _TYPE_DIM], "event_type string")
    return (
        e.join(F.broadcast(dim), "event_type", "left_anti")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@q(
    "multimap_fanout",
    """
    WITH dim(event_type, tag) AS (
      VALUES ('click', 'A'), ('click', 'B'), ('purchase', 'C'))
    SELECT d.tag AS tag, COUNT(*) AS n
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY 1
    """,
)
def multimap_fanout(spark, sf_dir):
    """J2 — 1→N mapping fan-out (the reference's multi-valued
    concept_relationship_dict, CMS_SynPuf_ETL_CDM_v5.py:480-487)."""
    e = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", "A"), ("click", "B"), ("purchase", "C")], "event_type string, tag string"
    )
    return (
        e.join(F.broadcast(dim), "event_type")
        .groupBy("tag")
        .agg(F.count("*").alias("n"))
    )


# =====================================================================
# C. CDC dedup / argmax / first-write-wins (E1-E5, G3, G4)
# =====================================================================

@q(
    "cdc_latest_by_key",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events) WHERE rn = 1
    """,
)
def cdc_latest_by_key(spark, sf_dir):
    """E5 — per key keep max-LSN event (event_id is the LSN here)."""
    e = _t(spark, sf_dir, "events")
    out = latest_by_lsn(e.select("user_id", "event_id", "event_type", "value"), ["user_id"], "event_id")
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@q(
    "cdc_partial_fold",
    """
    WITH src AS (
      SELECT user_id, event_id AS lsn,
             CASE WHEN event_id % 3 <> 0 THEN event_type END AS etype,
             CASE WHEN event_id % 5 <> 0 THEN value END AS val,
             CASE WHEN event_id % 17 = 0 THEN 'D' ELSE 'U' END AS op
      FROM events
    ), d AS (
      SELECT *, MAX(CASE WHEN op = 'D' THEN lsn END)
                  OVER (PARTITION BY user_id) AS del_lsn
      FROM src
    ), g AS (
      SELECT user_id,
        arg_max(etype, CASE WHEN op <> 'D' AND (del_lsn IS NULL OR lsn > del_lsn)
                            THEN lsn END) AS etype,
        arg_max(val,   CASE WHEN op <> 'D' AND (del_lsn IS NULL OR lsn > del_lsn)
                            THEN lsn END) AS val,
        MAX(lsn) AS lsn,
        MAX(CASE WHEN op <> 'D' AND (del_lsn IS NULL OR lsn > del_lsn)
                 THEN lsn END) AS last_upd
      FROM d GROUP BY user_id
    )
    SELECT user_id, etype, val, lsn,
           CASE WHEN last_upd IS NULL THEN 'D' ELSE 'U' END AS op
    FROM g
    """,
)
def cdc_partial_fold(spark, sf_dir):
    """E5+ — fold PARTIAL-IMAGE change events (binlog
    row_image=MINIMAL: an update carries only its changed columns)
    into one fullest-image row per key, delete-resets-state.  Each
    column independently resolves via ``max_by`` gated on presence —
    the exact semantics DuckDB's NULL-skipping ``arg_max`` verifies.
    The partial stream is synthesized deterministically from
    ``events`` (column c present iff event_id % p_c != 0; every 17th
    event is a delete)."""
    from etl_cms_spark.operators.dedup import fold_partial_updates

    e = _t(spark, sf_dir, "events")
    src = e.select(
        "user_id",
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_id") % 3 != 0, F.col("event_type")).alias("etype"),
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("val"),
        F.when(F.col("event_id") % 17 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    return fold_partial_updates(src, ["user_id"], "lsn", op_col="op").select(
        "user_id", "etype", "val", "lsn", "op"
    )


@q(
    "debezium_adapter",
    """
    SELECT user_id,
           CASE WHEN event_id % 17 <> 0 THEN event_type END AS event_type,
           CASE WHEN event_id % 17 <> 0 THEN value END AS value,
           event_id AS lsn,
           CASE WHEN event_id % 17 = 0 THEN 'D'
                WHEN event_id % 11 = 0 THEN 'I'
                WHEN event_id % 13 = 0 THEN 'I'
                ELSE 'U' END AS op
    FROM events
    """,
)
def debezium_adapter(spark, sf_dir):
    """S-adapter — flatten Debezium-style envelopes (op c/r/u/d,
    before/after images, source.lsn) into the engine's flat changelog.
    Envelopes are synthesized deterministically from ``events``
    (every 17th a delete carrying only the before-image; 11th/13th
    snapshot-read/insert ops) and the adapter's output is checked
    ROW-FOR-ROW — keys resolve from after-with-before-fallback,
    delete payloads are NULL, c/r both map to I."""
    from etl_cms_spark.sources.envelopes import from_debezium

    e = _t(spark, sf_dir, "events")
    is_d = F.col("event_id") % 17 == 0
    payload = F.struct("user_id", "event_type", "value")
    env = e.select(
        F.when(is_d, F.lit("d"))
        .when(F.col("event_id") % 11 == 0, F.lit("c"))
        .when(F.col("event_id") % 13 == 0, F.lit("r"))
        .otherwise(F.lit("u"))
        .alias("op"),
        F.when(~is_d, payload).alias("after"),
        F.when(is_d, payload).alias("before"),
        F.struct(F.col("event_id").alias("lsn")).alias("source"),
    )
    return from_debezium(env, ["user_id"])


@q(
    "debezium_keychange",
    """
    SELECT user_id, CAST(NULL AS VARCHAR) AS event_type,
           CAST(NULL AS DOUBLE) AS value, event_id AS lsn, 'D' AS op
    FROM events WHERE event_id % 17 = 0
    UNION ALL
    SELECT user_id, NULL, NULL, event_id, 'D'
    FROM events WHERE event_id % 17 <> 0 AND event_id % 7 = 0
    UNION ALL
    SELECT user_id + 1000000, event_type, value, event_id, 'I'
    FROM events WHERE event_id % 17 <> 0 AND event_id % 7 = 0
    UNION ALL
    SELECT user_id, event_type, value, event_id, 'U'
    FROM events WHERE event_id % 17 <> 0 AND event_id % 7 <> 0
    """,
)
def debezium_keychange(spark, sf_dir):
    """S-adapter+ — PRIMARY-KEY-CHANGING updates in the envelope
    feed.  An ``u`` whose before/after keys differ moves the row to
    a new identity; the adapter (``on_key_change="split"``, the
    default) emits a ``D`` tombstone at the old key plus an ``I`` at
    the new key — the delete+create pair Debezium's own connectors
    produce — instead of stranding the old row.  Envelopes are
    synthesized deterministically from ``events`` (every 17th a
    delete; every remaining 7th a key-change ``u`` relocating
    ``user_id`` by +1,000,000) and the flattened changelog is
    checked ROW-FOR-ROW against the explicit split.  The split path
    is one narrow Generate — no shuffle (asserted in
    tests/test_sources.py)."""
    from etl_cms_spark.sources.envelopes import from_debezium

    e = _t(spark, sf_dir, "events")
    is_d = F.col("event_id") % 17 == 0
    is_ku = ~is_d & (F.col("event_id") % 7 == 0)
    after_key = F.col("user_id") + F.when(is_ku, F.lit(1000000)).otherwise(F.lit(0))
    after = F.struct(
        after_key.alias("user_id"), F.col("event_type"), F.col("value")
    )
    before = F.struct("user_id", "event_type", "value")
    env = e.select(
        F.when(is_d, F.lit("d")).otherwise(F.lit("u")).alias("op"),
        F.when(~is_d, after).alias("after"),
        before.alias("before"),
        F.struct(F.col("event_id").alias("lsn")).alias("source"),
    )
    return from_debezium(env, ["user_id"])


@q(
    "first_write_wins",
    """
    SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id ASC) rn
          FROM events) WHERE rn = 1
    """,
)
def first_write_wins_q(spark, sf_dir):
    """E2 — write-once dimension semantics
    (reference get_CareSite/get_Provider, CMS_SynPuf_ETL_CDM_v5.py:258-284)."""
    e = _t(spark, sf_dir, "events")
    out = first_write_wins(e.select("user_id", "event_id", "event_type"), ["user_id"], "event_id")
    return out.select(
        "user_id",
        F.col("event_id").alias("first_event_id"),
        F.col("event_type").alias("first_event_type"),
    )


@q(
    "latest_order_per_customer",
    """
    SELECT o_custkey AS custkey, o_orderkey AS last_orderkey,
           o_totalprice AS last_totalprice
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
          FROM orders) WHERE rn = 1
    """,
)
def latest_order_per_customer(spark, sf_dir):
    """G3 — argmax/latest-row-per-group (reference LatestYearData,
    beneficiary.py:126-132) via max_by."""
    o = _t(spark, sf_dir, "orders")
    last = F.max_by(
        F.struct("o_orderkey", "o_totalprice"), F.struct("o_orderdate", "o_orderkey")
    )
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        last["o_orderkey"].alias("last_orderkey"),
        last["o_totalprice"].alias("last_totalprice"),
    )


@q(
    "observation_period",
    """
    SELECT user_id, MIN(ts) AS period_start, MAX(ts) AS period_end, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def observation_period(spark, sf_dir):
    """G2 — min/max per group (reference CMS_SynPuf_ETL_CDM_v5.py:844-860)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("period_start"),
            F.max("ts").alias("period_end"),
            F.count("*").alias("n_events"),
        )
    )


@q(
    "visit_dedup_reuse",
    """
    WITH k AS (SELECT DISTINCT o_custkey, o_orderdate FROM orders),
    ids AS (SELECT o_custkey, o_orderdate,
                   ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderdate) AS visit_id
            FROM k)
    SELECT o.o_orderkey AS claim_id, i.visit_id
    FROM orders o JOIN ids i
      ON o.o_custkey = i.o_custkey AND o.o_orderdate = i.o_orderdate
    """,
)
def visit_dedup_reuse(spark, sf_dir):
    """E1+E3 — the reference's determine_visits composite
    (CMS_SynPuf_ETL_CDM_v5.py:541-590): mint ONE id per distinct
    natural key, then every event sharing the key REUSES that id
    (join-back).  plans/claims.build_visits is the CDM-shaped form
    (hash ids, no global sort); the dense-id variant here is used so
    DuckDB can replay it exactly."""
    from etl_cms_spark.operators.dedup import dense_stable_id

    o = _t(spark, sf_dir, "orders")
    ids = dense_stable_id(
        o.select("o_custkey", "o_orderdate"), ["o_custkey", "o_orderdate"], "visit_id"
    )
    return o.join(ids, ["o_custkey", "o_orderdate"]).select(
        F.col("o_orderkey").alias("claim_id"), "visit_id"
    )


def _ppf_oracle_sql() -> str:
    """DuckDB replay of the reference's year-combo payer-plan spec
    (README.md §j / CMS_SynPuf_ETL_CDM_v5.py:720-797) — DuckDB's
    DATE ± INTERVAL n MONTH clamps the day exactly like the spec's
    calendar.monthrange logic and Spark's add_months."""
    seg = lambda cond, s, e: f"CASE WHEN {cond} THEN {{'s': {s}, 'e': {e}}} END"  # noqa: E731
    am = lambda base, n: f"CAST(DATE '{base}' + INTERVAL ({n}) MONTH AS DATE)"  # noqa: E731
    d = lambda x: f"DATE '{x}'"  # noqa: E731
    start8 = f"CASE WHEN m8 = 0 THEN {d('2009-01-01')} ELSE CAST(DATE '2008-12-31' - INTERVAL (m8) MONTH AS DATE) END"
    segs = ",\n      ".join([
        seg("m8 = 12 AND m9 = 12 AND m10 = 12", d("2008-01-01"), d("2010-12-31")),
        seg("m8 = 12 AND m9 = 12 AND m10 < 12", d("2008-01-01"), am("2009-12-31", "m10")),
        seg("m8 = 12 AND m9 < 12", d("2008-01-01"), d("2008-12-31")),
        seg("m8 = 12 AND m9 < 12 AND m9 > 0", d("2009-01-01"), am("2009-01-01", "m9")),
        seg("m8 = 12 AND m9 < 12 AND m10 = 12", d("2010-01-01"), d("2010-12-31")),
        seg("m8 = 12 AND m9 < 12 AND m10 < 12 AND m10 > 0", d("2010-01-01"), am("2010-01-01", "m10")),
        seg("m8 < 12 AND m9 = 12 AND m10 = 12", start8, d("2010-12-31")),
        seg("m8 < 12 AND m9 = 12 AND m10 < 12", start8, am("2009-12-31", "m10")),
        seg("m8 < 12 AND m9 < 12 AND m8 > 0", d("2008-01-01"), am("2008-01-01", "m8")),
        seg("m8 < 12 AND m9 < 12 AND m9 > 0", d("2009-01-01"), am("2009-01-01", "m9")),
        seg("m8 < 12 AND m9 < 12 AND m10 = 12", d("2010-01-01"), d("2010-12-31")),
        seg("m8 < 12 AND m9 < 12 AND m10 < 12 AND m10 > 0", d("2010-01-01"), am("2010-01-01", "m10")),
    ])
    return f"""
    WITH b AS (
      SELECT c_custkey,
             c_custkey % 13 AS m8,
             (c_custkey // 13) % 13 AS m9,
             (c_custkey // 169) % 13 AS m10
      FROM customer),
    segs AS (
      SELECT c_custkey, unnest(list_filter([
      {segs}
      ], x -> x IS NOT NULL)) AS p
      FROM b)
    SELECT c_custkey AS custkey,
           strftime(p['s'], '%Y-%m-%d') AS period_start,
           strftime(p['e'], '%Y-%m-%d') AS period_end
    FROM segs
    """


@q("payer_plan_faithful", _ppf_oracle_sql())
def payer_plan_faithful(spark, sf_dir):
    """F7 faithful — the reference's hand-enumerated payer-plan year
    combos (CMS_SynPuf_ETL_CDM_v5.py:720-797) as a vectorized Spark
    plan, replayed independently in DuckDB SQL.  Coverage months are
    synthesized from c_custkey so all 13^3 combos appear as data."""
    from etl_cms_spark.plans.cdm import build_payer_plan_period_faithful

    c = _t(spark, sf_dir, "customer").select("c_custkey")
    bene = c.select(
        F.col("c_custkey").cast("string").alias("desynpuf_id"),
        F.explode(F.array(F.lit(2008), F.lit(2009), F.lit(2010))).alias("year"),
        "c_custkey",
    ).select(
        "desynpuf_id",
        "year",
        F.when(F.col("year") == 2008, F.pmod(F.col("c_custkey"), F.lit(13)))
        .when(F.col("year") == 2009, F.pmod(F.floor(F.col("c_custkey") / 13), F.lit(13)))
        .otherwise(F.pmod(F.floor(F.col("c_custkey") / 169), F.lit(13)))
        .cast("int")
        .alias("bene_hi_cvrage_tot_mons"),
        F.lit(0).alias("bene_smi_cvrage_tot_mons"),
        F.lit(0).alias("bene_hmo_cvrage_tot_mons"),
        F.lit(0).alias("plan_cvrg_mos_num"),
        F.monotonically_increasing_id().alias("row_order"),
    )
    out = build_payer_plan_period_faithful(bene).where(
        F.col("plan_source_value") == "MEDICARE_HI"
    )
    ids = c.select(
        F.col("c_custkey").alias("custkey"),
        F.xxhash64(F.col("c_custkey").cast("string")).alias("person_id"),
    )
    return out.join(ids, "person_id").select(
        "custkey",
        F.date_format("payer_plan_period_start_date", "yyyy-MM-dd").alias("period_start"),
        F.date_format("payer_plan_period_end_date", "yyyy-MM-dd").alias("period_end"),
    )


@q(
    "stable_id_dedup",
    """
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (ORDER BY user_id, event_type) AS surrogate_id
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    """,
)
def stable_id_dedup(spark, sf_dir):
    """E1 — keyed dedup minting deterministic surrogate ids
    (reference determine_visits, CMS_SynPuf_ETL_CDM_v5.py:541-590);
    dense ids via the two-pass partition-offset operator (no
    single-partition window), byte-equal to the oracle's global
    ROW_NUMBER."""
    from etl_cms_spark.operators.dedup import dense_stable_id

    e = _t(spark, sf_dir, "events")
    return dense_stable_id(e, ["user_id", "event_type"], "surrogate_id")


# =====================================================================
# D. Gaps-and-islands / sessions / windows (W1-W4, J5, G5)
# =====================================================================

_ERA_ORACLE = """
    WITH o AS (
      SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) AS e
      FROM orders),
    flagged AS (
      SELECT custkey, s, e,
        CASE WHEN prev_max_end IS NULL OR s > prev_max_end + INTERVAL 30 DAY
             THEN 1 ELSE 0 END AS new_island
      FROM (SELECT custkey, s, e,
              MAX(e) OVER (PARTITION BY custkey ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
            FROM o) x),
    islands AS (
      SELECT custkey, s, e,
        SUM(new_island) OVER (PARTITION BY custkey ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged)
    SELECT custkey, CAST(MIN(s) AS VARCHAR) AS era_start,
           CAST(MAX(e) AS VARCHAR) AS era_end,
           COUNT(*) AS event_count
    FROM islands GROUP BY custkey, island
"""


def _order_dates(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("s"),
        F.col("o_orderdate").cast("date").alias("e"),
    )


def _eras_as_str(df):
    # dates → ISO strings so Spark and DuckDB hash identically
    # (pandas renders DATE as midnight Timestamp on the DuckDB side).
    return df.select(
        "custkey",
        F.col("era_start").cast("string").alias("era_start"),
        F.col("era_end").cast("string").alias("era_end"),
        "event_count",
    )


@q("order_eras_30d", _ERA_ORACLE)
def order_eras_30d(spark, sf_dir):
    """W1-W3 one-pass gaps-and-islands (reference
    SQL/create_CDMv5_condition_era.sql re-expressed, SURVEY §2.F)."""
    return _eras_as_str(build_eras(_order_dates(spark, sf_dir), ["custkey"], "s", "e", 30))


@q("order_eras_faithful", _ERA_ORACLE)
def order_eras_faithful(spark, sf_dir):
    """Same semantics via the reference's literal 2-window +
    range-join shape (create_CDMv5_condition_era.sql:48-117)."""
    return _eras_as_str(
        build_eras_faithful(_order_dates(spark, sf_dir), ["custkey"], "s", "e", 30)
    )


@q(
    "sessionize_30m",
    """
    WITH flagged AS (
      SELECT user_id, ts,
        CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_session
      FROM (SELECT user_id, ts,
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
            FROM events) x),
    sess AS (
      SELECT user_id, ts,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS event_count
    FROM sess GROUP BY user_id, session_id
    """,
)
def sessionize_30m(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    return sessionize(e, ["user_id"], "ts", "30 minutes")


@q(
    "running_max_value",
    """
    SELECT user_id, event_id,
      MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
    FROM events
    """,
)
def running_max_value(spark, sf_dir):
    """W1 — running MAX with ROWS UNBOUNDED PRECEDING frame
    (reference create_CDMv5_condition_era.sql:61)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select("user_id", "event_id", F.max("value").over(w).alias("run_max"))


@q(
    "lag_prev_event",
    """
    SELECT user_id, event_id,
      LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id
    FROM events
    """,
)
def lag_prev_event(spark, sf_dir):
    """W4 — lag() analytic (reference insert_visit_occurrence.sql:41)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id", F.lag("event_id").over(w).alias("prev_event_id")
    )


# =====================================================================
# E. Demux / unpivot / union / scalar suite (I, G7, S4, F1-F13)
# =====================================================================

@q(
    "demux_route_counts",
    """
    SELECT CASE WHEN event_type IN ('click','view') THEN 'engagement'
                WHEN event_type = 'purchase' THEN 'revenue'
                WHEN event_type = 'signup' THEN 'growth'
                ELSE 'ops' END AS dest,
           COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def demux_route_counts(spark, sf_dir):
    """I — domain-routed multi-output demux
    (reference domain_destination_file_list, CMS_SynPuf_ETL_CDM_v5.py:212-229)."""
    e = _t(spark, sf_dir, "events")
    routed = route(
        e,
        {
            "engagement": F.col("event_type").isin("click", "view"),
            "revenue": F.col("event_type") == "purchase",
            "growth": F.col("event_type") == "signup",
        },
        default="ops",
    )
    return routed.groupBy("dest").agg(
        F.count("*").alias("n"), F.count_distinct("user_id").alias("n_users")
    )


@q(
    "unpivot_measures",
    """
    SELECT measure, COUNT(*) AS n,
           CAST(SUM(CAST(val AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM (
      SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem)
    GROUP BY measure
    """,
)
def unpivot_measures(spark, sf_dir):
    """G7 — unpivot via stack() (the reference's 4-plan coverage
    pivot, beneficiary.py:134-142)."""
    l = _t(spark, sf_dir, "lineitem")
    unp = l.selectExpr(
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax) as (measure, val)"
    )
    return unp.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.sum(F.col("val").cast("decimal(12,2)")).cast("double").alias("total"),
    )


@q(
    "union_year_files",
    """
    SELECT tag, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM (
      SELECT 'open' AS tag, o_totalprice FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'filled', o_totalprice FROM orders WHERE o_orderstatus = 'F')
    GROUP BY tag
    """,
)
def union_year_files(spark, sf_dir):
    """S4 — tagged UNION ALL of per-period files (reference
    combine_beneficiary_files, FileControl.py:9-48)."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(
        F.lit("open").alias("tag"), "o_totalprice"
    )
    b = o.where(F.col("o_orderstatus") == "F").select(
        F.lit("filled").alias("tag"), "o_totalprice"
    )
    return (
        a.unionByName(b)
        .groupBy("tag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
        )
    )


@q(
    "scalar_suite",
    """
    SELECT o_orderkey,
      YEAR(CAST(o_orderdate AS DATE)) AS order_year,
      MONTH(CAST(o_orderdate AS DATE)) AS order_month,
      CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS next_month,
      CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
      DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
      LPAD(SPLIT_PART(o_orderpriority, '-', 1), 3, '0') AS prio_code,
      CONCAT_WS('-', o_orderstatus, SPLIT_PART(o_orderpriority, '-', 1)) AS status_key,
      GREATEST(o_totalprice, 1000.0) AS floored_price,
      COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved
    FROM orders
    """,
)
def scalar_suite(spark, sf_dir):
    """F1/F2/F6/F8/F10/F11/F12/F13 equivalents in one projection."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    prio = F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1))
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.add_months(d, 1).cast("string").alias("next_month"),
        F.last_day(d).cast("string").alias("eom"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("long").alias("days_to_y2k"),
        F.lpad(prio, 3, "0").alias("prio_code"),
        F.concat_ws("-", F.col("o_orderstatus"), prio).alias("status_key"),
        F.greatest(F.col("o_totalprice"), F.lit(1000.0)).alias("floored_price"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_resolved"
        ),
    )


# =====================================================================
# F. Training-data pipeline: documents
# =====================================================================

_NORM = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"


@q(
    "doc_exact_dedup",
    f"""
    WITH both_copies AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 100000, text FROM documents)
    SELECT MD5({_NORM}) AS fp, MIN(doc_id) AS keeper_id, COUNT(*) AS dup_count
    FROM both_copies
    GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def doc_exact_dedup(spark, sf_dir):
    """Exact dedup by normalized-content fingerprint.  The corpus has
    no natural dupes, so a shifted-id copy is unioned in (same on the
    oracle side) to exercise the group/keeper logic."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    both = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return (
        both.groupBy(X.fingerprint(F.col("text")).alias("fp"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


@q(
    "doc_fingerprint",
    f"SELECT doc_id, MD5({_NORM}) AS fp FROM documents",
)
def doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))


@q(
    "doc_token_stats",
    r"""
    SELECT doc_id,
      CASE WHEN trim(text) = '' THEN 0
           ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens,
      length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
      length(text) AS n_chars_actual
    FROM documents
    """,
)
def doc_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tokens"),
        X.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


@q(
    "doc_quality",
    r"""
    SELECT doc_id,
      ROUND(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / GREATEST(length(text), 1), 4) AS alpha_ratio,
      ROUND(length(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   t -> list_contains(['the','a','of','and','to','in','is','it','for','on'], t)))
            / GREATEST(length(string_split_regex(lower(trim(text)), '\s+')), 1), 4) AS stopword_ratio,
      ROUND(0.4 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / GREATEST(length(text), 1))
          + 0.3 * LEAST(length(text) / 500.0, 1.0)
          + 0.3 * LEAST((length(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> list_contains(['the','a','of','and','to','in','is','it','for','on'], t)))
                         / GREATEST(length(string_split_regex(lower(trim(text)), '\s+')), 1)) * 5, 1.0), 4) AS quality
    FROM documents
    """,
)
def doc_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(X.alpha_ratio(F.col("text")), 4).alias("alpha_ratio"),
        F.round(X.stopword_ratio(F.col("text")), 4).alias("stopword_ratio"),
        X.quality_score(F.col("text")).alias("quality"),
    )


@q(
    "doc_length_histogram",
    """
    SELECT lang,
           CAST(FLOOR(n_chars / 200) AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang, CAST(FLOOR(n_chars / 200) AS BIGINT)
    """,
)
def doc_length_histogram(spark, sf_dir):
    """Exact histogram/binning (corpus length profile per language) —
    the distribution-shape query every data-mixing report starts
    with.  Pure map-side binning + one hash agg; at 100 TB the
    output is O(langs × buckets), never O(docs)."""
    d = _t(spark, sf_dir, "documents")
    b = F.floor(F.col("n_chars") / 200).cast("long")
    return d.groupBy("lang", b.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


@q(
    "doc_length_quartiles",
    """
    WITH r AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents)
    SELECT lang,
           CAST(MAX(CASE WHEN rn = (n + 3) // 4     THEN n_chars END) AS BIGINT) AS q1_chars,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2     THEN n_chars END) AS BIGINT) AS median_chars,
           CAST(MAX(CASE WHEN rn = (3 * n + 1) // 4 THEN n_chars END) AS BIGINT) AS q3_chars
    FROM r GROUP BY lang
    """,
)
def doc_length_quartiles(spark, sf_dir):
    """EXACT rank-based quartiles per language (integer order
    statistics with a deterministic doc_id tie-break — no
    interpolation, so the value is cross-engine byte-exact, unlike
    percentile_approx sketches whose accuracy is asserted separately
    in tests/test_text_ops.py)."""
    d = _t(spark, sf_dir, "documents").select("lang", "n_chars", "doc_id")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    r = d.select(
        "lang", "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    pick = lambda expr: F.max(  # noqa: E731
        F.when(F.col("rn") == expr, F.col("n_chars"))
    ).cast("long")
    return r.groupBy("lang").agg(
        pick(F.floor((F.col("n") + 3) / 4)).alias("q1_chars"),
        pick(F.floor((F.col("n") + 1) / 2)).alias("median_chars"),
        pick(F.floor((3 * F.col("n") + 1) / 4)).alias("q3_chars"),
    )


def _winnow_oracle_sql(k: int = 5, w: int = 4, mod: int = 2_147_483_647, base: int = 257) -> str:
    pows = [base ** (k - 1 - j) for j in range(k)]
    pow_arr = ", ".join(str(p) for p in pows)
    return f"""
    WITH d AS (SELECT doc_id, lower(text) AS t,
                      greatest(length(lower(text)) - {k} + 1, 0) AS m
               FROM documents WHERE doc_id < 200),
    g AS (SELECT doc_id, m,
            CASE WHEN m > 0 THEN list_transform(range(1, m + 1), i ->
              CAST(list_sum(list_transform(range(0, {k}), j ->
                ord(substring(t, (i + j)::INT, 1)) * ([{pow_arr}])[j + 1])) AS BIGINT) % {mod})
            ELSE [] END AS grams
          FROM d),
    s AS (SELECT doc_id,
            CASE WHEN m > 0 THEN list_sort(list_distinct(
              list_transform(range(1, greatest(m - {w} + 1, 1) + 1), p ->
                list_min(grams[p : p + least({w}, m) - 1]))))
            ELSE [] END AS fps
          FROM g)
    SELECT doc_id, unnest(fps) AS fp FROM s
    """


@q("winnowing_fp", _winnow_oracle_sql())
def winnowing_fp(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing/MOSS): char
    k-gram polynomial hashes → per-window minima → distinct set, one
    row per (doc, fingerprint).  Exact-integer arithmetic chosen so
    DuckDB replays it bit-for-bit."""
    from etl_cms_spark.functions.text import winnowing_fingerprints

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id", F.explode(winnowing_fingerprints(F.col("text"))).alias("fp")
    )


@q(
    "doc_lang_id",
    r"""
    WITH scores AS (
      SELECT doc_id,
        length(regexp_extract_all(lower(text), '\b(der|und|das)\b')) AS s_de,
        length(regexp_extract_all(lower(text), '\b(the|and|of)\b')) AS s_en,
        length(regexp_extract_all(lower(text), '\b(el|que|los)\b')) AS s_es,
        length(regexp_extract_all(lower(text), '\b(le|et|les)\b')) AS s_fr
      FROM documents)
    SELECT doc_id,
      CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_fr THEN 'es'
           ELSE 'fr' END AS lang_pred
    FROM scores
    """,
)
def doc_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", X.lang_id(F.col("text")).alias("lang_pred"))


# =====================================================================
# G. Similarity / embeddings
# =====================================================================

_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot}) / (SQRT({na}) * SQRT({nb}))"


@q(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings
               WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings))
    SELECT vec_id, ROUND({_cos_sql('e.embedding', 'q.qv')}, 4) AS cos_sim
    FROM embeddings e CROSS JOIN q
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-k (the ANN correctness baseline);
    query = the lowest-id embedding."""
    from etl_cms_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    return cosine_topk(emb, "embedding", "vec_id", qv, k=10)


@q(
    "embedding_neardup_pairs",
    f"""
    WITH both_copies AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
      UNION ALL
      SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 300)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_cos_sql('a.embedding', 'b.embedding')}, 4) AS cos_sim
    FROM both_copies a JOIN both_copies b ON a.vec_id < b.vec_id
    WHERE ROUND({_cos_sql('a.embedding', 'b.embedding')}, 4) >= 0.95
    """,
)
def embedding_neardup_pairs(spark, sf_dir):
    """Embedding near-dup pairs via SRP-LSH banding (the scale path —
    no cross join; shuffle carries (id, band, bandhash) only), checked
    here against DuckDB's EXACT all-pairs SQL: the fixture's near-dups
    are identical copies, which LSH finds with probability 1 (identical
    signatures), so approximate recall cannot flap the gate.  Recall on
    non-identical near-dups is asserted in tests/test_similarity.py."""
    from etl_cms_spark.operators.similarity import srp_lsh_pairs

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300).select(
        "vec_id", "embedding"
    )
    both = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    return srp_lsh_pairs(both, "embedding", "vec_id", threshold=0.95)


@q(
    "ngram_jaccard_neardup",
    r"""
    WITH both_copies AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
      UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 300),
    toks AS (SELECT doc_id,
               CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(text), '\s+') END AS t
             FROM both_copies),
    sh AS (SELECT doc_id,
             list_distinct(CASE WHEN length(t) < 3 THEN []
               ELSE list_transform(range(1, length(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS shingles
           FROM toks),
    ex AS (SELECT doc_id, length(shingles) AS sz, unnest(shingles) AS s FROM sh),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b, ROUND(inter / (sz_a + sz_b - inter), 4) AS jaccard
    FROM pairs WHERE inter / (sz_a + sz_b - inter) >= 0.8
    """,
)
def ngram_jaccard_neardup(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs; the corpus has no natural
    dupes so a shifted-id copy is unioned in on both sides."""
    from etl_cms_spark.operators.textdedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    both = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return ngram_jaccard_pairs(both, "text", "doc_id", n=3, threshold=0.8)


def _minhash_portable_oracle_sql(n_hashes: int = 16, bands: int = 4, threshold: float = 0.8) -> str:
    from etl_cms_spark.operators.textdedup import _mh_coeffs

    rows_per_band = n_hashes // bands
    mins = ", ".join(
        f"coalesce(min(({a} * h + {b}) % 2147483647), 0) AS m{i}"
        for i, (a, b) in enumerate(_mh_coeffs(n_hashes))
    )
    band_conds = " OR ".join(
        "("
        + " AND ".join(
            f"a.m{bd * rows_per_band + j} = b.m{bd * rows_per_band + j}"
            for j in range(rows_per_band)
        )
        + ")"
        for bd in range(bands)
    )
    return rf"""
    WITH both_copies AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
      UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 300),
    toks AS (SELECT doc_id,
               CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(text), '\s+') END AS t
             FROM both_copies),
    sh AS (SELECT doc_id,
             list_distinct(CASE WHEN length(t) < 3 THEN []
               ELSE list_transform(range(1, length(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS shingles
           FROM toks),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    hs AS (SELECT doc_id,
             list_reduce(list_transform(range(1, length(s) + 1),
               c -> ord(substring(s, c::INT, 1))::BIGINT),
               (a, c) -> (a * 257 + c) % 2147483647) AS h
           FROM ex),
    sig AS (SELECT doc_id, {mins} FROM hs GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sig a JOIN sig b ON a.doc_id < b.doc_id
              WHERE {band_conds}),
    j AS (SELECT p.id_a, p.id_b,
                 len(list_intersect(sa.shingles, sb.shingles)) AS inter,
                 len(sa.shingles) + len(sb.shingles)
                   - len(list_intersect(sa.shingles, sb.shingles)) AS un
          FROM pairs p
          JOIN sh sa ON sa.doc_id = p.id_a
          JOIN sh sb ON sb.doc_id = p.id_b)
    SELECT id_a, id_b, ROUND(inter / greatest(un, 1), 4) AS jaccard
    FROM j WHERE ROUND(inter / greatest(un, 1), 4) >= {threshold}
    """


@q("minhash_lsh_portable", _minhash_portable_oracle_sql())
def minhash_lsh_portable(spark, sf_dir):
    """MinHash+LSH with the PORTABLE polynomial hash family — the
    entire LSH pipeline (signatures, band agreement, exact-jaccard
    verify) replayed independently in DuckDB, so the banding logic
    itself is oracle-checked (the xxhash64 variant below stays
    rows-only by construction)."""
    from etl_cms_spark.operators.textdedup import minhash_lsh_pairs_portable

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    both = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return minhash_lsh_pairs_portable(
        both, "text", "doc_id", n_hashes=16, bands=4, verify_threshold=0.8
    )


@q(
    "neardup_components",
    f"""
    WITH RECURSIVE
    edges AS (SELECT id_a, id_b FROM ({_minhash_portable_oracle_sql()})),
    sym AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b AS a, id_a AS b FROM edges),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT node AS doc_id, MIN(label) AS component_id,
           (node = MIN(label)) AS is_canonical
    FROM reach GROUP BY node
    """,
)
def neardup_components(spark, sf_dir):
    """Dedup GROUPS from near-dup pairs (round 4): portable MinHash
    LSH edges → iterative min-label-propagation connected components
    → one canonical survivor per group (min doc id — deterministic
    across replays AND engines; the oracle computes the same
    components via a recursive-CTE transitive closure over the same
    portable pairs).  The step a 100 TB dedup pipeline runs between
    pair generation and corpus filtering; per round it is one
    hash-join + one min-agg, lineage pinned per round, rounds =
    component diameter."""
    from etl_cms_spark.operators.graph import dedup_groups
    from etl_cms_spark.operators.textdedup import minhash_lsh_pairs_portable

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    both = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    pairs = minhash_lsh_pairs_portable(
        both, "text", "doc_id", n_hashes=16, bands=4, verify_threshold=0.8
    )
    return dedup_groups(pairs)


@q(
    "neardup_components_star",
    f"""
    WITH RECURSIVE
    edges AS (SELECT id_a, id_b FROM ({_minhash_portable_oracle_sql()})),
    sym AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b AS a, id_a AS b FROM edges),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT node AS doc_id, MIN(label) AS component_id,
           (node = MIN(label)) AS is_canonical
    FROM reach GROUP BY node
    """,
)
def neardup_components_star(spark, sf_dir):
    """Same dedup groups, computed by the ALTERNATING STAR CONTRACTION
    variant (large-star/small-star, Kiveris et al. SoCC'14) whose
    round count is O(log n) regardless of component DIAMETER — the
    safe algorithm when near-dup chains (overlapping shingle drift)
    stretch components into paths that would starve min-label
    propagation.  Oracle: the identical recursive-CTE transitive
    closure as ``neardup_components`` — both algorithms must land on
    the same min-id labeling; property tests additionally pin them
    equal on random graphs and on a 30-edge path where min-label's
    bounded loop correctly raises (tests/test_graph.py)."""
    from etl_cms_spark.operators.graph import dedup_groups
    from etl_cms_spark.operators.textdedup import minhash_lsh_pairs_portable

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    both = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    pairs = minhash_lsh_pairs_portable(
        both, "text", "doc_id", n_hashes=16, bands=4, verify_threshold=0.8
    )
    return dedup_groups(pairs, algorithm="star")


@q(
    "corpus_dedup_filtered",
    f"""
    WITH RECURSIVE
    both_copies AS (
      SELECT doc_id FROM documents WHERE doc_id < 300
      UNION ALL SELECT doc_id + 100000 FROM documents WHERE doc_id < 300),
    edges AS (SELECT id_a, id_b FROM ({_minhash_portable_oracle_sql()})),
    sym AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b AS a, id_a AS b FROM edges),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
    ),
    drop_set AS (
      SELECT node AS doc_id FROM reach GROUP BY node
      HAVING node <> MIN(label)
    )
    SELECT b.doc_id FROM both_copies b
    LEFT JOIN drop_set d ON b.doc_id = d.doc_id
    WHERE d.doc_id IS NULL
    """,
)
def corpus_dedup_filtered(spark, sf_dir):
    """The dedup chain END TO END — the corpus a training run would
    actually consume: MinHash-LSH pairs → connected components → drop
    every non-canonical group member, keep canonical survivors AND
    edge-free uniques.  One anti-join against the (small) drop set;
    the corpus side never shuffles."""
    from etl_cms_spark.operators.graph import dedup_groups
    from etl_cms_spark.operators.textdedup import minhash_lsh_pairs_portable

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    both = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    pairs = minhash_lsh_pairs_portable(
        both, "text", "doc_id", n_hashes=16, bands=4, verify_threshold=0.8
    )
    drop = dedup_groups(pairs).where(~F.col("is_canonical")).select("doc_id")
    return both.select("doc_id").join(F.broadcast(drop), "doc_id", "left_anti")


# ---- non-SQL-expressible ops (driver records rows-only checks) ----

@q(
    "minhash_lsh_neardup",
    r"""
    WITH both_copies AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
      UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 300),
    bands AS (SELECT * FROM read_parquet('/tmp/spark_graft_stage/minhash_bands/*.parquet')),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
    toks AS (SELECT doc_id,
               CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(text), '\s+') END AS t
             FROM both_copies),
    sh AS (SELECT doc_id,
             list_distinct(CASE WHEN length(t) < 3 THEN []
               ELSE list_transform(range(1, length(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS shingles
           FROM toks),
    j AS (SELECT c.id_a, c.id_b,
                 length(list_intersect(a.shingles, b.shingles)) AS inter,
                 length(a.shingles) AS sza, length(b.shingles) AS szb
          FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b)
    SELECT id_a, id_b,
           ROUND(inter / GREATEST(sza + szb - inter, 1), 4) AS jaccard
    FROM j WHERE inter / GREATEST(sza + szb - inter, 1) >= 0.8
    """,
)
def minhash_lsh_neardup(spark, sf_dir):
    """MinHash+LSH near-dup pairs (xxhash64 signatures).  The
    signatures themselves aren't DuckDB-expressible, so the Spark side
    STAGES its band keys (raw signature-slice strings, pre-hash) and
    the oracle replays the rest of the pipeline from them: band-bucket
    candidate join + exact 3-gram Jaccard verification from the
    documents text.  The portable-hash twin ``minhash_lsh_portable``
    oracle-checks the signature math itself; lsh ⊆ exact is
    pytest-proven (tests/test_text_ops.py)."""
    from etl_cms_spark.operators.textdedup import minhash_lsh_pairs, minhash_signatures

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    both = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    sigs = minhash_signatures(both, "text", "doc_id", n_hashes=16, shingle_n=3)
    _stage(
        sigs.select(
            F.col("_id").alias("doc_id"),
            F.posexplode(
                F.array(
                    *[
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at(F.col("_sig"), b * 4 + j + 1).cast("string")
                                for j in range(4)
                            ],
                        )
                        for b in range(4)
                    ]
                )
            ).alias("band", "bval"),
        ),
        "minhash_bands",
    )
    return minhash_lsh_pairs(both, "text", "doc_id", n_hashes=16, bands=4, verify_threshold=0.8)


@q(
    "simhash_clusters",
    """
    SELECT simhash, MIN(doc_id) AS keeper_id, COUNT(*) AS cluster_size
    FROM read_parquet('/tmp/spark_graft_stage/simhash_sigs_16/*.parquet')
    GROUP BY simhash HAVING COUNT(*) > 1
    """,
)
def simhash_clusters_q(spark, sf_dir):
    """Identical-SimHash clusters.  The 16-bit xxhash64 SimHash is
    staged per doc; the oracle replays the clustering (group by hash,
    min-id keeper, size>1) over the staged signatures."""
    from etl_cms_spark.operators.textdedup import simhash, simhash_clusters

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    both = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    _stage(
        both.select("doc_id", simhash(F.col("text"), 16).alias("simhash")),
        "simhash_sigs_16",
    )
    return simhash_clusters(both, "text", "doc_id")


def _simhash_band_conds(a: str, b: str, bits: int = 32, max_hamming: int = 3) -> str:
    n_bands = max_hamming + 1
    bounds = [round(i * bits / n_bands) for i in range(n_bands + 1)]
    return " OR ".join(
        f"(({a} >> {bounds[i]}) % {1 << (bounds[i + 1] - bounds[i])}"
        f" = ({b} >> {bounds[i]}) % {1 << (bounds[i + 1] - bounds[i])})"
        for i in range(n_bands)
    )


@q(
    "simhash_neardup",
    f"""
    WITH sig AS (SELECT doc_id, simhash
                 FROM read_parquet('/tmp/spark_graft_stage/simhash_sigs_32/*.parquet'))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE ({_simhash_band_conds('a.simhash', 'b.simhash')})
      AND bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def simhash_neardup_q(spark, sf_dir):
    """SimHash hamming-ball near-dup pairs via pigeonhole banding.
    The 32-bit xxhash64 SimHash is staged per doc; the oracle replays
    the banding (bit-slice agreement) and the hamming verify over the
    staged signatures.  The portable twin ``simhash_portable``
    oracle-checks the signature math; banding == brute-force hamming
    is pytest-proven (tests/test_text_ops.py)."""
    from etl_cms_spark.operators.textdedup import simhash, simhash_neardup_pairs

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    both = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
        )
    )
    _stage(
        both.select("doc_id", simhash(F.col("text"), 32).alias("simhash")),
        "simhash_sigs_32",
    )
    return simhash_neardup_pairs(both, "text", "doc_id", bits=32, max_hamming=3)


_STAGE_DIR = "/tmp/spark_graft_stage"
_IVF_STAGE = f"{_STAGE_DIR}/ann_ivf_candidates"


def _stage(df: DataFrame, name: str) -> None:
    """Write a small Spark-computed intermediate (signatures, band
    keys, candidate sets) where the DuckDB oracle can scan it.  This
    is how the xxhash64-based operators get real oracles: the
    data-derived part DuckDB cannot replay (xxhash64 signatures,
    k-means centroids) is staged as an INPUT, and the protocol around
    it — banding, candidate joins, hamming/jaccard verification,
    grouping, top-k — is replayed and hash-compared in SQL."""
    os.makedirs(_STAGE_DIR, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{_STAGE_DIR}/{name}")


@q(
    "ann_ivf_topk",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings
               WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings))
    SELECT c.vec_id, ROUND({_cos_sql('c.vec', 'q.qv')}, 4) AS cos_sim
    FROM read_parquet('{_IVF_STAGE}/*.parquet') c CROSS JOIN q
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed approximate ANN (scale path).  The k-means
    centroids are data-derived (DuckDB cannot replay them), so the
    oracle checks the probe protocol instead: the callable stages the
    probed cells' rows — the exact candidate set the partition-pruned
    scan reads — as parquet, and the oracle computes exact cosine
    top-k over that staged candidate set.  This certifies the scoring,
    rounding, tie-break, and that the returned top-k really is the
    best of the probed cells; recall of the cell selection itself is
    pytest-proven (tests/test_similarity.py)."""
    import shutil

    from etl_cms_spark.operators.similarity import IVFIndex, _cos_py

    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    os.makedirs("/tmp/spark_graft_stage", exist_ok=True)
    idx_path = "/tmp/spark_graft_stage/ann_ivf_index"
    shutil.rmtree(idx_path, ignore_errors=True)
    idx = IVFIndex.build(emb, "embedding", "vec_id", idx_path, n_cells=16)
    probe = sorted(range(idx.n_cells), key=lambda ci: (-_cos_py(idx.centroids[ci], qv), ci))[:4]
    (
        spark.read.parquet(idx_path)
        .where(F.col("cell").isin(probe))
        .select("vec_id", "vec")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(_IVF_STAGE)
    )
    return idx.topk(qv, k=10, n_probes=4)


@q(
    "media_feature_extract",
    """
    WITH m AS (SELECT doc_id AS media_id, sha256(text) AS h,
                      text IS NOT NULL AS decode_ok
               FROM documents WHERE doc_id < 200)
    SELECT media_id, decode_ok,
      array_to_string(list_transform(range(0, 8), i ->
        (strpos('0123456789abcdef', substring(h, 2*i+1, 1)) - 1) * 16
        + strpos('0123456789abcdef', substring(h, 2*i+2, 1)) - 1), ',') AS feature_bytes
    FROM m
    """,
)
def media_feature_extract(spark, sf_dir):
    """Multimodal plumbing: binary payloads → mapInPandas feature
    extraction (decode stubbed deterministically: feature[i] =
    sha256(payload)[i] / 255, which DuckDB can replay exactly via
    hex-digit math).  The array<float> is projected to an int-csv so
    the driver's canonicalizer can hash it (round(f*255) recovers the
    byte exactly — float32 eps ≪ 0.5)."""
    from etl_cms_spark.operators.multimodal import extract_features, synthesize_media

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = synthesize_media(d, "doc_id", "text")
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "decode_ok",
        F.concat_ws(
            ",",
            F.transform("feature", lambda x: F.round(x * 255).cast("int").cast("string")),
        ).alias("feature_bytes"),
    )


def _oracle_changelog_sql() -> str:
    """The flagship changelog as DuckDB SQL — the exact dual of
    ``_changelog_from_documents`` below (same modulo math, same sha256
    strings), so the oracle can replay the pipeline end to end."""
    from etl_cms_spark.fixtures.generator import LANG_VOCAB

    langs = ", ".join(f"'{x}'" for x in LANG_VOCAB)
    return f"""
      SELECT (doc_id * 2 + 1) AS lsn,
             CASE WHEN doc_id % 20 = 19 THEN 'D' ELSE 'U' END AS op,
             'repo-' || lpad(((doc_id % 150) % 12)::VARCHAR, 3, '0') AS repo,
             'src/f' || (doc_id % 150)::VARCHAR || '.txt' AS path,
             CASE WHEN doc_id % 20 = 19 THEN NULL
                  ELSE substring(sha256((doc_id % 150)::VARCHAR || ':' || (doc_id * 2 + 1)::VARCHAR), 1, 40) END AS commit,
             CASE WHEN doc_id % 20 = 19 THEN NULL
                  ELSE ([{langs}])[(doc_id % 30)::INT + 1] END AS lang,
             CASE WHEN doc_id % 20 = 19 THEN NULL ELSE text END AS content
      FROM documents
    """


def _concept_dim_sql() -> str:
    from etl_cms_spark.plans.mapping import CONCEPT_MAP

    vals = ", ".join(
        f"('{lang}', {cid}, '{dom}')" for lang, (cid, dom) in sorted(CONCEPT_MAP.items())
    )
    return f"(VALUES {vals}) AS dim(lang, concept_id, domain)"


def _changelog_from_documents(spark, sf_dir):
    """Deterministic CDC changelog derived from the documents table
    with DuckDB-expressible arithmetic only (event i = doc i; key =
    doc_id % 150; ~1/20 deletes; lang rotates per-event so a key's
    mapping can change across versions)."""
    from etl_cms_spark.fixtures.generator import LANG_VOCAB

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id").cast("long")
    key_id = F.pmod(i, F.lit(150))
    lsn = (i * 2 + 1).cast("long")
    is_del = F.pmod(i, F.lit(20)) == 19
    lang_arr = F.array(*[F.lit(x) for x in LANG_VOCAB])
    nn = lambda c: F.when(is_del, F.lit(None)).otherwise(c)  # noqa: E731
    return d.select(
        lsn.alias("lsn"),
        F.when(is_del, "D").otherwise("U").alias("op"),
        F.concat(
            F.lit("repo-"), F.lpad(F.pmod(key_id, F.lit(12)).cast("string"), 3, "0")
        ).alias("repo"),
        F.concat(F.lit("src/f"), key_id.cast("string"), F.lit(".txt")).alias("path"),
        nn(
            F.substring(
                F.sha2(F.concat(key_id.cast("string"), F.lit(":"), lsn.cast("string")), 256),
                1,
                40,
            )
        ).alias("commit"),
        nn(F.element_at(lang_arr, (F.pmod(i, F.lit(30)) + 1).cast("int"))).alias("lang"),
        nn(F.col("text")).alias("content"),
    )


@q(
    "media_frame_sample",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             length(text) % 300 AS n_frames
      FROM documents WHERE doc_id < 300)
    SELECT media_id, unnest(range(0, greatest(n_frames - 1, 0) + 1, 30)) AS frame_idx
    FROM m WHERE kind = 'video'
    """,
)
def media_frame_sample(spark, sf_dir):
    """Multimodal frame sampling: one row per sampled frame index of
    each video (explode over a stride sequence — fan-out sizing is
    plan-visible, no decode needed)."""
    from etl_cms_spark.operators.multimodal import frame_sample, synthesize_media

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    media = synthesize_media(d, "doc_id", "text")
    return frame_sample(media, every_nth=30).select(
        "media_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


@q(
    "lake_tombstone_horizon",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def lake_tombstone_horizon(spark, sf_dir):
    """Bounded tombstone retention (sink/lake.LakeTable.compact
    ``expire_tombstones_below=L`` — Kafka compaction's
    delete.retention / Iceberg delete-file expiry): delete markers
    below the replay horizon are physically dropped during
    compaction, younger ones kept to guard out-of-order sources.
    The query runs the flagship pipeline, expires at a mid-stream
    horizon (asserting markers actually fell on BOTH sides of it),
    and returns the state — retention must be invisible to the
    latest-wins oracle."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_tsgc_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8, merge_mode="mor")
        p.run(changes, n_epochs=2)
        ts = p.table.tombstone_stats().collect()
        assert ts, "fixture produces deletes"
        lo = min(r["min_lsn"] for r in ts)
        hi = max(r["max_lsn"] for r in ts)
        horizon = (lo + hi) // 2 + 1
        assert lo < horizon <= hi, (lo, horizon, hi)
        p.table.compact(expire_tombstones_below=horizon)
        raw = p.table.read_raw().where(F.col("_deleted"))
        assert raw.where(F.col("_lsn") < horizon).count() == 0
        assert raw.where(F.col("_lsn") >= horizon).count() > 0
        return p.current_state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_dml_epoch",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content, dim.concept_id,
           CASE WHEN l.lang = 'rust' THEN 'redacted' ELSE dim.domain END AS domain,
           sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    WHERE l.lang <> 'go'
    """,
)
def lake_dml_epoch(spark, sf_dir):
    """Ad-hoc bulk DML as one more change epoch (sink/lake.LakeTable
    .delete_where / .update_where — the `DELETE FROM ... WHERE` /
    `UPDATE ... SET ... WHERE` admin surface: retention, GDPR erasure,
    backfill corrections).  Victims are found through the stats-pruned
    read plan, stamped with an LSN above every committed change, and
    merged through the ordinary idempotent epoch commit — so DML
    replays exactly-once, flows into CDC-out for downstream views, and
    respects time travel.  The query runs the flagship pipeline, then
    `DELETE WHERE lang='go'` and `UPDATE SET domain='redacted' WHERE
    lang='rust'`; the oracle applies the same filter/rewrite on top of
    the one-pass latest-wins SQL."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_dml_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.run(changes, n_epochs=2)
        rec = p.table.delete_where({"lang": ("go", "go")})
        assert rec["rows_deleted"] > 0, "fixture maps go rows"
        p.table.update_where(
            {"domain": "redacted"}, {"lang": ("rust", "rust")}
        )
        cols = [
            "repo", "path", "commit", "lang", "content",
            "concept_id", "domain", "content_sha",
        ]
        return p.table.read().select(*cols).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "cdc_bootstrap_handoff",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def cdc_bootstrap_handoff(spark, sf_dir):
    """Initial-snapshot bootstrap → OVERLAPPING changelog-tail handoff
    (plans/pipeline.CDCPipeline.bootstrap — Debezium's
    snapshot-then-stream cutover; the reference's one-shot full load
    made resumable).  The engine loads a source-image snapshot
    consistent as of watermark W (latest pre-W row per key, pre-W
    deletes absent), then replays a tail that REACHES BACK BEFORE W —
    the checkpointed watermark gate must drop the overlap (an ungated
    replay would resurrect pre-snapshot deletes from their older
    upserts).  The oracle is the same one-pass latest-wins SQL over
    the WHOLE changelog: a correct handoff is indistinguishable from
    a pure replay."""
    import shutil
    import tempfile

    from etl_cms_spark.operators.dedup import latest_by_lsn
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    w = int(changes.agg(F.max("lsn")).first()[0]) // 2
    snap = (
        latest_by_lsn(changes.where(F.col("lsn") <= w), ["repo", "path"], "lsn")
        .where(F.col("op") != "D")
        .drop("lsn", "op")
    )
    root = tempfile.mkdtemp(prefix="cdc_boot_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.bootstrap(snap, w)
        p.run(changes.where(F.col("lsn") > w // 2), n_epochs=2)
        return p.current_state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "cdc_pipeline_state",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def cdc_pipeline_state(spark, sf_dir):
    """End-to-end CDC flagship: deterministic changelog → epoch loop →
    exactly-once merged lake state.  The DuckDB oracle replays the
    same changelog in one SQL pass (max-LSN per key via ROW_NUMBER,
    drop deletes, broadcast dim join, drop unmapped, sha256 content) —
    so the multi-epoch merge + tombstone + quarantine machinery is
    verified against an independent engine."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_entry_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.run(changes, n_epochs=2)
        return p.current_state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "cdc_pipeline_auto",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def cdc_pipeline_auto(spark, sf_dir):
    """The flagship pipeline under ``dedup_mode="auto"`` — the
    per-epoch resolver picks the dedup form from measured signals
    (plans/pipeline._resolve_dedup_mode: hot-key row budget →
    salted, small batch → broadcast-semi, cluster shape → join,
    else window).  At driver scale the batches fit the broadcast
    budget, so this drives the broadcast-resolved path through the
    full epoch/merge loop; the oracle is the SAME one-pass
    latest-wins SQL as ``cdc_pipeline_state`` — resolution must be
    invisible in the final state."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_auto_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8, dedup_mode="auto")
        recs = p.run(changes, n_epochs=2)
        assert all("dedup_auto" in r for r in recs)
        return p.current_state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "cdc_txn_boundary",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def cdc_txn_boundary(spark, sf_dir):
    """TRANSACTION-BOUNDARY-ALIGNED epoch slicing (``CDCPipeline(
    txn_col=...)``, plans/pipeline._epoch_ids): every row of a source
    transaction lands in the epoch of its COMMIT (max) LSN, so no
    epoch boundary splits a transaction and no committed snapshot
    shows a half-applied one — the binlog atomicity contract Debezium
    surfaces as transaction-boundary events (tests/test_txn_boundary
    pins the mid-epoch visibility semantics by hand).  Transaction
    ids here group ~4 consecutive events, deliberately spanning the
    epoch cuts; the oracle is the SAME one-pass latest-wins SQL as
    ``cdc_pipeline_state`` — commit-LSN assignment must be INVISIBLE
    in the converged state."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir).withColumn(
        "txn_id", F.concat(F.lit("t"), F.floor(F.col("lsn") / 8).cast("string"))
    )
    root = tempfile.mkdtemp(prefix="cdc_txn_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8, txn_col="txn_id")
        p.run(changes, n_epochs=3)
        return p.current_state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "cdc_demux_wap_state",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def cdc_demux_wap_state(spark, sf_dir):
    """MULTI-TABLE write-audit-publish (plans/pipeline.
    StagedEpochGroup): the flagship demux pipeline runs under an
    epoch_audit that REJECTS epoch 1 on its first offering — the
    verdict retracts the staged epoch from the main table AND every
    domain sink atomically, quarantines the whole batch, and the
    repair flow re-offers it (original LSNs) through the same gate.
    The result is the UNION of the per-domain destination tables; the
    oracle is the one-pass latest-wins SQL over the full changelog —
    i.e. the reject + multi-table retraction + repair round-trip must
    be INVISIBLE in the converged routed state (nothing lost from the
    rejected epoch, nothing duplicated by the repair, every row in
    exactly its domain's table)."""
    import shutil
    import tempfile
    from functools import reduce

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_mwap_")
    try:
        first_offer = set()

        def audit(gate):
            # multi-table audit surface: per-domain staged detail is
            # visible before anything commits.
            assert "domains" in gate.summary()
            if gate.epoch == 1 and 1 not in first_offer:
                first_offer.add(1)
                return False
            return True

        p = CDCPipeline(
            spark, root, n_buckets=8, demux_domains=True, epoch_audit=audit
        )
        recs = p.run(changes, n_epochs=2)
        assert recs[1].get("audit_rejected")
        p.reprocess_quarantine(1, -1)
        routed = reduce(
            lambda a, b: a.unionByName(b),
            [t.read() for _, t in sorted(p.domain_tables.items())],
        )
        cols = [
            "repo", "path", "commit", "lang", "content",
            "concept_id", "domain", "content_sha",
        ]
        return routed.select(*cols).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "debezium_roundtrip",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def debezium_roundtrip(spark, sf_dir):
    """CDC round-trip closure: the flagship pipeline's lake exports
    each epoch's diff as Debezium envelopes (``changes_for_epoch`` →
    ``to_debezium``, source.lsn = the epoch's snapshot version), a
    SECOND table ingests them back through ``from_debezium`` +
    ``merge_epoch`` — and the copy must equal the one-pass
    latest-wins SQL over the ORIGINAL changelog.  The wire format is
    lossless in both directions: out (diff → envelope) and in
    (envelope → flat changelog), including deletes (keys ride the
    before-image only, Debezium's shape)."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline
    from etl_cms_spark.sink.lake import LakeTable
    from etl_cms_spark.sources.envelopes import from_debezium, to_debezium

    changes = _changelog_from_documents(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="cdc_dbzrt_")
    try:
        p = CDCPipeline(
            spark, os.path.join(base, "a"), n_buckets=8, merge_mode="mor"
        )
        p.run(changes, n_epochs=2)
        key_cols = ["repo", "path"]
        copy = LakeTable(
            spark, os.path.join(base, "b"), n_buckets=8, merge_mode="mor"
        )
        copy.create(key_cols, p.table.schema())
        for rec in p.table.lineage():
            env = to_debezium(
                p.table.changes_for_epoch(int(rec["epoch"])),
                key_cols,
                lsn=int(rec["snapshot_version"]),
            )
            copy.merge_epoch(from_debezium(env, key_cols), int(rec["epoch"]))
        cols = [
            "repo", "path", "commit", "lang", "content",
            "concept_id", "domain", "content_sha",
        ]
        return copy.read().select(*cols).localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q(
    "lake_time_travel",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    b AS (SELECT MIN(lsn) AS lo, MAX(lsn) AS hi FROM ch),
    w AS (SELECT lo, GREATEST(1, (hi - lo + 2) // 2) AS width FROM b),
    prefix AS (SELECT ch.* FROM ch, w WHERE ch.lsn < w.lo + w.width),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM prefix),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def lake_time_travel(spark, sf_dir):
    """TIME TRAVEL: after the full 2-epoch run, ``read_at`` the
    snapshot version epoch 0 committed — the result must equal the
    latest-wins SQL over ONLY epoch 0's LSN slice (the oracle
    recomputes the historical state from the raw changelog; epoch 1's
    updates, deletes and re-creates must all be invisible).  Snapshot
    manifests are immutable, so this is a pure manifest pin — no
    copy, no restore."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_tt_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.run(changes, n_epochs=2)
        v0 = next(
            int(r["snapshot_version"])
            for r in p.table.lineage()
            if int(r["epoch"]) == 0
        )
        return p.table.read_at(v0).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "cdc_lineage_metrics",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    b AS (SELECT MIN(lsn) AS lo, MAX(lsn) AS hi FROM ch),
    w AS (SELECT lo, hi, GREATEST(1, (hi - lo + 2) // 2) AS width FROM b),
    sliced AS (
      SELECT ch.*, CAST((ch.lsn - w.lo) // w.width AS INT) AS epoch
      FROM ch, w),
    winners AS (
      SELECT * FROM (
        SELECT s.*, ROW_NUMBER() OVER (
          PARTITION BY epoch, repo, path ORDER BY lsn DESC) AS rn
        FROM sliced s) x
      WHERE rn = 1),
    flagged AS (
      SELECT wi.epoch, wi.lsn,
             (dim.lang IS NULL AND wi.op <> 'D') AS quar,
             (wi.op = 'D' OR dim.lang IS NULL) AS del
      FROM winners wi LEFT JOIN {_concept_dim_sql()} ON wi.lang = dim.lang)
    SELECT epoch,
           CAST(SUM(CASE WHEN NOT del THEN 1 ELSE 0 END) AS BIGINT) AS rows_upserted,
           CAST(SUM(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT) AS rows_deleted,
           CAST(SUM(CASE WHEN quar THEN 1 ELSE 0 END) AS BIGINT) AS rows_quarantined,
           MIN(lsn) AS lsn_min, MAX(lsn) AS lsn_max
    FROM flagged GROUP BY epoch
    """,
)
def cdc_lineage_metrics(spark, sf_dir):
    """LINEAGE AS DATA: the per-epoch lineage/metrics records the
    engine emits (the north rule's 'per-partition lineage + metrics
    each epoch') — epoch id, rows applied/deleted/quarantined, source
    LSN range — returned as a DataFrame and verified EXTERNALLY: the
    DuckDB oracle recomputes every number from the raw changelog alone
    (same ceil-width LSN slicing as ``run()``, per-epoch latest-wins,
    unmapped-upsert→tombstone conversion).  This turns the engine's
    bookkeeping arithmetic — not just its data plane — into an
    oracle-checked surface, the analogue of the reference's
    records_read/records_written FileControl accounting
    (FileControl.py:255-259)."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_lineage_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.run(changes, n_epochs=2)
        rows = [
            (
                int(r["epoch"]),
                int(r["rows_upserted"]),
                int(r["rows_deleted"]),
                int(r.get("rows_quarantined", 0)),
                int(r["lsn_min"]),
                int(r["lsn_max"]),
            )
            for r in p.table.lineage()
        ]
        return spark.createDataFrame(
            rows,
            "epoch int, rows_upserted long, rows_deleted long, "
            "rows_quarantined long, lsn_min long, lsn_max long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_drop_column",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    b AS (SELECT MIN(lsn) AS lo, MAX(lsn) AS hi FROM ch),
    w AS (SELECT lo + GREATEST(1, (hi - lo + 2) // 2) AS boundary FROM b),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path,
           CASE WHEN l.lsn >= w.boundary THEN l.commit END AS commit,
           l.lang, l.content, dim.concept_id, dim.domain,
           sha256(l.content) AS content_sha
    FROM latest l CROSS JOIN w JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def lake_drop_column(spark, sf_dir):
    """DROP-COLUMN schema evolution, oracle-checked end to end: the
    changelog carries a ``{{"drop": "commit"}}`` then ``{{"add":
    "commit:string"}}`` SCHEMA event pair at the epoch-1 boundary.
    The drop is metadata-only (sink/lake.py:apply_schema_change) —
    every physical spelling of the column is version-stamped into the
    manifest's ``dropped`` map and hidden from older write groups —
    so the re-added column must read NULL for keys whose winning
    upsert predates the drop and real values for epoch-1 winners.
    The DuckDB oracle expresses exactly that: commit is NULLed for
    winners below the epoch boundary, kept at/above it."""
    import shutil
    import tempfile

    from etl_cms_spark.fixtures.generator import gen_schema_events
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir).withColumn(
        "schema_change", F.lit(None).cast("string")
    )
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    boundary = lo + max(1, (hi - lo + 2) // 2)
    # data lsns are odd (2*doc_id+1): even event lsns inside epoch 1
    # collide with nothing and leave the lo/hi epoch split unchanged.
    drop_lsn = boundary if boundary % 2 == 0 else boundary + 1
    sev = gen_schema_events(
        spark,
        {drop_lsn: '{"drop": "commit"}', drop_lsn + 2: '{"add": "commit:string"}'},
    ).drop("ts")
    root = tempfile.mkdtemp(prefix="cdc_drop_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.run(changes.unionByName(sev), n_epochs=2)
        return p.current_state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_tag_retention",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    b AS (SELECT MIN(lsn) AS lo, MAX(lsn) AS hi FROM ch),
    w AS (SELECT lo, GREATEST(1, (hi - lo + 2) // 2) AS width FROM b),
    prefix AS (SELECT ch.* FROM ch, w WHERE ch.lsn < w.lo + w.width),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM prefix),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def lake_tag_retention(spark, sf_dir):
    """TAG RETENTION (sink/lake.py:tag/vacuum): epoch 0's snapshot is
    tagged, then ``vacuum(keep_last=1)`` expires every untagged
    historical version — and the tagged read must STILL equal the
    latest-wins SQL over epoch 0's LSN slice (same oracle as
    ``lake_time_travel``, but here the snapshot survives GC only
    because the tag pins its manifest and data dirs).  This is the
    operational half of time travel: an audit/release pin that
    routine snapshot expiry cannot silently reclaim."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_tag_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.run(changes, n_epochs=2)
        v0 = next(
            int(r["snapshot_version"])
            for r in p.table.lineage()
            if int(r["epoch"]) == 0
        )
        p.table.tag("audit-epoch0", v0)
        p.table.vacuum(keep_last=1)
        return p.table.read_tag("audit-epoch0").localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_files_metadata",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    keys AS (SELECT DISTINCT repo, path FROM ch)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(repo) AS min_repo, MAX(repo) AS max_repo
    FROM keys
    """,
)
def lake_files_metadata(spark, sf_dir):
    """METADATA TABLES (sink/lake.py:files_df — the Iceberg ``files``
    metadata-table analogue): after the flagship CoW run, the file
    listing comes from the manifest and per-file parquet FOOTER stats
    (row counts, leading-key min/max) are read executor-side via
    mapInPandas.  The oracle recomputes the invariants from the raw
    changelog alone: a CoW snapshot holds exactly one physical row per
    distinct key ever seen (live rows + persisted tombstones), so
    sum(footer row_count) == COUNT(DISTINCT key) and the global footer
    key-range equals the true key range.  This checks the METADATA
    layer — what query planning would prune on — not just the data."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_files_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.run(changes, n_epochs=2)
        return (
            p.table.files_df()
            .agg(
                F.sum("row_count").alias("n_rows"),
                F.min("key_min").alias("min_repo"),
                F.max("key_max").alias("max_repo"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_changelog_chain",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def lake_changelog_chain(spark, sf_dir):
    """PIPELINE CHAINING through the ``lake_changelog`` streaming
    source (sources/lakestream.py — Spark-4 Python DataSource API):
    the flagship pipeline ingests into an upstream MoR lake, a
    Structured Streaming query tails that lake's epoch commits as a
    changelog (offsets = snapshot versions, partitions = the epochs'
    delta bucket dirs, read executor-side with pyarrow), and
    foreachBatch merges each micro-batch into a DOWNSTREAM table.
    The result is the downstream state; the oracle is the one-pass
    latest-wins SQL over the original changelog — the entire
    upstream-merge → stream → downstream-merge transport must be
    lossless and duplicate-free."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline
    from etl_cms_spark.sink.lake import LakeTable
    from etl_cms_spark.sources.lakestream import LakeChangelogDataSource

    changes = _changelog_from_documents(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="cdc_chain_")
    try:
        up = CDCPipeline(
            spark, os.path.join(base, "up"), n_buckets=8, merge_mode="mor"
        )
        up.run(changes, n_epochs=2)
        down = LakeTable(
            spark, os.path.join(base, "down"), n_buckets=8, merge_mode="mor"
        )
        down.create(["repo", "path"], up.table.schema())
        spark.dataSource.register(LakeChangelogDataSource)
        q_ = (
            spark.readStream.format("lake_changelog")
            .option("path", up.table.root).load()
            .writeStream.foreachBatch(lambda df, bid: down.merge_epoch(df, bid))
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True).start()
        )
        q_.awaitTermination(300)
        cols = [
            "repo", "path", "commit", "lang", "content",
            "concept_id", "domain", "content_sha",
        ]
        return down.read().select(*cols).localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q(
    "lake_concurrent_commits",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT repo, path, commit, lang, content FROM latest
    """,
)
def lake_concurrent_commits(spark, sf_dir):
    """Optimistic-concurrency commit (the Iceberg-catalog CAS model,
    sink/lake.py): two writers race ONE MoR table — writer B commits
    its epoch BETWEEN writer A's delta write and manifest swap, so
    A's parent snapshot is stale and A must take the reserve/rebase
    path instead of a last-writer-wins CURRENT swap (which would
    silently DROP one epoch).  The oracle replays the full changelog
    serially in one latest-wins SQL pass: the race must be invisible
    in the final state — no lost update, no duplicate."""
    import shutil
    import tempfile

    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    e1 = changes.where(F.col("lsn") <= mid)
    e2 = changes.where(F.col("lsn") > mid)
    root = tempfile.mkdtemp(prefix="cdc_occ_")
    try:
        tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
        tb.create(
            ["repo", "path"],
            {"repo": "string", "path": "string", "commit": "string",
             "lang": "string", "content": "string"},
        )

        class _RacingTable(LakeTable):
            """Writer A: deterministically loses the commit race —
            writer B's merge runs at A's first commit attempt."""

            _fired = False

            def _commit_manifest(self, manifest):
                if not _RacingTable._fired:
                    _RacingTable._fired = True
                    tb.merge_epoch(e2, 1)
                return super()._commit_manifest(manifest)

        ta = _RacingTable(spark, root, n_buckets=8, merge_mode="mor")
        rec = ta.merge_epoch(e1, 0)
        # the race really happened and really rebased: A's commit sits
        # on top of B's interleaved snapshot, both epochs are in.
        assert not rec.get("skipped_duplicate_epoch")
        by_epoch = {r["epoch"]: r for r in ta.lineage()}
        assert rec["parent_version"] == by_epoch[1]["snapshot_version"]
        assert ta.committed_epochs() == {0, 1}
        return ta.read().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_wap_publish",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT repo, path, commit, lang, content FROM latest
    """,
)
def lake_wap_publish(spark, sf_dir):
    """WRITE-AUDIT-PUBLISH (Iceberg's WAP pattern,
    ``LakeTable.stage_epoch``): epoch 2 is STAGED — full merge compute
    + data write, nothing reader-visible — audited against its exact
    would-be post-publish state, then published as a pure metadata
    CAS commit.  The oracle is the serial latest-wins replay of the
    whole changelog: the stage/audit/publish detour must be invisible
    in the final state."""
    import shutil
    import tempfile

    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    root = tempfile.mkdtemp(prefix="cdc_wap_")
    try:
        t = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
        t.create(
            ["repo", "path"],
            {"repo": "string", "path": "string", "commit": "string",
             "lang": "string", "content": "string"},
        )
        t.merge_epoch(changes.where(F.col("lsn") <= mid), 0)
        staged = t.stage_epoch(changes.where(F.col("lsn") > mid), 1)
        # audit gate: counts sane, epoch not yet visible
        s = staged.summary()
        assert s["rows_upserted"] > 0 and t.committed_epochs() == {0}
        staged.publish()
        assert t.committed_epochs() == {0, 1}
        return t.read().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _partial_changelog_from_documents(spark, sf_dir):
    """The flagship changelog, PARTIAL-IMAGE edition: commit present
    only when lsn % 3 != 0, content only when lsn % 7 != 0 (binlog
    row_image=MINIMAL).  lang is keyed off key_id (CONSTANT per key)
    so the quarantine decision can't flip across a key's versions —
    the regime where epoch-wise hydration provably equals a single
    global fold (see tests/test_partial.py for the general case)."""
    from etl_cms_spark.fixtures.generator import LANG_VOCAB

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id").cast("long")
    key_id = F.pmod(i, F.lit(150))
    lsn = (i * 2 + 1).cast("long")
    is_del = F.pmod(i, F.lit(20)) == 19
    lang_arr = F.array(*[F.lit(x) for x in LANG_VOCAB])
    return d.select(
        lsn.alias("lsn"),
        F.when(is_del, "D").otherwise("U").alias("op"),
        F.concat(
            F.lit("repo-"), F.lpad(F.pmod(key_id, F.lit(12)).cast("string"), 3, "0")
        ).alias("repo"),
        F.concat(F.lit("src/f"), key_id.cast("string"), F.lit(".txt")).alias("path"),
        F.when(
            ~is_del & (lsn % 3 != 0),
            F.substring(
                F.sha2(F.concat(key_id.cast("string"), F.lit(":"), lsn.cast("string")), 256),
                1,
                40,
            ),
        ).alias("commit"),
        F.when(
            ~is_del, F.element_at(lang_arr, (F.pmod(key_id, F.lit(30)) + 1).cast("int"))
        ).alias("lang"),
        F.when(~is_del & (lsn % 7 != 0), F.col("text")).alias("content"),
    )


def _oracle_partial_fold_sql() -> str:
    """DuckDB dual of the partial changelog + global per-column fold."""
    from etl_cms_spark.fixtures.generator import LANG_VOCAB

    langs = ", ".join(f"'{x}'" for x in LANG_VOCAB)
    gate = "CASE WHEN op <> 'D' AND (del_lsn IS NULL OR lsn > del_lsn) THEN lsn END"
    return f"""
    ch AS (
      SELECT (doc_id * 2 + 1) AS lsn,
             CASE WHEN doc_id % 20 = 19 THEN 'D' ELSE 'U' END AS op,
             'repo-' || lpad(((doc_id % 150) % 12)::VARCHAR, 3, '0') AS repo,
             'src/f' || (doc_id % 150)::VARCHAR || '.txt' AS path,
             CASE WHEN doc_id % 20 <> 19 AND (doc_id * 2 + 1) % 3 <> 0
                  THEN substring(sha256((doc_id % 150)::VARCHAR || ':' || (doc_id * 2 + 1)::VARCHAR), 1, 40)
             END AS commit,
             CASE WHEN doc_id % 20 <> 19
                  THEN ([{langs}])[((doc_id % 150) % 30)::INT + 1] END AS lang,
             CASE WHEN doc_id % 20 <> 19 AND (doc_id * 2 + 1) % 7 <> 0
                  THEN text END AS content
      FROM documents),
    dd AS (
      SELECT *, MAX(CASE WHEN op = 'D' THEN lsn END)
                  OVER (PARTITION BY repo, path) AS del_lsn
      FROM ch),
    g AS (
      SELECT repo, path,
             arg_max(commit,  {gate}) AS commit,
             arg_max(lang,    {gate}) AS lang,
             arg_max(content, {gate}) AS content,
             MAX({gate}) AS last_upd
      FROM dd GROUP BY repo, path)
    """


@q(
    "cdc_columnar_mor",
    f"""
    WITH {_oracle_partial_fold_sql()}
    SELECT repo, path, commit, lang, content
    FROM g WHERE last_upd IS NOT NULL
    """,
)
def cdc_columnar_mor(spark, sf_dir):
    """Columnar merge-on-read: partial-image epochs applied OUT OF
    ORDER (reversed) into a ``partial_columnar`` LakeTable — merge is
    a pure delta append (no table read), read resolution folds each
    column to its latest present value by (lsn, write-version),
    tombstone-gated.  The oracle is the order-free one-pass fold, so
    the driver verifies the order-independence claim itself."""
    import shutil
    import tempfile

    from etl_cms_spark.sink.lake import LakeTable

    pe = _partial_changelog_from_documents(spark, sf_dir)
    lo, hi = pe.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    root = tempfile.mkdtemp(prefix="cdc_col_")
    try:
        t = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
        t.create(
            ["repo", "path"],
            {"repo": "string", "path": "string", "commit": "string",
             "lang": "string", "content": "string"},
            partial_columnar=True,
        )
        # LATER half first — order must not matter
        t.append_partial_epoch(pe.where(F.col("lsn") > mid), 1)
        t.append_partial_epoch(pe.where(F.col("lsn") <= mid), 0)
        return t.read().select(
            "repo", "path", "commit", "lang", "content"
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "cdc_pipeline_minimal",
    f"""
    WITH {_oracle_partial_fold_sql()}
    SELECT g.repo, g.path, g.commit, g.lang, g.content,
           dim.concept_id, dim.domain, sha256(g.content) AS content_sha
    FROM g JOIN {_concept_dim_sql()} ON g.lang = dim.lang
    WHERE g.last_upd IS NOT NULL
    """,
)
def cdc_pipeline_minimal(spark, sf_dir):
    """The flagship pipeline under ``row_image="minimal"`` — events
    carry only changed columns; each epoch folds per-column latest
    values and HYDRATES full images against the pre-epoch table
    before mapping/merge (operators.dedup.fold_partial_updates +
    LakeTable.hydrate_partial).  The oracle folds the whole partial
    changelog in one SQL pass (delete-reset-gated arg_max per
    column), so the multi-epoch hydration chain is verified against
    an independent engine."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _partial_changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_min_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8, row_image="minimal")
        p.run(changes, n_epochs=2)
        return p.current_state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_changelog_export",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    b AS (SELECT MIN(lsn) AS lo, MAX(lsn) AS hi FROM ch),
    cut AS (SELECT lo + (hi - lo + 2) // 2 - 1 AS c FROM b),
    r1 AS (
      SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch, cut WHERE ch.lsn <= cut.c),
    s1 AS (SELECT r1.repo, r1.path, r1.commit FROM r1
           JOIN {_concept_dim_sql()} ON r1.lang = dim.lang
           WHERE rn = 1 AND op <> 'D'),
    r2 AS (
      SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    s2 AS (SELECT r2.repo, r2.path, r2.commit FROM r2
           JOIN {_concept_dim_sql()} ON r2.lang = dim.lang
           WHERE rn = 1 AND op <> 'D')
    SELECT COALESCE(s1.repo, s2.repo) AS repo,
           COALESCE(s1.path, s2.path) AS path,
           CASE WHEN s1.repo IS NULL THEN 'I'
                WHEN s2.repo IS NULL THEN 'D'
                ELSE 'U' END AS op,
           s1.commit AS before_commit,
           s2.commit AS after_commit
    FROM s1 FULL OUTER JOIN s2 ON s1.repo = s2.repo AND s1.path = s2.path
    WHERE s1.repo IS NULL OR s2.repo IS NULL OR s1.commit <> s2.commit
    """,
)
def lake_changelog_export(spark, sf_dir):
    """CDC OUT: run the pipeline's first epoch, snapshot, run the
    second, then export ``changes_between`` the two snapshots — the
    oracle independently reconstructs both states (max-LSN windows at
    the epoch-boundary LSN cutoff and at the end, mapped langs only)
    and diffs them in SQL.  Verifies the snapshot-diff join, the
    I/U/D labeling, and the before/after payload carry."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_out_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.run(changes, n_epochs=2)
        v1 = p.table.lineage()[0]["snapshot_version"]
        diff = p.table.changes_between(v1)
        return diff.select(
            "repo",
            "path",
            "op",
            F.col("before.commit").alias("before_commit"),
            F.col("after.commit").alias("after_commit"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "incremental_rollup",
    f"""
    WITH ch AS ({_oracle_changelog_sql()})
    SELECT repo,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
           CAST(SUM(COALESCE(LENGTH(content), 0)) AS BIGINT) AS content_chars
    FROM ch GROUP BY repo
    """,
)
def incremental_rollup(spark, sf_dir):
    """Continuous aggregate (hypertable-rollup/IVM shape): the
    changelog folds into a per-repo rollup LakeTable across three
    exactly-once epochs — per epoch, only the batch is aggregated and
    only touched buckets rewrite — and the final state must equal the
    oracle's one-shot GROUP BY over the whole changelog."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.rollup import IncrementalRollup

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="rollup_entry_")
    try:
        r = IncrementalRollup(
            spark,
            root,
            key_exprs={"repo": F.col("repo")},
            measures={
                "n_events": F.count(F.lit(1)),
                "n_deletes": F.sum((F.col("op") == "D").cast("long")),
                "content_chars": F.sum(F.coalesce(F.length("content"), F.lit(0))),
            },
        )
        hi = changes.agg(F.max("lsn")).first()[0]
        width = (hi + 3) // 3
        for e in range(3):
            r.apply_epoch(
                changes.where(
                    (F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width)
                ),
                e,
            )
        return r.read().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "state_rollup",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch)
    SELECT lang,
           COUNT(*) AS n_files,
           CAST(SUM(COALESCE(LENGTH(content), 0)) AS BIGINT) AS content_chars
    FROM ranked WHERE rn = 1 AND op <> 'D'
    GROUP BY lang
    """,
)
def state_rollup(spark, sf_dir):
    """RETRACTION-capable continuous aggregate (StateRollup): per-lang
    file count and bytes over the LATEST live versions, maintained
    incrementally from the lake's own CDC-out diff (add the after
    image, subtract the before image — updates that move a key
    between langs retract from the old lang).  The oracle is the
    one-shot GROUP BY over the final snapshot: if any retraction were
    missed, stale versions' contributions would survive and the hash
    would differ."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.rollup import StateRollup
    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="state_rollup_entry_")
    try:
        t = LakeTable(spark, f"{root}/files", n_buckets=4)
        t.create(["repo", "path"], {"repo": "string", "path": "string",
                                    "commit": "string", "lang": "string",
                                    "content": "string"})
        r = StateRollup(
            spark,
            f"{root}/rollup",
            key_exprs={"lang": F.col("lang")},
            row_measures={
                "n_files": F.lit(1),
                "content_chars": F.coalesce(F.length("content"), F.lit(0)),
            },
            count_measure="n_files",
            n_buckets=4,
        )
        hi = changes.agg(F.max("lsn")).first()[0]
        width = (hi + 3) // 3
        for e in range(3):
            t.merge_epoch(
                changes.where(
                    (F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width)
                ),
                e,
            )
            # bucket-pruned per-epoch CDC-out: O(changed buckets),
            # not O(both snapshots)
            r.apply_diff(t.changes_for_epoch(e), epoch=e)
        return r.read().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "state_rollup_extrema",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch)
    SELECT lang,
           COUNT(*) AS n_files,
           CAST(MIN(LENGTH(content)) AS BIGINT) AS min_chars,
           CAST(MAX(LENGTH(content)) AS BIGINT) AS max_chars
    FROM ranked WHERE rn = 1 AND op <> 'D'
    GROUP BY lang
    """,
)
def state_rollup_extrema(spark, sf_dir):
    """NON-additive continuous aggregate (StateRollup min/max): the
    per-lang MIN and MAX live file size maintained incrementally from
    the lake's CDC-out diff.  A signed fold cannot carry extrema —
    retracting the row that held the minimum says nothing about the
    runner-up — so the state tracks the multiplicity of rows AT each
    extremum (``m__n``); retractions that kill it trigger a bounded
    rescan of ONLY the affected groups from the lake's row state at
    that epoch.  The oracle is the one-shot GROUP BY MIN/MAX over the
    final snapshot: a missed retraction leaves a stale extremum and
    breaks the hash."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.rollup import StateRollup
    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="state_rollup_ext_entry_")
    try:
        t = LakeTable(spark, f"{root}/files", n_buckets=4)
        t.create(["repo", "path"], {"repo": "string", "path": "string",
                                    "commit": "string", "lang": "string",
                                    "content": "string"})
        r = StateRollup(
            spark,
            f"{root}/rollup",
            key_exprs={"lang": F.col("lang")},
            row_measures={"n_files": F.lit(1)},
            count_measure="n_files",
            min_measures={"min_chars": F.length("content")},
            max_measures={"max_chars": F.length("content")},
            n_buckets=4,
        )
        hi = changes.agg(F.max("lsn")).first()[0]
        width = (hi + 3) // 3
        for e in range(3):
            t.merge_epoch(
                changes.where(
                    (F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width)
                ),
                e,
            )
            r.update_from_lake(t, e)
        return r.read().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "cdc_stateful_stream",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch)
    SELECT repo, path, lsn, op, commit, lang, content
    FROM ranked WHERE rn = 1
    """,
)
def cdc_stateful_stream(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    the same deterministic changelog is tailed as a FILE STREAM in
    several micro-batches through ``latest_by_key_stateful`` — one row
    of keyed state per (repo, path), emit-on-advance — and the drained
    final state must equal the one-shot SQL arg-max the oracle
    computes.  Verifies the streaming state machine (initialization,
    cross-batch advancement, no stale re-emission) against an
    independent engine."""
    import shutil
    import tempfile

    from etl_cms_spark.streaming.stateful import drain_latest_state

    changes = _changelog_from_documents(spark, sf_dir)
    log_dir = tempfile.mkdtemp(prefix="cdc_stateful_log_")
    try:
        changes.repartition(4).write.mode("overwrite").parquet(log_dir)
        schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in changes.schema)
        final = drain_latest_state(
            spark,
            log_dir,
            schema,
            ["repo", "path"],
            "lsn",
            max_files_per_trigger=2,
            query_name=f"cdc_stateful_{abs(hash(sf_dir)) % 10_000}",
        )
        return final.select(
            "repo", "path", "lsn", "op", "commit", "lang", "content"
        ).localCheckpoint()
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


# =====================================================================
# H. Additional survey shapes (J5/J6/G6) + engine extensions
# =====================================================================

@q(
    "range_join_followups",
    """
    SELECT e1.user_id, e1.event_id AS purchase_id, COUNT(*) AS followups
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
    WHERE e1.event_type = 'purchase'
    GROUP BY e1.user_id, e1.event_id
    """,
)
def range_join_followups(spark, sf_dir):
    """J5 — equi keys + range predicate (the era SQL's
    `e.end_date >= c.start_date` join shape, create_CDMv5_condition_era.sql:98):
    events within 30 minutes after each purchase by the same user."""
    e = _t(spark, sf_dir, "events")
    e1 = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("t1")
    )
    e2 = e.select("user_id", F.col("ts").alias("t2"))
    joined = e1.join(e2, "user_id").where(
        (F.col("t2") > F.col("t1"))
        & (F.col("t2") <= F.col("t1") + F.expr("INTERVAL 30 MINUTES"))
    )
    return joined.groupBy("user_id", "purchase_id").agg(F.count("*").alias("followups"))


@q(
    "stratified_sample_per_source",
    """
    WITH ranked AS (
      SELECT doc_id, source, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY (((doc_id + 7) % 2147483647) * 2654435761) % 2147483647, doc_id
             ) AS sample_rank
      FROM documents)
    SELECT doc_id, source, lang, n_chars, sample_rank
    FROM ranked WHERE sample_rank <= 20
    """,
)
def stratified_sample_per_source(spark, sf_dir):
    """Deterministic stratified sample: at most 20 docs per source,
    chosen by a portable multiplicative-hash order (seed 7) — the
    per-key cap + reproducible draw every data-mixing recipe needs.
    One hash-partitioned window; output bounded at k rows/key
    regardless of source skew."""
    from etl_cms_spark.operators.sampling import deterministic_sample_per_key

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang", "n_chars")
    return deterministic_sample_per_key(
        d, ["source"], k=20, id_col="doc_id", seed=7, rank_col="sample_rank"
    )


@q(
    "weighted_sample_per_source",
    """
    WITH pri AS (
      SELECT doc_id, source, lang, n_chars,
             ROUND(POW(((((doc_id + 11) % 2147483647) * 2654435761) % 2147483647 + 1) / 2147483648.0,
                       1.0 / n_chars), 9) AS p
      FROM documents WHERE n_chars > 0),
    ranked AS (
      SELECT doc_id, source, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY p DESC, doc_id) AS sample_rank
      FROM pri)
    SELECT doc_id, source, lang, n_chars, sample_rank
    FROM ranked WHERE sample_rank <= 10
    """,
)
def weighted_sample_per_source(spark, sf_dir):
    """Weighted per-source sample (A-Res priorities, weight =
    n_chars): longer documents are proportionally likelier, the draw
    is replay-stable, and DuckDB reproduces the exact selection from
    the same integer-hash + pow arithmetic."""
    from etl_cms_spark.operators.sampling import weighted_sample_per_key

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang", "n_chars")
    return weighted_sample_per_key(
        d, ["source"], k=10, id_col="doc_id", weight_col="n_chars",
        seed=11, rank_col="sample_rank",
    )


@q(
    "asof_join_purchase",
    """
    WITH r AS (SELECT user_id, ts AS rts, MAX(event_id) AS purchase_id
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT l.event_id, l.user_id, l.ts, r.rts AS purchase_ts, r.purchase_id
    FROM events l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.rts
    """,
)
def asof_join_purchase(spark, sf_dir):
    """As-of (temporal) join: every event annotated with the user's
    most recent purchase at-or-before it — checked against DuckDB's
    NATIVE ASOF JOIN.  The operator is the union-and-window
    composition (operators/asof.py): one shuffle on the key, per-key
    running last() — no range-explosion theta join.  The right side is
    pre-deduped to unique (user, ts) keeping the max event id, so the
    as-of winner is deterministic on both engines."""
    from etl_cms_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    right = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("rts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    out = asof_join(
        e.select("event_id", "user_id", "ts"),
        right,
        on=["user_id"],
        left_time="ts",
        right_time="rts",
        right_cols=["purchase_id"],
        suffix="",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("rts").alias("purchase_ts"),
        F.col("purchase_id"),
    )


@q(
    "snowflake_brand_revenue",
    """
    SELECT p.p_brand AS brand,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size <= 20 AND n.n_regionkey = 0
    GROUP BY p.p_brand
    """,
)
def snowflake_brand_revenue(spark, sf_dir):
    """J6 — snowflake dimension chain with filters pushed to the dims
    (the drug→ingredient rollup shape, create_CDMv5_drug_era…sql:38-43)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") <= 20)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0)
    disc_price = _dec("l_extendedprice") * (_one() - F.col("l_discount").cast("decimal(9,2)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@q(
    "distinct_users_per_type",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_users_per_type(spark, sf_dir):
    """G6 — distinct-count bookkeeping (the reference's
    unique_DESYNPUF_ID_count, CMS_SynPuf_ETL_CDM_v5.py:2078)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@q(
    "json_extract_props",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def json_extract_props(spark, sf_dir):
    """Semi-structured extraction from the JSON props column."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_mod")
    ).agg(F.count("*").alias("n"))


# same oracle as cdc_latest_by_key — proves the salted two-phase form
# is semantics-preserving inside the correctness gate itself.
@q("cdc_latest_by_key_salted", ORACLES["cdc_latest_by_key"])
def cdc_latest_by_key_salted(spark, sf_dir):
    from etl_cms_spark.operators.skew import salted_latest_by_lsn

    e = _t(spark, sf_dir, "events")
    out = salted_latest_by_lsn(
        e.select("user_id", "event_id", "event_type", "value"), ["user_id"], "event_id"
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@q(
    "grouped_map_rollup",
    """
    SELECT user_id, COUNT(*) AS n_events, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           ARG_MAX(event_type, event_id) AS latest_type
    FROM events GROUP BY user_id
    """,
)
def grouped_map_rollup(spark, sf_dir):
    """G1/K — the whole-entity applyInPandas transform inside the
    correctness gate (process_beneficiary analogue)."""
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "first_ts": [pdf["ts"].min()],
                "last_ts": [pdf["ts"].max()],
                "latest_type": [pdf["event_type"].iloc[-1]],
            }
        )

    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        fn, "user_id bigint, n_events bigint, first_ts timestamp, last_ts timestamp, latest_type string"
    )


@q(
    "events_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark, sf_dir):
    """Time-bucketed rollup (hypertable-style aggregation)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
    ).agg(F.count("*").alias("n"), F.count_distinct("user_id").alias("n_users"))


@q(
    "rollup_status_priority",
    """
    SELECT o_orderstatus AS status, o_orderpriority AS priority, COUNT(*) AS n
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark, sf_dir):
    """OLAP ROLLUP (beyond the reference — no grouping sets there)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup(F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n"))
    )


@q(
    "moving_avg_value",
    """
    SELECT user_id, event_id,
      ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg
    FROM events
    """,
)
def moving_avg_value(spark, sf_dir):
    """Sliding-frame window aggregate (3-row moving average)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return e.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 6).alias("mov_avg")
    )


@q(
    "embedding_norm_stats",
    f"""
    SELECT label, COUNT(*) AS n,
      ROUND(MIN(SQRT({_DOT.format(a='embedding', b='embedding')})), 4) AS min_norm,
      ROUND(MAX(SQRT({_DOT.format(a='embedding', b='embedding')})), 4) AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_norm_stats(spark, sf_dir):
    """Vector-column aggregation: per-label embedding norm extrema
    (min/max of deterministic double folds — oracle-exact)."""
    from etl_cms_spark.functions.vectors import norm

    emb = _t(spark, sf_dir, "embeddings")
    n_ = norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.min(n_), 4).alias("min_norm"),
        F.round(F.max(n_), 4).alias("max_norm"),
    )


# =====================================================================
# I. Cost-table shape (round 3): P5 amount gate + out-of-pocket
#    arithmetic + payer-plan-period range-join link — the
#    plans/claims.py cost builders' semantics on TPC-H tables
#    (reference procedure_cost path CMS_SynPuf_ETL_CDM_v5.py:1538-1566
#    gated by SynPufFiles.py:258-265; golden parity is
#    tests/test_reference_golden.py::test_procedure_cost_parity).
# =====================================================================

@q(
    "claim_cost_ppp",
    """
    WITH lines AS (
      SELECT o.o_custkey AS person_id, CAST(o.o_orderdate AS DATE) AS cost_date,
             NULLIF(CAST(l.l_tax AS DECIMAL(9,2)), 0) AS coins,
             NULLIF(CAST(l.l_discount AS DECIMAL(9,2)), 0) AS ddct,
             CAST(l.l_extendedprice AS DECIMAL(12,2)) AS payer
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    gated AS (
      SELECT * FROM lines
      WHERE COALESCE(coins, ddct, NULLIF(payer, 0)) IS NOT NULL
    ),
    ppp AS (
      SELECT DISTINCT o_custkey AS person_id,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y
      FROM orders
    )
    SELECT p.person_id * 10000 + p.y AS ppp_id,
           COUNT(*) AS n_lines,
           CAST(SUM(COALESCE(g.coins, 0) + COALESCE(g.ddct, 0)) AS DOUBLE) AS total_out_of_pocket,
           CAST(SUM(g.payer + COALESCE(g.coins, 0) + COALESCE(g.ddct, 0)) AS DOUBLE) AS total_paid
    FROM gated g JOIN ppp p
      ON g.person_id = p.person_id
     AND g.cost_date >= MAKE_DATE(CAST(p.y AS INT), 1, 1)
     AND g.cost_date <= MAKE_DATE(CAST(p.y AS INT), 12, 31)
    GROUP BY 1
    """,
)
def claim_cost_ppp(spark, sf_dir):
    """Cost-table composite: '' -> NULL amount semantics (NULLIF), the
    P5 any-amount-present gate, deductible+coinsurance out-of-pocket
    arithmetic (decimal-exact, cast to double at the edge), and the
    payer-plan-period link as a BROADCAST range join against the small
    per-(person, year) period dimension — exactly the
    link_payer_plan_period shape at 100 TB: the fact side never
    shuffles, the period dim broadcasts."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_tax", "l_discount", "l_extendedprice")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    zero9 = F.lit(0).cast("decimal(9,2)")
    lines = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_custkey").alias("person_id"),
        F.col("o_orderdate").cast("date").alias("cost_date"),
        F.nullif(_dec("l_tax", 9, 2), zero9).alias("coins"),
        F.nullif(_dec("l_discount", 9, 2), zero9).alias("ddct"),
        _dec("l_extendedprice").alias("payer"),
    )
    gated = lines.where(
        F.coalesce(
            F.col("coins"), F.col("ddct"), F.nullif(F.col("payer"), F.lit(0).cast("decimal(12,2)"))
        ).isNotNull()
    )
    ppp = (
        o.select(
            F.col("o_custkey").alias("p_person"),
            F.year("o_orderdate").cast("long").alias("y"),
        )
        .distinct()
    )
    zero = F.lit(0).cast("decimal(9,2)")
    linked = gated.join(
        F.broadcast(ppp),
        (F.col("person_id") == F.col("p_person"))
        & (F.col("cost_date") >= F.make_date("y", F.lit(1), F.lit(1)))
        & (F.col("cost_date") <= F.make_date("y", F.lit(12), F.lit(31))),
    )
    oop = F.coalesce(F.col("coins"), zero) + F.coalesce(F.col("ddct"), zero)
    return (
        linked.groupBy((F.col("p_person") * 10000 + F.col("y")).alias("ppp_id"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(oop).cast("double").alias("total_out_of_pocket"),
            F.sum(F.col("payer") + oop).cast("double").alias("total_paid"),
        )
    )


# =====================================================================
# J. Portable-hash twins (round 3): the xxhash64-based SimHash and IVF
#    rows-only entries get fully oracle-checked counterparts, mirroring
#    what minhash_lsh_portable does for MinHash.
# =====================================================================


def _simhash_portable_oracle_sql(bits: int = 32, max_hamming: int = 3) -> str:
    from etl_cms_spark.operators.textdedup import _mh_coeffs

    coeffs = _mh_coeffs(bits)
    votes = ", ".join(
        f"SUM(CASE WHEN ({a} * ph + {b}) % 2147483647 % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j, (a, b) in enumerate(coeffs)
    )
    pack = " + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    n_bands = max_hamming + 1
    bounds = [round(i * bits / n_bands) for i in range(n_bands + 1)]
    band_conds = " OR ".join(
        f"((a.sh >> {bounds[i]}) % {1 << (bounds[i + 1] - bounds[i])}"
        f" = (b.sh >> {bounds[i]}) % {1 << (bounds[i + 1] - bounds[i])})"
        for i in range(n_bands)
    )
    return rf"""
    WITH both_copies AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
      UNION ALL SELECT doc_id + 100000, text || ' zz9' FROM documents WHERE doc_id < 300),
    toks AS (SELECT doc_id,
               CASE WHEN trim(lower(text)) = '' THEN []
                    ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
             FROM both_copies),
    tok AS (SELECT doc_id, unnest(t) AS s FROM toks),
    ph AS (SELECT doc_id,
             CASE WHEN length(s) = 0 THEN 0 ELSE
               list_reduce(list_transform(range(1, length(s) + 1),
                 c -> ord(substring(s, c::INT, 1))::BIGINT),
                 (a, c) -> (a * 257 + c) % 2147483647) END AS ph
           FROM tok),
    votes AS (SELECT doc_id, {votes} FROM ph GROUP BY doc_id),
    sigr AS (SELECT doc_id, {pack} AS sh FROM votes),
    sig AS (SELECT t.doc_id, coalesce(s.sh, 0) AS sh
            FROM toks t LEFT JOIN sigr s USING (doc_id)),
    cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                    bit_count(xor(a.sh, b.sh)) AS hamming
             FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             WHERE {band_conds})
    SELECT id_a, id_b, hamming FROM cand WHERE hamming <= {max_hamming}
    """


@q("simhash_portable", _simhash_portable_oracle_sql())
def simhash_portable_q(spark, sf_dir):
    """SimHash near-dup pairs with the PORTABLE polynomial hash family:
    signatures, pigeonhole banding, and the hamming verify all replay
    in DuckDB — the banding logic itself is oracle-checked (the
    xxhash64 ``simhash_neardup`` stays rows-only by construction, with
    its brute-force-equality pytest)."""
    from etl_cms_spark.operators.textdedup import simhash_neardup_pairs

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    both = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
        )
    )
    return simhash_neardup_pairs(both, "text", "doc_id", bits=32, max_hamming=3, portable=True)


def _srp_cell_sql(v: str, cell_bits: int = 4) -> str:
    terms = []
    for j in range(cell_bits):
        proj = (
            f"list_sum(list_transform(range(1, len({v}) + 1), "
            f"i -> CAST({v}[i] AS DOUBLE) * "
            f"((((i - 1 + {j * 4096}) * 1315423911 + 2654435761) % 2147483647) % 2 * 2 - 1)))"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


def _ann_ivf_portable_oracle_sql(cell_bits: int = 4, max_flip: int = 1) -> str:
    return f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings
               WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
    qc AS (SELECT {_srp_cell_sql('q.qv', cell_bits)} AS qcell FROM q),
    cells AS (SELECT e.vec_id, e.embedding,
                     {_srp_cell_sql('e.embedding', cell_bits)} AS cell
              FROM embeddings e)
    SELECT c.vec_id, ROUND({_cos_sql('c.embedding', 'q.qv')}, 4) AS cos_sim
    FROM cells c CROSS JOIN q CROSS JOIN qc
    WHERE bit_count(xor(c.cell, qc.qcell)) <= {max_flip}
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """


@q("ann_ivf_portable", _ann_ivf_portable_oracle_sql())
def ann_ivf_portable(spark, sf_dir):
    """IVF top-k with data-independent portable SRP cells: the cell
    assignment, probe selection (hamming-ball of the query's cell),
    and exact rescoring ALL replay in DuckDB — the inverted-file
    pruning logic is oracle-checked end to end (the k-means
    ``ann_ivf_topk`` stays rows-only: its centroids come from a
    sampled k-means DuckDB cannot replay; its recall/pruning are
    pytest-proven in tests/test_similarity.py)."""
    from etl_cms_spark.operators.similarity import ivf_portable_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    return ivf_portable_topk(emb, "embedding", "vec_id", qv, k=10, cell_bits=4, max_flip=1)


# =====================================================================
# Epoch-incremental ANN index maintenance (round-5 headline): the IVF
# layout kept current under CDC changes at O(changes)/epoch, inside
# the same idempotent-epoch machinery as the lake.
# =====================================================================


def _ann_ivf_incremental_oracle_sql(cell_bits: int = 4, max_flip: int = 1) -> str:
    """The WHOLE maintenance protocol replayed in SQL: the same three
    deterministic change epochs, latest-LSN-wins state (deletes drop),
    portable SRP cell assignment, hamming-ball probe, exact cosine
    top-k.  Nothing is staged — the oracle independently derives what
    the incrementally-maintained index must return."""
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
             vec_id AS lsn, 'U' AS op
      FROM embeddings WHERE vec_id % 10 != 7),
    e1 AS (
      SELECT vec_id, list_transform(embedding, x -> -CAST(x AS DOUBLE)) AS vec,
             10000 + vec_id AS lsn, 'U' AS op
      FROM embeddings WHERE vec_id % 5 = 0
      UNION ALL
      SELECT vec_id, list_transform(list_reverse(embedding), x -> CAST(x AS DOUBLE)),
             10000 + vec_id, 'U'
      FROM embeddings WHERE vec_id % 10 = 7),
    e2 AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) * 0.5 + 0.25) AS vec,
             20000 + vec_id AS lsn, 'U' AS op
      FROM embeddings WHERE vec_id % 7 = 1
      UNION ALL
      SELECT vec_id, CAST(NULL AS DOUBLE[]), 25000 + vec_id, 'D'
      FROM embeddings WHERE vec_id % 10 = 3),
    chlog AS (SELECT * FROM base UNION ALL SELECT * FROM e1 UNION ALL SELECT * FROM e2),
    latest AS (
      SELECT vec_id, arg_max(vec, lsn) AS vec, arg_max(op, lsn) AS op
      FROM chlog GROUP BY vec_id),
    live AS (SELECT vec_id, vec FROM latest WHERE op != 'D'),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
    qc AS (SELECT {_srp_cell_sql('q.qv', cell_bits)} AS qcell FROM q),
    cells AS (SELECT l.vec_id, l.vec, {_srp_cell_sql('l.vec', cell_bits)} AS cell
              FROM live l)
    SELECT c.vec_id, ROUND({_cos_sql('c.vec', 'q.qv')}, 4) AS cos_sim
    FROM cells c CROSS JOIN q CROSS JOIN qc
    WHERE bit_count(xor(c.cell, qc.qcell)) <= {max_flip}
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """


def _incr_change_epochs(emb):
    """Three deterministic change epochs over the embeddings table —
    inserts, in-place updates, CELL-MOVING updates (negation flips
    every SRP sign), and deletes, with disjoint LSN ranges so
    latest-wins is unambiguous.  Pure engine-portable arithmetic; the
    oracle rebuilds the identical changelog in SQL."""
    vid = F.col("vec_id")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.where(vid % 10 != 7).select(
        "vec_id", dbl.alias("vec"), vid.alias("lsn"), F.lit("U").alias("op")
    )
    e1 = (
        emb.where(vid % 5 == 0)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: -x.cast("double")).alias("vec"),
            (F.lit(10000) + vid).alias("lsn"),
            F.lit("U").alias("op"),
        )
        .unionByName(
            emb.where(vid % 10 == 7).select(
                "vec_id",
                F.transform(F.reverse("embedding"), lambda x: x.cast("double")).alias("vec"),
                (F.lit(10000) + vid).alias("lsn"),
                F.lit("U").alias("op"),
            )
        )
    )
    e2 = (
        emb.where(vid % 7 == 1)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double") * 0.5 + 0.25).alias("vec"),
            (F.lit(20000) + vid).alias("lsn"),
            F.lit("U").alias("op"),
        )
        .unionByName(
            emb.where(vid % 10 == 3).select(
                "vec_id",
                F.lit(None).cast("array<double>").alias("vec"),
                (F.lit(25000) + vid).alias("lsn"),
                F.lit("D").alias("op"),
            )
        )
    )
    return base, [e1, e2]


@q("ann_ivf_incremental", _ann_ivf_incremental_oracle_sql())
def ann_ivf_incremental(spark, sf_dir):
    """Epoch-incremental ANN index upkeep (the round-4 verdict's top
    ask): build once, then two epochs of O(changes) maintenance —
    assignment maps over each epoch's changes only (plan-asserted in
    tests/test_vecindex.py), narrow mask rows retire stale copies in
    ANY cell (cross-cell moves included), probes stay partition-
    pruned.  The oracle replays the full protocol independently in
    SQL (portable SRP cells — nothing staged), so a hash match
    certifies the maintained index state end to end, including the
    delete/update/move semantics."""
    import shutil

    from etl_cms_spark.operators.vecindex import IncrementalVectorIndex

    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    base, epochs = _incr_change_epochs(emb)
    path = "/tmp/spark_graft_stage/ann_ivf_incr"
    shutil.rmtree(path, ignore_errors=True)
    idx = IncrementalVectorIndex.build(
        base.select("vec_id", F.col("vec").alias("embedding")),
        "embedding", "vec_id", path, kind="srp", cell_bits=4,
    )
    for n, e in enumerate(epochs):
        idx.apply_epoch(e.withColumnRenamed("vec", "embedding"), epoch=n + 1)
    return idx.topk(qv, k=10, max_flip=1)


def _textdedup_incr_oracle_sql(n_hashes: int = 16, bands: int = 4) -> str:
    """The whole dedup-index maintenance protocol replayed in SQL:
    the same deterministic document change epochs, latest-LSN-wins
    state (deletes drop), portable MinHash signatures recomputed from
    raw text, and the agreement-count verifier.  NOTHING is staged —
    by the pigeonhole bound (textindex module docstring) a pair passes
    the index's band join + verify iff its signatures agree in at
    least n_hashes-(bands-1) positions, so the oracle needs no band
    bucket hashes at all: it scores agreement over all live pairs
    directly."""
    from etl_cms_spark.operators.textdedup import _mh_coeffs

    verify_min = n_hashes - bands + 1
    mins = ", ".join(
        f"coalesce(min(({a} * h + {b}) % 2147483647), 0) AS m{i}"
        for i, (a, b) in enumerate(_mh_coeffs(n_hashes))
    )
    agree = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(n_hashes)
    )
    return rf"""
    WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
    base AS (
      SELECT doc_id, text, doc_id AS lsn, 'U' AS op FROM src WHERE doc_id % 10 != 7),
    e1 AS (
      SELECT doc_id + 100000, text, 100000 + doc_id, 'U' FROM src WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, text || ' [rev2]', 110000 + doc_id, 'U' FROM src WHERE doc_id % 9 = 2),
    e2 AS (
      SELECT doc_id, CAST(NULL AS VARCHAR), 200000 + doc_id, 'D' FROM src WHERE doc_id % 10 = 3
      UNION ALL
      SELECT doc_id + 200000, text, 210000 + doc_id, 'U' FROM src WHERE doc_id % 7 = 1
      UNION ALL
      SELECT doc_id + 100000, CAST(NULL AS VARCHAR), 220000 + doc_id, 'D' FROM src WHERE doc_id % 20 = 0),
    chlog AS (SELECT * FROM base UNION ALL SELECT * FROM e1 UNION ALL SELECT * FROM e2),
    latest AS (
      SELECT doc_id, arg_max(text, lsn) AS text, arg_max(op, lsn) AS op
      FROM chlog GROUP BY doc_id),
    live AS (SELECT doc_id, text FROM latest WHERE op != 'D'),
    toks AS (SELECT doc_id,
               CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(text), '\s+') END AS t
             FROM live),
    sh AS (SELECT doc_id,
             list_distinct(CASE WHEN length(t) < 3 THEN []
               ELSE list_transform(range(1, length(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS shingles
           FROM toks),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    hs AS (SELECT doc_id,
             list_reduce(list_transform(range(1, length(s) + 1),
               c -> ord(substring(s, c::INT, 1))::BIGINT),
               (a, c) -> (a * 257 + c) % 2147483647) AS h
           FROM ex),
    sig AS (SELECT doc_id, {mins} FROM hs GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(({agree}) / {float(n_hashes)}, 4) AS est_jaccard
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE ({agree}) >= {verify_min}
    """



def _textdedup_incr_epochs(d):
    """The shared deterministic document changelog (base + 2 change
    epochs) behind the textdedup_incremental* entries — mirrored
    line-for-line by the CTEs in _textdedup_incr_oracle_sql."""
    vid = F.col("doc_id")
    base = d.where(vid % 10 != 7).select(
        "doc_id", "text", vid.alias("lsn"), F.lit("U").alias("op")
    )
    e1 = (
        d.where(vid % 5 == 0)
        .select(
            (vid + 100000).alias("doc_id"), "text",
            (F.lit(100000) + vid).alias("lsn"), F.lit("U").alias("op"),
        )
        .unionByName(
            d.where(vid % 9 == 2).select(
                "doc_id", F.concat("text", F.lit(" [rev2]")).alias("text"),
                (F.lit(110000) + vid).alias("lsn"), F.lit("U").alias("op"),
            )
        )
    )
    e2 = (
        d.where(vid % 10 == 3)
        .select(
            "doc_id", F.lit(None).cast("string").alias("text"),
            (F.lit(200000) + vid).alias("lsn"), F.lit("D").alias("op"),
        )
        .unionByName(
            d.where(vid % 7 == 1).select(
                (vid + 200000).alias("doc_id"), "text",
                (F.lit(210000) + vid).alias("lsn"), F.lit("U").alias("op"),
            )
        )
        .unionByName(
            d.where(vid % 20 == 0).select(
                (vid + 100000).alias("doc_id"),
                F.lit(None).cast("string").alias("text"),
                (F.lit(220000) + vid).alias("lsn"), F.lit("D").alias("op"),
            )
        )
    )
    return [base, e1, e2]


@q("textdedup_incremental", _textdedup_incr_oracle_sql())
def textdedup_incremental(spark, sf_dir):
    """Epoch-incremental MinHash-LSH dedup index (dedup-at-ingest for
    the CDC loop — the text twin of ``ann_ivf_incremental``): an
    empty index ingests a base corpus plus two change epochs (dupes
    under new ids, in-place rewrites that retire every old band row,
    deletes of originals AND of dupes), probing each batch against the
    live corpus as it arrives; the returned state is the maintained
    index's CURRENT near-dup pair set.  The oracle independently
    replays latest-wins + portable signatures + the pigeonhole-exact
    agreement verifier from raw text — a hash match certifies that N
    epochs of O(changes) upkeep converge to exactly the from-scratch
    answer, update/delete/cross-bucket-move semantics included."""
    import shutil

    from etl_cms_spark.operators.textindex import IncrementalTextDedupIndex

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    path = "/tmp/spark_graft_stage/textdedup_incr"
    shutil.rmtree(path, ignore_errors=True)
    idx = IncrementalTextDedupIndex.build(spark, path, "text", "doc_id")
    for n, e in enumerate(_textdedup_incr_epochs(d)):
        idx.apply_epoch(e, epoch=n)
    return idx.live_pairs()


@q(
    "textdedup_incr_groups",
    f"""
    WITH RECURSIVE
    edges AS (SELECT id_a, id_b FROM ({_textdedup_incr_oracle_sql()})),
    sym AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b AS a, id_a AS b FROM edges),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT node AS doc_id, MIN(label) AS component_id,
           (node = MIN(label)) AS is_canonical
    FROM reach GROUP BY node
    """,
)
def textdedup_incr_groups(spark, sf_dir):
    """Incrementally-MAINTAINED dedup groups: the same three change
    epochs as ``textdedup_incremental``, but with per-epoch bounded
    component relabeling (only components touched by a changed doc or
    a new pair recompute — merges AND splits included) instead of a
    corpus-wide CC pass.  The oracle derives the groups independently:
    recursive-CTE transitive closure over the pair set its own SQL
    replay of the maintenance protocol produces.  A hash match
    certifies that N epochs of O(touched-components) label upkeep
    land on exactly the from-scratch clustering."""
    import shutil

    from etl_cms_spark.operators.textindex import IncrementalTextDedupIndex

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id", "text")
    path = "/tmp/spark_graft_stage/textdedup_incr_groups"
    shutil.rmtree(path, ignore_errors=True)
    idx = IncrementalTextDedupIndex.build(
        spark, path, "text", "doc_id", maintain_groups=True
    )
    for n, e in enumerate(_textdedup_incr_epochs(d)):
        idx.apply_epoch(e, epoch=n)
    return idx.live_groups()


@q(
    "lake_rebucket_state",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def lake_rebucket_state(spark, sf_dir):
    """Bucket-count EVOLUTION mid-history: epoch 0 lands in 8 buckets,
    ``LakeTable.rebucket(32)`` rewrites the snapshot into the grown
    layout (tombstones carried, prior versions readable under their
    own bucketing), epoch 1 lands in the new layout.  The oracle is
    the SAME one-pass latest-wins SQL as ``cdc_pipeline_state`` —
    bucket evolution must be invisible to query results, so a hash
    match certifies the rewrite changed placement and nothing else."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    width = max(1, (hi - lo + 1 + 1) // 2)
    root = tempfile.mkdtemp(prefix="cdc_rebucket_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8)
        p.init_tables()
        p.process_epoch(changes.where(F.col("lsn") < lo + width), 0)
        p.table.rebucket(32)
        p.process_epoch(changes.where(F.col("lsn") >= lo + width), 1)
        return p.current_state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_branch_publish",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch)
    SELECT repo, path, commit, lang, content
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def lake_branch_publish(spark, sf_dir):
    """Writable BRANCH refs (the mutable sibling of tags — the
    Iceberg/Nessie branch model): epoch 0 commits to main, epochs 1-2
    commit to a branch through the same idempotent merge path while
    main stays pinned at the fork, then ``fast_forward`` adopts the
    branch's manifest chain atomically (readers see ALL branch epochs
    or none) and the branch is dropped.  The oracle is the one-pass
    latest-wins SQL over the WHOLE changelog: the staged-on-a-branch
    detour must be invisible in the published state."""
    import shutil
    import tempfile

    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    width = max(1, (hi - lo + 3) // 3)
    root = tempfile.mkdtemp(prefix="lake_branch_entry_")
    try:
        t = LakeTable(spark, f"{root}/t", n_buckets=8, merge_mode="mor")
        t.create(["repo", "path"], {"repo": "string", "path": "string",
                                    "commit": "string", "lang": "string",
                                    "content": "string"})
        t.merge_epoch(changes.where(F.col("lsn") < lo + width), 0)
        t.create_branch("staged")
        b = t.branch_table("staged")
        b.merge_epoch(
            changes.where((F.col("lsn") >= lo + width)
                          & (F.col("lsn") < lo + 2 * width)), 1)
        b.merge_epoch(changes.where(F.col("lsn") >= lo + 2 * width), 2)
        t.fast_forward("staged")
        t.drop_branch("staged")
        return t.read().select(
            "repo", "path", "commit", "lang", "content"
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_zorder_state",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def lake_zorder_state(spark, sf_dir):
    """Z-ORDER clustering maintenance: two epochs merge, then
    ``compact(cluster_by=["lang", "repo"], cluster_layout="zorder")``
    rewrites each bucket in Morton order of (lang-rank, repo-rank) —
    the multi-column row-group-pruning layout
    (functions/zorder.zorder_key; Delta/Iceberg OPTIMIZE ZORDER BY
    re-expressed as a Spark sort key).  The oracle is the SAME
    one-pass latest-wins SQL as ``cdc_pipeline_state``: like every
    maintenance action, the physical layout must be invisible to
    query results, so a hash match certifies the rewrite reordered
    rows and changed nothing else.  The pruning effect itself is
    measured from parquet footers in tests/test_zorder.py (second
    cluster column: 100% row-group overlap under the linear layout
    vs ~35% under z-order, leading column still prunes)."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    width = max(1, (hi - lo + 1 + 1) // 2)
    root = tempfile.mkdtemp(prefix="cdc_zorder_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8, merge_mode="mor")
        p.init_tables()
        p.process_epoch(changes.where(F.col("lsn") < lo + width), 0)
        p.process_epoch(changes.where(F.col("lsn") >= lo + width), 1)
        p.table.compact(cluster_by=["lang", "repo"], cluster_layout="zorder")
        return p.current_state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_stats_pruned_read",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT repo, path, commit, lang, content, sha256(content) AS content_sha
    FROM latest
    WHERE lang BETWEEN 'go' AND 'java'
    """,
)
def lake_stats_pruned_read(spark, sf_dir):
    """PLANNING-time file pruning (Iceberg manifest column stats,
    re-expressed — sink/stats.py): two epochs merge, compaction
    establishes a z-ordered layout with bounded files
    (``target_file_rows``), ``refresh_stats`` records per-file
    [min, max] via distributed footer reads into the ``_stats.json``
    sidecar, and ``read_where({"lang": ("go", "java")})`` drops
    provably-excluded FILES from the scan before Spark plans it —
    the scan's file list, not just its row groups, shrinks.  The
    oracle is the latest-wins SQL with the same range predicate: by
    construction pruning may only remove files with no matching
    rows, so the hash must match exactly.  Pruning effectiveness
    (files_read < files_total) is asserted in
    tests/test_statsprune.py; this entry certifies it never changes
    results."""
    import shutil
    import tempfile

    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    width = max(1, (hi - lo + 1 + 1) // 2)
    root = tempfile.mkdtemp(prefix="cdc_statsprune_")
    try:
        t = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
        t.create(
            ["repo", "path"],
            {"repo": "string", "path": "string", "commit": "string",
             "lang": "string", "content": "string"},
        )
        t.merge_epoch(changes.where(F.col("lsn") < lo + width), 0)
        t.merge_epoch(changes.where(F.col("lsn") >= lo + width), 1)
        t.compact(cluster_by=["lang"], cluster_layout="zorder",
                  target_file_rows=400)
        t.refresh_stats(["lang"])
        out = (
            t.read_where({"lang": ("go", "java")})
            .select(
                "repo", "path", "commit", "lang", "content",
                F.sha2(F.col("content"), 256).alias("content_sha"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_member_pruned_lookup",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT repo, path, commit, lang, content
    FROM latest
    WHERE commit IN (SELECT commit FROM latest
                     WHERE path IN ('src/f7.txt', 'src/f42.txt', 'src/f99.txt'))
    """,
)
def lake_member_pruned_lookup(spark, sf_dir):
    """Membership-sketch (Bloom-style) file pruning for EQUALITY
    probes on an unclustered high-cardinality column
    (sink/stats.py refresh_member_stats): min/max stats cannot prune
    a point lookup on random 40-char commit hashes (every file's
    range admits every probe), so per-file sparse bit-position
    sketches prove absence instead — the probed commits' files are
    the only ones read.  A sketch can only prove absence, so false
    positives cost a read, never a row: results are byte-identical
    to the plain filtered read by construction.  The oracle replays
    the same latest-wins state and probes the same three keys'
    commits.  Pruning effectiveness and saturation semantics are
    pinned in tests/test_statsprune.py."""
    import shutil
    import tempfile

    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    width = max(1, (hi - lo + 1 + 1) // 2)
    root = tempfile.mkdtemp(prefix="cdc_memberprune_")
    try:
        t = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
        t.create(
            ["repo", "path"],
            {"repo": "string", "path": "string", "commit": "string",
             "lang": "string", "content": "string"},
        )
        t.merge_epoch(changes.where(F.col("lsn") < lo + width), 0)
        t.merge_epoch(changes.where(F.col("lsn") >= lo + width), 1)
        t.compact(target_file_rows=400)
        t.refresh_member_stats(["commit"])
        probes = sorted(
            r["commit"]
            for r in t.read()
            .where(F.col("path").isin("src/f7.txt", "src/f42.txt", "src/f99.txt"))
            .select("commit")
            .collect()
            if r["commit"] is not None
        )
        cols = ["repo", "path", "commit", "lang", "content"]
        if not probes:  # all three keys deleted in latest state
            return t.read().where(F.lit(False)).select(*cols).localCheckpoint()
        plan = t.plan_where({"commit": probes})
        if plan["files_total"] >= 4:
            assert plan["files_read"] < plan["files_total"], plan
        return t.read_where({"commit": probes}).select(*cols).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "lake_count_pruned",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT probe, n FROM (
      SELECT 'all' AS probe, COUNT(*) AS n FROM latest
      UNION ALL
      SELECT 'lang_go_java', COUNT(*) FROM latest
      WHERE lang BETWEEN 'go' AND 'java'
      UNION ALL
      SELECT 'repo_in', COUNT(*) FROM latest
      WHERE repo IN ('repo-003', 'repo-007')
    ) ORDER BY probe
    """,
)
def lake_count_pruned(spark, sf_dir):
    """Metadata-only aggregates (Iceberg metadata scan, re-expressed —
    sink/stats.py::count_where): per-file row + tombstone counts land
    in the ``_stats.json`` sidecar during ``refresh_stats``, so a bare
    ``count(*)`` over a compacted table is pure driver-side arithmetic
    — ZERO scan jobs (asserted in-entry) — and filtered counts read
    only files the stats can neither exclude nor fully prove.  At
    100 TB this is the difference between a sub-second planner answer
    and a full table scan.  The oracle computes the same three counts
    over the replayed latest-wins state; proof-ladder edge cases
    (delta stacks, cold cache, time travel, tombstone subtraction,
    random-draw parity) are pinned in tests/test_statsprune.py and
    test_properties.py."""
    import shutil
    import tempfile

    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    width = max(1, (hi - lo + 1 + 1) // 2)
    root = tempfile.mkdtemp(prefix="cdc_countprune_")
    try:
        t = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
        t.create(
            ["repo", "path"],
            {"repo": "string", "path": "string", "commit": "string",
             "lang": "string", "content": "string"},
        )
        t.merge_epoch(changes.where(F.col("lsn") < lo + width), 0)
        t.merge_epoch(changes.where(F.col("lsn") >= lo + width), 1)
        t.compact(cluster_by=["lang"], target_file_rows=400)
        t.refresh_stats(["lang", "repo"])
        rep_all = t.count_where()
        # the bare count must come entirely from the sidecar
        assert rep_all["files_scanned"] == 0 and rep_all["files_meta"] > 0, (
            rep_all
        )
        rep_lang = t.count_where({"lang": ("go", "java")})
        rep_repo = t.count_where({"repo": ["repo-003", "repo-007"]})
        rows = [
            ("all", rep_all["count"]),
            ("lang_go_java", rep_lang["count"]),
            ("repo_in", rep_repo["count"]),
        ]
        return spark.createDataFrame(rows, "probe string, n long").orderBy(
            "probe"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# =====================================================================
# I. Round-5 additions: SCD2 history + materialized join view (IVM)
# =====================================================================

def _dim_changelog_rows():
    """Deterministic 3-epoch dimension changelog over the lang key —
    the SAME rows feed the Spark side (createDataFrame) and the
    DuckDB oracle (VALUES), so both engines replay identical input.
    Epoch 0 inserts even langs, epoch 1 updates every 4th and inserts
    the odd ones, epoch 2 deletes every 5th."""
    from etl_cms_spark.fixtures.generator import LANG_VOCAB

    epochs = [[], [], []]
    for i, lang in enumerate(LANG_VOCAB):
        if i % 2 == 0:
            epochs[0].append((100 + i, "U", lang, 1000 + 10 * i, f"dom{i % 3}"))
        if i % 4 == 0:
            epochs[1].append((200 + i, "U", lang, 2000 + 10 * i, f"dom{(i + 1) % 3}"))
        if i % 2 == 1:
            epochs[1].append((200 + i, "U", lang, 1500 + 10 * i, f"dom{i % 3}"))
        if i % 5 == 0:
            epochs[2].append((300 + i, "D", lang, None, None))
    return epochs


def _dim_changelog_values_sql():
    rows = [r for ep in _dim_changelog_rows() for r in ep]
    vals = ", ".join(
        f"({lsn}, '{op}', '{lang}', "
        + ("NULL" if cid is None else str(cid))
        + ", "
        + ("NULL" if dom is None else f"'{dom}'")
        + ")"
        for lsn, op, lang, cid, dom in rows
    )
    return f"(VALUES {vals}) AS dch(lsn, op, lang, concept_id, domain)"


_SCD2_ORACLE_VERSIONS = f"""
    ch AS ({_oracle_changelog_sql()}),
    v AS (
      SELECT repo, path, lsn AS valid_from_lsn,
             LEAD(lsn) OVER (PARTITION BY repo, path ORDER BY lsn) AS valid_to_lsn,
             op, commit, lang, content
      FROM ch)
"""


@q(
    "scd2_history",
    f"""
    WITH {_SCD2_ORACLE_VERSIONS}
    SELECT repo, path, valid_from_lsn, valid_to_lsn,
           (valid_to_lsn IS NULL) AS is_current, commit, lang, content
    FROM v WHERE op <> 'D'
    """,
)
def scd2_history(spark, sf_dir):
    """SCD Type-2 dimension history maintained INCREMENTALLY across 3
    change epochs (plans/scd.py: append-only closed-version table +
    natural-key-bucketed open-version table, O(epoch) per fold) —
    must equal the oracle's one-shot LEAD() over the whole changelog.
    Reference analogue: the first-write-wins provider/care_site
    dimensions (CMS_SynPuf_ETL_CDM_v5.py) keep only latest state;
    this keeps every version queryable."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.scd import Scd2History

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="scd2_entry_")
    try:
        s = Scd2History(
            spark, root, ["repo", "path"],
            {"commit": "string", "lang": "string", "content": "string"},
            n_buckets=4,
        )
        hi = changes.agg(F.max("lsn")).first()[0]
        width = (hi + 3) // 3
        for e in range(3):
            s.apply_epoch(
                changes.where(
                    (F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width)
                ),
                e,
            )
        return s.history_df().select(
            "repo", "path", "valid_from_lsn", "valid_to_lsn", "is_current",
            "commit", "lang", "content",
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "scd2_asof_enrich",
    f"""
    WITH {_SCD2_ORACLE_VERSIONS},
    live AS (SELECT * FROM v WHERE op <> 'D'),
    f AS (SELECT repo, path, lsn + 1 AS at_lsn FROM ch)
    SELECT f.repo, f.path, f.at_lsn,
           live.commit AS dim_commit, live.lang AS dim_lang,
           live.content AS dim_content
    FROM f JOIN live
      ON f.repo = live.repo AND f.path = live.path
     AND f.at_lsn >= live.valid_from_lsn
     AND (live.valid_to_lsn IS NULL OR f.at_lsn < live.valid_to_lsn)
    """,
)
def scd2_asof_enrich(spark, sf_dir):
    """As-of enrichment against the maintained SCD2 history: each fact
    (at lsn+1 of every change event) picks the dimension VERSION valid
    at its LSN — an interval join over disjoint validity ranges, so no
    fact fans out.  The oracle replays the interval join over the
    LEAD()-derived versions."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.scd import Scd2History

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="scd2_asof_entry_")
    try:
        s = Scd2History(
            spark, root, ["repo", "path"],
            {"commit": "string", "lang": "string", "content": "string"},
            n_buckets=4,
        )
        hi = changes.agg(F.max("lsn")).first()[0]
        width = (hi + 3) // 3
        for e in range(3):
            s.apply_epoch(
                changes.where(
                    (F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width)
                ),
                e,
            )
        facts = changes.select("repo", "path", (F.col("lsn") + 1).alias("at_lsn"))
        return s.asof(facts, "at_lsn").select(
            "repo", "path", "at_lsn", "dim_commit", "dim_lang", "dim_content"
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "joinview_incremental",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    fact_live AS (SELECT repo, path, commit, lang, content
                  FROM ranked WHERE rn = 1 AND op <> 'D'),
    dch AS (SELECT * FROM {_dim_changelog_values_sql()}),
    dranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY lsn DESC) AS rn
      FROM dch),
    dim_live AS (SELECT lang, concept_id, domain
                 FROM dranked WHERE rn = 1 AND op <> 'D')
    SELECT f.repo, f.path, f.commit, f.lang, f.content,
           d.concept_id, d.domain
    FROM fact_live f JOIN dim_live d USING (lang)
    """,
)
def joinview_incremental(spark, sf_dir):
    """Materialized JOIN-view maintenance (plans/joinview.py): the
    fact changelog and a 3-epoch dimension changelog are merged into
    their LakeTables epoch by epoch, and the denormalized fact⋈dim
    view is folded INCREMENTALLY from both tables' epoch feeds —
    MoR tables here, so the fold reads each epoch's OWN delta files
    (LakeTable.epoch_batch, O(epoch rows), no snapshot diff at all)
    (delta join: Δfact ⋈ current dim ∪ affected facts ⋈
    Δdim, exclusion rule against double-apply).  The oracle is the
    one-shot latest-wins replay of BOTH changelogs joined — if any
    delta path over- or under-applied (dim delete not retracted, late
    dim not resurrecting unmatched facts, double apply), the hash
    would differ."""
    import shutil
    import tempfile

    from etl_cms_spark.operators.dedup import latest_by_lsn
    from etl_cms_spark.plans.joinview import MaterializedJoinView
    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="joinview_entry_")
    try:
        fact = LakeTable(spark, f"{root}/fact", n_buckets=8, merge_mode="mor")
        fact.create(
            ["repo", "path"],
            {"repo": "string", "path": "string", "commit": "string",
             "lang": "string", "content": "string"},
        )
        dim = LakeTable(spark, f"{root}/dim", n_buckets=4, merge_mode="mor")
        dim.create(
            ["lang"],
            {"lang": "string", "concept_id": "long", "domain": "string"},
        )
        view = MaterializedJoinView(
            spark, f"{root}/view", fact, dim, ["lang"], n_buckets=8,
            merge_mode="mor",
        )
        d_schema = "lsn long, op string, lang string, concept_id long, domain string"
        hi = changes.agg(F.max("lsn")).first()[0]
        width = (hi + 3) // 3
        for e, d_rows in enumerate(_dim_changelog_rows()):
            batch = changes.where(
                (F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width)
            )
            fact.merge_epoch(latest_by_lsn(batch, ["repo", "path"], "lsn"), e)
            dim.merge_epoch(
                latest_by_lsn(spark.createDataFrame(d_rows, d_schema), ["lang"], "lsn"),
                e,
            )
            view.apply_epoch(e)
        return view.read().select(
            "repo", "path", "commit", "lang", "content", "concept_id", "domain"
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "joinview_nonmonotone",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    fact_live AS (SELECT repo, path, commit, lang, content
                  FROM ranked WHERE rn = 1 AND op <> 'D'),
    dch AS (SELECT * FROM {_dim_changelog_values_sql()}),
    dranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY lsn DESC) AS rn
      FROM dch),
    dim_live AS (SELECT lang, concept_id, domain
                 FROM dranked WHERE rn = 1 AND op <> 'D')
    SELECT f.repo, f.path, f.commit, f.lang, f.content,
           d.concept_id, d.domain
    FROM fact_live f JOIN dim_live d USING (lang)
    """,
)
def joinview_nonmonotone(spark, sf_dir):
    """Join-view maintenance under NON-MONOTONE epochs: events are
    assigned to 3 epochs by pmod(xxhash64(lsn), 3) — a later epoch
    carries OLDER LSNs for most keys, the file-split streaming shape.
    Such a stale event loses the lake's last-writer-wins merge, so the
    view fold must skip it (LakeTable.epoch_effective_batch — the
    epoch's batch semi-joined to its CDC-out diff keys; the monotone
    fast path never fires here).  Feeding the raw per-epoch batch
    instead diverges (mutation-tested in
    tests/test_properties.py::test_joinview_tracks_join_under_arbitrary_epoch_assignment).
    The oracle is the one-shot latest-wins replay of both changelogs
    joined — epoch assignment must be invisible in the final view."""
    import shutil
    import tempfile

    from etl_cms_spark.operators.dedup import latest_by_lsn
    from etl_cms_spark.plans.joinview import MaterializedJoinView
    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="joinview_nonmono_entry_")
    try:
        fact = LakeTable(spark, f"{root}/fact", n_buckets=8, merge_mode="mor")
        fact.create(
            ["repo", "path"],
            {"repo": "string", "path": "string", "commit": "string",
             "lang": "string", "content": "string"},
        )
        dim = LakeTable(spark, f"{root}/dim", n_buckets=4, merge_mode="mor")
        dim.create(
            ["lang"],
            {"lang": "string", "concept_id": "long", "domain": "string"},
        )
        view = MaterializedJoinView(
            spark, f"{root}/view", fact, dim, ["lang"], n_buckets=8,
            merge_mode="mor",
        )
        d_schema = "lsn long, op string, lang string, concept_id long, domain string"
        d_rows = [r for ep in _dim_changelog_rows() for r in ep]
        dim.merge_epoch(
            latest_by_lsn(spark.createDataFrame(d_rows, d_schema), ["lang"], "lsn"),
            0,
        )
        for e in range(3):
            batch = changes.where(F.expr("pmod(xxhash64(lsn), 3)") == e)
            fact.merge_epoch(latest_by_lsn(batch, ["repo", "path"], "lsn"), e)
            view.apply_epoch(e)
        return view.read().select(
            "repo", "path", "commit", "lang", "content", "concept_id", "domain"
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# =====================================================================
# J. Round-5: CHAINED incremental maintenance — IVM operators compose
# because every maintained object IS a LakeTable with per-epoch
# CDC-out, so a view can be another view's base and a rollup can tail
# a view, each stage O(its own epoch delta).
# =====================================================================

def _dim2_changelog_rows():
    """Deterministic 3-epoch changelog for the SECOND dimension of the
    snowflake (domain -> rank/region).  Exercises late arrival (dom2
    missing until epoch 1 — its facts must resurrect), an update
    (dom0 re-ranked), and a delete (dom1 at epoch 2 — its subtree
    retracts from the chained view)."""
    return [
        [(400, "U", "dom0", 1, "amer"), (401, "U", "dom1", 2, "emea")],
        [(500, "U", "dom2", 3, "apac"), (501, "U", "dom0", 10, "amer")],
        [(600, "D", "dom1", None, None)],
    ]


def _dim2_changelog_values_sql():
    rows = [r for ep in _dim2_changelog_rows() for r in ep]
    vals = ", ".join(
        f"({lsn}, '{op}', '{dom}', "
        + ("NULL" if rank is None else str(rank))
        + ", "
        + ("NULL" if reg is None else f"'{reg}'")
        + ")"
        for lsn, op, dom, rank, reg in rows
    )
    return f"(VALUES {vals}) AS d2ch(lsn, op, domain, domain_rank, region)"


_SNOWFLAKE_LIVE_SQL = f"""
    ch AS ({{changelog}}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    fact_live AS (SELECT repo, path, commit, lang, content
                  FROM ranked WHERE rn = 1 AND op <> 'D'),
    dch AS (SELECT * FROM {_dim_changelog_values_sql()}),
    dranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY lsn DESC) AS rn
      FROM dch),
    dim_live AS (SELECT lang, concept_id, domain
                 FROM dranked WHERE rn = 1 AND op <> 'D')
"""


def _chain_tables(spark, root, changes):
    """Build the MoR base tables + first-hop view shared by the
    chained-IVM entries, and yield per-epoch after merging epoch e
    into fact/dim1 and folding view1."""
    from etl_cms_spark.plans.joinview import MaterializedJoinView
    from etl_cms_spark.sink.lake import LakeTable

    fact = LakeTable(spark, f"{root}/fact", n_buckets=8, merge_mode="mor")
    fact.create(
        ["repo", "path"],
        {"repo": "string", "path": "string", "commit": "string",
         "lang": "string", "content": "string"},
    )
    dim1 = LakeTable(spark, f"{root}/dim1", n_buckets=4, merge_mode="mor")
    dim1.create(
        ["lang"], {"lang": "string", "concept_id": "long", "domain": "string"}
    )
    v1 = MaterializedJoinView(
        spark, f"{root}/v1", fact, dim1, ["lang"], n_buckets=8,
        merge_mode="mor",
    )
    hi = changes.agg(F.max("lsn")).first()[0]
    width = (hi + 3) // 3
    d_schema = "lsn long, op string, lang string, concept_id long, domain string"

    def epochs():
        for e, d_rows in enumerate(_dim_changelog_rows()):
            batch = changes.where(
                (F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width)
            )
            fact.merge_epoch(latest_by_lsn(batch, ["repo", "path"], "lsn"), e)
            dim1.merge_epoch(
                latest_by_lsn(
                    spark.createDataFrame(d_rows, d_schema), ["lang"], "lsn"
                ),
                e,
            )
            v1.apply_epoch(e)
            yield e

    return v1, epochs


@q(
    "joinview_snowflake_chain",
    f"""
    WITH {_SNOWFLAKE_LIVE_SQL.format(changelog=_oracle_changelog_sql())},
    d2ch AS (SELECT * FROM {_dim2_changelog_values_sql()}),
    d2ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY domain ORDER BY lsn DESC) AS rn
      FROM d2ch),
    dim2_live AS (SELECT domain, domain_rank, region
                  FROM d2ranked WHERE rn = 1 AND op <> 'D')
    SELECT f.repo, f.path, f.commit, f.lang, f.content,
           d.concept_id, d.domain, d2.domain_rank, d2.region
    FROM fact_live f
    JOIN dim_live d USING (lang)
    JOIN dim2_live d2 USING (domain)
    """,
)
def joinview_snowflake_chain(spark, sf_dir):
    """CHAINED view maintenance — the reference's snowflake shape
    (claim -> concept -> domain, CMS_SynPuf_ETL_CDM_v5.py source-code
    mapping chain) as two stacked MaterializedJoinViews: view1 =
    fact⋈dim1 is itself the FACT of view2 = view1⋈dim2.  Composition
    is free because a maintained view IS a LakeTable: view2 folds
    view1's per-epoch MoR delta files (epoch_batch) exactly as view1
    folds the base tables'.  Late-arriving dim2 rows resurrect the
    whole subtree, a dim2 delete retracts it, and every epoch costs
    O(Δ) at each hop — no stage ever re-joins its full inputs.  The
    oracle replays all three changelogs latest-wins and takes the
    one-shot 3-way join."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.joinview import MaterializedJoinView
    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="snowflake_chain_entry_")
    try:
        v1, epochs = _chain_tables(spark, root, changes)
        dim2 = LakeTable(spark, f"{root}/dim2", n_buckets=2, merge_mode="mor")
        dim2.create(
            ["domain"],
            {"domain": "string", "domain_rank": "long", "region": "string"},
        )
        v2 = MaterializedJoinView(
            spark, f"{root}/v2", v1.table, dim2, ["domain"], n_buckets=8,
            merge_mode="mor",
        )
        d2_schema = "lsn long, op string, domain string, domain_rank long, region string"
        d2_rows = _dim2_changelog_rows()
        for e in epochs():
            dim2.merge_epoch(
                latest_by_lsn(
                    spark.createDataFrame(d2_rows[e], d2_schema),
                    ["domain"], "lsn",
                ),
                e,
            )
            v2.apply_epoch(e)
        return v2.read().select(
            "repo", "path", "commit", "lang", "content",
            "concept_id", "domain", "domain_rank", "region",
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "ivm_chain_rollup",
    f"""
    WITH {_SNOWFLAKE_LIVE_SQL.format(changelog=_oracle_changelog_sql())}
    SELECT d.domain AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(LENGTH(f.content)) AS BIGINT) AS total_len
    FROM fact_live f JOIN dim_live d USING (lang)
    GROUP BY d.domain
    """,
)
def ivm_chain_rollup(spark, sf_dir):
    """Second-order IVM: a retraction-capable StateRollup keyed by a
    DIMENSION attribute (domain) tails the MAINTAINED join view's own
    per-epoch CDC-out — so a dim1 update that moves a lang between
    domains retracts every affected file's contribution from the old
    domain and adds it to the new, without the rollup ever seeing the
    base tables.  Each refresh is O(changed view rows); the oracle is
    the one-shot GROUP BY over the final joined state."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.rollup import StateRollup

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ivm_chain_entry_")
    try:
        v1, epochs = _chain_tables(spark, root, changes)
        roll = StateRollup(
            spark, f"{root}/roll",
            key_exprs={"domain": F.col("domain")},
            row_measures={
                "n_files": F.lit(1),
                "total_len": F.length("content"),
            },
            count_measure="n_files",
            n_buckets=4,
        )
        for e in epochs():
            roll.apply_diff(v1.table.changes_for_epoch(e), e)
        return roll.read().select(
            "domain",
            F.col("n_files").cast("long").alias("n_files"),
            F.col("total_len").cast("long").alias("total_len"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "cdc_consistent_read",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    latest AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
    SELECT l.repo, l.path, l.commit, l.lang, l.content,
           dim.concept_id, dim.domain, sha256(l.content) AS content_sha
    FROM latest l JOIN {_concept_dim_sql()} ON l.lang = dim.lang
    """,
)
def cdc_consistent_read(spark, sf_dir):
    """CONSISTENT MULTI-TABLE SNAPSHOT (CDCPipeline.read_consistent):
    after the 2-epoch demux run, an EXTRA epoch is merged into one
    domain sink only — the torn write a mid-epoch crash or in-flight
    merge leaves behind.  read_consistent() pins every sink at the
    snapshot version recording the main table's newest COMPLETED
    source epoch (LakeTable.version_at_epoch — the main commit is the
    epoch's completion marker because domains merge first), so the
    routed union equals the latest-wins replay of the REAL changelog;
    the torn rows, visible to any naive per-table read, must be
    absent.  Multi-table snapshot isolation from shared epoch ids
    alone — no transactional catalog."""
    import shutil
    import tempfile
    from functools import reduce

    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_consistent_")
    try:
        p = CDCPipeline(spark, root, n_buckets=8, demux_domains=True)
        p.run(changes, n_epochs=2)
        dom, t = sorted(p.domain_tables.items())[0]
        torn = spark.createDataFrame(
            [(10**9, "U", "torn-repo", f"f{i}", "c0", "python", "x",
              9001, dom, "s") for i in range(7)],
            "lsn long, op string, repo string, path string, commit string, "
            "lang string, content string, concept_id long, domain string, "
            "content_sha string",
        )
        t.merge_epoch(torn, 2)
        cut = p.read_consistent()
        union = reduce(
            lambda a, b: a.unionByName(b),
            [cut[d] for d in sorted(p.domain_tables)],
        )
        cols = ["repo", "path", "commit", "lang", "content",
                "concept_id", "domain", "content_sha"]
        return union.select(*cols).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q(
    "joinview_evolution",
    f"""
    WITH ch AS ({_oracle_changelog_sql()}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
      FROM ch),
    fact_live AS (SELECT repo, path, commit, lang, content
                  FROM ranked WHERE rn = 1 AND op <> 'D'),
    dch AS (SELECT * FROM {_dim_changelog_values_sql()}),
    dranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY lsn DESC) AS rn
      FROM dch),
    dim_live AS (SELECT lang, concept_id, domain
                 FROM dranked WHERE rn = 1 AND op <> 'D')
    SELECT f.repo, f.path, f.commit, f.lang,
           f.content AS body, d.concept_id, d.domain
    FROM fact_live f JOIN dim_live d USING (lang)
    """,
)
def joinview_evolution(spark, sf_dir):
    """SCHEMA EVOLUTION UNDER A LIVE VIEW: the fact table renames
    content->body between epochs 1 and 2, with the SAME long-lived
    view object folding throughout.  The view's _sync_schema
    propagates the rename through the base manifest's chained
    physical->logical map before the fold — pre-rename view rows keep
    their payload under the NEW name, post-rename epochs keep folding
    (without propagation the view's old column would silently
    NULL-fill, because merge_epoch null-fills batch-absent columns by
    design).  The oracle replays both changelogs latest-wins and
    labels the payload with the post-evolution name — any NULLed or
    stale cell breaks the hash."""
    import shutil
    import tempfile

    from etl_cms_spark.plans.joinview import MaterializedJoinView
    from etl_cms_spark.sink.lake import LakeTable

    changes = _changelog_from_documents(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="joinview_evo_")
    try:
        fact = LakeTable(spark, f"{root}/fact", n_buckets=8, merge_mode="mor")
        fact.create(
            ["repo", "path"],
            {"repo": "string", "path": "string", "commit": "string",
             "lang": "string", "content": "string"},
        )
        dim = LakeTable(spark, f"{root}/dim", n_buckets=4, merge_mode="mor")
        dim.create(
            ["lang"],
            {"lang": "string", "concept_id": "long", "domain": "string"},
        )
        view = MaterializedJoinView(
            spark, f"{root}/view", fact, dim, ["lang"], n_buckets=8,
            merge_mode="mor",
        )
        d_schema = "lsn long, op string, lang string, concept_id long, domain string"
        hi = changes.agg(F.max("lsn")).first()[0]
        width = (hi + 3) // 3
        for e, d_rows in enumerate(_dim_changelog_rows()):
            if e == 2:
                fact.apply_schema_change({"rename": "content:body"})
            batch = changes.where(
                (F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width)
            )
            if e == 2:
                batch = batch.withColumnRenamed("content", "body")
            fact.merge_epoch(latest_by_lsn(batch, ["repo", "path"], "lsn"), e)
            dim.merge_epoch(
                latest_by_lsn(spark.createDataFrame(d_rows, d_schema), ["lang"], "lsn"),
                e,
            )
            view.apply_epoch(e)
        return view.read().select(
            "repo", "path", "commit", "lang", "body", "concept_id", "domain"
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
