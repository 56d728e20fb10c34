"""Deterministic synthetic changelog generator (FIXTURES.md §1-2).

Generates the engine-input shape from BASELINE.json input_hint —
``(repo, path, commit, lang, content)`` — wrapped in a CDC envelope
``(lsn, op, ts, schema_change)``.  Everything is derived inside Spark
from ``spark.range`` via ``xxhash64``/``sha2`` expressions, so the
generator itself scales: no driver-side loops, no Python RNG, and the
same (seed, n) always produces byte-identical data — which is what
lets replay tests assert sha256(content) equality.

Skew: the repo for a key is drawn from a power-law transform of a
uniform hash so a handful of repos dominate (FIXTURES.md: "hot-key
skew: draw from Zipf").  This is what the salted two-phase dedup in
``operators/skew.py`` is exercised against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ~30-value vocabulary (FIXTURES.md §1: "small vocabulary (~30 values)
# → broadcast-dict lookup side").  Mirrors the reference's vocabulary
# tables (CONCEPT.csv) that are loaded into in-process hash maps
# (reference CMS_SynPuf_ETL_CDM_v5.py:437-498).
LANG_VOCAB = [
    "python", "java", "scala", "go", "rust", "c", "cpp", "csharp",
    "javascript", "typescript", "ruby", "php", "kotlin", "swift",
    "sql", "r", "julia", "haskell", "ocaml", "lua", "perl", "shell",
    "html", "css", "yaml", "json", "toml", "markdown", "dockerfile",
    "proto",
]

_WORDS = [
    "def", "class", "import", "return", "lambda", "yield", "async",
    "await", "struct", "impl", "match", "trait", "public", "static",
    "void", "const", "template", "select", "merge", "commit",
]


def gen_source_changes(
    spark: SparkSession,
    n_events: int = 10_000,
    n_keys: int = 2_000,
    n_repos: int = 50,
    skew: float = 3.0,
    seed: int = 42,
    delete_frac_mod: int = 20,
    key_skew: float = 0.0,
) -> DataFrame:
    """A deterministic changelog of ``n_events`` I/U/D events over
    ``n_keys`` distinct (repo, path) keys.

    lsn is strictly monotone; ~1/delete_frac_mod of events are
    deletes; every key gets n_events/n_keys versions on average
    (FIXTURES.md: ">=3 versions for >=20% of keys").

    ``key_skew`` > 0 draws the key of each event from a power-law so a
    few keys receive most updates (hot-key fixture for the salted
    dedup path); 0 = uniform.
    """
    df = spark.range(n_events).withColumnRenamed("id", "_i")
    if key_skew > 0:
        ku = (
            F.pmod(F.xxhash64(F.col("_i"), F.lit("key"), F.lit(seed)), F.lit(1_000_000))
            / F.lit(1_000_000.0)
        )
        key_id = F.floor(F.pow(ku, F.lit(1.0 + key_skew)) * F.lit(n_keys)).cast("long")
    else:
        key_id = F.pmod(F.xxhash64(F.col("_i"), F.lit("key"), F.lit(seed)), F.lit(n_keys))
    # power-law repo assignment: u in [0,1) -> floor(n_repos * u^skew)
    u = (
        F.pmod(F.xxhash64(key_id, F.lit("repo"), F.lit(seed)), F.lit(1_000_000))
        / F.lit(1_000_000.0)
    )
    repo_idx = F.floor(F.pow(u, F.lit(skew)) * F.lit(n_repos)).cast("int")
    dir_idx = F.pmod(F.xxhash64(key_id, F.lit("dir"), F.lit(seed)), F.lit(16))
    lang_idx = F.pmod(F.xxhash64(key_id, F.lit("lang"), F.lit(seed)), F.lit(len(LANG_VOCAB)))
    lang_arr = F.array(*[F.lit(w) for w in LANG_VOCAB])
    word_arr = F.array(*[F.lit(w) for w in _WORDS])

    lsn = (F.col("_i") * 2 + 1).cast("long")
    op = (
        F.when(F.pmod(F.xxhash64(F.col("_i"), F.lit("op"), F.lit(seed)), F.lit(delete_frac_mod)) == 0, F.lit("D"))
        .when(F.pmod(F.xxhash64(key_id, F.lit("first")), F.lit(97)) == F.pmod(F.col("_i"), F.lit(97)), F.lit("I"))
        .otherwise(F.lit("U"))
    )
    # content: deterministic pseudo-source — a few vocabulary words
    # plus a sha2 chunk keyed by (key, lsn) so every version differs.
    w = lambda tag: F.element_at(word_arr, (F.pmod(F.xxhash64(key_id, lsn, F.lit(tag)), F.lit(len(_WORDS))) + 1).cast("int"))  # noqa: E731
    content = F.concat_ws(
        " ",
        w("w1"), w("w2"), w("w3"),
        F.sha2(F.concat(key_id.cast("string"), F.lit(":"), lsn.cast("string")), 256),
        w("w4"), w("w5"),
    )
    out = df.select(
        lsn.alias("lsn"),
        op.alias("op"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=lsn.cast("double"))).alias("ts"),
        F.concat(F.lit("repo-"), F.lpad(repo_idx.cast("string"), 3, "0")).alias("repo"),
        F.concat(
            F.lit("src/d"), dir_idx.cast("string"), F.lit("/f"),
            key_id.cast("string"), F.lit(".txt"),
        ).alias("path"),
        F.substring(F.sha2(F.concat(key_id.cast("string"), lsn.cast("string"), F.lit(seed).cast("string")), 256), 1, 40).alias("commit"),
        F.element_at(lang_arr, (lang_idx + 1).cast("int")).alias("lang"),
        content.alias("content"),
        F.lit(None).cast("string").alias("schema_change"),
    )
    # deletes carry no payload (reference: '' is the NULL representation
    # in its CSVs — SURVEY.md §1.1; we use real NULLs).
    for c in ("commit", "lang", "content"):
        out = out.withColumn(c, F.when(F.col("op") == "D", F.lit(None)).otherwise(F.col(c)))
    return out


def gen_schema_events(spark: SparkSession, at_lsns: dict[int, str]) -> DataFrame:
    """Schema-evolution events interleaved into the changelog.

    ``at_lsns`` maps lsn -> schema_change payload, e.g.
    ``{4001: '{"add": "stars:bigint"}', 8001: '{"rename": "lang:language"}'}``.
    """
    rows = [
        (int(lsn), "SCHEMA", None, None, None, None, None, change)
        for lsn, change in sorted(at_lsns.items())
    ]
    return spark.createDataFrame(
        rows,
        "lsn long, op string, repo string, path string, commit string, "
        "lang string, content string, schema_change string",
    ).withColumn(
        "ts",
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("lsn").cast("double"))),
    ).select("lsn", "op", "ts", "repo", "path", "commit", "lang", "content", "schema_change")


def with_injected_duplicates(changes: DataFrame, every_nth: int = 50) -> DataFrame:
    """Re-emit every nth event verbatim (same lsn, same key) —
    FIXTURES.md §2: "duplicate (lsn,key) pairs injected in one fixture
    to test idempotent re-apply"."""
    dups = changes.where(F.pmod(F.col("lsn"), F.lit(every_nth)) == 1)
    return changes.unionByName(dups)
