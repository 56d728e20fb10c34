"""Fixed-schema CSV/TSV sources (SURVEY.md §2.S1-S4, §1.1).

The reference addresses CSV fields by integer position through layout
classes (python_etl/constants.py:139-509) and materializes repeated
columns as Python lists (SynPufFiles.py:135-153, 315-330).  Spark
mapping: explicit StructType (never inferSchema), ``nullValue=''``
(the reference's de-facto NULL), repeated columns folded to arrays
with empties dropped, and carrier claim-lines zipped into an
array<struct> via arrays_zip + filter + explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_fixed(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """S1/S2: schema-enforced CSV/TSV scan, '' read as NULL.  Passing
    a list of paths is the reference's file-concatenation (S4) —
    UNION ALL for free, one distributed scan."""
    paths = path if isinstance(path, list) else [path]
    return (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("nullValue", "")
        .schema(schema)
        .csv(paths)
    )


def repeated_cols_to_array(
    df: DataFrame, prefix: str, n: int, out_col: str
) -> DataFrame:
    """ICD9_DGNS_CD_1..10 → array with empty/null entries dropped
    (reference SynPufFiles.py:135-153)."""
    arr = F.array(*[F.col(f"{prefix}{i}") for i in range(1, n + 1)])
    return df.withColumn(
        out_col, F.filter(arr, lambda x: x.isNotNull() & (x != ""))
    )


def zip_claim_lines(
    df: DataFrame, groups: dict[str, str], n: int, out_col: str = "lines"
) -> DataFrame:
    """Carrier-claim parallel column groups → array<struct> (the
    reference zips 10 parallel groups into 13 line structs,
    SynPufFiles.py:315-330).  ``groups`` maps struct-field name →
    column prefix; lines where every field is null are dropped."""
    zipped = F.arrays_zip(
        *[
            F.array(*[F.col(f"{prefix}{i}") for i in range(1, n + 1)]).alias(name)
            for name, prefix in groups.items()
        ]
    )
    names = list(groups.keys())
    non_empty = lambda s: F.exists(  # noqa: E731
        F.array(*[s[n_] for n_ in names]), lambda x: x.isNotNull()
    )
    return df.withColumn(out_col, F.filter(zipped, non_empty))


def explode_lines(df: DataFrame, lines_col: str = "lines") -> DataFrame:
    """array<struct> → one row per claim line, line_number attached."""
    out = df.select(
        "*", F.posexplode(F.col(lines_col)).alias("line_number", "_line")
    ).drop(lines_col)
    line_fields = [f.name for f in out.schema["_line"].dataType.fields]
    for name in line_fields:
        out = out.withColumn(name, F.col(f"_line.{name}"))
    return out.drop("_line").withColumn("line_number", F.col("line_number") + 1)
