"""S3 — zip-decompress source (SURVEY.md §2.A).

The reference eagerly unzips downloaded SynPUF archives to temp files
before reading them (FileControl/FileDescriptor constructor side
effects, reference python_etl/FileControl.py:93-175) — a driver-side,
disk-doubling step.  Spark-first form: read the archives as
``binaryFile`` rows and decompress + CSV-parse INSIDE an Arrow
``mapInPandas`` stage, so each executor streams its own archives and
no unzipped copy ever lands on disk.

Scale notes: one task per archive (binaryFile splits at file
granularity — archives should be sized like input splits, hundreds of
MB, not one giant zip: a single huge archive serializes into one
task).  Everything downstream (schema, ''→NULL, layout handling) is
identical to the plain CSV reader in csv_layouts.py.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_zipped_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    header: bool = True,
    member_suffix: str = ".csv",
) -> DataFrame:
    """Read every ``member_suffix`` member of every zip archive under
    ``path`` as one DataFrame with the given fixed schema; empty
    strings become NULL (the reference's '' semantics, same as
    csv_layouts.read_csv_fixed)."""
    struct = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    names = [f.name for f in struct.fields]
    binaries = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for member in zf.namelist():
                        if not member.endswith(member_suffix):
                            continue
                        with zf.open(member) as fh:
                            out = pd.read_csv(
                                fh,
                                header=0 if header else None,
                                names=names,
                                dtype=str,
                                keep_default_na=False,
                            )
                        # ''→NULL at the source, like read_csv_fixed.
                        yield out.replace({"": None})

    text = binaries.select("content").mapInPandas(
        decode, schema=StructType.fromDDL(", ".join(f"`{n}` string" for n in names))
    )
    # cast to the declared types AFTER the universal string parse so
    # type errors surface as NULLs consistently with the CSV reader.
    casts = [text[f.name].cast(f.dataType).alias(f.name) for f in struct.fields]
    return text.select(*casts)
