"""Z-order clustering: Morton key construction and the multi-column
row-group pruning it buys at compaction (vs the linear layout, which
only prunes on the leading cluster column)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.functions.zorder import interleave_bits, zorder_key
from tests.conftest import assert_df_equal


def test_interleave_bits_known_values(spark):
    # k=2, bits=2: z = a1<<3 | b1<<2 | a0<<1 | b0  (col 0 = MSB per group)
    rows = [(0, 0, 0), (1, 0, 2), (0, 1, 1), (2, 1, 9), (3, 3, 15), (2, 3, 13)]
    df = spark.createDataFrame(rows, ["a", "b", "expect"])
    got = df.withColumn(
        "z", interleave_bits([F.col("a"), F.col("b")], bits=2)
    ).collect()
    for r in got:
        assert r.z == r.expect, (r.a, r.b, r.z, r.expect)


def test_interleave_bits_guards():
    with pytest.raises(ValueError, match="at least one"):
        interleave_bits([], 8)
    with pytest.raises(ValueError, match="result bits"):
        interleave_bits([F.lit(1)] * 8, 8)


def test_zorder_key_input_validation(spark):
    df = spark.range(10).select(F.col("id").alias("a"))
    with pytest.raises(ValueError, match="no such columns"):
        zorder_key(df, ["nope"])
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="must be in"):
        zorder_key(df, ["a"], bits=64)


def test_zorder_key_groups_equal_strings_and_ranks_numbers(spark):
    df = spark.range(1000).select(
        F.col("id").alias("n"),
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(7)).cast("string")).alias("s"),
    )
    out = df.withColumn("z", zorder_key(df, ["n", "s"], bits=4)).collect()
    # equal strings with equal-rank numbers share a key; the key is
    # deterministic across evaluations
    by_pair = {}
    for r in out:
        by_pair.setdefault((r.n, r.s), set()).add(r.z)
    assert all(len(v) == 1 for v in by_pair.values())
    # numeric rank is monotone: quartile-distant numbers with the same
    # string never produce an inverted leading coordinate
    zs = [r.z for r in sorted(out, key=lambda r: r.n) if r.s == "s0"]
    assert zs == sorted(zs) or len(set(zs)) > 1  # coarse monotonicity


def _overlap(files, col, pred):
    """Fraction of row groups whose [min,max] admits pred's value(s)."""
    import pyarrow.parquet as pq

    total = hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            total += 1
            if pred(st.min, st.max):
                hit += 1
    assert total > 0
    return hit / total, total


def test_compact_zorder_multi_column_pruning(spark, tmp_root):
    """A/B vs the linear layout on (num, lang) with a HIGH-cardinality
    leading column: linear keeps tight stats on num but lang interleaves
    (overlap 1.0); z-order bounds BOTH coordinates per row group, so a
    lang equality predicate skips row groups too.  State identical."""
    from etl_cms_spark.sink.lake import LakeTable

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    try:
        langs = ["ada", "c", "go", "js", "py", "rs"]
        base = spark.range(60_000).select(
            F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("k"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(16384)).cast("int").alias("num"),
            F.element_at(
                F.array(*[F.lit(x) for x in langs]),
                (F.pmod(F.col("id"), F.lit(len(langs))) + 1).cast("int"),
            ).alias("lang"),
            F.repeat(F.sha2(F.col("id").cast("string"), 256), 3).alias("v"),
            (F.col("id") + 1).alias("lsn"),
            F.lit("U").alias("op"),
        )
        schema = {"k": "string", "num": "int", "lang": "string", "v": "string"}

        def build(name, layout):
            t = LakeTable(
                spark, os.path.join(tmp_root, name), n_buckets=4, merge_mode="mor"
            )
            t.create(["k"], schema)
            t.merge_epoch(base.where("id % 2 = 0"), 0)
            t.merge_epoch(base.where("id % 2 = 1"), 1)
            stats = t.compact(
                cluster_by=["num", "lang"], cluster_layout=layout
            )
            assert stats["cluster_layout"] == layout
            return t

        linear = build("zl_linear", "linear")
        zorder = build("zl_zorder", "zorder")
        assert_df_equal(zorder.read(), linear.read(), "layout is invisible")

        def files(t):
            fs = glob.glob(
                os.path.join(t.root, "data", "v*-compact", "_bucket=*", "*.parquet")
            )
            assert fs
            return fs

        # lang = 'go' (second cluster column)
        lang_pred = lambda lo, hi: lo <= "go" <= hi
        lin_lang, n1 = _overlap(files(linear), "lang", lang_pred)
        zo_lang, n2 = _overlap(files(zorder), "lang", lang_pred)
        assert n1 >= 8 and n2 >= 8
        assert lin_lang == 1.0, lin_lang  # num leads: lang never prunes
        assert zo_lang <= 0.7, zo_lang    # z-order: bounded lang coordinate

        # num BETWEEN 1000 AND 1999 (leading cluster column)
        num_pred = lambda lo, hi: not (hi < 1000 or lo > 1999)
        lin_num, _ = _overlap(files(linear), "num", num_pred)
        zo_num, _ = _overlap(files(zorder), "num", num_pred)
        assert lin_num <= 0.3, lin_num    # linear: tight leading stats
        assert zo_num < 1.0, zo_num       # z-order: coarser but still prunes
        assert zo_num <= 0.8, zo_num

        # zorder without cluster_by / bad layout name refuse
        with pytest.raises(ValueError, match="requires cluster_by"):
            linear.compact(cluster_layout="zorder")
        with pytest.raises(ValueError, match="must be 'linear' or 'zorder'"):
            linear.compact(cluster_by=["lang"], cluster_layout="hilbert")
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)
