import os

from pyspark.sql import types as T

from etl_cms_spark.sources.csv_layouts import (
    explode_lines,
    read_csv_fixed,
    repeated_cols_to_array,
    zip_claim_lines,
)


def _write_csv(tmp_root, name, header, rows):
    p = os.path.join(tmp_root, name)
    with open(p, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write(r + "\n")
    return p


def test_fixed_schema_and_empty_as_null(spark, tmp_root):
    p = _write_csv(
        tmp_root, "bene.csv", "id,dt,amt",
        ["A1,20200101,10.5", "A2,,", "A3,20200301,"],
    )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("dt", T.StringType()),
            T.StructField("amt", T.DoubleType()),
        ]
    )
    df = read_csv_fixed(spark, p, schema)
    rows = {r.id: (r.dt, r.amt) for r in df.collect()}
    assert rows["A2"] == (None, None)
    assert rows["A3"] == ("20200301", None)


def test_multi_path_union(spark, tmp_root):
    p1 = _write_csv(tmp_root, "a.csv", "id,dt,amt", ["A,20200101,1"])
    p2 = _write_csv(tmp_root, "b.csv", "id,dt,amt", ["B,20200101,2"])
    schema = "id string, dt string, amt double"
    df = read_csv_fixed(spark, [p1, p2], T._parse_datatype_string(schema))
    assert df.count() == 2


def test_repeated_cols_to_array(spark):
    df = spark.createDataFrame(
        [("c1", "250.0", "", None), ("c2", "", "", "")],
        "clm string, dx_1 string, dx_2 string, dx_3 string",
    )
    out = repeated_cols_to_array(df, "dx_", 3, "dx_list")
    got = {r.clm: list(r.dx_list) for r in out.collect()}
    assert got == {"c1": ["250.0"], "c2": []}


def test_zip_and_explode_claim_lines(spark):
    df = spark.createDataFrame(
        [("c1", "n1", "n2", None, "h1", None, None)],
        "clm string, npi_1 string, npi_2 string, npi_3 string, "
        "hcpcs_1 string, hcpcs_2 string, hcpcs_3 string",
    )
    zipped = zip_claim_lines(df, {"npi": "npi_", "hcpcs": "hcpcs_"}, 3)
    lines = explode_lines(zipped)
    rows = sorted((r.line_number, r.npi, r.hcpcs) for r in lines.collect())
    # line 3 (all-null) dropped; line 2 kept (npi present, hcpcs null)
    assert rows == [(1, "n1", "h1"), (2, "n2", None)]


def test_first_write_wins_replay_stable_under_repartition(spark, tmp_root):
    """G4 replay-convergence: the first-write-wins winner among
    duplicate (beneficiary, year) rows must not depend on the input
    partition layout (the reference's 'first one in file wins',
    beneficiary.py:121-124, re-expressed as a data-derived order key)."""
    from etl_cms_spark.operators.dedup import first_write_wins
    from etl_cms_spark.sources.synpuf import read_beneficiary_summaries

    header = "DESYNPUF_ID,BENE_BIRTH_DT,BENE_SEX_IDENT_CD"
    rows = [f"P{i:03d},1940010{1 + i % 9},1" for i in range(40)]
    # inject content-divergent duplicates for a few beneficiaries
    rows += [f"P{i:03d},19500101,2" for i in range(0, 40, 7)]
    p = _write_csv(tmp_root, "DE1_0_2008_Beneficiary_Summary_File_Sample_9.csv", header, rows)
    bene = read_beneficiary_summaries(spark, [p])

    def winners(df):
        out = first_write_wins(df, ["desynpuf_id", "year"], "row_order")
        return sorted(
            (r["desynpuf_id"], r["bene_birth_dt"], r["bene_sex_ident_cd"])
            for r in out.collect()
        )

    a = winners(bene)
    b = winners(bene.repartition(13))
    c = winners(bene.repartition(1).sortWithinPartitions("bene_sex_ident_cd"))
    assert a == b == c
    assert len(a) == 40


def test_zip_decompress_source_matches_plain_csv(spark, tmp_path):
    """S3: reading a zipped CSV through the binaryFile + mapInPandas
    source must equal reading the plain CSV — schema, ''->NULL, and
    multi-archive union included."""
    import zipfile

    from etl_cms_spark.sources.zipcsv import read_zipped_csv

    csv_a = "id,name,amount\n1,alpha,10.5\n2,,3.25\n"
    csv_b = "id,name,amount\n3,gamma,\n"
    zdir = tmp_path / "zips"
    zdir.mkdir()
    for fn, body in [("a.zip", csv_a), ("b.zip", csv_b)]:
        with zipfile.ZipFile(zdir / fn, "w") as z:
            z.writestr(fn.replace(".zip", ".csv"), body)
    plain = tmp_path / "plain.csv"
    plain.write_text(csv_a + csv_b.split("\n", 1)[1])

    schema = "id int, name string, amount double"
    got = read_zipped_csv(spark, str(zdir), schema)
    exp = spark.read.csv(str(plain), header=True, schema=schema)
    assert sorted(map(str, got.collect())) == sorted(map(str, exp.collect()))
    # ''->NULL semantics
    rows = {r["id"]: r for r in got.collect()}
    assert rows[2]["name"] is None
    assert rows[3]["amount"] is None


# ------------------------------------------------------------------ #
# Debezium-style envelope adapter                                    #
# ------------------------------------------------------------------ #


def test_debezium_adapter_flattens_and_merges(spark, tmp_root):
    """Envelope -> flat changelog -> lake merge composes: deletes
    (before-image only) tombstone their keys, c/r/u upsert."""
    import os

    from pyspark.sql import functions as F

    from etl_cms_spark.sink.lake import LakeTable
    from etl_cms_spark.sources.envelopes import from_debezium

    sch = (
        "op string, before struct<k:string,v:string>, "
        "after struct<k:string,v:string>, source struct<lsn:long>"
    )
    rows = [
        ("c", None, ("k1", "v1"), (1,)),
        ("u", ("k1", "v1"), ("k1", "v2"), (2,)),
        ("r", None, ("k2", "w1"), (3,)),
        ("d", ("k2", "w1"), None, (4,)),
        ("c", None, ("k3", "x1"), (5,)),
    ]
    flat = from_debezium(spark.createDataFrame(rows, sch), ["k"])
    got = {r["k"]: (r["v"], r["lsn"], r["op"]) for r in flat.collect()}
    assert got["k2"] == (None, 4, "D") or ("k2", "w1") in [
        (k, v) for k, (v, _, _) in got.items()
    ]  # dedup below settles it; row-level: delete key came from before
    assert flat.count() == 5
    assert flat.where((F.col("k") == "k2") & (F.col("op") == "D")).count() == 1

    t = LakeTable(spark, os.path.join(tmp_root, "dbz"), n_buckets=2)
    t.create(["k"], {"k": "string", "v": "string"})
    t.merge_epoch(flat, 0)
    state = {r["k"]: r["v"] for r in t.read().collect()}
    assert state == {"k1": "v2", "k3": "x1"}


def test_debezium_adapter_unknown_op_fails_fast(spark):
    import pytest

    from etl_cms_spark.sources.envelopes import from_debezium

    sch = (
        "op string, before struct<k:string,v:string>, "
        "after struct<k:string,v:string>, source struct<lsn:long>"
    )
    bad = spark.createDataFrame([("x", None, ("k1", "v1"), (1,))], sch)
    with pytest.raises(Exception, match="unknown CDC op"):
        from_debezium(bad, ["k"]).collect()


def test_to_debezium_round_trips_all_ops(spark):
    """to_debezium(from CDC-out diff shape) -> from_debezium is the
    identity on (key, payload, op-class): insert keys ride after,
    delete keys ride before ONLY (Debezium's shape), updates carry
    both images."""
    from etl_cms_spark.sources.envelopes import from_debezium, to_debezium

    diff = spark.createDataFrame(
        [
            ("k1", "I", None, {"v": "new"}),
            ("k2", "U", {"v": "old"}, {"v": "upd"}),
            ("k3", "D", {"v": "gone"}, None),
        ],
        "k string, op string, before struct<v:string>, after struct<v:string>",
    )
    env = to_debezium(diff, ["k"], lsn=7)
    rows = {r["op"]: r for r in env.collect()}
    assert set(rows) == {"c", "u", "d"}
    assert rows["c"]["before"] is None and rows["c"]["after"]["k"] == "k1"
    assert rows["d"]["after"] is None and rows["d"]["before"]["k"] == "k3"
    assert rows["u"]["before"]["v"] == "old" and rows["u"]["after"]["v"] == "upd"
    assert all(r["source"]["lsn"] == 7 for r in rows.values())

    flat = {r["k"]: r for r in from_debezium(env, ["k"]).collect()}
    assert flat["k1"]["op"] == "I" and flat["k1"]["v"] == "new"
    assert flat["k2"]["op"] == "U" and flat["k2"]["v"] == "upd"
    assert flat["k3"]["op"] == "D" and flat["k3"]["v"] is None
    assert all(r["lsn"] == 7 for r in flat.values())


def test_debezium_key_change_splits_into_delete_plus_insert(spark, tmp_root):
    """A key-changing ``u`` (before.k != after.k) must MOVE the row:
    tombstone at the old key + insert at the new key, both at the
    envelope's LSN.  Taking only the after-key (on_key_change=
    'ignore') strands the old row — the merged state shows exactly
    that divergence."""
    import os

    from pyspark.sql import functions as F

    from etl_cms_spark.sink.lake import LakeTable
    from etl_cms_spark.sources.envelopes import from_debezium

    sch = (
        "op string, before struct<k:string,v:string>, "
        "after struct<k:string,v:string>, source struct<lsn:long>"
    )
    rows = [
        ("c", None, ("k1", "v1"), (1,)),
        ("c", None, ("k2", "w1"), (2,)),
        # primary-key update: k1 -> k9 (payload also changes)
        ("u", ("k1", "v1"), ("k9", "v2"), (3,)),
        # ordinary update, same key: must NOT split
        ("u", ("k2", "w1"), ("k2", "w2"), (4,)),
    ]
    env = spark.createDataFrame(rows, sch)

    flat = from_debezium(env, ["k"])  # default on_key_change="split"
    assert flat.count() == 5  # 4 envelopes -> 5 events
    moved = {(r["k"], r["op"], r["lsn"]): r["v"] for r in flat.collect()}
    assert moved[("k1", "D", 3)] is None  # tombstone, no payload
    assert moved[("k9", "I", 3)] == "v2"
    assert ("k2", "U", 4) in moved  # same-key update untouched

    t = LakeTable(spark, os.path.join(tmp_root, "dbz_kc"), n_buckets=2)
    t.create(["k"], {"k": "string", "v": "string"})
    t.merge_epoch(flat, 0)
    state = {r["k"]: r["v"] for r in t.read().collect()}
    assert state == {"k9": "v2", "k2": "w2"}  # k1 is GONE

    # 'ignore' reproduces the stranded-row bug it exists to escape to
    legacy = from_debezium(env, ["k"], on_key_change="ignore")
    t2 = LakeTable(spark, os.path.join(tmp_root, "dbz_kc2"), n_buckets=2)
    t2.create(["k"], {"k": "string", "v": "string"})
    t2.merge_epoch(legacy, 0)
    state2 = {r["k"]: r["v"] for r in t2.read().collect()}
    assert state2 == {"k1": "v1", "k9": "v2", "k2": "w2"}

    # split path stays shuffle-free: Generate, but no Exchange
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # null-safe: NULL before-image never witnesses a change
    no_before = spark.createDataFrame([("u", None, ("k5", "z1"), (9,))], sch)
    out = from_debezium(no_before, ["k"]).collect()
    assert len(out) == 1 and out[0]["k"] == "k5" and out[0]["op"] == "U"


def test_debezium_key_change_error_mode_fails_fast(spark):
    import pytest

    from etl_cms_spark.sources.envelopes import from_debezium

    sch = (
        "op string, before struct<k:string,v:string>, "
        "after struct<k:string,v:string>, source struct<lsn:long>"
    )
    env = spark.createDataFrame([("u", ("k1", "v1"), ("k9", "v2"), (3,))], sch)
    with pytest.raises(Exception, match="key-changing update"):
        from_debezium(env, ["k"], on_key_change="error").collect()
    with pytest.raises(ValueError, match="split\\|error\\|ignore"):
        from_debezium(env, ["k"], on_key_change="bogus")
