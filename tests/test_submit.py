"""Ship-mode smoke: the engine runs via ``spark-submit --py-files
dist/etl_cms_spark.zip`` from a directory that does NOT contain the
package, so the import resolves from the zip alone (BASELINE.json
north_rule: "run via spark-submit --py-files on a multi-executor
cluster").  Replaces nothing — the in-process suites test semantics;
this tests the deployment packaging."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit():
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_py_files_runs_pipeline(spark, tmp_root):
    exe = _spark_submit()
    if exe is None:
        pytest.skip("spark-submit not on PATH")

    # build the zip fresh
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "package.py")],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("etl_cms_spark.zip") and os.path.exists(zip_path)

    # stage an isolated work dir: main.py copied OUT of the repo so
    # the package can only come from --py-files, plus a tiny changelog
    work = os.path.join(tmp_root, "submit")
    os.makedirs(work)
    shutil.copy(os.path.join(REPO, "main.py"), work)
    from etl_cms_spark.fixtures.generator import gen_source_changes

    ch_dir = os.path.join(work, "changelog")
    gen_source_changes(spark, n_events=800, n_keys=200, n_repos=8) \
        .coalesce(2).write.parquet(ch_dir)
    lake = os.path.join(work, "lake")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing from the repo leaks in
    run = subprocess.run(
        [exe, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(work, "main.py"),
         "--changelog", ch_dir, "--lake", lake,
         "--epochs", "2", "--n-buckets", "4", "--merge-mode", "mor"],
        capture_output=True, text=True, cwd=work, env=env, timeout=600,
    )
    assert run.returncode == 0, run.stdout[-2000:] + run.stderr[-2000:]

    # the submitted run's lake equals the in-process pipeline's state
    from etl_cms_spark.operators.dedup import latest_by_lsn
    from etl_cms_spark.plans.mapping import CONCEPT_MAP
    from etl_cms_spark.sink.lake import LakeTable
    from pyspark.sql import functions as F
    from tests.conftest import assert_df_equal

    t = LakeTable(spark, os.path.join(lake, "tables", "files"), n_buckets=4)
    changes = spark.read.parquet(ch_dir)
    latest = latest_by_lsn(
        changes.where(F.col("op") != "SCHEMA"), ["repo", "path"], "lsn"
    )
    expected = (
        latest.where(F.col("op") != "D")
        .where(F.col("lang").isin(list(CONCEPT_MAP.keys())))
        .select("repo", "path", "commit")
    )
    assert_df_equal(
        t.read().select("repo", "path", "commit"), expected,
        "spark-submit --py-files run == in-process expected state",
    )
