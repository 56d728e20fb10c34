"""Tags (named snapshot refs): immutable retention pins that survive
vacuum's keep_last window — the operational half of time travel."""

import os

import pytest

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.plans.pipeline import CDCPipeline
from etl_cms_spark.sink.lake import LakeTable


def _run(spark, tmp_root, name, n_epochs=3):
    changes = gen_source_changes(spark, n_events=1500, n_keys=200, n_repos=8)
    p = CDCPipeline(spark, os.path.join(tmp_root, name), n_buckets=8)
    p.run(changes, n_epochs=n_epochs)
    return p


def test_tag_survives_vacuum(spark, tmp_root):
    p = _run(spark, tmp_root, "tg")
    lin = p.table.lineage()
    v0 = int(lin[0]["snapshot_version"])
    pinned = sorted(map(str, p.table.read_at(v0).collect()))
    assert p.table.tag("audit-epoch0", v0) == v0
    rep = p.table.vacuum(keep_last=1)
    assert rep["removed_bucket_dirs"] >= 0
    # the tagged snapshot still reads, byte-identical
    assert sorted(map(str, p.table.read_tag("audit-epoch0").collect())) == pinned
    # an untagged old version in between is gone
    v1 = int(lin[1]["snapshot_version"])
    with pytest.raises(FileNotFoundError):
        p.table.read_at(v1)


def test_drop_tag_releases_retention(spark, tmp_root):
    p = _run(spark, tmp_root, "dt")
    v0 = int(p.table.lineage()[0]["snapshot_version"])
    p.table.tag("tmp-pin", v0)
    p.table.vacuum(keep_last=1)
    assert p.table.read_tag("tmp-pin").count() > 0
    p.table.drop_tag("tmp-pin")
    p.table.vacuum(keep_last=1)
    with pytest.raises(FileNotFoundError):
        p.table.read_at(v0)


def test_tag_validation(spark, tmp_root):
    t = LakeTable(spark, os.path.join(tmp_root, "tv"), n_buckets=4)
    t.create(["k"], {"k": "string", "v": "int"})
    t.tag("rel-1.0")
    with pytest.raises(ValueError, match="already exists"):
        t.tag("rel-1.0")
    with pytest.raises(ValueError, match="unknown or vacuumed"):
        t.tag("ghost", version=9999)
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("no/slashes")
    with pytest.raises(ValueError, match="no such tag"):
        t.drop_tag("missing")
    assert t.tags() == {"rel-1.0": t._current_version()}
