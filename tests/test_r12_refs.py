"""Iceberg refs — branches and tags (spec v2 ``refs`` metadata map).

Pinned: ref reads equal the snapshot read they point at, `main` tracks the
current snapshot, tags are immutable bookmarks, and refs PROTECT their
snapshots from expiry (the spec's retention rule) until dropped."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dataframe_spark.sources.iceberg import (
    IcebergError,
    expire_iceberg_snapshots,
    read_iceberg,
    resolve_iceberg_ref,
    set_iceberg_ref,
    write_iceberg_commit,
)


def _three_snaps(spark, path):
    sids = []
    for k in range(3):
        sids.append(write_iceberg_commit(
            spark, path,
            spark.range(4).select(
                (F.col("id") + 10 * k).cast("long").alias("id"),
                F.lit(k).cast("long").alias("v"),
            ),
        ))
    return sids


class TestIcebergRefs:
    def test_ref_read_equals_snapshot_read(self, spark, tmp_path):
        path = str(tmp_path / "t")
        s1, s2, s3 = _three_snaps(spark, path)
        set_iceberg_ref(path, "v1", ref_type="tag", snapshot_id=s1)
        set_iceberg_ref(path, "audit", ref_type="branch", snapshot_id=s2)

        def ids(df):
            return sorted(r.id for r in df.collect())

        assert ids(read_iceberg(spark, path, ref="v1")) == ids(
            read_iceberg(spark, path, snapshot_id=s1)
        )
        assert len(ids(read_iceberg(spark, path, ref="v1"))) == 4
        assert len(ids(read_iceberg(spark, path, ref="audit"))) == 8
        assert ids(read_iceberg(spark, path, ref="main")) == ids(
            read_iceberg(spark, path)
        )
        assert resolve_iceberg_ref(path, "main") == s3

    def test_ref_refusals(self, spark, tmp_path):
        path = str(tmp_path / "t")
        s1, _s2, _s3 = _three_snaps(spark, path)
        with pytest.raises(IcebergError, match="reserved"):
            set_iceberg_ref(path, "main", snapshot_id=s1)
        with pytest.raises(IcebergError, match="not in metadata"):
            set_iceberg_ref(path, "x", snapshot_id=123456)
        with pytest.raises(IcebergError, match="does not exist"):
            read_iceberg(spark, path, ref="nope")
        with pytest.raises(IcebergError, match="does not exist"):
            set_iceberg_ref(path, "nope", drop=True)
        with pytest.raises(IcebergError, match="'tag' or 'branch'"):
            set_iceberg_ref(path, "x", ref_type="wat")
        set_iceberg_ref(path, "v1", ref_type="tag", snapshot_id=s1)
        with pytest.raises(IcebergError, match="immutable"):
            set_iceberg_ref(path, "v1", ref_type="tag")
        with pytest.raises(IcebergError, match="not both"):
            read_iceberg(spark, path, ref="v1", snapshot_id=s1)

    def test_refs_protect_snapshots_from_expiry(self, spark, tmp_path):
        path = str(tmp_path / "t")
        s1, s2, _s3 = _three_snaps(spark, path)
        set_iceberg_ref(path, "v1", ref_type="tag", snapshot_id=s1)

        removed = expire_iceberg_snapshots(path, keep_last=1)
        # s2's exclusive files die; s1 survives through the tag
        assert removed > 0
        assert read_iceberg(spark, path, ref="v1").count() == 4
        assert read_iceberg(spark, path).count() == 12
        with pytest.raises(IcebergError):
            read_iceberg(spark, path, snapshot_id=s2).collect()

        # dropping the tag releases the snapshot; the next expiry takes it
        set_iceberg_ref(path, "v1", drop=True)
        removed2 = expire_iceberg_snapshots(path, keep_last=1)
        assert removed2 > 0
        with pytest.raises(IcebergError):
            read_iceberg(spark, path, snapshot_id=s1).collect()
        assert read_iceberg(spark, path).count() == 12

    def test_branch_moves_tag_does_not(self, spark, tmp_path):
        path = str(tmp_path / "t")
        s1, s2, _s3 = _three_snaps(spark, path)
        set_iceberg_ref(path, "b", ref_type="branch", snapshot_id=s1)
        assert resolve_iceberg_ref(path, "b") == s1
        set_iceberg_ref(path, "b", ref_type="branch", snapshot_id=s2)
        assert resolve_iceberg_ref(path, "b") == s2
