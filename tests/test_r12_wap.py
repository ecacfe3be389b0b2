"""Iceberg WAP (write-audit-publish) + rollback, and Delta RESTORE.

Pinned: branch commits are invisible on main until fast-forward, the
branch read sees staged data, non-fast-forward publishes refuse, rollback
is metadata-only, and Delta RESTORE reconstructs an old version as a NEW
commit (pre-restore state stays time-travelable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestIcebergWap:
    def test_write_audit_publish(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            fast_forward_iceberg,
            read_iceberg,
            set_iceberg_ref,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path,
            spark.range(5).select(F.col("id").cast("long").alias("id")),
        )
        set_iceberg_ref(path, "staging", ref_type="branch")
        # two staged commits on the branch
        write_iceberg_commit(
            spark, path,
            spark.range(100, 103).select(
                F.col("id").cast("long").alias("id")
            ),
            branch="staging",
        )
        write_iceberg_commit(
            spark, path,
            spark.range(200, 202).select(
                F.col("id").cast("long").alias("id")
            ),
            branch="staging",
        )
        # main is untouched; the branch sees the staged rows
        assert read_iceberg(spark, path).count() == 5
        assert read_iceberg(spark, path, ref="staging").count() == 10
        # publish
        fast_forward_iceberg(path, "staging")
        assert read_iceberg(spark, path).count() == 10

    def test_publish_refuses_non_fast_forward(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            fast_forward_iceberg,
            set_iceberg_ref,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path,
            spark.range(5).select(F.col("id").cast("long").alias("id")),
        )
        set_iceberg_ref(path, "staging", ref_type="branch")
        write_iceberg_commit(
            spark, path,
            spark.range(100, 103).select(
                F.col("id").cast("long").alias("id")
            ),
            branch="staging",
        )
        # main advances independently -> branch head no longer descends
        # from main's current snapshot
        write_iceberg_commit(
            spark, path,
            spark.range(300, 302).select(
                F.col("id").cast("long").alias("id")
            ),
        )
        with pytest.raises(IcebergError, match="not an ancestor"):
            fast_forward_iceberg(path, "staging")

    def test_branch_write_requires_existing_branch(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path,
            spark.range(3).select(F.col("id").cast("long").alias("id")),
        )
        with pytest.raises(IcebergError, match="does not exist"):
            write_iceberg_commit(
                spark, path,
                spark.range(3).select(
                    F.col("id").cast("long").alias("id")
                ),
                branch="nope",
            )

    def test_rollback(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            read_iceberg,
            rollback_iceberg,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        s1 = write_iceberg_commit(
            spark, path,
            spark.range(4).select(F.col("id").cast("long").alias("id")),
        )
        s2 = write_iceberg_commit(
            spark, path,
            spark.range(10, 13).select(
                F.col("id").cast("long").alias("id")
            ),
        )
        rollback_iceberg(path, s1)
        assert read_iceberg(spark, path).count() == 4
        # the newer snapshot survives rollback (time-travelable)
        assert read_iceberg(spark, path, snapshot_id=s2).count() == 7
        with pytest.raises(IcebergError, match="not in metadata"):
            rollback_iceberg(path, 424242)


class TestDeltaRestore:
    def test_restore_to_old_version(self, spark, tmp_path):
        from rust_dataframe_spark.sources.delta import (
            read_delta,
            restore_delta,
            write_delta_commit,
        )

        path = str(tmp_path / "t")
        write_delta_commit(  # v0: 5 rows
            spark, path,
            spark.range(5).select(F.col("id").cast("long").alias("id")),
        )
        write_delta_commit(  # v1: +3 rows
            spark, path,
            spark.range(10, 13).select(
                F.col("id").cast("long").alias("id")
            ),
        )
        v_restore = restore_delta(spark, path, version=0)
        assert read_delta(spark, path).count() == 5
        # the pre-restore state stays readable above the restore commit
        assert read_delta(spark, path, version=v_restore - 1).count() == 8
        # restoring again to the same state is a loud no-op
        from rust_dataframe_spark.sources.delta import DeltaError

        with pytest.raises(DeltaError, match="no-op"):
            restore_delta(spark, path, version=0)

    def test_restore_refusals(self, spark, tmp_path):
        from rust_dataframe_spark.sources.delta import (
            DeltaError,
            restore_delta,
            vacuum_delta,
            write_delta_commit,
        )

        cdf = str(tmp_path / "cdf")
        write_delta_commit(
            spark, cdf,
            spark.range(3).select(F.col("id").cast("long").alias("id")),
            enable_cdf=True,
        )
        with pytest.raises(DeltaError, match="Change-Data-Feed"):
            restore_delta(spark, cdf, version=0)

        # vacuumed target refuses: v0's file must be gone
        vac = str(tmp_path / "vac")
        write_delta_commit(
            spark, vac,
            spark.range(3).select(
                F.col("id").cast("long").alias("id")
            ).coalesce(1),
        )
        from rust_dataframe_spark.sources.delta import (
            delta_snapshot_files,
            drop_delta_files,
        )

        _m, adds = delta_snapshot_files(spark, vac)
        drop_delta_files(  # v1 removes all of v0's files
            spark, vac, [a["path"] for a in adds]
        )
        write_delta_commit(
            spark, vac,
            spark.range(5, 8).select(
                F.col("id").cast("long").alias("id")
            ).coalesce(1),
        )
        vacuum_delta(spark, vac, retain_versions=1)
        with pytest.raises(DeltaError, match="vacuumed"):
            restore_delta(spark, vac, version=0)
