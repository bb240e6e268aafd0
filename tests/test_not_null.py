"""NOT NULL column constraints (VERDICT r8 item 5): declared at CREATE
or via set_not_null / ALTER ... SET NOT NULL, recorded in ChangeMetadata
on the CHECK lane (constraint ``<col>_not_null``), enforced in-plan on
every write path, validated against existing rows at declaration, and
blocked on stamp-gated-DEFAULT columns until materialization."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_experiment_spark.client import DeltaLakeClient
from delta_lake_experiment_spark.errors import TypeMismatchError


def _mk(spark, store_dir, **kw):
    c = DeltaLakeClient(spark, store_dir, dataobject_size=4)
    c.new_tx()
    c.create_table("t", "k BIGINT, v STRING", **kw)
    return c


def test_create_not_null_rejects_buffered_null(spark, store_dir):
    c = _mk(spark, store_dir, not_null=["v"])
    c.write_row("t", [1, "a"])
    c.write_row("t", [2, None])
    with pytest.raises(Exception, match="v_not_null"):
        c.commit_tx()  # flush evaluates the check in-plan
    c.abort_tx()


def test_create_not_null_rejects_bulk_ingest_null(spark, store_dir):
    c = _mk(spark, store_dir, not_null=["v"])
    c.commit_tx()
    c.new_tx()
    bad = spark.createDataFrame([(1, "a"), (2, None)], "k BIGINT, v STRING")
    with pytest.raises(Exception, match="v_not_null"):
        c.write_dataframe("t", bad)
    c.abort_tx()
    c.new_tx()
    c.write_dataframe(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING")
    )
    c.commit_tx()
    c.new_tx()
    assert c.scan("t").count() == 2
    c.abort_tx()


def test_merge_rejects_null_in_not_null_column(spark, store_dir):
    c = DeltaLakeClient(spark, store_dir, dataobject_size=4)
    c.new_tx()
    c.create_table(
        "t", "k BIGINT, v STRING", primary_keys=["k"], not_null=["v"]
    )
    c.write_row("t", [1, "a"])
    c.commit_tx()
    c.new_tx()
    with pytest.raises(Exception, match="v_not_null"):
        c.merge("t", spark.createDataFrame([(1, None)], "k BIGINT, v STRING"))
    c.abort_tx()


def test_set_not_null_validates_existing_rows(spark, store_dir):
    c = _mk(spark, store_dir)
    c.write_row("t", [1, None])
    c.commit_tx()
    c.new_tx()
    with pytest.raises(TypeMismatchError, match="existing row"):
        c.set_not_null("t", "v")
    c.abort_tx()


def test_set_then_drop_not_null_round_trip(spark, store_dir):
    c = _mk(spark, store_dir)
    c.write_row("t", [1, "a"])
    c.commit_tx()
    c.new_tx()
    c.set_not_null("t", "v")
    c.commit_tx()
    # recorded in ChangeMetadata: a FRESH client (pure log replay)
    # enforces it
    c2 = DeltaLakeClient(spark, store_dir, dataobject_size=4)
    c2.new_tx()
    assert "v_not_null" in c2.tx.snapshot.checks.get("t", {})
    with pytest.raises(Exception, match="v_not_null"):
        c2.write_dataframe(
            "t", spark.createDataFrame([(2, None)], "k BIGINT, v STRING")
        )
    c2.abort_tx()
    c2.new_tx()
    c2.drop_not_null("t", "v")
    c2.write_dataframe(
        "t", spark.createDataFrame([(2, None)], "k BIGINT, v STRING")
    )
    c2.commit_tx()
    c2.new_tx()
    assert c2.scan("t").count() == 2
    c2.abort_tx()
    with pytest.raises(TypeMismatchError, match="not declared"):
        c2.new_tx()
        c2.drop_not_null("t", "v")


def test_not_null_blocked_on_defaulted_column(spark, store_dir):
    c = _mk(spark, store_dir)
    c.write_row("t", [1, "a"])
    c.commit_tx()
    c.new_tx()
    c.add_columns("t", "score DOUBLE DEFAULT 1.5")
    c.commit_tx()
    c.new_tx()
    # stored pre-birth rows are physically NULL under the default —
    # the declaration is ambiguous until materialized
    with pytest.raises(TypeMismatchError, match="materialize"):
        c.set_not_null("t", "score")
    c.materialize_table("t")
    c.commit_tx()
    c.new_tx()
    c.set_not_null("t", "score")  # defaults baked in: unambiguous now
    c.commit_tx()
    c.new_tx()
    with pytest.raises(Exception, match="score_not_null"):
        c.write_dataframe(
            "t",
            spark.createDataFrame(
                [(9, "z", None)], "k BIGINT, v STRING, score DOUBLE"
            ),
        )
    c.abort_tx()


def test_sql_alter_not_null(spark, store_dir):
    c = _mk(spark, store_dir)
    c.write_row("t", [1, "a"])
    c.commit_tx()
    c.new_tx()
    c.execute("ALTER TABLE t ALTER COLUMN v SET NOT NULL")
    c.commit_tx()
    c.new_tx()
    assert "v_not_null" in c.tx.snapshot.checks["t"]
    c.execute("ALTER TABLE t ALTER COLUMN v DROP NOT NULL")
    c.commit_tx()
    c.new_tx()
    assert "v_not_null" not in c.tx.snapshot.checks.get("t", {})
    c.abort_tx()


def test_not_null_blocks_drop_and_rename_of_column(spark, store_dir):
    c = _mk(spark, store_dir, not_null=["v"])
    c.write_row("t", [1, "a"])
    c.commit_tx()
    c.new_tx()
    with pytest.raises(TypeMismatchError, match="references it"):
        c.drop_column("t", "v")
    with pytest.raises(TypeMismatchError, match="references it"):
        c.rename_column("t", "v", "label")
    c.abort_tx()
