"""Real JDBC round-trip against embedded Derby (the only JDBC database in
the container — its driver ships inside Spark's jars).

This exercises the reference's actual end-to-end pipeline — introspect →
create → batched load → scan back (`handler/Handler.java:42-55`) — through
Spark's JDBC source/sink, including the parallel partitioned read that
replaces the reference's single-thread scan."""

from __future__ import annotations

import shutil

import pytest

from cpt_database_sync_spark.sources.sync import (
    jdbc_reader,
    jdbc_writer,
    scratch_dir,
)
from cpt_database_sync_spark.sources.tables import load

DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


@pytest.fixture(scope="module")
def derby_url():
    db_dir = f"{scratch_dir()}/derby_test_db"
    shutil.rmtree(db_dir, ignore_errors=True)
    return f"jdbc:derby:{db_dir};create=true"


def test_full_copy_round_trip(spark, sf_dir, derby_url):
    src = load(spark, sf_dir, "customer")
    jdbc_writer(src, derby_url, "customer_copy", props=DERBY_PROPS)
    back = jdbc_reader(spark, derby_url, "customer_copy", props=DERBY_PROPS)
    src_rows = sorted(tuple(r) for r in src.collect())
    back_rows = sorted(tuple(r) for r in back.collect())
    assert back_rows == src_rows  # the reference's count check, made exact


def test_overwrite_is_idempotent(spark, sf_dir, derby_url):
    src = load(spark, sf_dir, "nation")
    jdbc_writer(src, derby_url, "nation_copy", props=DERBY_PROPS)
    jdbc_writer(src, derby_url, "nation_copy", props=DERBY_PROPS)  # drop+recreate
    back = jdbc_reader(spark, derby_url, "nation_copy", props=DERBY_PROPS)
    assert back.count() == src.count()


def test_partitioned_parallel_read(spark, sf_dir, derby_url):
    src = load(spark, sf_dir, "customer")
    jdbc_writer(src, derby_url, "customer_part", props=DERBY_PROPS)
    hi = src.count()
    back = jdbc_reader(
        spark,
        derby_url,
        "customer_part",
        props=DERBY_PROPS,
        partition_column="c_custkey",
        lower_bound=1,
        upper_bound=hi + 1,
        num_partitions=4,
    )
    # 4 concurrent range scans replacing the reference's single cursor
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == hi
