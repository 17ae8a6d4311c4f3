"""Whole-database sync: the reference's boot loop, verified by counts and
spot value equality."""

from __future__ import annotations

import shutil

from cpt_database_sync_spark.sources.sync import scratch_dir, sync_database
from cpt_database_sync_spark.sources.tables import ALL_TABLES, load


def test_sync_database_copies_every_table(spark, sf_dir):
    target = f"{scratch_dir()}/sync_db_test"
    shutil.rmtree(target, ignore_errors=True)
    counts = sync_database(spark, sf_dir, target)
    assert set(counts) == set(ALL_TABLES)
    for t in ALL_TABLES:
        assert counts[t] == load(spark, sf_dir, t).count(), t
    # spot-check values survived, not just counts
    src = {r.n_nationkey: r.n_name for r in load(spark, sf_dir, "nation").collect()}
    dst = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{target}/nation").collect()
    }
    assert src == dst
