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


def test_incremental_append_crash_retry_is_idempotent(spark, sf_dir):
    """A crash between the increment write and the watermark advance must
    not duplicate rows on retry (ADVICE r1): the retry recomputes the same
    watermark range and overwrites the same run-keyed path."""
    import os

    from pyspark.sql import functions as F

    from cpt_database_sync_spark.streaming.incremental import (
        _write_watermark,
        incremental_append,
        read_increments,
    )
    from cpt_database_sync_spark.sources.tables import load

    target = f"{scratch_dir()}/incr_idem_test/data"
    wm_file = f"{scratch_dir()}/incr_idem_test/wm.json"
    shutil.rmtree(f"{scratch_dir()}/incr_idem_test", ignore_errors=True)
    os.makedirs(f"{scratch_dir()}/incr_idem_test", exist_ok=True)

    ev = load(spark, sf_dir, "events")
    cutoff = "2024-01-15 00:00:00"
    incremental_append(spark, ev.filter(F.col("ts") <= cutoff), "ts", target, wm_file)
    wm_after_phase1 = open(wm_file).read()

    # first shipment of the tail, then simulate the crash: data landed but
    # the watermark write was lost
    incremental_append(spark, ev, "ts", target, wm_file)
    with open(wm_file, "w") as f:
        f.write(wm_after_phase1)

    # retry re-ships the same increment
    incremental_append(spark, ev, "ts", target, wm_file)

    assert read_increments(spark, target).count() == ev.count()


def test_incremental_retry_with_new_rows_does_not_double_count(spark, sf_dir):
    """Harder crash case (ADVICE r2): new source rows arrive BETWEEN the
    orphaned increment write and the retry. A high-keyed run dir would
    leave inc_<hwm>_<max1> beside inc_<hwm>_<max2> and double-count the
    overlap; low-keyed dirs make the retry overwrite the orphan."""
    import os

    from pyspark.sql import functions as F

    from cpt_database_sync_spark.streaming.incremental import (
        incremental_append,
        read_increments,
    )

    target = f"{scratch_dir()}/incr_retry_test/data"
    wm_file = f"{scratch_dir()}/incr_retry_test/wm.json"
    shutil.rmtree(f"{scratch_dir()}/incr_retry_test", ignore_errors=True)
    os.makedirs(f"{scratch_dir()}/incr_retry_test", exist_ok=True)

    ev = load(spark, sf_dir, "events")
    c1, c2 = "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    incremental_append(spark, ev.filter(F.col("ts") <= c1), "ts", target, wm_file)
    wm_after_phase1 = open(wm_file).read()

    # increment up to c2 lands, then crash: watermark write lost
    incremental_append(spark, ev.filter(F.col("ts") <= c2), "ts", target, wm_file)
    with open(wm_file, "w") as f:
        f.write(wm_after_phase1)

    # retry sees MORE source data (full table now) — wider range, same low
    incremental_append(spark, ev, "ts", target, wm_file)

    assert read_increments(spark, target).count() == ev.count()


def test_run_to_table_empty_source_and_scratch_cleanup(spark, sf_dir):
    """Zero-micro-batch streams return an empty frame (not an
    AnalysisException on the never-created sink dir), and the per-run
    tmpfs scratch is fully deleted after materialization (ADVICE r2)."""
    import os

    from pyspark.sql import functions as F

    from cpt_database_sync_spark.streaming.windows import (
        events_stream,
        run_to_table,
    )

    empty_dir = f"{scratch_dir()}/empty_stream_src"
    shutil.rmtree(empty_dir, ignore_errors=True)
    os.makedirs(empty_dir, exist_ok=True)
    st = (
        spark.readStream.schema("k bigint, v double")
        .parquet(empty_dir)
        .groupBy("k")
        .agg(F.sum("v").alias("sv"))
    )
    out = run_to_table(st, "complete")
    assert out.count() == 0
    assert out.columns == ["k", "sv"]

    # a normal run must leave nothing NEW behind in the scratch root
    # (compare against a pre-run snapshot: a concurrent bench/driver
    # process or a stale dir from a killed run is not THIS run's leak)
    roots = ("/dev/shm/spark-graft-ckpt", "/tmp/spark-graft-ckpt")
    before = {
        root: set(os.listdir(root)) if os.path.isdir(root) else set()
        for root in roots
    }
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    res = run_to_table(agg, "complete")
    assert res.count() > 0
    for root in roots:
        if os.path.isdir(root):
            leaked = set(os.listdir(root)) - before[root]
            assert leaked == set(), f"leaked scratch in {root}: {leaked}"


def test_merge_into_semantics(spark, sf_dir):
    """Source wins on key match, unmatched source inserts, unmatched
    target survives — and the merged key set is exact."""
    from pyspark.sql import functions as F

    from cpt_database_sync_spark.sources.sync import merge_into

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    target = o.filter(F.col("o_orderkey") % 3 != 0)
    source = o.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    merged = merge_into(target, source, "o_orderkey").cache()

    t_keys = {r.o_orderkey for r in target.select("o_orderkey").collect()}
    s_keys = {r.o_orderkey for r in source.select("o_orderkey").collect()}
    m = {r.o_orderkey: r.o_totalprice for r in merged.collect()}
    assert set(m) == t_keys | s_keys
    assert merged.count() == len(t_keys | s_keys), "one row per key"
    for k, v in m.items():
        assert (v == -1.0) == (k in s_keys), f"key {k}: source must win"
    merged.unpersist()


def test_stream_checkpoint_processes_only_new_files(spark, sf_dir):
    """The incremental guarantee Structured Streaming's checkpoint gives
    the sync lineage: a second availableNow run against the SAME
    checkpoint dir must process only files that arrived since the first
    run — no reprocessing, no loss."""
    import os

    from pyspark.sql import functions as F

    root = f"{scratch_dir()}/ckpt_continuation"
    shutil.rmtree(root, ignore_errors=True)
    src, ckpt, out = f"{root}/src", f"{root}/ckpt", f"{root}/out"
    os.makedirs(src)

    batch1 = spark.range(0, 100).select(F.col("id").alias("k"))
    batch1.write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("k bigint").parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    run_once()
    assert spark.read.parquet(out).count() == 100

    # second batch arrives; rerun with the same checkpoint
    spark.range(100, 130).select(F.col("id").alias("k")).write.mode(
        "append"
    ).parquet(src)
    run_once()
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == list(range(130)), "must append exactly the 30 new rows"

    # idempotent: a third run with nothing new must add nothing
    run_once()
    assert spark.read.parquet(out).count() == 130
    shutil.rmtree(root, ignore_errors=True)


def test_jdbc_merge_null_key_upserts_one_row(spark):
    """NULL-safe MERGE keys (r8 review): a NULL-keyed group must hold
    exactly ONE serving row across repeated upsert batches — plain
    equality never matches NULL, which inserted a fresh duplicate per
    micro-batch."""
    import os

    from cpt_database_sync_spark.sources.sync import (
        jdbc_reader,
        jdbc_sync_table,
        jdbc_upsert_batch,
        sweep_scratch,
    )

    sweep_scratch("nullkey_", spark)
    workdir = os.path.join(scratch_dir(), "nullkey_db")
    shutil.rmtree(workdir, ignore_errors=True)
    url = f"jdbc:derby:{workdir}/db;create=true"
    df1 = spark.createDataFrame(
        [(None, 1.0), (7, 2.0)], "k INT, v DOUBLE"
    )
    jdbc_sync_table(spark, df1.limit(0), url, "serving", flavor="ansi")
    jdbc_upsert_batch(spark, df1, url, "serving", ["k"], flavor="ansi")
    df2 = spark.createDataFrame(
        [(None, 9.0), (7, 8.0)], "k INT, v DOUBLE"
    )
    jdbc_upsert_batch(spark, df2, url, "serving", ["k"], flavor="ansi")
    back = {
        r[0]: r[1]
        for r in jdbc_reader(spark, url, "serving").collect()
    }
    assert back == {None: 9.0, 7: 8.0}, back


def test_jdbc_cdc_null_op_row_inserts(spark):
    """NULL op marker reads as upsert on BOTH arms (r8 review): the
    INSERT arm's `op <> 'D'` alone evaluates to NULL for a NULL marker,
    silently discarding new-key rows while existing keys still updated.
    Drives merge_cdc_statement directly over SQL (Spark's JDBC writer
    cannot ship NULL strings into Derby VARCHAR, which is a writer
    limitation, not a MERGE one)."""
    import os

    from cpt_database_sync_spark.sources.sync import (
        _execute_jdbc,
        jdbc_reader,
        merge_cdc_statement,
        sweep_scratch,
    )

    sweep_scratch("nullop_", spark)
    workdir = os.path.join(scratch_dir(), "nullop_db")
    shutil.rmtree(workdir, ignore_errors=True)
    url = f"jdbc:derby:{workdir}/db;create=true"
    _execute_jdbc(spark, url, [
        'CREATE TABLE "T" ("K" INT, "V" DOUBLE)',
        'INSERT INTO "T" VALUES (1, 10.0), (3, 30.0)',
        'CREATE TABLE "S" ("K" INT, "V" DOUBLE, "OP" VARCHAR(4))',
        "INSERT INTO \"S\" VALUES (1, 11.0, NULL), (2, 20.0, NULL), (3, 33.0, 'D')",
    ])
    sql = merge_cdc_statement("T", "S", ["K", "V", "OP"], ["K"], "OP")
    _execute_jdbc(spark, url, [sql])
    back = {r[0]: r[1] for r in jdbc_reader(spark, url, "T").collect()}
    # NULL-op rows upsert on both arms; 'D' deletes
    assert back == {1: 11.0, 2: 20.0}, back
