"""Driver-lane crossover measurement (VERDICT r13 next #5).

The r13 optimization round moved the ITERATION of the loop-shaped
operators (graph fixed points, dedup connected components, the BPE merge
loop) onto the driver below data-probed ceilings
(``GRAPH_DRIVER_EDGE_CEILING`` / ``DEDUP_CC_EDGE_CEILING`` = 500k edges,
``BPE_VOCAB_DRIVER_CEILING`` = 200k words). The ceilings were sized by
memory-bound argument only — nothing ever TIMED the driver lane against
the distributed lane AT the ceiling, so the constants were assumptions.

This harness builds synthetic inputs at fractions and multiples of each
ceiling, times both lanes on identical data in one session (forcing the
lane by patching the module ceiling, exactly like the twin tests), checks
the lanes produce identical results, and prints one JSON document
(committed as ``CROSSOVER_r14.json``). "The right ceiling" is where the
lane times cross: below it the distributed loop is pure job overhead,
above it the driver solve's single-core Python cost overtakes.

Run: ``python tests/crossover.py [out.json]`` (quiet host; ~minutes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cpt_database_sync_spark.operators import graph, llm_dedup, llm_text  # noqa: E402
from cpt_database_sync_spark.session import get_spark  # noqa: E402


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def cc_edges(spark, n_edges: int, n_nodes: int):
    """Deterministic synthetic (a_id, b_id) pair relation: n_edges rows
    over n_nodes nodes, hashed spread (guide §2.5 — deterministic
    synthetic keys), a_id < b_id like the near-dup pair pipelines."""
    e = spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(n_nodes)).alias("y"),
    )
    return (
        e.filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a_id"), F.greatest("x", "y").alias("b_id")
        )
        .distinct()
        .localCheckpoint(eager=True)  # time the LANES, not the generator
    )


def run_cc(spark, sizes) -> dict:
    out = {}
    for n in sizes:
        edges = cc_edges(spark, n, max(1000, n // 50))
        n_real = edges.count()
        saved = llm_dedup.DEDUP_CC_EDGE_CEILING
        try:
            llm_dedup.DEDUP_CC_EDGE_CEILING = 2_000_000_000  # force driver lane (limit() takes int32)
            d_res, t_driver = _timed(
                lambda: _rowset(llm_dedup.connected_components(edges))
            )
            llm_dedup.DEDUP_CC_EDGE_CEILING = 0  # force distributed lane
            s_res, t_dist = _timed(
                lambda: _rowset(llm_dedup.connected_components(edges))
            )
        finally:
            llm_dedup.DEDUP_CC_EDGE_CEILING = saved
        out[str(n)] = {
            "edges": n_real,
            "t_driver": t_driver,
            "t_distributed": t_dist,
            "identical": d_res == s_res,
        }
    return out


def run_graph(spark, sizes) -> dict:
    """PageRank representative for the 5 graph loops: synthetic flows
    (src, dst, w) patched in for ``_trade_flows``; both lanes share the
    checkpointed edge relation so only the iteration is timed."""
    out = {}
    saved_flows = graph._trade_flows
    saved_ceil = graph.GRAPH_DRIVER_EDGE_CEILING
    try:
        for n in sizes:
            n_nodes = max(1000, int((2 * n) ** 0.5))
            flows = (
                spark.range(n)
                .select(
                    F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("src"),
                    F.pmod(
                        F.xxhash64(F.col("id") + 7_777_777), F.lit(n_nodes)
                    ).alias("dst"),
                )
                .filter(F.col("src") != F.col("dst"))
                .groupBy("src", "dst")
                .agg(F.count(F.lit(1)).alias("w"))
                .localCheckpoint(eager=True)
            )
            n_real = flows.count()
            # real sf_dir only for the final 25-row nation-name join;
            # the iteration runs over the patched synthetic flows
            sf_small = "/root/testdata/sf0.001"
            graph._trade_flows = lambda s, d, _f=flows: _f
            graph._FLOWS_ROWS_MEMO[:] = []
            graph.GRAPH_DRIVER_EDGE_CEILING = 2_000_000_000
            d_res, t_driver = _timed(
                lambda: _rowset(graph.pagerank_nations(spark, sf_small,
                                                       n_nodes_hint=1))
            )
            graph._FLOWS_ROWS_MEMO[:] = []
            graph.GRAPH_DRIVER_EDGE_CEILING = 0
            s_res, t_dist = _timed(
                lambda: _rowset(graph.pagerank_nations(spark, sf_small,
                                                       n_nodes_hint=1))
            )
            out[str(n)] = {
                "edges": n_real,
                "t_driver": t_driver,
                "t_distributed": t_dist,
                "identical": d_res == s_res,
            }
    finally:
        graph._trade_flows = saved_flows
        graph.GRAPH_DRIVER_EDGE_CEILING = saved_ceil
        graph._FLOWS_ROWS_MEMO[:] = []
    return out


def run_bpe(spark, sizes) -> dict:
    """BPE merge loop at vocab sizes around BPE_VOCAB_DRIVER_CEILING:
    synthetic corpus = one document per distinct word (freq 1), words of
    4-10 lowercase letters derived from the row id."""
    from cpt_database_sync_spark.operators import llm_text as lt

    out = {}
    saved_load = lt.load
    saved_ceil = lt.BPE_VOCAB_DRIVER_CEILING
    try:
        for n in sizes:
            # hex-rendered hash = a 1-16 char word over [0-9a-f]: real
            # shared-substring structure for the merge loop to chew on
            word = F.lower(F.hex(F.abs(F.xxhash64(F.col("id")))))
            docs = (
                spark.range(n)
                .select(F.col("id").alias("doc_id"), word.alias("text"))
                .localCheckpoint(eager=True)
            )
            n_real = docs.select("text").distinct().count()
            lt.load = lambda s, d, t, _docs=docs: _docs
            lt.BPE_VOCAB_DRIVER_CEILING = 2_000_000_000
            d_res, t_driver = _timed(
                lambda: _rowset(lt.bpe_learn(spark, "/nonexistent"))
            )
            lt.BPE_VOCAB_DRIVER_CEILING = 0
            s_res, t_dist = _timed(
                lambda: _rowset(lt.bpe_learn(spark, "/nonexistent"))
            )
            out[str(n)] = {
                "distinct_words": n_real,
                "t_driver": t_driver,
                "t_distributed": t_dist,
                "identical": d_res == s_res,
            }
    finally:
        lt.load = saved_load
        lt.BPE_VOCAB_DRIVER_CEILING = saved_ceil
    return out


def main() -> None:
    spark = get_spark(app_name="crossover-r14")
    doc = {
        "loadavg": round(os.getloadavg()[0], 2),
        "cc": run_cc(spark, [125_000, 500_000, 2_000_000]),
        "graph_pagerank": run_graph(spark, [125_000, 500_000, 2_000_000]),
        "bpe": run_bpe(spark, [50_000, 200_000, 800_000]),
    }
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CROSSOVER_r14.json"
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
