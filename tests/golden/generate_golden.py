"""Freeze golden outputs for the seeded-hash approximate operators.

``dedup_minhash``, ``dedup_simhash`` and ``sim_ann_lsh`` are exact
functions of the fixture content and their compile-time seeds (xxhash64,
seeded Gaussian hyperplanes) — but their hash primitives don't exist in
DuckDB, so they had no SQL oracle ("rows-only" driver evidence). This
script runs each query on every fixture scale and freezes the result into
one committed parquet per query, keyed by a content fingerprint of the
input corpus (md5 over the ordered rows, computed in DuckDB with the very
expression the oracle SQL reuses). The registered oracle then reads the
golden file filtered to the current corpus fingerprint, giving the driver
full rows+schema+hash evidence.

If the driver regenerates fixtures with different *content*, the
fingerprint no longer matches and parity fails loudly — rerun:

    python tests/golden/generate_golden.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from cpt_database_sync_spark.plans.golden import (  # noqa: E402
    DOCS_FINGERPRINT_SQL,
    EMB_FINGERPRINT_SQL,
)

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

GOLDEN_QUERIES = {
    "bpe_learn": ("documents", DOCS_FINGERPRINT_SQL),
    "dedup_minhash": ("documents", DOCS_FINGERPRINT_SQL),
    "dedup_minhash_incremental": ("documents", DOCS_FINGERPRINT_SQL),
    "dedup_simhash": ("documents", DOCS_FINGERPRINT_SQL),
    "sim_ann_lsh": ("embeddings", EMB_FINGERPRINT_SQL),
}


def fingerprint(sf_dir: str, table: str, expr: str) -> str:
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
        )
        return con.execute(f"SELECT {expr}").fetchone()[0]
    finally:
        con.close()


def main() -> None:
    from cpt_database_sync_spark.plans.registry import all_specs
    from cpt_database_sync_spark.session import get_spark

    spark = get_spark(app_name="golden-gen")
    queries = all_specs()
    for name, (table, expr) in GOLDEN_QUERIES.items():
        frames = []
        for sf_dir in SF_DIRS:
            fp = fingerprint(sf_dir, table, expr)
            pdf = queries[name].fn(spark, sf_dir).toPandas()
            pdf.insert(0, "corpus_md5", fp)
            frames.append(pdf)
            print(f"{name} @ {sf_dir}: {len(pdf)} rows (fp {fp[:12]})")
        out = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pd.concat(frames, ignore_index=True).to_parquet(out, index=False)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
