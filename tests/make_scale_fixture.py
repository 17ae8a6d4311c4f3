"""Deterministic scale-up fixture generator for the sfN step-up sweep
(VERDICT r10 next #7): builds a K×-replicated corpus from an existing
fixture dir so the heavy-tail operators can be timed AND differentially
verified (Spark vs DuckDB read the SAME parquet, so correctness is
engine-vs-engine regardless of how the data was made).

    python tests/make_scale_fixture.py /root/testdata/sf0.1 /tmp/sf1 10

Replication preserves the source fixture's distributional SHAPE while
multiplying its SIZE — the honest scale-up (a verbatim ×K copy would
instead multiply the DUPLICATE density and quadratic-pair mass, turning
a size experiment into a shape experiment):

- every key column offsets by copy_i × KEY_STRIDE; the stride is a
  multiple of lcm(1..10) × 90, so every `key % m` device the operators
  use (interval durations event_id % 90, corpus splits doc_id % 5, ...)
  sees the same residue distribution in every copy;
- referential integrity holds per copy (orders.o_custkey → customer,
  lineitem.l_orderkey → orders) because both sides shift together;
- region/nation stay catalog-sized (the realistic dimension shape);
- documents.text gets a per-copy word suffix so copies are NOT near-dups
  of each other: the near-dup cluster structure of the source corpus
  repeats K× (linear), instead of every doc acquiring K−1 exact twins
  (quadratic pair blowup); n_chars is recomputed on the transformed text;
- embeddings perturb by copy_i × 1e-4 so ANN distance ties stay broken.
"""

from __future__ import annotations

import os
import sys

import duckdb

# multiple of lcm(1..10)=2520 and of 90; larger than any sf<=10 key
KEY_STRIDE = 25_200_000

TABLES_AS_IS = ("region", "nation")

_COPY_SQL = {
    "customer": """
        SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM src""",
    "supplier": """
        SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM src""",
    "part": """
        SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM src""",
    "orders": """
        SELECT o_orderkey + {off} AS o_orderkey,
               o_custkey + {off} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src""",
    "lineitem": """
        SELECT l_orderkey + {off} AS l_orderkey,
               l_partkey + {off} AS l_partkey,
               l_suppkey + {off} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src""",
    "events": """
        SELECT event_id + {off} AS event_id, ts,
               user_id + {off} AS user_id,
               event_type, value, props
        FROM src""",
    # word suffix _k{i} keeps copy 0 byte-identical to the source and
    # makes cross-copy shingle sets disjoint (see module docstring);
    # NULL text stays NULL (regexp_replace propagates NULL).
    "documents": """
        SELECT doc_id + {off} AS doc_id,
               CASE WHEN {i} = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1_k{i}', 'g')
               END AS text,
               lang, source,
               CASE WHEN {i} = 0 THEN n_chars
                    ELSE len(CASE WHEN text IS NULL THEN NULL
                             ELSE regexp_replace(text, '(\\S+)', '\\1_k{i}', 'g')
                             END)
               END AS n_chars
        FROM src""",
    "embeddings": """
        SELECT vec_id + {off} AS vec_id,
               CASE WHEN {i} = 0 THEN embedding
                    ELSE list_transform(embedding,
                         x -> CAST(x + {i} * 0.0001 AS FLOAT))
               END AS embedding,
               label
        FROM src""",
}


def make_scale_fixture(src_dir: str, out_dir: str, copies: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src_dir}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, sql in _COPY_SQL.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM read_parquet('{src_dir}/{t}.parquet')"
        )
        union = "\nUNION ALL\n".join(
            sql.format(off=i * KEY_STRIDE, i=i) for i in range(copies)
        )
        con.execute(
            f"COPY ({union}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_scale_fixture(src, out, k)
