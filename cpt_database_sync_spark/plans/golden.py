"""Golden-fixture oracles for seeded-hash approximate operators.

``dedup_minhash``, ``dedup_simhash`` and ``sim_ann_lsh`` are exact,
deterministic functions of the fixture content and their compile-time
seeds (xxhash64 signatures, seeded Gaussian hyperplanes) — but their hash
primitives have no DuckDB equivalent, so a recomputing SQL oracle is
impossible and the driver previously recorded only rows-count evidence.

Instead the expected output is frozen per fixture scale into committed
parquet under ``tests/golden/`` (see ``tests/golden/generate_golden.py``),
keyed by a content fingerprint of the input corpus. The oracle SQL reads
the golden file filtered to the fingerprint of the *current* corpus — so
the driver gets full rows+schema+hash evidence, and a fixture regenerated
with different content fails loudly (0 golden rows) instead of silently
comparing against stale expectations.
"""

from __future__ import annotations

from pathlib import Path

GOLDEN_DIR = Path(__file__).resolve().parents[2] / "tests" / "golden"

# Content fingerprints, computed wholly in DuckDB over the pre-registered
# fixture views (row counts alone can't discriminate: sf0.001 and sf0.01
# both ship 500 documents with different content).
DOCS_FINGERPRINT_SQL = (
    "(SELECT md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || text, '|' "
    "ORDER BY doc_id)) FROM documents)"
)
EMB_FINGERPRINT_SQL = (
    "(SELECT md5(string_agg(CAST(vec_id AS VARCHAR) || ':' || "
    "CAST(CAST(embedding AS DOUBLE[]) AS VARCHAR), '|' ORDER BY vec_id)) "
    "FROM embeddings)"
)


def golden_oracle(name: str, cols: list[str], fingerprint_sql: str) -> str:
    """Oracle SQL reading the committed golden parquet for ``name``."""
    path = GOLDEN_DIR / f"{name}.parquet"
    return (
        f"SELECT {', '.join(cols)} FROM read_parquet('{path}') "
        f"WHERE corpus_md5 = {fingerprint_sql}"
    )
