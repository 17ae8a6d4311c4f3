"""Deduplication operators for LLM-data pipelines.

Four tiers, each a pure DataFrame pipeline (no driver-side loops, no
collect; xxhash64 is Spark-built-in and deterministic):

- ``dedup_exact``      — sha2 content hash, keep lowest doc_id per text.
- ``dedup_ngram``      — exact word-3-shingle Jaccard over candidate pairs
                         that share ≥1 shingle (the exact verifier; its
                         shingle join is the part LSH replaces at scale).
- ``dedup_minhash``    — MinHash signatures + banded LSH: candidates from
                         band-bucket equality only, then exact-Jaccard
                         verification of candidates. Near-linear at 100 TB:
                         cost ~ #docs × #bands + bucket-local joins.
- ``dedup_simhash``    — 64-bit SimHash + 16-bit band LSH + Hamming
                         verification: catches small edits that shift many
                         shingles.

The reference has no dedup of any kind (its only "integrity" check is
fetch-count == pull-count, `sync/FetchRunner.java:38`); these are the
BASELINE.json-mandated extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cpt_database_sync_spark.plans.registry import register
from cpt_database_sync_spark.sources.tables import load

SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
MINHASH_HASHES = 16
MINHASH_BANDS = 4  # 4 rows per band
SIMHASH_HAMMING_MAX = 3


@register(
    "dedup_exact",
    oracle="""
    SELECT
      min(doc_id) AS keep_id,
      COUNT(*) AS n_copies,
      sha256(text) AS fp
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by sha2(text), keep the lowest doc_id.

    Scale note: grouping by the 64-hex digest instead of the full text
    keeps shuffle rows small; at 100 TB this is a single hash-shuffle on a
    well-distributed key.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", F.sha2("text", 256))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies", "fp")
    )


def _shingles(text_col: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-shingles of a text column (empty if < k words)."""
    words = F.split(F.trim(text_col), r"\s+")
    return F.when(
        F.size(words) >= k,
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, size(split(trim(text), '\\\\s+')) - {k}), "
                f"i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i + 1, {k})))"
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_table(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) exploded pairs + per-doc shingle counts."""
    return docs.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("g")
    )


def exact_jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over all pairs sharing ≥1 shingle.

    The shingle self-join is quadratic in per-shingle frequency — fine as
    a verifier / small-corpus path; MinHash-LSH bounds the candidate set
    at scale.
    """
    e = shingle_table(docs)
    sizes = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = e.alias("a"), e.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "a_id", "n": "na"}), "a_id")
        .join(sizes.withColumnsRenamed({"doc_id": "b_id", "n": "nb"}), "b_id")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_common", "jaccard")
    )


@register(
    "dedup_ngram",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN len(w) >= {SHINGLE_K}
                  THEN list_distinct(list_transform(range(1, len(w) - {SHINGLE_K - 2}),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [] END AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
    ),
    e AS (SELECT doc_id, unnest(sh) AS g FROM s),
    sizes AS (SELECT doc_id, len(sh) AS n FROM s),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, n_common,
           CAST(n_common AS DOUBLE) / CAST(la.n + lb.n - n_common AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes la ON la.doc_id = a_id
    JOIN sizes lb ON lb.doc_id = b_id
    WHERE CAST(n_common AS DOUBLE) / CAST(la.n + lb.n - n_common AS DOUBLE)
          >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-shingle Jaccard ≥ 0.5."""
    return exact_jaccard_pairs(load(spark, sf_dir, "documents"), JACCARD_THRESHOLD)


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h{k-1}) MinHash signature via seeded xxhash64.

    One explode + one groupBy: the signature aggregation is a map-side
    combinable min() per hash — linear in total shingle count.
    """
    e = shingle_table(docs)
    mins = [
        F.min(F.xxhash64(F.concat(F.lit(f"mh{i}|"), F.col("g")))).alias(f"h{i}")
        for i in range(MINHASH_HASHES)
    ]
    return e.groupBy("doc_id").agg(*mins)


def minhash_candidates(sig: DataFrame) -> DataFrame:
    """LSH banding: equal band-hash in any band → candidate pair."""
    rows_per_band = MINHASH_HASHES // MINHASH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("band")).select(
        "doc_id", "band.band_id", "band.band_hash"
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


@register("dedup_minhash")  # rows-only: xxhash64 signatures are Spark-specific
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidates, exact-Jaccard verified.

    16 hashes / 4 bands of 4: P(candidate) = 1-(1-j^4)^4 — ≈1.0 at the
    planted-duplicate similarity (~0.97), steep dropoff below ~0.7. The
    exact-Jaccard verification of candidates removes band-collision false
    positives, so emitted pairs are true near-dups (tested against
    dedup_ngram's exact pair set in tests/test_llm_ops.py).
    """
    docs = load(spark, sf_dir, "documents")
    cand = minhash_candidates(minhash_signatures(docs))
    verified = exact_jaccard_pairs(docs, JACCARD_THRESHOLD)
    return cand.join(verified, ["a_id", "b_id"]).select(
        "a_id", "b_id", "jaccard"
    )


def simhash_column(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over word tokens.

    Explode words → per-word xxhash64 → per-bit ±1 vote sums → sign bits
    reassembled into a BIGINT. Entirely aggregation-shaped (combinable)."""
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    h = F.xxhash64("w")
    votes = [
        F.sum(
            F.when(
                h.bitwiseAND(F.shiftleft(F.lit(1).cast("bigint"), j)) != 0, 1
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(64)
    ]
    per_doc = words.groupBy("doc_id").agg(*votes)
    sim = None
    for j in range(64):
        bit = F.when(
            F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)
        ).otherwise(F.lit(0).cast("bigint"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return per_doc.select("doc_id", sim.alias("simhash"))


@register("dedup_simhash")  # rows-only: xxhash64-based
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 4×16-bit band LSH (a pair within Hamming
    distance 3 shares ≥1 exact band — pigeonhole), verified by true
    Hamming ≤ 3."""
    sims = simhash_column(load(spark, sf_dir, "documents"))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftrightunsigned("simhash", b * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_val"),
            )
            for b in range(4)
        ]
    )
    banded = sims.select("doc_id", "simhash", F.explode(bands).alias("band")).select(
        "doc_id", "simhash", "band.band_id", "band.band_val"
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .select("a_id", "b_id", "hamming")
    )
