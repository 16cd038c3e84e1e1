"""Fixture determinism + the span-sequence equality invariant
(SURVEY.md §5 item 3; input_hint's per-row invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import N_DOCS, N_MEDIA, N_PARTITIONS, SEED


def _table_hash(df):
    """Order-independent content hash of a docs frame."""
    return df.select(
        F.expr("bit_xor(xxhash64(to_json(struct(doc_id, spans, partition_id))))")
    ).first()[0]


def test_generation_deterministic(spark, docs):
    """Same (seed, n) → identical table, independent of generation
    parallelism (splitmix64 keyed on row id, not partition)."""
    from anomalydetection_spark.fixtures import generate_documents

    again = generate_documents(
        spark, N_DOCS, seed=SEED, n_partitions=N_PARTITIONS, n_media=N_MEDIA
    )
    assert _table_hash(again) == _table_hash(docs)
    assert again.count() == docs.count() == N_DOCS


def test_different_seed_differs(spark, docs):
    from anomalydetection_spark.fixtures import generate_documents

    other = generate_documents(
        spark, N_DOCS, seed=SEED + 1, n_partitions=N_PARTITIONS, n_media=N_MEDIA
    )
    assert _table_hash(other) != _table_hash(docs)


def test_span_sequence_round_trip(spark, docs):
    """posexplode → reassemble ordered by pos reproduces every doc's
    span sequence exactly, including null/empty spans arrays."""
    # planted duplicate doc_ids are distinct physical rows — tag each
    # row uniquely so reassembly can't merge two docs sharing an id
    tagged = docs.withColumn("_rid", F.monotonically_increasing_id()).cache()
    tagged.count()
    exploded = tagged.select(
        "_rid",
        "doc_id",
        "partition_id",
        F.col("spans").isNull().alias("was_null"),
        F.posexplode_outer("spans").alias("pos", "s"),
    )
    rebuilt = (
        exploded.groupBy("_rid", "doc_id", "partition_id", "was_null")
        .agg(
            F.transform(
                F.filter(
                    F.sort_array(F.collect_list(F.struct("pos", "s"))),
                    lambda x: x["s"].isNotNull()
                    | x["s"]["kind"].isNotNull()
                    | x["s"]["text"].isNotNull()
                    | x["s"]["media_ref"].isNotNull()
                    | x["s"]["offset"].isNotNull(),
                ),
                lambda x: x["s"],
            ).alias("spans_rebuilt")
        )
        .select(
            "doc_id",
            "partition_id",
            F.when(F.col("was_null"), F.lit(None))
            .otherwise(F.col("spans_rebuilt"))
            .alias("spans"),
        )
    )
    # exceptAll in both directions == exact multiset equality
    orig = docs.select("doc_id", "partition_id", "spans")
    assert orig.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(orig).count() == 0


def test_planted_violation_counts(docs, expected):
    """The generator's closed-form expected sets match what landed in
    the table (guards against generator drift breaking the oracles)."""
    n_null = docs.filter(F.col("spans").isNull()).count()
    n_empty = docs.filter(
        F.col("spans").isNotNull() & (F.size("spans") == 0)
    ).count()
    assert n_null == len(expected["null_spans"])
    assert n_empty == len(expected["empty_spans"])

    dup_rows = (
        docs.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )
    assert dup_rows == len(expected["uniqueness"])


def test_hot_partition_skew(docs):
    """Partition 0 absorbs the overflow band — verifies the skew the
    salting paths are exercised against."""
    counts = {
        r.partition_id: r["count"]
        for r in docs.groupBy("partition_id").count().collect()
    }
    others = [v for k, v in counts.items() if k != 0]
    assert counts[0] > 3 * (sum(others) / len(others))
