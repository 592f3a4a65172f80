"""Generate an ON-DISK sf1 dataset (10x sf0.1) by FK-consistent
replication — real parquet files, not in-memory union replication, so
scale sweeps exercise genuine file counts, row-group boundaries, and
scan parallelism.

Each of the 10 replicas shifts every entity key by rep * stride
(stride = a round power of ten above the base table's max key), so
joins stay consistent (replica i's lineitem references replica i's
orders/part/supplier) and keys stay unique. Dimension tables with
fixed cardinality (region, nation) are NOT replicated. Timestamps are
left unshifted: the temporal distribution stays the base one, which
keeps date-filter selectivities comparable across scales. Document
words get a per-replica suffix (tools/scaleup.py's convention): with
verbatim text every shingle would be shared by all replicas, and the
EXACT pair semantics of q26/q56 are genuinely quadratic in
duplicate-group size — a measured 34x wall blow-up at 10x that is a
property of the replicated DATA, not of the plans. Per-replica
vocabulary keeps shingle/minhash/near-dup structure per-replica so the
sweep measures plan scaling. Embeddings get a per-replica CIRCULAR
SHIFT of their coordinates — a permutation, i.e. an orthogonal
transform: norms and all intra-replica cosines are preserved exactly,
while cross-replica copies of the same base vector decorrelate (two
shifts of an iid random vector are ~orthogonal). Verbatim embedding
replication had the same quadratic-by-data artifact as verbatim text:
every vector carried replicas-1 exact duplicates, so within-bucket
pair counts grew with the SQUARE of the replica count (measured: q93
61 s at 30x with all 60k vectors in dup clusters).

Usage: python tools/gen_sf1.py [src_sf_dir] [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

KEY_STRIDE = 100_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "sf1",
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # key columns shifted per replica; every other column passes through
    shifted = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    passthrough = ["region", "nation"]

    os.makedirs(out, exist_ok=True)
    rep = F.col("_rep")
    for table, keys in shifted.items():
        df = load_table(spark, src, table)
        reps_df = spark.range(reps).select(F.col("id").alias("_rep"))
        big = df.crossJoin(reps_df)
        for k in keys:
            big = big.withColumn(
                k, (F.col(k) + rep * F.lit(KEY_STRIDE)).cast("long")
            )
        if table == "embeddings":
            # replica-r circular shift (r=0 keeps the base corpus
            # verbatim, so sf1 ⊇ sf0.1 for spot checks)
            dim = len(df.select("embedding").first()[0])
            shifted_vec = F.expr(
                f"concat(slice(embedding, cast(pmod(_rep, {dim}) + 1 as int),"
                f" cast({dim} - pmod(_rep, {dim}) as int)),"
                f" slice(embedding, 1, cast(pmod(_rep, {dim}) as int)))"
            )
            big = big.withColumn(
                "embedding",
                F.when(rep == 0, F.col("embedding")).otherwise(shifted_vec),
            )
        if table == "documents":
            # per-replica vocabulary (replica 0 keeps the base corpus
            # verbatim so sf1 ⊇ sf0.1 semantics for spot checks)
            suffixed = F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(
                        w, F.lit("_"), F.col("_rep").cast("string")
                    ),
                ),
                " ",
            )
            big = big.withColumn(
                "text", F.when(rep == 0, F.col("text")).otherwise(suffixed)
            )
        big = big.drop("_rep")
        # ~8 files per table: real multi-file scan parallelism without
        # a small-files problem
        big.repartition(8).write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )
        print(f"{table}: x{reps}")
    for table in passthrough:
        load_table(spark, src, table).write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )
        print(f"{table}: passthrough")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
