"""Curated-corpus export sink — the OUTPUT side of the training-data
pipeline (split/pack/mix/dedup feed this; a trainer's data loader
reads it).

Design for the 100 TB target:

- ``partitionBy`` on low-cardinality curation keys (lang, split):
  directory-level pruning for every downstream reader, and each
  training job reads only its split.
- ``maxRecordsPerFile`` bounds file sizes without a repartition —
  the writer rolls files inside each task, so no extra shuffle is
  introduced just to control file counts.
- Optional ``sort_within_partitions_by`` orders rows inside each
  output task (e.g. by source then doc_id) for compression locality
  and reproducible file contents — ``sortWithinPartitions`` is a
  partition-local sort, NOT a global orderBy (no range-exchange).
- Formats: parquet (columnar, default) and gzip JSONL (the common
  interchange for tokenizer/training toolchains).

The reference has no bulk data sink (its export surface is the
jsondb-tree writer, sources/jsondb_import.export_jsondb_tree); this
module is part of the engine's pipeline surface, not reference parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = ("parquet", "jsonl")


def export_corpus(
    df: DataFrame,
    out_dir: str,
    partition_by: tuple[str, ...] = ("lang",),
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
    sort_within_partitions_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a partitioned training corpus under ``out_dir``."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    missing = [c for c in (*partition_by, *sort_within_partitions_by)
               if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if sort_within_partitions_by:
        df = df.sortWithinPartitions(*sort_within_partitions_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if fmt == "parquet":
        writer.parquet(out_dir)
    else:
        writer.option("compression", "gzip").json(out_dir)


def read_corpus(
    spark: SparkSession, out_dir: str, fmt: str = "parquet"
) -> DataFrame:
    """Read an exported corpus back (partition columns restored from
    the directory layout by Spark's partition discovery)."""
    if fmt == "parquet":
        return spark.read.parquet(out_dir)
    return spark.read.json(out_dir)


def corpus_manifest(
    spark: SparkSession,
    out_dir: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """(partition → n_files, n_rows) — the audit record an export job
    publishes next to the data. ``partition_by`` names the layout
    columns (same tuple passed to :func:`export_corpus`); when omitted
    they are inferred from the ``col=value`` directory names Spark's
    partition discovery found."""
    df = read_corpus(spark, out_dir, fmt)
    if partition_by is None:
        # collect `col=value` segments at EVERY directory level (a
        # ('lang','split') layout nests split= under lang=), ordered
        # outermost-first as export_corpus wrote them
        found: dict[str, int] = {}
        for root, dirs, _files in os.walk(out_dir):
            depth = len(os.path.relpath(root, out_dir).split(os.sep))
            for d in dirs:
                if "=" in d and not d.startswith(("_", ".")):
                    col = d.split("=", 1)[0]
                    if col in df.columns:
                        found[col] = min(found.get(col, depth), depth)
        partition_by = tuple(sorted(found, key=found.__getitem__))
    meta = df.withColumn("_file", F.input_file_name())
    keys = list(partition_by) or [F.lit("all").alias("partition")]
    return meta.groupBy(*keys).agg(
        F.countDistinct("_file").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def file_sizes(out_dir: str) -> dict[str, int]:
    """Local-filesystem helper for tests/audits: relative path → bytes
    for every data file under ``out_dir``."""
    out: dict[str, int] = {}
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            if f.startswith(("_", ".")):
                continue  # _SUCCESS, checksums
            p = os.path.join(root, f)
            out[os.path.relpath(p, out_dir)] = os.path.getsize(p)
    return out
