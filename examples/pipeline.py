"""End-to-end training-data pipeline over the documents table:

  html extraction → load → language filter → adaptive quality gate →
  repetition filter → stratified sampling → exact dedup → near-dup
  clustering → decontamination → train/val/test split → sequence
  packing → chunk manifest → ... → curation manifest

Every stage is one of the engine's operators composing on DataFrames —
lazy until the final action, so Catalyst optimizes across stage
boundaries (filters merge into the scan; the per-doc columns compute
in one codegen pass).

Run: python examples/pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from aerovaldb_spark.catalog import load_table
from aerovaldb_spark.operators.advanced import curation_manifest
from aerovaldb_spark.operators.dedup import (
    connected_components,
    dedup_exact,
    lsh_candidate_pairs,
    minhash_signatures,
    verified_jaccard_pairs,
)
from aerovaldb_spark.operators.markup import (
    html_extract,
    synth_html_col,
)
from aerovaldb_spark.operators.text import (
    PACK_BUDGET,
    quality_columns,
    repetition_columns,
    split_col,
    token_count_col,
)
from aerovaldb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pipeline", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    print(f"loaded: {docs.count()} docs")

    # 0. raw pages first (r13): real corpora arrive as HTML — the
    # extraction rung (q127) is a shuffle-free projection: tag/script
    # stripping, entity decoding, Gopher-style line rules, optional
    # NFC. Demonstrated on synthesized pages wrapping the real text;
    # any operator below accepts raw HTML by composing through
    # html_to_text_col (q128 does exactly that for q39).
    pages = docs.where(F.col("text").isNotNull()).withColumn(
        "html", synth_html_col()
    )
    ledger = html_extract(pages).agg(
        F.sum("n_lines_kept"),
        F.sum("n_lines_dropped_short"),
        F.sum("n_lines_dropped_link"),
    ).first()
    print(
        f"html extraction: {ledger[0]} lines kept, "
        f"{ledger[1]} short-dropped, {ledger[2]} link-dropped"
    )

    # 1. language + quality gates (map-only; merge into the scan)
    scored = quality_columns(docs)
    kept = scored.filter(F.col("lang").isin("en", "fr", "es", "de")).filter(
        F.col("quality_score") > 0.2
    )
    print(f"after lang+quality filters: {kept.count()}")

    # 1a'. adaptive per-source quality gate (q84): additionally drop
    # each source's bottom quality decile — per-source, so a clean
    # source isn't over-pruned by a global threshold
    from aerovaldb_spark.operators.text import quality_percentile_gate

    # gate the SURVIVING population (not the raw corpus — ranking `docs`
    # would mostly re-drop rows stage 1 already removed, making this a
    # near-no-op on exactly the low-quality sources it targets)
    gated_ids = quality_percentile_gate(kept, pct=0.10).select("doc_id")
    kept = kept.join(gated_ids, "doc_id", "left_semi")
    print(f"after adaptive per-source gate: {kept.count()}")

    # 1b. repetition gate (Gopher-style, also map-only): drop docs
    # dominated by one repeated bigram (synthetic word-soup corpus →
    # a loose threshold; real corpora use ~0.2)
    kept = repetition_columns(kept).filter(F.col("top_bigram_frac") < 0.2).drop(
        "n_distinct_tokens", "repeated_token_frac", "top_bigram_count",
        "top_bigram_frac",
    )
    print(f"after repetition filter: {kept.count()}")

    # 1c. stratified sampling (q81): deterministic per-source mix
    # control — a pure map-side predicate, reproducible on any engine
    from aerovaldb_spark.operators.text import stratified_sample_flag

    kept = kept.filter(stratified_sample_flag(rates={"src0": 60}))
    print(f"after stratified sampling: {kept.count()}")

    # 2. exact dedup: keep the lowest doc_id per content hash
    reps = dedup_exact(kept)
    kept = kept.join(
        reps.select(F.col("keep_doc_id").alias("doc_id")), "doc_id", "left_semi"
    )
    print(f"after exact dedup: {kept.count()}")

    # 3. near-dup clustering: drop every non-canonical cluster member.
    # The SCALE path (same composition as q62): banded-LSH candidates,
    # then exact Jaccard on candidates only — the all-pairs shingle
    # join never runs.
    cand = lsh_candidate_pairs(minhash_signatures(kept, 3))
    pairs = verified_jaccard_pairs(kept, cand, 3, min_shared=5, min_jaccard=0.0)
    clusters = connected_components(pairs)
    losers = clusters.filter(F.col("v") != F.col("component")).select(
        F.col("v").alias("doc_id")
    )
    kept = kept.join(losers, "doc_id", "left_anti")
    print(f"after near-dup clustering: {kept.count()}")

    # 4. decontaminate: remove TRAIN docs sharing a 4-gram with the
    # held-out test split (q58 uses 3-grams for its oracle; real
    # decontamination uses longer n-grams — 3-gram overlap on this
    # synthetic low-entropy vocabulary would flag nearly everything)
    from aerovaldb_spark.operators.dedup import hashed_shingles

    with_split = kept.withColumn("split", split_col())
    sh = hashed_shingles(with_split, 4)
    splits = with_split.select("doc_id", "split")
    train_sh = sh.join(splits.filter("split = 'train'"), "doc_id")
    test_sh = sh.join(splits.filter("split = 'test'"), "doc_id").select("h").distinct()
    contaminated = train_sh.join(test_sh, "h", "left_semi").select("doc_id").distinct()
    kept = kept.join(contaminated, "doc_id", "left_anti")
    print(f"after decontamination: {kept.count()}")

    # 4b. the SURGICAL alternative (q105): instead of dropping whole
    # documents, excise exactly the words covered by a leaked n-gram —
    # at realistic contamination rates this keeps most of a flagged
    # document's tokens
    from aerovaldb_spark.operators.text import decontaminate_spans

    spans = decontaminate_spans(docs)
    tot, removed = spans.agg(
        F.sum("n_words"), F.sum("n_removed")
    ).first()
    print(
        f"span-level alternative: {removed}/{tot} words excised "
        f"({100.0 * removed / tot:.1f}% — vs dropping whole docs)"
    )

    # 5. split + pack
    final = kept.withColumn("split", split_col()).withColumn(
        "n_tokens", token_count_col()
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = final.withColumn(
        "shard_id", F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET)
    )
    summary = (
        packed.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.countDistinct("source", "shard_id").alias("shards"),
        )
        .orderBy("split")
    )
    print("final corpus:")
    summary.show()

    # 6. export: partitioned parquet a trainer's data loader reads
    # (directory pruning per split, bounded file sizes, no extra
    # shuffle — see operators/export_sink.py)
    import tempfile

    from aerovaldb_spark.operators.export_sink import (
        corpus_manifest,
        export_corpus,
    )

    out_dir = tempfile.mkdtemp(prefix="corpus_export_")
    export_corpus(
        packed.select("doc_id", "text", "lang", "source", "split", "shard_id"),
        out_dir,
        partition_by=("split",),
        max_records_per_file=10_000,
        sort_within_partitions_by=("source", "doc_id"),
    )
    print(f"exported to {out_dir}:")
    corpus_manifest(spark, out_dir).orderBy("split").show()

    # 7. chunk manifest (q80): the retrieval-side view of the same
    # corpus — sliding token windows, addressed by (doc_id, chunk_id),
    # content carried as hashes for chunk-level dedup
    from aerovaldb_spark.operators.text import sliding_chunks

    n_chunks = sliding_chunks(packed).count()
    print(f"chunk manifest: {n_chunks} chunks")

    # 8. embedding-side curation (q90 + q89): drop each label's
    # most-dissimilar decile (mislabeled/noise vectors), freeze the
    # discovered thresholds into the streaming admission gate, and
    # audit int8 quantization before writing a compressed index
    from aerovaldb_spark.operators.similarity import (
        label_centroids,
        label_outlier_gate,
        quantization_audit,
    )
    from aerovaldb_spark.streaming import admission_table, embedding_outlier_gate

    emb = load_table(spark, sf_dir, "embeddings")
    # one corpus-wide (label, pos) centroid aggregation feeds BOTH the
    # audit and the admission table
    cents = label_centroids(emb)
    audit = label_outlier_gate(emb, centroids=cents)
    n_out, n_labels = audit.agg(
        F.sum("n_dropped"), F.count(F.lit(1))
    ).first()
    print(f"embedding outliers dropped: {n_out} across {n_labels} labels")
    gate = embedding_outlier_gate(emb, admission_table(emb, centroids=cents))
    clean = gate.filter(~F.col("outlier_flagged"))
    q = quantization_audit(
        emb.join(clean.select("vec_id"), "vec_id", "left_semi")
    )
    worst = q.agg(F.max("rmse")).first()[0]
    print(f"int8 quantization on the kept set: worst rmse {worst}")

    # 9. semantic dedup (q93): the embedding-side near-dup pass —
    # SRP-bucketed candidates, cosine-verified, clustered, one
    # canonical kept per cluster (complements step 3's lexical pass:
    # paraphrases share embeddings, not shingles)
    from aerovaldb_spark.operators.similarity import semantic_dedup

    sem = semantic_dedup(emb, dim=64)
    n_clustered, n_kept = sem.agg(
        F.count(F.lit(1)), F.sum("is_canonical")
    ).first()
    print(
        f"semantic dedup: {n_clustered} vectors in clusters, "
        f"{n_kept} canonicals kept"
    )

    # 9b. serve similarity from the compressed index (q101): int8
    # codes bucketed by their own SRP signature — probes directory-
    # prune the bucket-partitioned tinyint table and re-rank with
    # exact integer arithmetic (4x fewer bytes per probed row)
    from aerovaldb_spark.operators.similarity import quantized_srp_topk

    served = quantized_srp_topk(
        emb, emb.limit(3), k=5, dim=64, planes=6
    )
    print(f"quantized-SRP serving: {served.count()} results for 3 probes")

    # 10. BPE budget audit (q92): the whitespace counts that packed
    # step 5 are a 1.3-1.7x underestimate of subword cost — the frozen
    # corpus-trained merge table gives the budget a trainer actually
    # pays (encode runs once per DISTINCT word, never per doc)
    from aerovaldb_spark.functions.bpe import bpe_token_stats

    bpe = bpe_token_stats(kept)  # q100's bpe_token_stats_with(...,
    # LARGE_MERGES) is the production-table path; same plan shape
    ws_vs_bpe = bpe.agg(
        F.sum("n_words").alias("ws_tokens"),
        F.sum("n_bpe_tokens").alias("bpe_tokens"),
    ).first()
    print(
        f"token budget: {ws_vs_bpe['ws_tokens']} whitespace vs "
        f"{ws_vs_bpe['bpe_tokens']} BPE tokens"
    )

    # 11. corpus health + mixture planning (q122, q121, q119): read
    # the per-source health table (dup rate / quality / share), plan
    # the temperature mix on DEDUPED token counts so duplicate-heavy
    # sources stop earning duplicated share, and materialize integer
    # per-doc copy counts; streaming.mixture_gate serves the same
    # frozen plan at ingest time
    from aerovaldb_spark.operators.text import (
        mixture_assignment,
        source_health,
    )

    health = source_health(docs)
    worst = health.orderBy(F.desc("dup_rate")).first()
    print(
        f"health: worst source {worst['source']} dup_rate "
        f"{worst['dup_rate']} quality {worst['mean_quality']}"
    )
    # freeze the plan as a persisted artifact (r12): save/load, serve
    # the frozen rates at the streaming gate, and later ask "is my
    # frozen plan stale" via MixturePlan.drift / maybe_rebuild — the
    # same lifecycle the index families have
    from aerovaldb_spark.operators.text import MixturePlan

    frozen = MixturePlan.build(
        docs, alpha=0.3, target_fraction=0.5, planner="dedup_adjusted"
    )
    plan_dir = tempfile.mkdtemp(prefix="mixplan_")
    frozen.save(plan_dir)
    plan = MixturePlan.load(spark, plan_dir).plan
    # materialize THIS plan's rates over the CANONICAL subset (the
    # pairing dedup_adjusted_mix_plan documents): the rates were
    # planned against deduped token counts, so materializing over the
    # full frame would hand every duplicate copy floor(rate) copies
    # again and overshoot the printed planned budget; omitting plan=
    # would likewise re-derive the raw temperature plan and hand
    # duplicate-heavy sources their duplicated share right back
    keep = dedup_exact(docs).select(F.col("keep_doc_id").alias("doc_id"))
    copies = mixture_assignment(
        docs.join(keep, "doc_id", "left_semi"), plan=plan
    )
    planned = plan.agg(F.sum("expected_tokens")).first()[0]
    upsampled = copies.filter(F.col("n_copies") > 1).count()
    print(
        f"mixture: planned {planned:.0f} tokens, "
        f"{upsampled} docs repeat (upsampling)"
    )

    # 12. the whole run, accounted (q132): the curation manifest is
    # the artifact a production run publishes next to the export —
    # one row per INPUT doc naming the stage that dropped it (or its
    # split when kept), so every byte of the final corpus is
    # attributable. Stage rules are the graded rungs' own; one
    # persisted base pass, no stage rescans raw text.
    manifest = curation_manifest(docs)
    fates = {
        r["verdict"]: r["n"]
        for r in manifest.groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"curation manifest: {fates}")


if __name__ == "__main__":
    main()
