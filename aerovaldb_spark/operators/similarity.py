"""Similarity search over the ``embeddings`` table (array<float>).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random-hyperplane / SRP) variant as the 100 TB scale path: hyperplane
signs bucket the vectors so candidate generation is a bucket-equijoin
instead of a full cross join. Dot products use built-in higher-order
functions (``zip_with`` + ``aggregate``) — JVM-side, no Python UDF, and
a left-to-right fold so the float summation order is deterministic.

Parity note: elements are cast to double before the fold; the oracle
(DuckDB list_dot_product on double lists) sums in the same order.
Scores are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .._round import round6
from ._staging import require_meta_family


def _dbl(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_col(a, b) -> Column:
    """Deterministic left-fold dot product of two array columns."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a) -> Column:
    return F.sqrt(dot_col(a, a))


def pair_dot_col(a: str = "vec_a", b: str = "vec_b") -> Column:
    """Deterministic left-fold dot product of two ALREADY-double array
    columns (the post-`_dbl` pair-join shape). The single definition of
    the fold convention for every pairwise operator — change summation
    here (e.g. Kahan) and every pair scorer changes together."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _l2_d2_flat(a: str, b: str, dim: int) -> Column:
    """round6 squared L2 distance between two array columns (by NAME)
    of STATICALLY KNOWN length ``dim`` — a flat left-associated
    ``element_at`` chain instead of the generic ``zip_with`` +
    ``aggregate`` fold. Bit-identical to the fold for length-``dim``
    inputs (same add order; the fold's ``0.0 + t1`` first step equals
    ``t1`` — squares are nonnegative; an input shorter than ``dim``
    nulls out in both forms), but the chain stays inside whole-stage
    codegen where the higher-order fold is interpreted per row.
    Compiled as ONE SQL string so plan construction is a single
    ``F.expr`` instead of ~8·dim py4j calls (the pq module's _name
    rationale). Only pass ``dim`` when every row is exactly that
    length (the PQ module's frozen layout guarantees it); the generic
    fold remains the default everywhere else."""
    acc = None
    for j in range(1, dim + 1):
        d = (
            f"(CAST(element_at(`{a}`, {j}) AS DOUBLE) - "
            f"CAST(element_at(`{b}`, {j}) AS DOUBLE))"
        )
        t = f"({d} * {d})"
        acc = t if acc is None else f"({acc} + {t})"
    return F.expr(f"(round(({acc}) * 1000000.0D, 0) / 1000000.0D)")


def _over_guard(vectors: DataFrame, id_col: str, max_rows: int) -> bool:
    """Size guard for the O(n²) validation baselines: a column-pruned
    ``LIMIT max_rows+1`` count instead of a full scan — short-circuits
    as soon as the limit is hit and never ships vectors anywhere, so
    the guard costs ~nothing when callers already know the input is
    small."""
    return (
        vectors.select(id_col).limit(max_rows + 1).count() > max_rows
    )


def cosine_col(a, b) -> Column:
    """Cosine with a NULL (not NaN) result for zero-norm inputs.

    DuckDB division-by-zero yields NULL; Spark's double 0.0/0.0 yields
    NaN. NaN and NULL sort to the same end (NaN last under Spark ASC,
    NULLS LAST is DuckDB's ASC default) so RANKS coincide, but any
    EMITTED cosine would hash-diverge — nullif on the divisor makes
    Spark produce NULL too."""
    return dot_col(a, b) / F.nullif(norm_col(a) * norm_col(b), F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    single_query: bool | None = None,
) -> DataFrame:
    """Exact top-k by cosine PER QUERY: broadcast the query row(s),
    score, rank within each query.

    At scale this is the map-only scoring pattern: the (tiny) query set
    broadcasts, each partition scores its shard, and only k rows per
    partition survive to the final top-k. A single-row query keeps the
    shuffle-free TakeOrderedAndProject plan (per-partition local top-k,
    driver merge); a multi-row query ranks with a per-query window (one
    shuffle on query_id).
    """

    q = query.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = (
        vectors.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cosine", round6(cosine_col(vec_col, "qvec")))
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine")
    )
    # Plan-shape decision: single-query → shuffle-free TakeOrdered.
    # Callers that know their query cardinality pass single_query to
    # skip the probe job entirely (a point-lookup take(2) still costs
    # a scheduled job — ~0.4 s of pure overhead in a sub-second query);
    # otherwise probe with take(2), not count().
    if single_query if single_query is not None else len(query.take(2)) <= 1:
        return scored.orderBy(F.col("cosine").desc(), F.col("neighbor_id")).limit(k)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# Random-hyperplane LSH: deterministic pseudo-random planes derived from
# the shared 60-bit hash so the bucketing is reproducible anywhere.
NUM_PLANES = 8

# Asserted default operating points, picked from the measured
# recall-vs-touched-fraction sweep (tools/ann_operating_points.py;
# tables in SCALING.md "ANN operating points"; floors enforced by
# tests/test_bpe_and_ann.py::test_ann_default_operating_points):
# margin-probe with n_flip=5 at 8 planes reaches ~the full Hamming-1
# recall for ~70% of its touched fraction; IVF at n_probe=4 of 16
# lists is the knee of its recall curve on both iid and clustered
# corpora.
SRP_RECOMMENDED_N_FLIP = 5
IVF_DEFAULT_N_PROBE = 4

# Ceiling on the probed-bucket/list id literals a persisted-index read
# will collect to the driver for partition pruning. Below the cap the
# distinct probed ids become a literal IN filter, which the
# bucket/list-partitioned parquet layout turns into directory pruning
# at planning time. Above it (a huge query batch against a high-planes
# index: distinct buckets approach min(2^planes, |queries| * probes))
# the IN-list itself becomes driver-memory + plan-size risk, so the
# read falls back to a broadcast semi-join on the distinct probe
# frame: the scan is no longer pruned at planning time, but Spark's
# dynamic partition pruning can still prune it at runtime (join on the
# partition column with a broadcast build side), unprobed rows still
# never reach scoring, and driver memory stays O(cap) regardless of
# batch size. 4096 int literals is well under Spark's plan-size
# comfort zone while covering every bounded case that exists today
# (planes <= 24 guard upstream; IVF n_lists in the hundreds).
PROBE_LITERAL_CAP = 4096


def _pruned_by_probes(
    assignments: DataFrame, probe: DataFrame, col: str
) -> DataFrame:
    """Restrict ``assignments`` to the ``col`` partitions named in
    ``probe`` — literal IN filter up to :data:`PROBE_LITERAL_CAP`
    distinct ids (collect is capped: at most cap+1 rows ever reach the
    driver), broadcast semi-join beyond it. One helper so the cap +
    fallback policy can't drift between the four persisted families.
    """
    distinct = probe.select(col).distinct()
    ids = [r[0] for r in distinct.limit(PROBE_LITERAL_CAP + 1).collect()]
    if len(ids) <= PROBE_LITERAL_CAP:
        return assignments.filter(F.col(col).isin(sorted(ids)))
    return assignments.join(F.broadcast(distinct), col, "left_semi")


def srp_signature_col(
    vec_col: str, dim: int, planes: int = NUM_PLANES,
    plane_offset: int = 0,
) -> Column:
    """Sign-random-projection bucket id (integer 0..2^planes-1).

    Plane p has ±1 weights derived from parity of a deterministic hash
    of (p, dimension index) — no stored model, reproducible on any
    engine, and good enough bucketing for candidate generation.
    ``plane_offset`` shifts the plane indices so multiple INDEPENDENT
    signatures can coexist (band k of :func:`srp_banded_pairs` uses
    planes [k*r, (k+1)*r) — disjoint hyperplane sets, zero offset for
    every existing single-table caller).
    """
    sig = F.lit(0)
    for p in range(plane_offset, plane_offset + planes):
        # weight(p, i) = +1 if hash parity even else -1
        proj = F.aggregate(
            F.expr(
                f"zip_with(transform({vec_col}, x -> CAST(x AS DOUBLE)),"
                f" transform(sequence(0, {dim - 1}),"
                f" i -> CASE WHEN (CAST(conv(substring(md5(concat('p{p}_', i)), 1, 15), 16, 10) AS BIGINT) & 1) = 0"
                f" THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END),"
                f" (x, w) -> x * w)"
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(
            proj > 0, F.lit(1 << (p - plane_offset))
        ).otherwise(F.lit(0))
    return sig


def lsh_bucketed_pairs(
    vectors: DataFrame, dim: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Candidate near-dup pairs: same SRP bucket → pair. One shuffle on
    the bucket id; quadratic only within buckets (expected n/2^planes).
    The signed-projection signature (8 md5-weighted dot products per
    vector) is persisted so it computes once, not per join side."""
    from ._scope import scoped_persist

    # project to (id, vec) BEFORE the persist so unrelated columns
    # (e.g. the embeddings table's label) never reach the scan or the
    # cached partitions — column pruning an InMemoryRelation can't do
    with_sig = scoped_persist(
        vectors.select(id_col, vec_col).withColumn(
            "bucket", srp_signature_col(vec_col, dim)
        )
    )
    a = with_sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "bucket")
    b = with_sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", round6(cosine_col("vec_a", "vec_b")))
        .select("bucket", "id_a", "id_b", "cosine")
    )


def srp_collision_prob(
    cos_sim: float, planes_per_band: int, bands: int = 1
) -> float:
    """Per-PAIR collision probability under (banded) SRP: a random
    hyperplane separates two vectors at angle θ with probability θ/π
    (the Goemans-Williamson identity — EXACT for random planes, unlike
    the TF-IDF dial's t/(2-t) heuristic), so per-plane agreement is
    p = 1 - acos(cos_sim)/π and the banded S-curve is
    1-(1-p^planes)^bands — the same model the minhash dial uses
    (:func:`..text.band_collision_prob`), with p derived from geometry
    instead of set overlap. Two approximation caveats: the identity is
    exact for GAUSSIAN planes — our ±1-weight md5 planes approximate
    it through the CLT over the vector's active dimensions, so DENSE
    embeddings track the model (pinned by test: measured collision
    fraction across 128 disjoint bands within ±0.15) while very sparse
    or low-dimensional vectors deviate (a 2-sparse pair can collide on
    every plane regardless of angle). Note this is PAIR-level — recall@k
    of an ANN index mixes neighbor similarities, so calibrate against
    the measured operating points (SCALING.md) when sizing a serving
    index, and use this model directly for the near-dup rungs
    (:func:`srp_banded_pairs`, semantic dedup) where the quantity that
    matters IS the qualifying pair's collision probability.

    >>> round(srp_collision_prob(0.9, 6, 4), 3)
    0.866
    """
    from .text import band_collision_prob

    return band_collision_prob(
        _cos_plane_agreement(cos_sim), bands, planes_per_band
    )


def _cos_plane_agreement(cos_sim: float) -> float:
    """Per-plane agreement p = 1 - acos(cos)/π, validating the cosine
    domain — the ONE cos→agreement conversion (shared by the model and
    the chooser; silently clamping here would turn an unnormalized dot
    product or degrees into a wildly wrong dial with no error)."""
    import math

    c = float(cos_sim)
    if not -1.0 <= c <= 1.0:
        raise ValueError(f"cosine must be in [-1, 1], got {cos_sim}")
    return 1.0 - math.acos(c) / math.pi


def effective_plane_agreement(
    planes_per_band: int, bands: int, measured_recall: float
) -> float:
    """Invert the SRP collision model at one measured operating point
    (the :func:`..text.effective_jaccard` pattern): the per-plane
    agreement p for which ``srp_collision_prob`` equals the measured
    pair recall — corpus calibration when threshold pairs' angle
    distribution differs from the nominal threshold's point angle."""
    from .text import effective_jaccard

    # effective_jaccard validates bands/planes >= 1 and the recall
    # range (ValueError, never ZeroDivisionError)
    return effective_jaccard(bands, planes_per_band, measured_recall)


def choose_srp_bands(
    threshold_cos: float | None = None,
    target_recall: float = 0.95,
    plane_agreement: float | None = None,
    planes_per_band: int = 6,
    max_bands: int = 32,
) -> int:
    """Minimal ``bands`` for :func:`srp_banded_pairs` meeting a
    pair-recall target at the given cosine threshold (via the exact
    geometric identity) or at a CALIBRATED per-plane agreement (from
    :func:`effective_plane_agreement`). ``planes_per_band`` stays the
    caller's selectivity dial (each band's chance-candidate volume is
    ~n²/2^planes); this sizes the recall side. Raises when no band
    count within ``max_bands`` reaches the target — lower
    planes_per_band (flatter curve) or the target.

    >>> choose_srp_bands(threshold_cos=0.9, planes_per_band=6)
    6
    """
    from .text import min_bands_for_target

    if planes_per_band < 1:
        raise ValueError(
            f"planes_per_band must be >= 1, got {planes_per_band}"
        )
    if plane_agreement is None:
        if threshold_cos is None:
            raise ValueError("pass threshold_cos or plane_agreement")
        plane_agreement = _cos_plane_agreement(threshold_cos)
    if not 0.0 < plane_agreement <= 1.0:
        raise ValueError(
            f"plane agreement must be in (0, 1], got {plane_agreement} "
            "(threshold_cos=-1 has no retainable pairs)"
        )
    if not 0.0 < target_recall < 1.0:
        raise ValueError(
            f"target_recall must be in (0, 1), got {target_recall}"
        )
    bands = min_bands_for_target(
        plane_agreement**planes_per_band, target_recall
    )
    if bands is None:
        raise ValueError(
            f"collision probability underflows at planes_per_band="
            f"{planes_per_band} for agreement {plane_agreement:.4f} — "
            "lower planes_per_band"
        )
    if bands > max_bands:
        raise ValueError(
            f"needs {bands} bands (> max_bands={max_bands}) to reach "
            f"recall {target_recall} at agreement {plane_agreement:.4f} "
            f"with {planes_per_band} planes/band — lower "
            "planes_per_band or the target"
        )
    return bands


class SrpDialCalibration(NamedTuple):
    """Result of :func:`calibrate_srp_dial` — the chosen band count
    plus every intermediate the chooser consumed (the
    ``BandDialCalibration`` convention from the minhash twin)."""

    bands: int
    planes_per_band: int
    measured_recall: float
    recall_used: float
    plane_agreement: float
    n_true_edges: int
    n_banded_hits: int
    n_vectors: int


def calibrate_srp_dial(
    vectors: DataFrame,
    dim: int,
    threshold_cos: float = 0.8,
    target_recall: float = 0.95,
    sample_frac: float | None = None,
    probe_planes: int = 6,
    probe_bands: int = 4,
    planes_per_band: int | None = None,
    max_bands: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_true_edges: int = 10,
) -> SrpDialCalibration:
    """ONE-CALL corpus calibration of the banded-SRP dial — the dense
    twin of :func:`..text.calibrate_band_dial`: measure pair recall of
    a probe dial against the EXACT all-pairs baseline on (a sample
    of) ``vectors``, invert the S-curve at that point
    (:func:`effective_plane_agreement`), and size ``bands`` for the
    target via :func:`choose_srp_bands`. Calibration matters here for
    a different reason than the minhash rung: the geometric identity
    p = 1 - θ/π is exact at a POINT angle, but threshold pairs in a
    real corpus carry an angle DISTRIBUTION (and ±1 md5 planes only
    approach the identity through the CLT), so the measured operating
    point is the honest input when the recall target matters.

    Measurement shape: the exact baseline is a brute-force self-join
    — quadratic BY DESIGN, which is exactly why ``sample_frac``
    (deterministic md5-of-id subset, no RNG state) is the 100 TB
    path: calibrate on thousands of vectors, serve with the chosen
    dial on all of them. Banded hits come from
    :func:`srp_banded_pairs` at the probe dial filtered to the same
    round6 cosine floor; only counts cross the driver. Zero true
    pairs / zero hits raise (cannot invert), as do fewer than
    ``min_true_edges`` true pairs (a one-pair calibration is noise —
    grow the sample or lower ``min_true_edges`` deliberately);
    perfect probe recall is
    continuity-corrected to (2n-1)/(2n) before inversion, flagged by
    recall_used < measured_recall — re-probe with fewer bands when
    the target matters.

    ``planes_per_band`` defaults to ``probe_planes`` (the selectivity
    dial the caller already chose); pass it to re-size bands for a
    different per-band cost envelope under the same calibration."""
    from .dedup import hash60

    if planes_per_band is None:
        planes_per_band = probe_planes
    if sample_frac is not None:
        if not 0.0 < sample_frac <= 1.0:
            raise ValueError(
                f"sample_frac must be in (0, 1], got {sample_frac}"
            )
        if sample_frac < 1.0:
            vectors = vectors.where(
                F.pmod(
                    hash60(F.col(id_col).cast("string")),
                    F.lit(1_000_000),
                )
                < F.lit(int(round(sample_frac * 1_000_000)))
            )
    from ._scope import scoped_persist

    vecs = scoped_persist(vectors.select(id_col, vec_col))
    n_vectors = vecs.count()
    a = vecs.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = vecs.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    true_edges = scoped_persist(
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", round6(cosine_col("_va", "_vb")))
        .where(F.col("cosine") >= threshold_cos)
        .select("id_a", "id_b")
    )
    n_true = true_edges.count()
    if n_true == 0:
        raise ValueError(
            f"no pairs at cosine >= {threshold_cos} among the "
            f"{n_vectors} sampled vectors — raise sample_frac or "
            "lower threshold_cos"
        )
    # the calibrate_band_dial rule: a dial inverted from a handful of
    # pairs is noise (recall_used is 0.5 at n_true=1) — refuse
    if n_true < min_true_edges:
        raise ValueError(
            f"only {n_true} true pair(s) at cosine >= {threshold_cos} "
            f"among the {n_vectors} sampled vectors — too few to "
            f"calibrate from (min_true_edges={min_true_edges}); raise "
            "sample_frac / lower threshold_cos, or pass a smaller "
            "min_true_edges to accept the noise deliberately"
        )
    n_hit = true_edges.join(
        srp_banded_pairs(
            vecs, dim, probe_planes, probe_bands, vec_col, id_col
        ).where(F.col("cosine") >= threshold_cos),
        ["id_a", "id_b"],
        "left_semi",
    ).count()
    if n_hit == 0:
        raise ValueError(
            f"probe dial ({probe_bands} bands x {probe_planes} "
            f"planes) caught none of the {n_true} true pairs — "
            "recall 0 cannot be inverted; probe with more bands or "
            "fewer planes_per_band"
        )
    measured = n_hit / n_true
    recall_used = min(measured, (2 * n_true - 1) / (2 * n_true))
    p_eff = effective_plane_agreement(
        probe_planes, probe_bands, recall_used
    )
    # re-express the calibrated agreement at the serving dial's
    # planes_per_band (p is PER-PLANE, so it carries across row widths)
    bands = choose_srp_bands(
        target_recall=target_recall,
        plane_agreement=p_eff,
        planes_per_band=planes_per_band,
        max_bands=max_bands,
    )
    return SrpDialCalibration(
        bands=bands,
        planes_per_band=planes_per_band,
        measured_recall=round(measured, 6),
        recall_used=round(recall_used, 6),
        plane_agreement=round(p_eff, 6),
        n_true_edges=n_true,
        n_banded_hits=n_hit,
        n_vectors=n_vectors,
    )


def srp_banded_pairs(
    vectors: DataFrame,
    dim: int,
    planes_per_band: int = 6,
    bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidate pairs via OR-amplified SRP: ``bands`` INDEPENDENT
    signature tables (disjoint hyperplane sets per band), a pair
    qualifies if it collides in ANY band. (id_a, id_b, cosine), each
    pair once.

    This is the RECALL dial the single-table planes parameter is not:
    the measured sf1 retention of 0.35-cosine pairs under single-bucket
    conditioning falls off a cliff with planes (planes=10 keeps 40%,
    =12 keeps 16% — SCALING.md), because a single AND-only signature's
    collision curve is p^planes. Banding steepens the S-curve:
    P(candidate) = 1-(1-p^r)^b keeps high-cosine pairs while each
    band's candidate volume stays n²/2^r. Scale shape: b bucket
    equi-joins over the SAME persisted signature frame (one corpus
    scan, b narrow shuffles), distinct pair ids before the one cosine
    evaluation per pair — the SRP twin of the minhash banding q40
    runs on text."""
    from ._scope import scoped_persist

    sigs = vectors.select(id_col, vec_col)
    for k in range(bands):
        sigs = sigs.withColumn(
            f"_b{k}",
            srp_signature_col(
                vec_col, dim, planes_per_band,
                plane_offset=k * planes_per_band,
            ),
        )
    sigs = scoped_persist(sigs)
    cand = None
    for k in range(bands):
        a = sigs.select(F.col(id_col).alias("id_a"), F.col(f"_b{k}").alias("_k"))
        b = sigs.select(F.col(id_col).alias("id_b"), F.col(f"_b{k}").alias("_k"))
        pairs_k = a.join(b, "_k").filter(
            F.col("id_a") < F.col("id_b")
        ).select("id_a", "id_b")
        cand = pairs_k if cand is None else cand.unionByName(pairs_k)
    cand = cand.distinct()
    va = sigs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = sigs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", round6(cosine_col("_va", "_vb")))
        .select("id_a", "id_b", "cosine")
    )


# --------------------------------------------------------------------------
# q29: brute-force cosine top-k for a fixed query vector (vec_id = 0).
def q29_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    return brute_force_topk(emb, query, k=10, single_query=True)


Q29_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    ROUND(
      list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])))), 6) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine
FROM scored ORDER BY cosine DESC, neighbor_id LIMIT 10
"""


# --------------------------------------------------------------------------
# q30: per-vector L2 norm (deterministic fold; round 6).
def q30_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        round6(norm_col("embedding")).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


Q30_SQL = """
SELECT vec_id, label,
  ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
  len(embedding) AS dim
FROM embeddings
"""


def _probe_lists(
    query: DataFrame,
    centroids: DataFrame,
    n_probe: int,
    vec_col: str,
    id_col: str,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, qvec, list_id): each query's ``n_probe`` nearest
    centroids — ENTIRELY executor-side.

    The n_lists-row centroid table broadcasts onto the query frame, the
    squared distance is one array fold per (query, centroid) pair, and
    a per-query window keeps the n_probe best. No ``collect()`` of the
    queries and no per-query Python loop: a 1M-query batch is one
    distributed job of 1M × n_lists cheap rows, with driver memory
    independent of the batch size. Ties break on list_id ascending
    (the same order the previous driver-side stable sort produced).
    Distances are 6dp-rounded with the shared cross-engine convention
    before ranking so the probe choice is oracle-replayable (q66).
    """
    qv = query.select(
        F.col(id_col).alias("query_id"), _dbl(vec_col).alias("qvec")
    )
    if dim is not None:
        # statically-known width (e.g. the PQ module's frozen layout):
        # flat codegen chain, bit-identical to the fold for dim-length
        # rows — see _l2_d2_flat
        d2 = _l2_d2_flat("qvec", "centroid", dim)
    else:
        d2 = round6(
            F.aggregate(
                F.zip_with(
                    "qvec", "centroid", lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_d2").asc(), F.col("list_id").asc()
    )
    return (
        qv.crossJoin(F.broadcast(centroids.select("list_id", "centroid")))
        .withColumn("_d2", d2)
        .withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qvec", "list_id")
    )


def ivf_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_sample_fraction: float | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize with KMeans
    (Spark ML, seeded), probe only the n_probe nearest inverted lists.

    The scale shape: scoring touches ~n_probe/n_lists of the data; the
    centroid table broadcasts. Approximate — recall is asserted in
    tests, not oracle-matched (KMeans is not cross-engine
    deterministic; see :func:`srp_ivf_topk` for the oracle-matched
    deterministic coarse quantizer).
    All queries score in ONE job: probe lists are assigned
    executor-side (:func:`_probe_lists` — broadcast centroids + array
    fold + per-query window), the probe frame joins the assigned
    vectors on list_id, and a per-query window takes the top k — no
    per-query driver loop ANYWHERE, so a 1M-query batch is one pass
    with bounded driver memory.

    At 100 TB the KMeans fit itself must train on a sample
    (``fit_sample_fraction``) — clustering quality needs ~thousands of
    points per centroid, not the full corpus; assignment still covers
    every vector.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = vectors.sparkSession
    with_vec = vectors.withColumn("_features", array_to_vector(_dbl(vec_col)))
    fit_input = with_vec
    if fit_sample_fraction is not None:
        fit_input = with_vec.sample(fit_sample_fraction, seed=42)
    model = KMeans(k=n_lists, seed=42, featuresCol="_features").fit(fit_input)
    assigned = model.transform(with_vec).withColumnRenamed(
        "prediction", "list_id"
    )

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in
         enumerate(model.clusterCenters())],
        "list_id int, centroid array<double>",
    )
    qdf = _probe_lists(query, centroids, n_probe, vec_col, id_col)

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        assigned.join(F.broadcast(qdf), "list_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cosine", round6(cosine_col(vec_col, "qvec")))
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# --------------------------------------------------------------------------
# q46: the scale-path near-duplicate join end-to-end: SRP bucket →
# within-bucket pairs → exact cosine. Candidate generation is an
# equi-join on the bucket id (expected n²/2^planes pairs, not n²).
def q46_srp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_bucketed_pairs(emb, dim=64)


def _srp_proj_sql_expr(expr: str, p: int, dim: int = 64) -> str:
    """Plane p's signed projection over an arbitrary DOUBLE[] SQL
    expression (the generalization q101 buckets CODES with)."""
    return (
        f"list_dot_product({expr}, "
        f"list_transform(generate_series(0, {dim - 1}), "
        f"i -> CASE WHEN (CAST('0x' || substring(md5('p{p}_' || i), 1, 15) AS BIGINT) & 1) = 0 "
        "THEN 1.0 ELSE -1.0 END))"
    )


def _srp_proj_sql_on(alias: str, p: int, dim: int = 64) -> str:
    return _srp_proj_sql_expr(
        f"CAST({alias}.embedding AS DOUBLE[])", p, dim
    )


def _bucket_sql_for(planes: int, alias: str = "e") -> str:
    return " + ".join(
        f"(CASE WHEN {_srp_proj_sql_on(alias, p)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    )


def _bucket_sql_expr(expr: str, planes: int, dim: int = 64) -> str:
    return " + ".join(
        f"(CASE WHEN {_srp_proj_sql_expr(expr, p, dim)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    )


_BUCKET_SQL = _bucket_sql_for(NUM_PLANES)

Q46_SQL = f"""
WITH bucketed AS (
  SELECT e.vec_id, e.embedding, {_BUCKET_SQL} AS bucket FROM embeddings e
)
SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(
    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cosine
FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
"""


# --------------------------------------------------------------------------
# q50: exact embedding-cosine near-duplicate pairs (threshold join).
# This is the correctness baseline the LSH path (q46) approximates: at
# scale you never run the O(n²) cross product — you run q46's
# bucket-equijoin and validate its recall against this on a sample.
# The threshold filter is applied to the ROUNDED score on both engines
# so borderline floats can't flip pair membership between engines.
COSINE_NEAR_DUP_THRESHOLD = 0.35


# cosine_near_dup_pairs is an all-pairs VALIDATION baseline: it
# refuses inputs above this size unless explicitly overridden, so the
# O(n²) join can't be launched on production-scale data by accident.
COSINE_NEAR_DUP_MAX_ROWS = 100_000


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = COSINE_NEAR_DUP_THRESHOLD,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int | None = COSINE_NEAR_DUP_MAX_ROWS,
) -> DataFrame:
    """All pairs with round(cosine, 6) >= threshold (exact, all-pairs).

    VALIDATION-ONLY at scale: this is the correctness baseline q46's
    LSH path approximates — run it on samples to measure recall, never
    on the full corpus. Inputs above ``max_rows`` raise (pass
    ``max_rows=None`` to consciously override).

    Two scale-shaping choices: (1) arrays are cast to double and norms
    are computed ONCE per vector before the join (one fold per pair
    instead of three — higher-order folds are interpreted, not
    codegen'd, so tripling them triples the dominant cost); (2) the
    left side is repartitioned so the broadcast nested-loop scoring
    parallelizes even when the source is a single parquet row group
    (O(n²/p) work per task instead of O(n²) on one core).
    """
    if max_rows is not None and _over_guard(vectors, id_col, max_rows):
        raise ValueError(
            f"cosine_near_dup_pairs is an O(n²) validation baseline; "
            f"input has more than max_rows={max_rows} rows. Use the LSH "
            "path (lsh_bucketed_pairs / q46) at scale, or sample, or "
            "pass max_rows=None to override."
        )
    par = vectors.sparkSession.sparkContext.defaultParallelism
    prepped = vectors.select(
        F.col(id_col).alias("_id"),
        _dbl(vec_col).alias("_vec"),
        norm_col(vec_col).alias("_norm"),
    )
    a = prepped.toDF("id_a", "vec_a", "norm_a").repartition(par, "id_a")
    b = prepped.toDF("id_b", "vec_b", "norm_b")
    dot = pair_dot_col()
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            round6(dot / F.nullif(F.col("norm_a") * F.col("norm_b"), F.lit(0.0))),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def q50_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb)


Q50_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(
      list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {COSINE_NEAR_DUP_THRESHOLD}
"""


# --------------------------------------------------------------------------
# q66: IVF approximate top-k on the graded surface — the SERVE path
# over FROZEN centroids (the q100 frozen-model-artifact pattern).
# KMeans TRAINING is not cross-engine deterministic, so the fit runs
# once (tools/gen_ivf_centroids.py, seeded Spark ML KMeans) and its
# centroids are frozen as data; assignment + probe + exact re-rank —
# the part a 100 TB serving cluster actually executes per query batch
# — are pure deterministic arithmetic that the DuckDB oracle replays
# from the same VALUES rows, giving q66 a full rows+schema+hash grade.
# The ephemeral fit-and-serve form stays available as ivf_topk()
# (recall-tested); q66 grades IVFIndex.topk, the REAL persisted-index
# serve code, including its partition-pruning probe collect.
Q66_N_PROBE = 4
Q66_K = 10


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """(id, vec, list_id): nearest-centroid assignment — the
    deterministic half of IVF indexing. The n_lists-row centroid
    table broadcasts, the squared distance is one array fold per
    (vector, centroid) pair (6dp-rounded with the shared cross-engine
    convention, ties on list_id ascending), and a per-vector window
    keeps the argmin: one distributed pass, n × n_lists cheap rows,
    no shuffle of the vectors themselves beyond the window's."""
    if dim is not None:
        # statically-known width: flat codegen chain (see
        # _l2_d2_flat); bit-identical for dim-length rows
        d2 = _l2_d2_flat("_v", "centroid", dim)
    else:
        d2 = round6(
            F.aggregate(
                F.zip_with(
                    "_v", "centroid", lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_d2").asc(), F.col("list_id").asc()
    )
    return (
        vectors.select(id_col, vec_col, _dbl(vec_col).alias("_v"))
        .crossJoin(F.broadcast(centroids.select("list_id", "centroid")))
        .withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "list_id")
    )


def frozen_ivf_centroids(spark: SparkSession) -> DataFrame:
    from .ivf_centroids_frozen import CENTROIDS

    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(CENTROIDS)],
        "list_id int, centroid array<double>",
    )


def q66_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = frozen_ivf_centroids(spark)
    index = IVFIndex(cents, ivf_assign(emb, cents), "embedding", "vec_id")
    return index.topk(
        emb.filter(F.col("vec_id") < 5), k=Q66_K, n_probe=Q66_N_PROBE
    )


def _frozen_ivf_assigned_sql() -> str:
    """Oracle CTE fragment: frozen centroids as VALUES rows,
    6dp-rounded squared distances, nearest-centroid assignment —
    shared by q66/q108 (probe+serve) and q116 (staleness)."""
    from .ivf_centroids_frozen import CENTROIDS

    values = ",\n    ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}])"
        for i, c in enumerate(CENTROIDS)
    )
    dim = len(CENTROIDS[0])
    d2 = (
        f"ROUND(list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (e.v[i] - c.centroid[i]) * (e.v[i] - c.centroid[i]))), 6)"
    )
    return f"""cent(list_id, centroid) AS (
  VALUES
    {values}
), emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), dists AS (
  SELECT e.vec_id, e.v, c.list_id, {d2} AS d2
  FROM emb e CROSS JOIN cent c
), assigned AS (
  SELECT vec_id, v, list_id FROM (
    SELECT vec_id, v, list_id,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
    FROM dists) WHERE rn = 1
)"""


def _frozen_ivf_prefix_sql(n_probe: int) -> str:
    """q66/q108's CTE prefix: the frozen assignment fragment plus
    per-query probe lists."""
    return f"""{_frozen_ivf_assigned_sql()}, probes AS (
  SELECT vec_id AS query_id, v AS qv, list_id FROM (
    SELECT vec_id, v, list_id,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
    FROM dists WHERE vec_id < 5) WHERE rn <= {n_probe})"""


def _q66_sql() -> str:
    return f"""
WITH {_frozen_ivf_prefix_sql(Q66_N_PROBE)}, scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
    ROUND(list_dot_product(a.v, p.qv)
      / (sqrt(list_dot_product(a.v, a.v))
         * sqrt(list_dot_product(p.qv, p.qv))), 6) AS cosine
  FROM probes p JOIN assigned a
    ON a.list_id = p.list_id AND a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored) WHERE rn <= {Q66_K}
"""


Q66_SQL = _q66_sql()


def _save_ivf_layout(
    centroids: DataFrame,
    assignments: DataFrame,
    path: str,
    family: str,
    extra: "dict | None" = None,
) -> tuple:
    """The one on-disk IVF layout (shared by IVFIndex and
    QuantizedIVFIndex so the two can never diverge): ``centroids/``
    (n_lists rows) + ``assignments/`` PARTITIONED BY list_id — the
    layout that makes probing a directory-pruned scan — plus a one-row
    ``meta/`` carrying the centroid-table fingerprint, so a held
    handle's ``add(path=...)`` can detect that a rebuild swapped in
    re-fit centroids (returned so ``save()`` can arm the caller's own
    guard)."""
    import os as _os

    from ._staging import clear_stale, frame_fingerprint

    # a stale assignments.old from an interrupted compaction must not
    # outlive a re-save: if this save then crashed mid-overwrite,
    # loaders would silently serve the PRE-rebuild state via the
    # resolve_live fallback
    clear_stale(_os.path.join(path, "assignments"))
    centroids.write.mode("overwrite").parquet(
        _os.path.join(path, "centroids")
    )
    (
        assignments.write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(_os.path.join(path, "assignments"))
    )
    fp = frame_fingerprint(centroids)
    # the hash sum is an arbitrary-width integer (decimal(38,0)
    # aggregate) — stored as a string so it round-trips exactly; the
    # family tag is the cross-family add guard's identity
    # (_staging.require_meta_family — the IVF-layout families share
    # this meta schema, so column names alone can't tell them apart).
    # ``extra`` appends family-private long columns (the PQ families
    # persist pq_m so load() can refuse a foreign code layout from
    # the one-row meta read instead of scanning assignments)
    extra = extra or {}
    assert all(k.isidentifier() for k in extra), extra  # DDL-safe keys
    schema = "c_rows long, c_fp string, family string" + "".join(
        f", {k} long" for k in extra
    )
    centroids.sparkSession.createDataFrame(
        [(fp[0], str(fp[1]), family, *[int(v) for v in extra.values()])],
        schema,
    ).write.mode("overwrite").parquet(_os.path.join(path, "meta"))
    return fp


def _ivf_fp_from(md) -> "tuple | None":
    """(c_rows, c_fp) from an IVF-layout meta dict, None for pre-
    fingerprint layouts."""
    if md and md.get("c_fp") is not None:
        return (int(md["c_rows"]), int(md["c_fp"]))
    return None


def _load_ivf_frames(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, "dict | None"]:
    import os as _os

    from ._staging import read_meta_row, resolve_live

    # root-level resolve first (a crash inside rebuild_root's swap
    # window leaves the pre-rebuild root at <path>.old), then the
    # dataset-level fallback for _compact_assignments' rename window
    # (centroids are never swapped)
    path = resolve_live(path)
    meta = read_meta_row(spark, path)
    md = meta.asDict() if meta is not None else None
    return (
        spark.read.parquet(_os.path.join(path, "centroids")),
        spark.read.parquet(
            resolve_live(_os.path.join(path, "assignments"))
        ),
        md,
    )


def _compact_assignments(
    spark: SparkSession, path: str, partition_col: str
) -> None:
    """Rewrite a saved index's ``assignments`` parquet with one file
    per partition directory — the maintenance verb for the small-file
    litter repeated :meth:`add` appends leave (at some point FILE
    COUNT, not data size, dominates scan planning). Row-preserving;
    crash recovery and the swap live in the shared
    ``_staging.compact_dataset`` (every loader falls back to the
    ``.old`` state, a re-run picks an interrupted compaction up). Not
    safe concurrently with ``add`` or active readers."""
    from ._staging import compact_dataset

    compact_dataset(spark, path, "assignments", partition_col=partition_col)


def _verify_srp_meta(
    spark: SparkSession, path: str, dim: int, planes: int,
    family: str,
) -> None:
    """The SRP families' frozen-parameter guard for ``add(path=...)``:
    the layout must belong to THIS family (explicit meta tag —
    SRPIndex and QuantizedSRPIndex share the meta schema but have
    incompatible assignments schemas, so column names alone cannot
    separate them) and the handle's (dim, planes) quantizer must
    match the persisted one-row meta — a handle outliving a
    maybe_rebuild that swapped in a re-parameterized index (e.g.
    planes+1) would otherwise append signatures that can never
    collide with the layout's buckets. One-row read; raises on
    mismatch (re-``load()`` after any maintenance pass)."""
    from ._staging import (
        read_meta_row,
        require_meta_family,
        verify_frozen_handle,
    )

    meta = read_meta_row(spark, path)
    md = meta.asDict() if meta is not None else {}
    if meta is not None and "dim" not in md:
        # a non-SRP meta shape — name the actual mistake instead of
        # dying on a KeyError
        raise ValueError(
            f"the index at {path!r} is not an SRP-family layout (its "
            f"meta carries {sorted(md)}, not (dim, planes)) — "
            "appending SRP signatures into a foreign layout would "
            "corrupt it"
        )
    require_meta_family(md, family, path)
    verify_frozen_handle(
        path,
        "(dim, planes) quantizer",
        (dim, planes),
        (int(md["dim"]), int(md["planes"])) if md else None,
    )


def _append_assignments(
    new: DataFrame, path: str, partition_col: str, require_subdir: str
) -> None:
    """The one disk-append shape shared by every index family's
    ``add(path=...)`` (the `_save_ivf_layout` never-diverge rationale
    applied to the append side): refuse a path with no saved index
    BEFORE writing — an unguarded append would strand half an index
    on disk and then fail confusingly when the trailing load() misses
    ``meta``/``centroids`` — then append the new rows to the
    partitioned ``assignments`` parquet (existing files untouched)."""
    import os as _os

    from ._staging import append_partitioned

    if not _os.path.isdir(_os.path.join(path, require_subdir)):
        raise ValueError(
            f"no saved index under {path!r} (missing {require_subdir}/)"
            " — save() there first; add(path=...) appends to an"
            " existing layout"
        )
    # append_partitioned refuses the compact crash window (.old
    # without live) AND a missing live dataset (crashed save) — an
    # append must never materialize a fresh live dir holding only the
    # new rows
    append_partitioned(new, path, "assignments", partition_col)


class IVFIndex:
    """Persisted IVF index: build once, serve many query batches.

    On disk the index is two parquet datasets under one root:
    ``centroids/`` (n_lists rows — tiny) and ``assignments/``
    PARTITIONED BY ``list_id``. That layout is the point: probing
    n_probe of n_lists lists becomes a directory-pruned scan — a
    query batch physically reads ~n_probe/n_lists of the index,
    which is the IVF promise at 100 TB (ephemeral :func:`ivf_topk`
    re-fits and re-assigns per call; the index amortizes both).

    Scoring is the same one-job shape as :func:`ivf_topk`: per-query
    probe lists assigned executor-side (:func:`_probe_lists`), the
    probe frame broadcasts, one join on list_id, one per-query window
    for top-k. The only collect is the DISTINCT probed list ids
    (≤ n_lists ints) that become the partition-pruning IN filter.
    """

    # the one dataset add(path=...) appends to (the streaming
    # ingest replay protocol snapshots it: streaming.index_ingest_fn)
    APPEND_DATASETS = ("assignments",)

    def __init__(self, centroids: DataFrame, assignments: DataFrame,
                 vec_col: str, id_col: str):
        self.centroids = centroids
        self.assignments = assignments
        self.vec_col = vec_col
        self.id_col = id_col
        # (rows, xxhash64-sum) of the frozen centroids — set by
        # save()/load(), lazily computed for never-saved handles; the
        # add(path=...) guard against a rebuild-swapped layout
        self._frozen_fp: tuple | None = None
        # True only for disk-backed handles (set by load()): the
        # probed-id IN prefilter exists to directory-prune the
        # partitioned parquet scan at planning time, which costs one
        # eager collect job per serve (_pruned_by_probes). An
        # EPHEMERAL build has no scan to prune — the serve's inner
        # join on the probe frame already restricts to probed
        # partitions row-for-row — so serves skip the prefilter and
        # its job entirely (guide §5: no driver actions the plan
        # doesn't need).
        self._scan_pruned = False

    @staticmethod
    def build(
        vectors: DataFrame,
        n_lists: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        fit_sample_fraction: float | None = None,
    ) -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        spark = vectors.sparkSession
        with_vec = vectors.withColumn(
            "_features", array_to_vector(_dbl(vec_col))
        )
        fit_input = with_vec
        if fit_sample_fraction is not None:
            fit_input = with_vec.sample(fit_sample_fraction, seed=42)
        model = KMeans(k=n_lists, seed=42, featuresCol="_features").fit(
            fit_input
        )
        assignments = (
            model.transform(with_vec)
            .withColumnRenamed("prediction", "list_id")
            .select(id_col, vec_col, "list_id")
        )
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in
             enumerate(model.clusterCenters())],
            "list_id int, centroid array<double>",
        )
        return IVFIndex(centroids, assignments, vec_col, id_col)

    def add(
        self, vectors: DataFrame, path: str | None = None
    ) -> "IVFIndex":
        """Incremental append: assign new vectors to the nearest
        FROZEN centroid (:func:`ivf_assign` — the same deterministic
        round6 + list_id tie-break convention the frozen-centroid
        serve path q66 uses) and add them to the list_id-partitioned
        assignments, so a growing corpus never re-fits or re-assigns
        the existing index. With ``path`` the new rows append to the
        existing parquet (centroids are untouched — they are the
        frozen model) and the returned index reads from disk; without
        it the append is in-memory.

        STALENESS: centroids stay frozen — appends are exact under the
        frozen-model contract, but the KMeans fit no longer reflects
        the grown distribution, so list sizes can skew and recall at a
        fixed n_probe can drift as appended data diverges from the
        build-time sample. Re-``build`` when the corpus has shifted
        materially. Appended ids must not collide with existing ones.

        With ``path``, the handle's frozen centroids are first
        verified against the persisted meta fingerprint (one-row
        read): a handle that outlived a maybe_rebuild/maintain swap
        would otherwise silently append rows assigned under the OLD
        centroids into the re-fit layout. Raises on mismatch —
        re-``load()`` (and re-create any ingest closures) after any
        maintenance pass; checked BEFORE the assignment plan exists so
        a refused call leaves no abandoned plan state behind."""
        if path is not None:
            self._verify_frozen(vectors.sparkSession, path)
        new = ivf_assign(
            vectors, self.centroids, self.vec_col, self.id_col
        )
        if path is None:
            out = IVFIndex(
                self.centroids,
                self.assignments.unionByName(new),
                self.vec_col,
                self.id_col,
            )
            out._frozen_fp = self._frozen_fp
            # an in-memory append onto a disk-backed handle: the IN
            # prefilter still prunes the parquet child of the union
            out._scan_pruned = self._scan_pruned
            return out
        _append_assignments(new, path, "list_id", "centroids")
        return IVFIndex.load(
            new.sparkSession, path, self.vec_col, self.id_col
        )

    def _verify_frozen(self, spark: SparkSession, path: str) -> None:
        from ._staging import (
            frame_fingerprint,
            read_meta_row,
            require_meta_family,
            verify_frozen_handle,
        )

        if self._frozen_fp is None:
            self._frozen_fp = frame_fingerprint(self.centroids)
        meta = read_meta_row(spark, path)
        md = meta.asDict() if meta is not None else {}
        if md and "c_fp" not in md:
            # the symmetric cross-family guard to _verify_srp_meta's
            raise ValueError(
                f"the index at {path!r} is not an IVF-family layout "
                f"(its meta carries {sorted(md)}, not a centroid "
                "fingerprint) — appending IVF assignments into a "
                "foreign layout would corrupt it"
            )
        # the IVF-layout families share this meta schema and can
        # even share frozen centroids — only the explicit tag can
        # separate a float layout from a packed/int8/residual one.
        # Identity is the FAMILY attribute where a class declares one
        # (the PQ families; save()/load() key on it, so a subclass
        # inheriting FAMILY — e.g. a custom-codebook measurement
        # subclass — must verify under the SAME identity it saved
        # under), falling back to the class name for the families
        # whose save() writes their name literally (r14 review).
        require_meta_family(
            md, getattr(type(self), "FAMILY", type(self).__name__), path
        )
        verify_frozen_handle(
            path, "centroids", self._frozen_fp, _ivf_fp_from(md)
        )

    def save(self, path: str) -> None:
        self._frozen_fp = _save_ivf_layout(
            self.centroids, self.assignments, path, "IVFIndex"
        )

    @staticmethod
    def compact(
        spark: SparkSession,
        path: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "IVFIndex":
        """One file per list directory (see ``_compact_assignments``)
        — run after many ``add`` appends."""
        _compact_assignments(spark, path, "list_id")
        return IVFIndex.load(spark, path, vec_col, id_col)

    @staticmethod
    def load(
        spark: SparkSession,
        path: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "IVFIndex":
        centroids, assignments, md = _load_ivf_frames(spark, path)
        require_meta_family(md, "IVFIndex", path)
        idx = IVFIndex(centroids, assignments, vec_col, id_col)
        idx._frozen_fp = _ivf_fp_from(md)
        idx._scan_pruned = True
        return idx

    def staleness(
        self, sample_fraction: float | None = None
    ) -> DataFrame:
        """One-row frozen-centroid drift report — occupancy skew,
        centroid shift, assignment churn; see
        :func:`ivf_staleness_report` for metric definitions and the
        measured rebuild rule. Snapshot once right after ``build`` —
        drift reads as GROWTH over that baseline."""
        return ivf_staleness_report(
            self.centroids,
            self.assignments,
            self.vec_col,
            self.id_col,
            sample_fraction,
        )

    def save_build_report(self, path: str) -> None:
        """Persist the build-time staleness row under the index root —
        the baseline ``maybe_rebuild`` (and ``ivf_rebuild_verdict``'s
        occupancy-growth triggers) compares against. Call right after
        ``save()``; ``maybe_rebuild`` refreshes it automatically after
        every rebuild it performs."""
        _write_baseline(self.staleness(), path, BUILD_REPORT_DIR)

    @staticmethod
    def maybe_rebuild(
        spark: SparkSession,
        path: str,
        vectors: DataFrame | None = None,
        n_lists: int | None = None,
        sample_fraction: float | None = None,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        **thresholds,
    ):
        """Staleness -> verdict -> staged rebuild+swap, in one call —
        the loop :func:`ivf_rebuild_verdict` left manual: measure the
        saved index's drift (q116's report), apply the measured rule
        (occupancy triggers armed by the stored
        :meth:`save_build_report` baseline when present), and when it
        trips, re-fit KMeans over the CURRENT corpus (``vectors`` when
        given, else the index's own assignments — they retain the raw
        vectors), write the fresh index + fresh baseline to a staging
        root, and swap via ``_staging.rebuild_root`` (rename protocol;
        loaders fall back to ``<path>.old`` across the crash window;
        streaming ingest markers are preserved so a resuming stream
        still dedups). Returns ``(index, verdict, report_row)`` —
        ``index`` is the freshly-swapped load when rebuilt, the
        current one otherwise. ``n_lists`` defaults to the saved
        centroid count; ``thresholds`` forward to the verdict."""
        from ._staging import recover_before_rebuild

        recover_before_rebuild(path, spark)
        idx = IVFIndex.load(spark, path, vec_col, id_col)
        report = idx.staleness(sample_fraction).collect()[0]
        base = _read_baseline(spark, path, BUILD_REPORT_DIR)
        verdict = ivf_rebuild_verdict(
            report,
            base.collect()[0] if base is not None else None,
            **thresholds,
        )
        if not verdict.rebuild:
            return idx, verdict, report
        from ._staging import rebuild_root, refresh_root

        source = (
            vectors
            if vectors is not None
            else idx.assignments.select(id_col, vec_col)
        )
        k = n_lists if n_lists is not None else idx.centroids.count()

        def _fresh(staging: str) -> None:
            fresh = IVFIndex.build(source, k, vec_col, id_col)
            fresh.save(staging)
            fresh.save_build_report(staging)

        rebuild_root(path, _fresh)
        refresh_root(spark, path)
        return IVFIndex.load(spark, path, vec_col, id_col), verdict, report

    def topk(
        self, query: DataFrame, k: int = 10,
        n_probe: int = IVF_DEFAULT_N_PROBE,
    ) -> DataFrame:
        qdf = _probe_lists(
            query, self.centroids, n_probe, self.vec_col, self.id_col
        )

        # IN-filter on the union of probed lists reaches the scan as a
        # PARTITION filter on the list_id layout — the join alone would
        # read every list. Distinct probed ids are bounded by n_lists
        # here; _pruned_by_probes caps the collect and falls back to a
        # broadcast semi-join past PROBE_LITERAL_CAP regardless.
        # Ephemeral builds have no scan to prune — skip the prefilter
        # and its eager collect job (see __init__._scan_pruned).
        pruned = (
            _pruned_by_probes(self.assignments, qdf, "list_id")
            if self._scan_pruned
            else self.assignments
        )

        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return (
            pruned.join(F.broadcast(qdf), "list_id")
            .filter(F.col(self.id_col) != F.col("query_id"))
            .withColumn("cosine", round6(cosine_col(self.vec_col, "qvec")))
            .select(
                "query_id", F.col(self.id_col).alias("neighbor_id"), "cosine"
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )


def ann_recall(
    approx: DataFrame, exact: DataFrame
) -> DataFrame:
    """(query_id, n_exact, n_hit, recall): per-query recall of an
    approximate top-k result against an exact one — the executable
    form of "validate the index's recall against the brute-force
    baseline on samples" that the IVF/SRP docstrings prescribe.

    Inputs are any two frames with (query_id, neighbor_id) columns
    (e.g. ``IVFIndex.topk``/``srp_ivf_topk`` vs ``brute_force_topk``
    on the same sampled queries). One semi-join + two small aggs; the
    output is |queries| rows, so at 100 TB this runs over a sampled
    query set and the report broadcasts anywhere.
    """
    ex = exact.select("query_id", "neighbor_id")
    hits = (
        ex.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    totals = ex.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return totals.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        round6(
            F.coalesce("n_hit", F.lit(0)).cast("double")
            / F.col("n_exact")
        ).alias("recall"),
    )


# --------------------------------------------------------------------------
# Index staleness reports. All five persisted families append under
# FROZEN parameters (KMeans centroids, SRP hyperplanes, idf stats) —
# exact by design, but a user appending 10x the build corpus needs a
# MEASURED signal for when frozen-parameter recall/serving cost has
# drifted below spec, not a docstring's "rebuild when it matters"
# (the reference checks freshness too, mtime-invalidated version
# cache: /root/reference/src/aerovaldb/jsondb/jsonfiledb.py:224-258).
# Every metric follows the cross-engine determinism conventions
# (round6 per-term values, DECIMAL(18,6) sums, integer counts), so
# the reports are DuckDB-oracle-gradable (q114/q115/q116).


class RebuildVerdict(NamedTuple):
    """Executable form of a documented rebuild rule: ``rebuild`` plus
    the specific measured reasons that tripped it (empty when fresh
    enough). Produced by the per-family ``*_rebuild_verdict`` pure
    functions from collected staleness-report rows, so applying a
    rule costs no extra Spark jobs beyond the report the user already
    ran."""

    rebuild: bool
    reasons: tuple[str, ...]


def _report_dict(report) -> dict:
    return report.asDict() if hasattr(report, "asDict") else dict(report)


def ivf_rebuild_verdict(
    report,
    build_report=None,
    churn_threshold: float = 0.25,
    occupancy_growth: float = 2.0,
) -> RebuildVerdict:
    """Apply the MEASURED IVF rebuild rule (SCALING.md "Index
    staleness", r11) to a collected :func:`ivf_staleness_report` row.
    Frozen centroids did not lose recall in measurement — they lose
    the cost advantage — so the triggers are serving-cost signals:

    - occupancy concentration: load_factor_max or top_mass grew past
      ``occupancy_growth``x the build-time report (the shift
      signature; measured 12.8x load factor -> 1.9x candidates scored
      per query). Needs ``build_report`` (staleness() collected right
      after build); without it this trigger is skipped.
    - assignment_churn > ``churn_threshold`` (the diffusion
      signature; measured 0.128 churn -> +37% scoring cost, so 0.25
      marks roughly 2x).

    >>> ivf_rebuild_verdict(
    ...     {"load_factor_max": 12.8, "top_mass": 0.8,
    ...      "assignment_churn": 0.0005},
    ...     {"load_factor_max": 2.2, "top_mass": 0.14,
    ...      "assignment_churn": 0.065}).rebuild
    True
    """
    cur = _report_dict(report)
    reasons = []
    if build_report is not None:
        base = _report_dict(build_report)
        for key in ("load_factor_max", "top_mass"):
            if (
                base.get(key)
                and cur.get(key) is not None
                and cur[key] >= occupancy_growth * base[key]
            ):
                reasons.append(
                    f"{key} {cur[key]} >= {occupancy_growth}x build-time "
                    f"{base[key]} (hot lists make probes degenerate "
                    "toward brute force)"
                )
    churn = cur.get("assignment_churn")
    # NULL churn (e.g. a sampled report whose Bernoulli sample came up
    # empty) is absent evidence, not a trigger — same rule as the
    # base.get() guard above
    if churn is not None and churn > churn_threshold:
        reasons.append(
            f"assignment_churn {churn} > "
            f"{churn_threshold} (a refit would move this fraction of "
            "members; scoring cost creeps with it)"
        )
    return RebuildVerdict(bool(reasons), tuple(reasons))


def srp_rebuild_verdict(
    report,
    build_report=None,
    occupancy_growth: float = 2.0,
    new_bucket_mass_threshold: float = 0.2,
) -> RebuildVerdict:
    """Apply the documented SRP re-plan rule to a collected
    :func:`bucket_occupancy_drift` (or plain skew) row: the quantizer
    stays bit-exact forever, so this is purely serving-cost drift —
    re-plan (more planes, or re-partition) when load_factor_max grows
    past ``occupancy_growth``x its build value (needs
    ``build_report``) or new_bucket_mass exceeds
    ``new_bucket_mass_threshold``.

    >>> srp_rebuild_verdict(
    ...     {"load_factor_max": 1.5, "new_bucket_mass": 0.45}).rebuild
    True
    """
    cur = _report_dict(report)
    reasons = []
    if build_report is not None:
        base = _report_dict(build_report)
        if (
            base.get("load_factor_max")
            and cur.get("load_factor_max") is not None
            and cur["load_factor_max"]
            >= occupancy_growth * base["load_factor_max"]
        ):
            reasons.append(
                f"load_factor_max {cur['load_factor_max']} >= "
                f"{occupancy_growth}x build-time "
                f"{base['load_factor_max']}"
            )
    nbm = cur.get("new_bucket_mass")
    if nbm is not None and nbm > new_bucket_mass_threshold:
        reasons.append(
            f"new_bucket_mass {nbm} > {new_bucket_mass_threshold} "
            "(corpus mass in buckets the build never saw)"
        )
    return RebuildVerdict(bool(reasons), tuple(reasons))


BUILD_REPORT_DIR = "build_report"
BUILD_OCCUPANCY_DIR = "build_occupancy"


def _write_baseline(df: DataFrame, path: str, name: str) -> None:
    """Persist a build-time baseline frame (one-row report or bucket
    histogram) under the index root — the stored object
    ``maybe_rebuild`` compares drift against."""
    import os as _os

    df.coalesce(1).write.mode("overwrite").parquet(
        _os.path.join(path, name)
    )


def _read_baseline(spark: SparkSession, path: str, name: str):
    """The stored baseline frame, or None when the index was saved
    without one (occupancy-growth triggers are then skipped — the
    ivf/srp verdicts' documented no-baseline rule)."""
    import os as _os

    from ._staging import resolve_live

    d = _os.path.join(resolve_live(path), name)
    if not _os.path.isdir(d):
        return None
    return spark.read.parquet(d)


def _occupancy_metrics(assignments: DataFrame, col: str) -> DataFrame:
    """One-row (n_rows, n_partitions, load_factor_max, occupancy_cov,
    top_mass) over the ``col``-partitioned assignment table. Skew here
    is the serving-cost drift signal for the hash-partitioned families
    (a drifted corpus concentrating into few buckets makes every probe
    of a hot bucket score proportionally more candidates). Integer
    aggregates only, so exact on any engine: load_factor_max =
    max_size/mean_size, occupancy_cov = population stddev/mean via
    sqrt(L*sum(c^2) - (sum c)^2)/sum(c), top_mass = max_size/total."""
    return _occupancy_metrics_from_hist(
        assignments.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
    )


def _occupancy_metrics_from_hist(occ: DataFrame) -> DataFrame:
    """:func:`_occupancy_metrics` over an ALREADY-BUILT (col, c)
    histogram — callers that have the histogram in hand (persisted
    drift reports) must not rescan the assignment table to re-derive
    it."""
    return occ.agg(
        F.sum("c").alias("_tot"),
        F.count(F.lit(1)).alias("_l"),
        F.max("c").alias("_mx"),
        F.sum(F.col("c") * F.col("c")).alias("_s2"),
    ).select(
        F.col("_tot").alias("n_rows"),
        F.col("_l").alias("n_partitions"),
        round6(
            F.col("_mx") * F.col("_l") / F.col("_tot").cast("double")
        ).alias("load_factor_max"),
        round6(
            # products in DOUBLE: long multiply wraps silently past
            # 2^63 (n_rows >= ~3e9 makes tot*tot overflow — inside the
            # 100 TB envelope), where the DuckDB oracle's checked
            # BIGINT would error instead; both engines compute the
            # identical IEEE double product
            # clamp at 0: past 2^53 the double products round, so a
            # mathematically-zero variance can come out epsilon-
            # negative — Spark sqrt would NaN and DuckDB ERRORS
            F.sqrt(
                F.greatest(
                    F.col("_l").cast("double") * F.col("_s2").cast("double")
                    - F.col("_tot").cast("double")
                    * F.col("_tot").cast("double"),
                    F.lit(0.0),
                )
            )
            / F.col("_tot")
        ).alias("occupancy_cov"),
        round6(F.col("_mx") / F.col("_tot").cast("double")).alias("top_mass"),
    )


def bucket_occupancy_drift(
    assignments: DataFrame, baseline: DataFrame, col: str = "bucket"
) -> DataFrame:
    """One-row occupancy DRIFT report for the SRP families: current
    ``col`` histogram of ``assignments`` vs a ``baseline`` (col, c)
    histogram snapshotted at build time (``SRPIndex.occupancy()``).
    Columns: the :func:`_occupancy_metrics` skew set for the CURRENT
    table, plus growth_ratio (rows now / rows at baseline),
    total_variation (0.5 * sum |p_now - p_base| over the bucket union;
    per-bucket terms round6'd and DECIMAL-summed so the sum is
    order-free), and new_bucket_mass (current mass in buckets the
    baseline never saw — the clearest "distribution moved" signal).

    Rebuild rule (measured in SCALING.md "Index staleness"): the SRP
    quantizer stays bit-exact forever, so this is serving-cost drift,
    not correctness drift — re-plan (more planes, or re-partition) when
    load_factor_max grows past ~2x its build value or new_bucket_mass
    exceeds ~0.2; total_variation tracks how far the corpus moved."""
    from ._scope import scoped_persist

    # persist the CURRENT histogram: it feeds the drift join AND the
    # skew metrics below — unpersisted, each consumer re-runs the
    # signature projection over the whole assignment table (for the
    # SRP families that is planes x dim md5 folds per row, ~3x)
    occ = scoped_persist(
        assignments.groupBy(col).agg(F.count(F.lit(1)).alias("c_now"))
    )
    base = baseline.select(col, F.col("c").alias("c_base"))
    # persisted too: the joined histogram feeds the totals AND the
    # per-bucket drift terms (bucket-count cardinality — tiny)
    joined = scoped_persist(
        occ.join(base, col, "full_outer").select(
            F.coalesce("c_now", F.lit(0)).alias("c_now"),
            F.coalesce("c_base", F.lit(0)).alias("c_base"),
        )
    )
    tot = joined.agg(
        F.sum("c_now").alias("_tn"), F.sum("c_base").alias("_tb")
    )
    drift = (
        joined.crossJoin(F.broadcast(tot))
        .select(
            round6(
                F.abs(
                    F.col("c_now") / F.col("_tn").cast("double")
                    - F.col("c_base") / F.col("_tb").cast("double")
                )
            ).alias("_tv"),
            F.when(F.col("c_base") == 0, F.col("c_now"))
            .otherwise(F.lit(0))
            .alias("_new"),
            "_tn",
            "_tb",
        )
        .agg(
            round6(
                F.sum(F.col("_tv").cast("decimal(18,6)")).cast("double")
                / 2.0
            ).alias("total_variation"),
            round6(
                F.sum("_new") / F.max("_tn").cast("double")
            ).alias("new_bucket_mass"),
            round6(
                F.max("_tn") / F.max("_tb").cast("double")
            ).alias("growth_ratio"),
        )
    )
    return _occupancy_metrics_from_hist(
        occ.select(F.col("c_now").alias("c"))
    ).crossJoin(drift)


def ivf_staleness_report(
    centroids: DataFrame | None,
    assignments: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """One-row staleness report for a frozen-centroid IVF index:
    occupancy skew (:func:`_occupancy_metrics`) + centroid drift +
    assignment churn. The KMeans fit froze at build; as appended data
    diverges from the build-time sample, members drift away from
    their frozen centroid and recall at a fixed n_probe decays — this
    measures that before it bites.

    - centroid_shift_mean/max: per occupied list, the distance between
      the frozen centroid and the CURRENT member mean, relative to the
      centroid's norm (round6 / DECIMAL-mean conventions, so the same
      report computes on any engine). A fresh index measures ~0 only
      if KMeans converged; the meaningful read is GROWTH over the
      build-time value.
    - assignment_churn: fraction of (sampled) members whose nearest
      one-Lloyd-step-updated mean differs from their stored list — the
      executable form of "would a refit move this vector". Sampling
      (``sample_fraction``) keeps the pass cheap at scale; the graded
      query runs unsampled for cross-engine determinism.

    Rebuild rule (measured in SCALING.md "Index staleness", r11):
    frozen centroids did NOT lose top-k recall on the measured
    corpora — even a hard distribution shift kept stale recall at or
    above the fresh rebuild's, because drifted mass CONCENTRATES into
    few frozen lists and probing a hot list degenerates toward brute
    force. What decays is the IVF cost advantage: candidates scored
    per query grew 1.9x when top_mass hit 0.80 (load_factor_max
    12.8x) under a shifted 5x append, and 1.37x under a
    same-distribution 5x append (churn 0.128) — so rebuild when
    load_factor_max/top_mass roughly doubles from the build-time
    report (shift signature: churn stays ~0 because the hot list's
    one-step mean is dominated by the drifted mass itself) or when
    assignment_churn exceeds ~0.25 (diffusion signature; 0.128
    already costs +37% scoring). centroid_shift growth corroborates
    but is the laggier signal of the three.

    ``centroids=None`` skips the shift columns — the QuantizedIVF
    store keeps only per-vector-scaled int8 codes, so there is no
    code-space frozen centroid to measure shift against (each code
    array lost its per-vector scale factor); its drift signal is
    occupancy skew + code-space churn against the one-step code
    means."""
    members = assignments.select(
        id_col, F.col(vec_col).alias("_vec"), "list_id"
    )
    if sample_fraction is not None:
        members = members.sample(sample_fraction, seed=seed)
    from ._scope import scoped_persist

    # sampled frame feeds three jobs (means, churn, occupancy is on
    # the full table); persist so they see ONE sample
    members = scoped_persist(members)
    dims = members.select(
        "list_id", F.posexplode(_dbl("_vec")).alias("pos", "x")
    )
    means = (
        dims.groupBy("list_id", "pos")
        .agg(
            round6(
                F.sum(round6(F.col("x")).cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("list_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )
    means = scoped_persist(means)
    # relative shift per occupied list: round6'd squared distances so
    # sqrt inputs match across engines
    shift = None if centroids is None else (
        means.withColumnRenamed("centroid", "_mv")
        .join(F.broadcast(centroids), "list_id")
        .select(
            round6(
                F.sqrt(
                    round6(
                        F.aggregate(
                            F.zip_with(
                                "_mv", "centroid",
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                    )
                    / round6(
                        F.aggregate(
                            F.zip_with(
                                "centroid", "centroid", lambda a, b: a * b
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                    )
                )
            ).alias("rel_shift")
        )
        .agg(
            round6(
                F.sum(F.col("rel_shift").cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("centroid_shift_mean"),
            F.max("rel_shift").alias("centroid_shift_max"),
        )
    )
    churn = (
        ivf_assign(
            # ivf_assign keeps only (id, vec, list_id) — the stored
            # list rides back in via the join below, so don't feed a
            # decoy column through the assignment
            members.select(id_col, "_vec"),
            means,
            "_vec",
            id_col,
        )
        .join(
            members.select(id_col, F.col("list_id").alias("_old")), id_col
        )
        .agg(
            round6(
                F.sum(
                    F.when(F.col("list_id") != F.col("_old"), 1).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("assignment_churn")
        )
    )
    report = _occupancy_metrics(assignments, "list_id")
    if shift is not None:
        report = report.crossJoin(shift)
    return report.crossJoin(churn)


# --------------------------------------------------------------------------
# q79: exact batch kNN self-join — every vector's k nearest neighbors
# in one job. This is the retrieval-eval / dedup-verification shape a
# training pipeline runs over an embedded corpus; exact all-pairs is
# the VALIDATION baseline (size-guarded like cosine_near_dup_pairs) —
# the 100 TB path is IVFIndex.topk (directory-pruned probes) with this
# as its recall oracle on samples.
KNN_JOIN_K = 3
KNN_JOIN_MAX_ROWS = 100_000


def knn_join(
    vectors: DataFrame,
    k: int = KNN_JOIN_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int | None = KNN_JOIN_MAX_ROWS,
) -> DataFrame:
    """Exact k nearest neighbors (cosine) for EVERY vector, one plan.

    Same scale-shaping as :func:`cosine_near_dup_pairs`: arrays cast to
    double and norms computed once per vector BEFORE the join (one fold
    per pair, not three), left side repartitioned so the O(n²) scoring
    parallelizes off a single row group. The per-query top-k window
    shuffles only (query_id, neighbor_id, cosine) triples — 20 bytes a
    row, not vectors. Inputs above ``max_rows`` raise; use
    :class:`IVFIndex` + sampled recall checks at scale.
    """

    if max_rows is not None and _over_guard(vectors, id_col, max_rows):
        raise ValueError(
            f"knn_join is an O(n²) validation baseline; input has more "
            f"than max_rows={max_rows} rows. Use IVFIndex.topk at "
            "scale (validate its recall against knn_join on a "
            "sample), or pass max_rows=None to override."
        )
    par = vectors.sparkSession.sparkContext.defaultParallelism
    prepped = vectors.select(
        F.col(id_col).alias("_id"),
        _dbl(vec_col).alias("_vec"),
        norm_col(vec_col).alias("_norm"),
    )
    a = prepped.toDF("query_id", "vec_a", "norm_a").repartition(par, "query_id")
    b = prepped.toDF("neighbor_id", "vec_b", "norm_b")
    dot = pair_dot_col()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        a.join(b, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            round6(dot / F.nullif(F.col("norm_a") * F.col("norm_b"), F.lit(0.0))),
        )
        .select("query_id", "neighbor_id", "cosine")
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("query_id", "knn_rank", "neighbor_id", "cosine")
    )


def q79_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join(emb, k=KNN_JOIN_K)


Q79_SQL = f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    ROUND(
      list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS knn_rank
  FROM scored
)
SELECT query_id, knn_rank, neighbor_id, cosine
FROM ranked WHERE knn_rank <= {KNN_JOIN_K}
"""


# --------------------------------------------------------------------------
# q83: embedding cluster-cohesion report — intra-label pairwise cosine
# statistics per label. The "did my clustering / labeling hold up"
# audit a pipeline runs after assigning embeddings to groups: a label
# whose average intra-cosine is low (or whose min is negative) is
# incoherent. Pairwise sums use the DECIMAL-sum convention (round to 6
# then cast decimal(18,6)) so the aggregate is order-independent and
# bit-equal cross-engine. Intra-label pairing is quadratic per label —
# size-guarded like knn_join; at scale you run it per-label on a
# deterministic sample (stratified_sample_flag) and the report shape
# is unchanged.
LABEL_COHESION_MAX_ROWS = 100_000


def label_cohesion(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    max_rows: int | None = LABEL_COHESION_MAX_ROWS,
) -> DataFrame:
    """(label, n_vectors, n_pairs, avg_cosine, min_cosine, max_cosine).

    ``avg_cosine`` averages round(cosine, 6) over all within-label
    pairs via an exact DECIMAL sum; min/max are order-free already.
    Norms are computed once per vector before the pair join.
    """
    if max_rows is not None and _over_guard(vectors, id_col, max_rows):
        raise ValueError(
            f"label_cohesion pairs quadratically within labels; "
            f"input has more than max_rows={max_rows} rows. Run it on "
            "a stratified sample at scale, or pass max_rows=None."
        )
    prepped = vectors.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("_id"),
        _dbl(vec_col).alias("_vec"),
        norm_col(vec_col).alias("_norm"),
    )
    a = prepped.toDF("label", "id_a", "vec_a", "norm_a")
    b = prepped.toDF("label", "id_b", "vec_b", "norm_b")
    dot = pair_dot_col()
    pairs = (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            round6(dot / F.nullif(F.col("norm_a") * F.col("norm_b"), F.lit(0.0))),
        )
    )
    sizes = vectors.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    stats = pairs.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        round6(
            F.sum(F.col("cosine").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))).alias("avg_cosine"),
        F.min("cosine").alias("min_cosine"),
        F.max("cosine").alias("max_cosine"),
    )
    # LEFT join FROM sizes: a singleton label has no pairs (and so no
    # stats row) but must still appear in the audit report — a
    # mis-clustered stray in its own label would otherwise be
    # invisible to a consumer iterating the output. n_pairs coalesces
    # to 0; the cosine stats stay NULL (no pairs to describe).
    return sizes.join(stats, "label", "left").select(
        "label",
        "n_vectors",
        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        "avg_cosine",
        "min_cosine",
        "max_cosine",
    )


def q83_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return label_cohesion(emb)


Q83_SQL = """
WITH p AS (
  SELECT a.label,
    ROUND(
      list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
), stats AS (
  SELECT label, COUNT(*) AS n_pairs,
    ROUND(CAST(SUM(CAST(cosine AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_cosine,
    MIN(cosine) AS min_cosine, MAX(cosine) AS max_cosine
  FROM p GROUP BY label
), sizes AS (
  SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label
)
SELECT z.label, z.n_vectors, COALESCE(s.n_pairs, 0) AS n_pairs,
       s.avg_cosine, s.min_cosine, s.max_cosine
FROM sizes z LEFT JOIN stats s ON s.label = z.label
"""


# --------------------------------------------------------------------------
# q89: int8 embedding quantization audit — per-vector symmetric
# quantization (scale = max|x|/127, codes = round-half-up to int8) and
# the reconstruction error it costs. The storage-compression step an
# embedding pipeline runs before writing a billion-vector index (4x
# smaller, cache-friendlier scans); the report tells you per vector
# whether int8 is safe (rmse ≪ typical inter-vector distance).
# Map-only: transform/zip_with/aggregate higher-order functions, no
# shuffle at all. Quantization uses floor(x/scale + 0.5) — pure
# integer-producing double arithmetic, bit-identical cross-engine
# (no banker's-rounding ambiguity); the error fold mirrors DuckDB's
# in-order list_dot_product.
def quantization_audit(
    vectors: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    v = _dbl(vec_col)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = max_abs / F.lit(127.0)
    codes = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(x / scale + F.lit(0.5))),
        ),
    )
    err = F.zip_with(v, codes, lambda x, q: x - q * scale)
    sse = F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e)
    # An all-zero vector has scale 0: its codes/rmse are undefined.
    # Explicit NULL gating (not x/0) because Spark yields NaN while
    # DuckDB yields NULL on double /0, and Spark's least/greatest SKIP
    # NULLs (127 would leak through) — the CASE keeps both engines at
    # NULL. q_scale itself stays 0.0 (well-defined).
    defined = max_abs != F.lit(0.0)
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        F.size(vec_col).alias("dim"),
        round6(scale).alias("q_scale"),
        F.when(
            defined,
            F.aggregate(codes, F.lit(0.0), lambda acc, q: acc + q),
        ).cast("long").alias("sum_codes"),
        F.when(
            defined, round6(F.sqrt(sse / F.size(vec_col)))
        ).alias("rmse"),
    )


def q89_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return quantization_audit(emb)


# --------------------------------------------------------------------------
# q98: ANN served FROM the int8-quantized storage q89 audits — the
# step after "is int8 safe?" is "retrieve from it". Per-vector
# symmetric scales CANCEL in the cosine
# (dot(q_a*s_a, q_b*s_b) / (|q_a|s_a * |q_b|s_b) = dot(q_a, q_b) /
# (|q_a| |q_b|)), so scoring is EXACT integer arithmetic over the
# codes — bit-identical cross-engine with no float-accumulation
# divergence, and the scan reads 1/4 the bytes of the float32 column
# at 100 TB. Zero-norm vectors have undefined codes (scale 0) and are
# excluded on both engines. Per-query cost is O(n) (a batch of k
# point lookups, the q29 family shape — not a pair join); the scale
# path composes the same codes with SRP buckets — DEMONSTRATED by
# q101 / QuantizedSRPIndex below: signatures computed on the codes,
# directory-pruned probes over the tinyint table, exact integer
# re-rank (positive scale preserves the raw vector's projection
# signs; rounding can flip a near-zero projection, which the q101
# recall floor measures — ~zero recall cost at sf0.1).
def _q8_codes(vec_col: str) -> Column:
    """The exact q89 quantization: integer-valued double codes, NULL
    for a zero vector (scale 0 — CASE-gated so ANSI mode never sees
    the division; DuckDB reaches the same NULL through its /0 → NULL
    propagation)."""
    v = _dbl(vec_col)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = max_abs / F.lit(127.0)
    codes = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(x / scale + F.lit(0.5))),
        ),
    )
    return F.when(max_abs > F.lit(0.0), codes)


def quantized_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    corpus = vectors.select(
        F.col(id_col).alias("neighbor_id"), _q8_codes(vec_col).alias("_qc")
    ).filter(F.col("_qc").isNotNull())
    probes = query.select(
        F.col(id_col).alias("query_id"), _q8_codes(vec_col).alias("_qq")
    ).filter(F.col("_qq").isNotNull())
    dot = F.aggregate(
        F.zip_with("_qc", "_qq", lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q8").desc(), F.col("neighbor_id")
    )
    return (
        corpus.join(F.broadcast(probes), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_q8", round6(dot / (nrm(F.col("_qc")) * nrm(F.col("_qq"))))
        )
        .withColumn("ann_rank", F.row_number().over(w))
        .filter(F.col("ann_rank") <= k)
        .select("query_id", "ann_rank", "neighbor_id", "cosine_q8")
    )


def q98_quantized_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


Q98_SQL = """
WITH live AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> greatest(-127.0, least(127.0,
             floor(x / (list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) / 127.0) + 0.5)))) AS codes
  FROM embeddings
  -- zero vectors have scale 0 / undefined codes: exclude on the SAME
  -- max|x| > 0 predicate the Spark side CASE-gates on (DuckDB's
  -- double 0/0 is NaN, not NULL, so a codes-based guard would differ)
  WHERE list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) > 0
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    ROUND(list_dot_product(c.codes, q.codes)
      / (sqrt(list_dot_product(c.codes, c.codes))
         * sqrt(list_dot_product(q.codes, q.codes))), 6) AS cosine_q8
  FROM live c JOIN (SELECT * FROM live WHERE vec_id < 5) q
    ON c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_q8,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine_q8 DESC, neighbor_id) AS ann_rank
  FROM scored
)
SELECT query_id, ann_rank, neighbor_id, cosine_q8
FROM ranked WHERE ann_rank <= 10
"""


Q89_SQL = """
WITH prep AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, len(embedding) AS dim
  FROM embeddings
), scaled AS (
  SELECT vec_id, v, dim,
    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM prep
), coded AS (
  SELECT vec_id, v, dim, scale,
    list_transform(v, x -> greatest(-127.0, least(127.0, floor(x / scale + 0.5)))) AS codes
  FROM scaled
), err AS (
  SELECT vec_id, dim, scale, codes,
    list_transform(list_zip(v, codes), p -> p[1] - p[2] * scale) AS e
  FROM coded
)
SELECT vec_id, dim,
  ROUND(scale, 6) AS q_scale,
  CASE WHEN scale <> 0 THEN CAST(list_sum(codes) AS BIGINT) END AS sum_codes,
  CASE WHEN scale <> 0 THEN ROUND(sqrt(list_dot_product(e, e) / dim), 6) END AS rmse
FROM err
"""


# --------------------------------------------------------------------------
# q90: label-centroid outlier gate — the embedding-side sibling of the
# q84 quality gate: drop each label's most-dissimilar bottom decile
# (by cosine to the label centroid), the mislabeled/noise-vector
# screen an embedding pipeline runs before training on labeled
# clusters. Scale shape: ONE (label, pos) aggregation for the
# centroids (labels × dims keys — balanced however skewed the labels
# are), the centroid table is |labels| rows → broadcast back, the
# cosine is map-only, and the gate is one per-label window (same
# posture as q84's per-source window: partitions are corpus/|labels|).
# Parity: centroid elements are 6dp-rounded DECIMAL sums (order-free,
# engine-exact), the cosine fold mirrors DuckDB's in-order
# list_dot_product, and membership is the INTEGER rule
# rank > floor(pct * n) over ascending (cos, vec_id) — no float
# comparison decides who is dropped (q84's convention).
OUTLIER_PCT = 0.10


def label_centroids(
    vectors: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """(label, centroid): per-label mean vector.

    Elements are rounded to 6dp and summed as DECIMAL(18,6), so the
    centroid is bit-identical on any engine and any partitioning (the
    order-free-sum convention of q83's avg_cosine); the mean divides
    as double and re-rounds to 6dp.
    """
    e = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(_dbl(vec_col)).alias("pos", "x"),
    )
    cd = e.groupBy("label", "pos").agg(
        round6(
            F.sum(round6(F.col("x")).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))).alias("c")
    )
    return cd.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("centroid")
    )


def label_outlier_gate(
    vectors: DataFrame,
    pct: float = OUTLIER_PCT,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Audit report of dropping each label's bottom ``pct`` fraction by
    cosine-to-centroid: (label, n_vectors, n_dropped, kept_avg_cos,
    kept_min_cos, kept_max_cos). ``kept_min_cos`` is the effective
    admission threshold the gate discovered per label.

    ``centroids`` accepts a precomputed :func:`label_centroids` frame
    so a caller that also needs the centroids themselves (e.g. the
    streaming admission table) pays the corpus aggregation once."""
    cents = (
        centroids
        if centroids is not None
        else label_centroids(vectors, vec_col, label_col)
    )
    # the centroid self-norm is a per-label constant: compute it on the
    # |labels|-row side BEFORE the broadcast, not per corpus row
    cents = cents.withColumn(
        "_cnorm", F.sqrt(pair_dot_col("centroid", "centroid"))
    )
    scored = (
        vectors.select(
            F.col(label_col).alias("label"),
            F.col(id_col).alias("vec_id"),
            _dbl(vec_col).alias("v"),
        )
        .join(F.broadcast(cents), "label")
        .withColumn(
            "cos",
            round6(
                pair_dot_col("v", "centroid")
                / F.nullif(
                    F.sqrt(pair_dot_col("v", "v")) * F.col("_cnorm"),
                    F.lit(0.0),
                )),
        )
        .drop("v", "centroid", "_cnorm")
    )
    # asc_nulls_last mirrors DuckDB's ASC default: a NULL cosine
    # (zero-norm vector) must land at the SAME end of the ranking on
    # both engines or n_dropped diverges
    w = Window.partitionBy("label").orderBy(
        F.col("cos").asc_nulls_last(), F.col("vec_id").asc()
    )
    wn = Window.partitionBy("label")
    flagged = (
        scored.withColumn("_rank", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "_drop",
            F.col("_rank")
            <= F.floor(F.lit(pct) * F.col("_n")).cast("long"),
        )
    )
    kept_cos = F.when(~F.col("_drop"), F.col("cos"))
    return flagged.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("_drop").cast("long")).alias("n_dropped"),
        round6(
            F.sum(kept_cos.cast("decimal(18,6)")).cast("double")
            / F.sum((~F.col("_drop")).cast("long"))).alias("kept_avg_cos"),
        F.min(kept_cos).alias("kept_min_cos"),
        F.max(kept_cos).alias("kept_max_cos"),
    )


def q90_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return label_outlier_gate(emb)


Q90_SQL = f"""
WITH e AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
         ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS x
  FROM embeddings
), cd AS (
  SELECT label, pos,
    ROUND(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS c
  FROM e GROUP BY label, pos
), cent AS (
  SELECT label, list(c ORDER BY pos) AS centroid FROM cd GROUP BY label
), scored AS (
  SELECT v.label, v.vec_id,
    ROUND(
      list_dot_product(CAST(v.embedding AS DOUBLE[]), c.centroid)
      / (sqrt(list_dot_product(CAST(v.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(c.centroid, c.centroid))), 6) AS cos
  FROM embeddings v JOIN cent c ON c.label = v.label
), flagged AS (
  SELECT label, vec_id, cos,
    ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos ASC, vec_id ASC) AS rnk,
    COUNT(*) OVER (PARTITION BY label) AS n
  FROM scored
)
SELECT label, COUNT(*) AS n_vectors,
  CAST(SUM(CASE WHEN rnk <= CAST(FLOOR(CAST({OUTLIER_PCT} AS DOUBLE) * n) AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
  ROUND(CAST(SUM(CASE WHEN rnk > CAST(FLOOR(CAST({OUTLIER_PCT} AS DOUBLE) * n) AS BIGINT) THEN CAST(cos AS DECIMAL(18,6)) END) AS DOUBLE)
        / SUM(CASE WHEN rnk > CAST(FLOOR(CAST({OUTLIER_PCT} AS DOUBLE) * n) AS BIGINT) THEN 1 ELSE 0 END), 6) AS kept_avg_cos,
  MIN(CASE WHEN rnk > CAST(FLOOR(CAST({OUTLIER_PCT} AS DOUBLE) * n) AS BIGINT) THEN cos END) AS kept_min_cos,
  MAX(CASE WHEN rnk > CAST(FLOOR(CAST({OUTLIER_PCT} AS DOUBLE) * n) AS BIGINT) THEN cos END) AS kept_max_cos
FROM flagged GROUP BY label
"""


# --------------------------------------------------------------------------
# q91: DETERMINISTIC coarse-quantized ANN with a full hash-matched
# oracle. Same inverted-list shape as ivf_topk, but the coarse
# quantizer is the SRP signature (md5-derived hyperplanes — no trained
# model, bit-reproducible on any engine; the same machinery that
# already oracle-matches in q36/q46) instead of KMeans — no training
# step to freeze at all, where q66 freezes its trained centroids as
# data to make the serve path oracle-replayable. Multi-probe:
# each query probes its own bucket plus all buckets at Hamming
# distance 1 (planes+1 probes), so scoring touches
# ~(planes+1)/2^planes of the corpus per query — the IVF promise with
# zero model state. Probe assignment is pure column arithmetic
# (bucket XOR one-hot masks) — executor-side by construction.
def srp_ivf_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    dim: int = 64,
    planes: int = NUM_PLANES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via SRP-bucket inverted lists, Hamming-1
    multi-probe. Fully deterministic: same result on any engine, any
    partitioning. Returns (query_id, ann_rank, neighbor_id, cosine).
    """
    assigned = vectors.withColumn(
        "bucket", srp_signature_col(vec_col, dim, planes)
    )
    probe = _srp_probe_frame(query, dim, planes, vec_col, id_col)
    return _score_probed(assigned, probe, k, vec_col, id_col)


def _srp_probe_frame(
    query: DataFrame, dim: int, planes: int, vec_col: str, id_col: str
) -> DataFrame:
    """(query_id, qvec, bucket): each query's own SRP bucket plus all
    Hamming-1 neighbors — pure column arithmetic (bucket XOR one-hot
    masks), executor-side by construction."""
    qb = query.withColumn(
        "qbucket", srp_signature_col(vec_col, dim, planes)
    ).select(
        F.col(id_col).alias("query_id"),
        _dbl(vec_col).alias("qvec"),
        "qbucket",
    )
    return qb.select(
        "query_id",
        "qvec",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(planes)
                ],
            )
        ).alias("bucket"),
    )


def _srp_proj_col(vec_col: str, dim: int, p: int) -> Column:
    """Plane p's signed projection (the value whose SIGN is bucket bit
    p) — the same md5-weighted fold srp_signature_col sums over."""
    return F.aggregate(
        F.expr(
            f"zip_with(transform({vec_col}, x -> CAST(x AS DOUBLE)),"
            f" transform(sequence(0, {dim - 1}),"
            f" i -> CASE WHEN (CAST(conv(substring(md5(concat('p{p}_', i)), 1, 15), 16, 10) AS BIGINT) & 1) = 0"
            f" THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END),"
            f" (x, w) -> x * w)"
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def srp_margin_probe_frame(
    query: DataFrame,
    dim: int,
    planes: int = NUM_PLANES,
    n_flip: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Margin-based multi-probe (classic multi-probe LSH, Lv et al.
    VLDB'07 shape): probe the query's own bucket plus flips of only
    its ``n_flip`` LEAST-CONFIDENT planes (smallest |projection| — the
    bits most likely to differ for a true near neighbor), instead of
    all ``planes`` Hamming-1 flips.

    1 + n_flip probes buy most of full Hamming-1's recall at a
    fraction of the candidates — the knob that makes MORE planes
    (smaller buckets) affordable. Entirely executor-side: projections
    are the same array folds as the signature, flip ranking is one
    array_sort over (|proj|, plane) structs, probes are bucket XOR
    one-hot masks. Deterministic (ties break on plane index), so an
    oracle can replay it in SQL.
    """
    if not 0 <= n_flip <= planes:
        raise ValueError(f"n_flip must be in [0, {planes}]")
    projs = F.array(
        *[_srp_proj_col(vec_col, dim, p) for p in range(planes)]
    )
    qb = query.select(
        F.col(id_col).alias("query_id"),
        _dbl(vec_col).alias("qvec"),
        projs.alias("_projs"),
    ).withColumn(
        "qbucket",
        F.aggregate(
            F.zip_with(
                "_projs",
                F.expr(f"sequence(0, {planes - 1})"),
                lambda pr, p: F.when(
                    pr > 0, F.pow(F.lit(2.0), p).cast("int")
                ).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
    )
    # rank planes by |projection| ascending (plane index tie-break via
    # struct ordering), keep the n_flip least-confident
    flips = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    "_projs",
                    F.expr(f"sequence(0, {planes - 1})"),
                    lambda pr, p: F.struct(
                        F.abs(pr).alias("m"), p.cast("int").alias("p")
                    ),
                )
            ),
            lambda s: s["p"],
        ),
        1,
        n_flip,
    )
    return qb.select(
        "query_id",
        "qvec",
        F.explode(
            F.concat(
                F.array(F.col("qbucket")),
                F.transform(
                    flips,
                    lambda p: F.col("qbucket").bitwiseXOR(
                        F.pow(F.lit(2.0), p).cast("int")
                    ),
                ),
            )
        ).alias("bucket"),
    )


def srp_margin_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    dim: int = 64,
    planes: int = NUM_PLANES,
    n_flip: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """:func:`srp_ivf_topk` with margin-based multi-probe candidate
    generation — same output shape, ~(1+n_flip)/(1+planes) of the
    candidates."""
    assigned = vectors.withColumn(
        "bucket", srp_signature_col(vec_col, dim, planes)
    )
    probe = srp_margin_probe_frame(
        query, dim, planes, n_flip, vec_col, id_col
    )
    return _score_probed(assigned, probe, k, vec_col, id_col)


def _score_probed(
    assigned: DataFrame,
    probe: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        assigned.join(F.broadcast(probe), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cosine", round6(cosine_col(vec_col, "qvec")))
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine")
        .withColumn("ann_rank", F.row_number().over(w))
        .filter(F.col("ann_rank") <= k)
        .select("query_id", "ann_rank", "neighbor_id", "cosine")
    )


# Graded instance: 4 planes (16 buckets, Hamming-1 probes 5/16 of the
# corpus) — measured recall ~0.5 vs brute force on the synthetic
# corpus, which is near-worst-case for LSH (iid random embeddings have
# no cluster structure for the hyperplanes to exploit). The
# planes/probe-radius pair is the recall/cost dial: real embedded
# corpora cluster, so more planes keep recall at a far smaller touched
# fraction.
Q91_PLANES = 4


def q91_srp_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return srp_ivf_topk(emb, queries, k=10, dim=64, planes=Q91_PLANES)


Q91_SQL = f"""
WITH bucketed AS (
  SELECT e.vec_id, e.embedding, {_bucket_sql_for(Q91_PLANES)} AS bucket FROM embeddings e
), q AS (
  SELECT vec_id AS query_id, embedding AS qvec, bucket AS qbucket
  FROM bucketed WHERE vec_id < 5
), probes AS (
  SELECT query_id, qvec,
    CASE WHEN p < 0 THEN qbucket ELSE xor(qbucket, (1 << p)) END AS bucket
  FROM q CROSS JOIN (SELECT unnest(generate_series(-1, {Q91_PLANES - 1})) AS p)
), scored AS (
  SELECT pr.query_id, b.vec_id AS neighbor_id,
    ROUND(
      list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(pr.qvec AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(pr.qvec AS DOUBLE[]), CAST(pr.qvec AS DOUBLE[])))), 6) AS cosine
  FROM probes pr JOIN bucketed b ON b.bucket = pr.bucket AND b.vec_id <> pr.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS ann_rank
  FROM scored
)
SELECT query_id, ann_rank, neighbor_id, cosine
FROM ranked WHERE ann_rank <= 10
"""


# q94: margin-based multi-probe ANN (Lv et al. probe shape) over the
# SRP quantizer. Pre-staged in r5, registered in QUERIES/ORACLE at the
# r6 rotation as committed.
Q94_PLANES = 8
Q94_N_FLIP = 4


def q94_margin_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return srp_margin_topk(
        emb, queries, k=10, dim=64, planes=Q94_PLANES, n_flip=Q94_N_FLIP
    )


def _q94_sql() -> str:
    planes, n_flip = Q94_PLANES, Q94_N_FLIP
    proj_list = ", ".join(
        _srp_proj_sql_on("e", p) for p in range(planes)
    )
    bucket_from_prj = " + ".join(
        f"(CASE WHEN prj[{p + 1}] > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    )
    return f"""
WITH projs AS (
  SELECT e.vec_id, e.embedding, [{proj_list}] AS prj FROM embeddings e
), bucketed AS (
  SELECT vec_id, embedding, prj, {bucket_from_prj} AS bucket FROM projs
), q AS (
  SELECT vec_id AS query_id, embedding AS qvec, prj, bucket AS qbucket
  FROM bucketed WHERE vec_id < 5
), flips AS (
  SELECT query_id, qvec, qbucket,
    list_transform(
      list_sort(list_transform(generate_series(1, {planes}),
                               p -> struct_pack(m := abs(prj[p]), p := p - 1))),
      s -> s.p)[1:{n_flip}] AS fl
  FROM q
), probes AS (
  SELECT query_id, qvec, qbucket AS bucket FROM flips
  UNION ALL
  SELECT f.query_id, f.qvec, xor(f.qbucket, (1 << t.fp)) AS bucket
  FROM flips f, unnest(f.fl) AS t(fp)
), scored AS (
  SELECT pr.query_id, b.vec_id AS neighbor_id,
    ROUND(
      list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(pr.qvec AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(pr.qvec AS DOUBLE[]), CAST(pr.qvec AS DOUBLE[])))), 6) AS cosine
  FROM probes pr JOIN bucketed b ON b.bucket = pr.bucket AND b.vec_id <> pr.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS ann_rank
  FROM scored
)
SELECT query_id, ann_rank, neighbor_id, cosine
FROM ranked WHERE ann_rank <= 10
"""


Q94_SQL = _q94_sql()


class SRPIndex:
    """Persisted SRP inverted-file index — the DETERMINISTIC twin of
    :class:`IVFIndex`. No trained model at all: the quantizer is the
    md5-derived hyperplane signature, so build/save/load/serve returns
    bit-identical results to the ephemeral :func:`srp_ivf_topk` on any
    engine or cluster — a full DuckDB oracle (q91) with no frozen
    model artifact, where the KMeans path (q66) freezes its trained
    centroids as data to earn the same grade.

    On disk: ``assignments/`` PARTITIONED BY ``bucket`` (probing is a
    directory-pruned scan — a Hamming-1 probe set physically reads
    ~(planes+1)/2^planes of the index) and a one-row ``meta/`` parquet
    pinning (dim, planes) so a loaded index can't be served with
    mismatched quantizer parameters.
    """

    # the one dataset add(path=...) appends to (the streaming
    # ingest replay protocol snapshots it: streaming.index_ingest_fn)
    APPEND_DATASETS = ("assignments",)

    def __init__(self, assignments: DataFrame, dim: int, planes: int,
                 vec_col: str, id_col: str):
        self.assignments = assignments
        self.dim = dim
        self.planes = planes
        self.vec_col = vec_col
        self.id_col = id_col
        # disk-backed handles prefilter the bucket-partitioned scan
        # (IVFIndex.__init__ documents the trade); ephemeral builds
        # skip the prefilter's eager collect job
        self._scan_pruned = False

    @staticmethod
    def build(
        vectors: DataFrame,
        dim: int,
        planes: int = NUM_PLANES,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "SRPIndex":
        assignments = vectors.select(
            id_col, vec_col,
            srp_signature_col(vec_col, dim, planes).alias("bucket"),
        )
        return SRPIndex(assignments, dim, planes, vec_col, id_col)

    def add(
        self, vectors: DataFrame, path: str | None = None
    ) -> "SRPIndex":
        """Incremental append: sign new vectors with the index's
        (dim, planes) quantizer and add them to the bucket-partitioned
        assignments — a growing corpus never forces a rebuild. The SRP
        quantizer is deterministic and parameter-frozen at build, so
        unlike the KMeans family there is NO staleness at all:
        ``build(old).add(new)`` is bit-identical to
        ``build(old ∪ new)`` (tested). With ``path`` the new rows
        append to the existing parquet (one atomic write job; existing
        bucket files are never rewritten) and the returned index reads
        from disk; without it the append is in-memory. Appended ids
        must not collide with existing ones (a duplicate would serve
        as two reference rows). The handle's (dim, planes) quantizer
        is verified against the persisted meta first (one-row read) —
        a handle outliving a maybe_rebuild swap must not append
        signatures that can never collide with the new layout's."""
        if path is not None:
            _verify_srp_meta(
                vectors.sparkSession, path, self.dim, self.planes,
                type(self).__name__,
            )
        new = vectors.select(
            self.id_col,
            self.vec_col,
            srp_signature_col(
                self.vec_col, self.dim, self.planes
            ).alias("bucket"),
        )
        if path is None:
            out = SRPIndex(
                self.assignments.unionByName(new),
                self.dim, self.planes, self.vec_col, self.id_col,
            )
            out._scan_pruned = self._scan_pruned
            return out
        _append_assignments(new, path, "bucket", "meta")
        return SRPIndex.load(
            new.sparkSession, path, self.vec_col, self.id_col
        )

    def save(self, path: str) -> None:
        import os as _os

        from ._staging import clear_stale

        spark = self.assignments.sparkSession
        clear_stale(_os.path.join(path, "assignments"))
        (
            self.assignments.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(_os.path.join(path, "assignments"))
        )
        spark.createDataFrame(
            [(self.dim, self.planes, "SRPIndex")],
            "dim int, planes int, family string",
        ).write.mode("overwrite").parquet(_os.path.join(path, "meta"))

    @staticmethod
    def compact(
        spark: SparkSession,
        path: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "SRPIndex":
        """One file per bucket directory (see ``_compact_assignments``)
        — run after many ``add`` appends."""
        _compact_assignments(spark, path, "bucket")
        return SRPIndex.load(spark, path, vec_col, id_col)

    @staticmethod
    def load(
        spark: SparkSession,
        path: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "SRPIndex":
        import os as _os

        from ._staging import (
            read_meta_row,
            require_meta_family,
            resolve_live,
        )

        path = resolve_live(path)  # rebuild_root swap-window fallback
        meta = read_meta_row(spark, path)
        if meta is None:
            raise ValueError(
                f"no meta dataset under {path!r} — not a saved "
                "SRPIndex layout"
            )
        require_meta_family(meta.asDict(), "SRPIndex", path)
        idx = SRPIndex(
            spark.read.parquet(
                resolve_live(_os.path.join(path, "assignments"))
            ),
            int(meta["dim"]),
            int(meta["planes"]),
            vec_col,
            id_col,
        )
        idx._scan_pruned = True
        return idx

    def occupancy(self) -> DataFrame:
        """(bucket, c) histogram of the current assignments — snapshot
        this at build time (it is 2^planes rows at most; collect or
        write it anywhere) and hand it back to :meth:`staleness` after
        appends to measure occupancy drift."""
        return self.assignments.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("c")
        )

    def staleness(self, baseline: DataFrame | None = None) -> DataFrame:
        """One-row occupancy-skew report; with a ``baseline``
        histogram (a build-time :meth:`occupancy` snapshot) also the
        drift columns (growth_ratio, total_variation,
        new_bucket_mass). The SRP quantizer is deterministic, so this
        is SERVING-COST drift, not correctness drift — see
        :func:`bucket_occupancy_drift` for the measured re-plan
        rule."""
        if baseline is None:
            return _occupancy_metrics(self.assignments, "bucket")
        return bucket_occupancy_drift(self.assignments, baseline)

    def save_build_report(self, path: str) -> None:
        """Persist the build-time bucket-occupancy histogram (the
        :meth:`occupancy` snapshot, <= 2^planes rows) under the index
        root — the baseline :meth:`maybe_rebuild` measures drift
        against. Call right after ``save()``."""
        _write_baseline(self.occupancy(), path, BUILD_OCCUPANCY_DIR)

    @staticmethod
    def maybe_rebuild(
        spark: SparkSession,
        path: str,
        planes: int | None = None,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        **thresholds,
    ):
        """Drift -> verdict -> staged re-plan+swap for the SRP family.
        The quantizer is bit-exact forever, so a "rebuild" here is a
        RE-PLAN: when the stored-baseline drift report
        (:func:`bucket_occupancy_drift` against the
        :meth:`save_build_report` histogram) trips
        :func:`srp_rebuild_verdict`, the index re-signs its own
        vectors (assignments retain them) under ``planes`` hyperplanes
        — default one MORE than today, doubling the bucket count,
        which is the measured response to occupancy overload — and the
        roots swap (markers preserved; loaders fall back across the
        crash window). Returns ``(index, verdict, report_row)``.

        Without a stored baseline the occupancy-growth and
        new-bucket-mass triggers have nothing to compare against — the
        plain skew report is measured but the verdict can only stay
        fresh; store the baseline at build time to arm the rule."""
        from ._staging import recover_before_rebuild

        recover_before_rebuild(path, spark)
        idx = SRPIndex.load(spark, path, vec_col, id_col)
        base = _read_baseline(spark, path, BUILD_OCCUPANCY_DIR)
        report = idx.staleness(base).collect()[0]
        verdict = srp_rebuild_verdict(
            report,
            _occupancy_metrics_from_hist(base).collect()[0]
            if base is not None
            else None,
            **thresholds,
        )
        if not verdict.rebuild:
            return idx, verdict, report
        from ._staging import rebuild_root, refresh_root

        new_planes = planes if planes is not None else idx.planes + 1

        def _fresh(staging: str) -> None:
            fresh = SRPIndex.build(
                idx.assignments.select(id_col, vec_col),
                idx.dim, new_planes, vec_col, id_col,
            )
            fresh.save(staging)
            fresh.save_build_report(staging)

        rebuild_root(path, _fresh)
        refresh_root(spark, path)
        return SRPIndex.load(spark, path, vec_col, id_col), verdict, report

    def topk(
        self, query: DataFrame, k: int = 10, n_flip: int | None = None
    ) -> DataFrame:
        """``n_flip=None`` probes the full Hamming-1 ring (planes+1
        buckets per query — the deterministic default, bit-identical
        to ``srp_ivf_topk``); an integer probes only the ``n_flip``
        LOWEST-MARGIN flips (Lv et al. multi-probe). The measured
        operating points (SCALING.md "ANN operating points") put
        ``n_flip=SRP_RECOMMENDED_N_FLIP`` at ~the Hamming-1 recall for
        ~70% of its touched fraction — the dial to turn when read
        volume matters more than the last recall point."""
        # The probed-bucket collect below is bounded by 2^planes ints —
        # negligible at the default 16 planes (<=65k) but EXPONENTIAL
        # in planes: a 32-plane index could silently pull 4B ints to
        # the driver. Refuse past the point where the bound stops
        # being a bound; such an index should probe via a
        # bucket-partitioned join instead of an IN filter.
        if self.planes > 24:
            raise ValueError(
                f"SRPIndex.topk's directory-pruning collect is bounded "
                f"by 2^planes buckets ({self.planes} planes = "
                f"{1 << self.planes:,}); beyond 24 planes use a "
                "bucket-partitioned join against `assignments` instead"
            )
        if n_flip is None:
            probe = _srp_probe_frame(
                query, self.dim, self.planes, self.vec_col, self.id_col
            )
        else:
            probe = srp_margin_probe_frame(
                query, self.dim, self.planes, n_flip,
                self.vec_col, self.id_col,
            )
        # persist the probe frame: it feeds TWO actions (the bucket
        # collect below and the scoring join), and an unpersisted
        # nondeterministic query lineage (e.g. limit() without order)
        # could otherwise yield inconsistent probe sets between them
        from ._scope import scoped_persist

        probe = scoped_persist(probe)
        # the union of probed buckets (≤ 2^planes ints — independent of
        # the query-batch size) becomes a literal IN filter so the
        # bucket-partitioned layout is directory-pruned at the scan;
        # past PROBE_LITERAL_CAP the helper swaps to a broadcast
        # semi-join instead of pushing a giant IN-list through the
        # driver
        pruned = (
            _pruned_by_probes(self.assignments, probe, "bucket")
            if self._scan_pruned
            else self.assignments
        )
        return _score_probed(pruned, probe, k, self.vec_col, self.id_col)


# --------------------------------------------------------------------------
# q101: int8 codes THROUGH SRP bucket pruning — the composition q98
# asserted and r6's verdict asked to demonstrate. Signatures are
# computed ON THE CODES (both index and probe side, so the scheme is
# self-consistent; quantization can flip a near-zero projection's
# sign vs the raw vector, which only moves a vector to a neighboring
# bucket — an approximation the recall floor test measures, not a
# correctness issue). Scoring inside probed buckets is q98's exact
# integer arithmetic: |proj| <= dim * 127 and |dot| <= dim * 127^2
# are exact in doubles, so bucket bits AND scores are bit-identical
# on any engine — which is why this path keeps a full DuckDB oracle.
# The serving win composes multiplicatively: 1/4 scan bytes per row
# (int8 vs float32) x the probed-bucket fraction of rows.
def _quantized_codes_frame(
    vectors: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """(id, codes): q89/q98's int8-valued codes; zero vectors (NULL
    codes) excluded on the same predicate as q98."""
    return vectors.select(
        id_col, _q8_codes(vec_col).alias("codes")
    ).filter(F.col("codes").isNotNull())


def quantized_srp_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    dim: int = 64,
    planes: int = NUM_PLANES,
    n_flip: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Ephemeral quantized-SRP ANN: quantize corpus and queries to
    int8 codes, bucket both on code signatures, probe Hamming-1 (or
    ``n_flip`` lowest-margin flips), exact integer re-rank inside
    probed buckets. Deterministic — bit-identical to the persisted
    :class:`QuantizedSRPIndex` serve path."""
    corpus = _quantized_codes_frame(vectors, vec_col, id_col)
    qf = _quantized_codes_frame(query, vec_col, id_col)
    assigned = corpus.withColumn(
        "bucket", srp_signature_col("codes", dim, planes)
    )
    probe = (
        _srp_probe_frame(qf, dim, planes, "codes", id_col)
        if n_flip is None
        else srp_margin_probe_frame(qf, dim, planes, n_flip, "codes", id_col)
    )
    return _score_probed(assigned, probe, k, "codes", id_col).withColumnRenamed(
        "cosine", "cosine_q8"
    )


class QuantizedSRPIndex:
    """Persisted quantized-SRP inverted file: :class:`SRPIndex`'s
    layout (assignments PARTITIONED BY bucket + one-row meta) storing
    int8 CODES instead of raw vectors — every probed-bucket scan
    reads a quarter of the bytes, and probing still directory-prunes
    to the probe set. Deterministic quantizer + deterministic codes →
    build/save/load/serve is bit-identical to
    :func:`quantized_srp_topk` (tested)."""

    # the one dataset add(path=...) appends to (the streaming
    # ingest replay protocol snapshots it: streaming.index_ingest_fn)
    APPEND_DATASETS = ("assignments",)

    def __init__(self, assignments: DataFrame, dim: int, planes: int,
                 id_col: str):
        self.assignments = assignments
        self.dim = dim
        self.planes = planes
        self.id_col = id_col
        # see IVFIndex.__init__: prefilter only disk-backed scans
        self._scan_pruned = False

    @staticmethod
    def build(
        vectors: DataFrame,
        dim: int,
        planes: int = NUM_PLANES,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "QuantizedSRPIndex":
        corpus = _quantized_codes_frame(vectors, vec_col, id_col)
        assignments = corpus.select(
            id_col,
            # tinyint storage is the 1/4-bytes point; scoring casts
            # back to double (exact: codes are in [-127, 127])
            F.transform(
                "codes", lambda x: x.cast("tinyint")
            ).alias("codes"),
            srp_signature_col("codes", dim, planes).alias("bucket"),
        )
        return QuantizedSRPIndex(assignments, dim, planes, id_col)

    def add(
        self,
        vectors: DataFrame,
        path: str | None = None,
        vec_col: str = "embedding",
    ) -> "QuantizedSRPIndex":
        """Incremental append: quantize new vectors to int8 codes and
        sign them with the frozen (dim, planes) quantizer — both
        deterministic and per-vector, so like :meth:`SRPIndex.add`
        this is bit-identical to a one-shot build over the union
        (tested), with no staleness. With ``path`` the new rows append
        to the bucket-partitioned parquet; without it the append is
        in-memory. Appended ids must not collide with existing ones.
        The (dim, planes) quantizer is verified against the persisted
        meta first — the SRPIndex.add contract."""
        if path is not None:
            _verify_srp_meta(
                vectors.sparkSession, path, self.dim, self.planes,
                type(self).__name__,
            )
        new = _quantized_codes_frame(vectors, vec_col, self.id_col).select(
            self.id_col,
            F.transform("codes", lambda x: x.cast("tinyint")).alias(
                "codes"
            ),
            srp_signature_col("codes", self.dim, self.planes).alias(
                "bucket"
            ),
        )
        if path is None:
            return QuantizedSRPIndex(
                self.assignments.unionByName(new),
                self.dim, self.planes, self.id_col,
            )
        _append_assignments(new, path, "bucket", "meta")
        return QuantizedSRPIndex.load(new.sparkSession, path, self.id_col)

    def save(self, path: str) -> None:
        import os as _os

        from ._staging import clear_stale

        spark = self.assignments.sparkSession
        clear_stale(_os.path.join(path, "assignments"))
        (
            self.assignments.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(_os.path.join(path, "assignments"))
        )
        spark.createDataFrame(
            [(self.dim, self.planes, "QuantizedSRPIndex")],
            "dim int, planes int, family string",
        ).write.mode("overwrite").parquet(_os.path.join(path, "meta"))

    @staticmethod
    def compact(
        spark: SparkSession, path: str, id_col: str = "vec_id"
    ) -> "QuantizedSRPIndex":
        """One file per bucket directory (see ``_compact_assignments``)
        — run after many ``add`` appends."""
        _compact_assignments(spark, path, "bucket")
        return QuantizedSRPIndex.load(spark, path, id_col)

    @staticmethod
    def load(
        spark: SparkSession, path: str, id_col: str = "vec_id"
    ) -> "QuantizedSRPIndex":
        import os as _os

        from ._staging import (
            read_meta_row,
            require_meta_family,
            resolve_live,
        )

        path = resolve_live(path)  # rebuild_root swap-window fallback
        meta = read_meta_row(spark, path)
        if meta is None:
            raise ValueError(
                f"no meta dataset under {path!r} — not a saved "
                "QuantizedSRPIndex layout"
            )
        require_meta_family(meta.asDict(), "QuantizedSRPIndex", path)
        idx = QuantizedSRPIndex(
            spark.read.parquet(
                resolve_live(_os.path.join(path, "assignments"))
            ),
            int(meta["dim"]),
            int(meta["planes"]),
            id_col,
        )
        idx._scan_pruned = True
        return idx

    def occupancy(self) -> DataFrame:
        """(bucket, c) histogram — see :meth:`SRPIndex.occupancy`."""
        return self.assignments.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("c")
        )

    def staleness(self, baseline: DataFrame | None = None) -> DataFrame:
        """Occupancy skew / drift report — the quantized twin of
        :meth:`SRPIndex.staleness` (same serving-cost semantics; the
        bucket bits come from the codes, but skew and drift read
        identically)."""
        if baseline is None:
            return _occupancy_metrics(self.assignments, "bucket")
        return bucket_occupancy_drift(self.assignments, baseline)

    def save_build_report(self, path: str) -> None:
        """Persist the build-time bucket histogram — see
        :meth:`SRPIndex.save_build_report`."""
        _write_baseline(self.occupancy(), path, BUILD_OCCUPANCY_DIR)

    @staticmethod
    def maybe_rebuild(
        spark: SparkSession,
        path: str,
        planes: int | None = None,
        id_col: str = "vec_id",
        **thresholds,
    ):
        """:meth:`SRPIndex.maybe_rebuild` for the quantized twin. The
        re-plan needs NO raw vectors: build signs the int8 codes, and
        codes are per-vector frozen, so re-signing the stored codes
        under more planes reproduces ``build(raw, planes')``
        bit-for-bit (tested). Returns ``(index, verdict, report)``."""
        from ._staging import recover_before_rebuild

        recover_before_rebuild(path, spark)
        idx = QuantizedSRPIndex.load(spark, path, id_col)
        base = _read_baseline(spark, path, BUILD_OCCUPANCY_DIR)
        report = idx.staleness(base).collect()[0]
        verdict = srp_rebuild_verdict(
            report,
            _occupancy_metrics_from_hist(base).collect()[0]
            if base is not None
            else None,
            **thresholds,
        )
        if not verdict.rebuild:
            return idx, verdict, report
        from ._staging import rebuild_root, refresh_root

        new_planes = planes if planes is not None else idx.planes + 1

        def _fresh(staging: str) -> None:
            fresh = QuantizedSRPIndex(
                idx.assignments.select(
                    id_col,
                    "codes",
                    srp_signature_col(
                        "codes", idx.dim, new_planes
                    ).alias("bucket"),
                ),
                idx.dim, new_planes, id_col,
            )
            fresh.save(staging)
            fresh.save_build_report(staging)

        rebuild_root(path, _fresh)
        refresh_root(spark, path)
        return (
            QuantizedSRPIndex.load(spark, path, id_col), verdict, report
        )

    def topk(
        self, query: DataFrame, k: int = 10, n_flip: int | None = None,
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Serve top-k from the quantized table: queries are quantized
        with the same q98 codes, probed buckets become a literal IN
        filter (directory-pruned scan), and scoring is the exact
        integer cosine over codes."""
        if self.planes > 24:
            raise ValueError(
                f"QuantizedSRPIndex.topk's directory-pruning collect is "
                f"bounded by 2^planes buckets ({self.planes} planes = "
                f"{1 << self.planes:,}); beyond 24 planes use a "
                "bucket-partitioned join against `assignments` instead"
            )
        qf = _quantized_codes_frame(query, vec_col, self.id_col)
        probe = (
            _srp_probe_frame(qf, self.dim, self.planes, "codes", self.id_col)
            if n_flip is None
            else srp_margin_probe_frame(
                qf, self.dim, self.planes, n_flip, "codes", self.id_col
            )
        )
        # same two-action probe reuse as SRPIndex.topk: persist so the
        # collect and the scoring join see one probe set
        from ._scope import scoped_persist

        probe = scoped_persist(probe)
        pruned = (
            _pruned_by_probes(self.assignments, probe, "bucket")
            if self._scan_pruned
            else self.assignments
        ).withColumn("codes", F.transform("codes", lambda x: x.cast("double")))
        return _score_probed(
            pruned, probe, k, "codes", self.id_col
        ).withColumnRenamed("cosine", "cosine_q8")


Q101_PLANES = 6


def q101_quantized_srp_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_srp_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, dim=64,
        planes=Q101_PLANES,
    )


def _q101_sql() -> str:
    bucket = _bucket_sql_expr("c.codes", Q101_PLANES)
    return f"""
WITH live AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> greatest(-127.0, least(127.0,
             floor(x / (list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) / 127.0) + 0.5)))) AS codes
  FROM embeddings
  WHERE list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) > 0
), bucketed AS (
  SELECT c.vec_id, c.codes, {bucket} AS bucket FROM live c
), q AS (
  SELECT vec_id AS query_id, codes AS qcodes, bucket AS qbucket
  FROM bucketed WHERE vec_id < 5
), probes AS (
  SELECT query_id, qcodes,
    CASE WHEN p < 0 THEN qbucket ELSE xor(qbucket, (1 << p)) END AS bucket
  FROM q CROSS JOIN (SELECT unnest(generate_series(-1, {Q101_PLANES - 1})) AS p)
), scored AS (
  SELECT pr.query_id, b.vec_id AS neighbor_id,
    ROUND(list_dot_product(b.codes, pr.qcodes)
      / (sqrt(list_dot_product(b.codes, b.codes))
         * sqrt(list_dot_product(pr.qcodes, pr.qcodes))), 6) AS cosine_q8
  FROM probes pr JOIN bucketed b
    ON b.bucket = pr.bucket AND b.vec_id <> pr.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_q8,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine_q8 DESC, neighbor_id) AS ann_rank
  FROM scored
)
SELECT query_id, ann_rank, neighbor_id, cosine_q8
FROM ranked WHERE ann_rank <= 10
"""


Q101_SQL = _q101_sql()


class QuantizedIVFIndex:
    """Persisted quantized IVF — q101's int8 composition applied to
    the KMeans family: :class:`IVFIndex`'s list_id-partitioned layout
    storing int8 CODES instead of raw vectors. Assignment uses the RAW
    vector against the (frozen) centroids at build time; serving
    probes with the raw query vector, directory-prunes to the probed
    lists, and re-ranks with the exact integer cosine over codes
    (per-vector quantization scales cancel in cosine — q98's trick).
    Bytes touched per query batch: ~n_probe/n_lists of the index ×
    1/4 per row — the two compression dials multiply. With frozen
    centroids the whole serve path is deterministic (q108's DuckDB
    oracle replays quantization + assignment + probe + re-rank)."""

    # the one dataset add(path=...) appends to (the streaming
    # ingest replay protocol snapshots it: streaming.index_ingest_fn)
    APPEND_DATASETS = ("assignments",)

    def __init__(self, centroids: DataFrame, assignments: DataFrame,
                 id_col: str = "vec_id"):
        self.centroids = centroids
        self.assignments = assignments
        self.id_col = id_col
        # frozen-centroid fingerprint — the IVFIndex add(path=...)
        # guard (see IVFIndex._verify_frozen), shared layout
        self._frozen_fp: tuple | None = None
        # see IVFIndex.__init__: prefilter only disk-backed scans
        self._scan_pruned = False

    @staticmethod
    def build(
        vectors: DataFrame,
        centroids: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "QuantizedIVFIndex":
        assignments = (
            ivf_assign(vectors, centroids, vec_col, id_col)
            .withColumn("codes", _q8_codes(vec_col))
            # zero vectors have no codes (same predicate as q98/q101)
            # and could never score — excluded at build
            .filter(F.col("codes").isNotNull())
            .select(
                id_col,
                F.transform(
                    "codes", lambda x: x.cast("tinyint")
                ).alias("codes"),
                "list_id",
            )
        )
        return QuantizedIVFIndex(centroids, assignments, id_col)

    def add(
        self,
        vectors: DataFrame,
        path: str | None = None,
        vec_col: str = "embedding",
    ) -> "QuantizedIVFIndex":
        """Incremental append: assign new RAW vectors to the nearest
        FROZEN centroid (build's own :func:`ivf_assign` convention),
        quantize to int8 codes, and add to the list_id-partitioned
        assignments. Deterministic given the frozen centroids —
        ``build(old ∪ new, centroids)`` and ``build(old,
        centroids).add(new)`` are bit-identical (tested); the
        :meth:`IVFIndex.add` staleness note applies to the centroids
        (frozen model vs grown distribution). Appended ids must not
        collide with existing ones. The frozen centroids are verified
        against the persisted meta fingerprint first — the
        IVFIndex.add contract."""
        if path is not None:
            IVFIndex._verify_frozen(self, vectors.sparkSession, path)
        new = (
            ivf_assign(vectors, self.centroids, vec_col, self.id_col)
            .withColumn("codes", _q8_codes(vec_col))
            .filter(F.col("codes").isNotNull())
            .select(
                self.id_col,
                F.transform(
                    "codes", lambda x: x.cast("tinyint")
                ).alias("codes"),
                "list_id",
            )
        )
        if path is None:
            out = QuantizedIVFIndex(
                self.centroids,
                self.assignments.unionByName(new),
                self.id_col,
            )
            out._frozen_fp = self._frozen_fp
            out._scan_pruned = self._scan_pruned
            return out
        _append_assignments(new, path, "list_id", "centroids")
        return QuantizedIVFIndex.load(new.sparkSession, path, self.id_col)

    def save(self, path: str) -> None:
        self._frozen_fp = _save_ivf_layout(
            self.centroids, self.assignments, path,
            "QuantizedIVFIndex",
        )

    @staticmethod
    def compact(
        spark: SparkSession, path: str, id_col: str = "vec_id"
    ) -> "QuantizedIVFIndex":
        """One file per list directory (see ``_compact_assignments``)
        — run after many ``add`` appends."""
        _compact_assignments(spark, path, "list_id")
        return QuantizedIVFIndex.load(spark, path, id_col)

    @staticmethod
    def load(
        spark: SparkSession, path: str, id_col: str = "vec_id"
    ) -> "QuantizedIVFIndex":
        centroids, assignments, md = _load_ivf_frames(spark, path)
        require_meta_family(md, "QuantizedIVFIndex", path)
        idx = QuantizedIVFIndex(centroids, assignments, id_col)
        idx._frozen_fp = _ivf_fp_from(md)
        idx._scan_pruned = True
        return idx

    def staleness(
        self, sample_fraction: float | None = None
    ) -> DataFrame:
        """Occupancy skew + CODE-SPACE assignment churn (no
        centroid-shift columns: the store keeps per-vector-scaled int8
        codes, so no code-space frozen centroid exists to measure
        shift against — :func:`ivf_staleness_report` documents the
        rationale). A user holding the raw vectors measures shift via
        :meth:`IVFIndex.staleness` on the float twin."""
        return ivf_staleness_report(
            None,
            self.assignments.withColumn(
                "_codes_d", F.transform("codes", lambda x: x.cast("double"))
            ),
            "_codes_d",
            self.id_col,
            sample_fraction,
        )

    def save_build_report(self, path: str) -> None:
        """Persist the build-time staleness row — see
        :meth:`IVFIndex.save_build_report` (code-space metrics here,
        consistently on both sides of the comparison)."""
        _write_baseline(self.staleness(), path, BUILD_REPORT_DIR)

    @staticmethod
    def maybe_rebuild(
        spark: SparkSession,
        path: str,
        vectors: DataFrame | None = None,
        n_lists: int | None = None,
        sample_fraction: float | None = None,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        **thresholds,
    ):
        """:meth:`IVFIndex.maybe_rebuild` for the quantized store,
        with one honest difference: a rebuild means RE-FITTING
        centroids, and the per-vector-scaled int8 codes cannot be
        inverted to raw vectors — so when the verdict trips, the
        CURRENT raw corpus must be passed as ``vectors`` (the float
        twin's assignments, or the source table); without it this
        raises instead of fabricating a refit. Measurement and the
        fresh-enough path need no raw data. Returns
        ``(index, verdict, report)``."""
        from ._staging import recover_before_rebuild

        recover_before_rebuild(path, spark)
        idx = QuantizedIVFIndex.load(spark, path, id_col)
        report = idx.staleness(sample_fraction).collect()[0]
        base = _read_baseline(spark, path, BUILD_REPORT_DIR)
        verdict = ivf_rebuild_verdict(
            report,
            base.collect()[0] if base is not None else None,
            **thresholds,
        )
        if not verdict.rebuild:
            return idx, verdict, report
        if vectors is None:
            raise ValueError(
                "QuantizedIVFIndex.maybe_rebuild: the verdict says "
                f"rebuild ({'; '.join(verdict.reasons)}) but int8 "
                "codes cannot be inverted to raw vectors for a KMeans "
                "refit — pass the current corpus as vectors="
            )
        from ._staging import rebuild_root, refresh_root

        k = n_lists if n_lists is not None else idx.centroids.count()

        def _fresh(staging: str) -> None:
            refit = IVFIndex.build(vectors, k, vec_col, id_col)
            fresh = QuantizedIVFIndex.build(
                vectors, refit.centroids, vec_col, id_col
            )
            fresh.save(staging)
            fresh.save_build_report(staging)

        rebuild_root(path, _fresh)
        refresh_root(spark, path)
        return (
            QuantizedIVFIndex.load(spark, path, id_col), verdict, report
        )

    def topk(
        self,
        query: DataFrame,
        k: int = 10,
        n_probe: int = IVF_DEFAULT_N_PROBE,
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Serve top-k from the quantized lists: probe selection runs
        on the RAW query vector (centroids live in float space), the
        probed list ids become a partition-pruning IN filter (the
        collect is bounded by n_lists ints), and scoring is the exact
        integer cosine between the query's q8 codes and the stored
        tinyint codes."""
        probe = _probe_lists(
            query, self.centroids, n_probe, vec_col, self.id_col
        ).select("query_id", "list_id")
        qcodes = _quantized_codes_frame(query, vec_col, self.id_col).select(
            F.col(self.id_col).alias("query_id"),
            F.col("codes").alias("qcodes"),
        )
        from ._scope import scoped_persist

        # one probe set for both the pruning collect and the scoring
        # join (same two-action reuse as SRPIndex.topk)
        probe = scoped_persist(probe.join(qcodes, "query_id"))
        pruned = (
            _pruned_by_probes(self.assignments, probe, "list_id")
            if self._scan_pruned
            else self.assignments
        ).withColumn(
            "codes", F.transform("codes", lambda x: x.cast("double"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine_q8").desc(), F.col("neighbor_id")
        )
        return (
            pruned.join(F.broadcast(probe), "list_id")
            .filter(F.col(self.id_col) != F.col("query_id"))
            .withColumn("cosine_q8", round6(cosine_col("codes", "qcodes")))
            .select(
                "query_id",
                F.col(self.id_col).alias("neighbor_id"),
                "cosine_q8",
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )


def q108_quantized_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    index = QuantizedIVFIndex.build(emb, frozen_ivf_centroids(spark))
    return index.topk(
        emb.filter(F.col("vec_id") < 5), k=Q66_K, n_probe=Q66_N_PROBE
    )


def _q108_sql() -> str:
    return f"""
WITH {_frozen_ivf_prefix_sql(Q66_N_PROBE)}, codes AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> greatest(-127.0, least(127.0,
             floor(x / (list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) / 127.0) + 0.5)))) AS codes
  FROM embeddings
  WHERE list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) > 0
), acode AS (
  SELECT a.vec_id, c.codes, a.list_id
  FROM assigned a JOIN codes c USING (vec_id)
), scored AS (
  SELECT p.query_id, b.vec_id AS neighbor_id,
    ROUND(list_dot_product(b.codes, qc.codes)
      / (sqrt(list_dot_product(b.codes, b.codes))
         * sqrt(list_dot_product(qc.codes, qc.codes))), 6) AS cosine_q8
  FROM probes p
  JOIN codes qc ON qc.vec_id = p.query_id
  JOIN acode b ON b.list_id = p.list_id AND b.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine_q8 FROM (
  SELECT query_id, neighbor_id, cosine_q8,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine_q8 DESC, neighbor_id) AS rn
  FROM scored) WHERE rn <= {Q66_K}
"""


Q108_SQL = _q108_sql()


# --------------------------------------------------------------------------
# q93: SemDeDup-style semantic-dedup composition — the embedding-side
# twin of q62's discipline: SRP buckets generate candidates (one
# equi-join on the bucket id, NEVER an all-pairs embedding join),
# within-bucket exact cosine keeps pairs >= threshold, min-label
# propagation clusters them, and each cluster's canonical keeps the
# lowest vec_id (which IS the component label). One row per clustered
# vector; singletons (no near-dup) are absent — at 100 TB you don't
# materialize a row per corpus vector to say "unique".
SEMANTIC_DEDUP_THRESHOLD = COSINE_NEAR_DUP_THRESHOLD


def _bucket_local_clusters(
    edges: DataFrame, max_neighbors: int | None = None
) -> DataFrame:
    """(vec_id, component, cluster_size, is_canonical) from a
    bucket-confined edge list (bucket, id_a, id_b, cosine), optionally
    keeping only each vector's ``max_neighbors`` strongest edges
    before the union-find (the q96 bound, applied task-locally).

    The SRP candidate graph can NEVER have a cross-bucket edge (the
    pair generator is an equi-join on the bucket id and every vector
    has exactly one bucket), so each component lives inside one bucket
    and the whole component/canonical step collapses to a per-bucket
    LOCAL union-find: one Arrow-batched ``applyInPandas`` over
    ``groupBy(bucket)`` — a single shuffle, no iterations, no
    convergence checks — versus the general iterative
    ``connected_components`` (log-diameter shuffle ROUNDS, a
    convergence count per round). Per-task work is bounded by bucket
    occupancy (expected n/2^planes; size ``planes`` to the corpus —
    the same knob every SRP operator here already scales by)."""
    import pandas as pd

    def cluster(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if max_neighbors is None:
            edges = [
                (int(a), int(b))
                for a, b in zip(pdf["id_a"], pdf["id_b"])
            ]
        else:
            # per-vector strongest-m bounding INSIDE the task (same
            # semantics as the distributed window: rounded cosine
            # desc, neighbor id asc), so the bound costs no extra
            # shuffle in the local path
            nbrs: dict[int, list[tuple[float, int]]] = {}
            for a, b, c in zip(pdf["id_a"], pdf["id_b"], pdf["cosine"]):
                a, b, c = int(a), int(b), float(c)
                nbrs.setdefault(a, []).append((-c, b))
                nbrs.setdefault(b, []).append((-c, a))
            edges = []
            for u, lst in nbrs.items():
                lst.sort()
                edges.extend((u, w) for _, w in lst[:max_neighbors])

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        verts = set()
        for a, b in edges:
            verts.add(a)
            verts.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        members: dict[int, list[int]] = {}
        for v in verts:
            members.setdefault(find(v), []).append(v)
        rows = []
        for comp in members.values():
            label = min(comp)
            size = len(comp)
            for v in comp:
                rows.append((v, label, size, 1 if v == label else 0))
        return pd.DataFrame(
            rows,
            columns=["vec_id", "component", "cluster_size", "is_canonical"],
        )

    return edges.groupBy("bucket").applyInPandas(
        cluster,
        schema="vec_id long, component long, cluster_size long,"
        " is_canonical int",
    )


def semantic_dedup(
    vectors: DataFrame,
    dim: int = 64,
    threshold: float = SEMANTIC_DEDUP_THRESHOLD,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_neighbors: int | None = None,
    local_components: bool = False,
    bands: int | None = None,
) -> DataFrame:
    """(vec_id, component, cluster_size, is_canonical) per clustered
    vector. Threshold compares the ROUNDED cosine (both engines), so
    borderline floats can't flip cluster membership.

    ``max_neighbors`` bounds the edge set fed to the component step:
    each vector keeps only its ``m`` STRONGEST qualifying neighbors
    (cosine desc, neighbor id asc — deterministic on the 6dp-rounded
    cosine). This is the scale valve for the one super-linear-OUTPUT
    shape in fixed-threshold dedup: on a denser corpus the qualifying
    pair count grows faster than the input (sf1 measured 65x pairs for
    10x vectors), while the bounded edge set is <= m*n by
    construction. Connectivity degrades gracefully — every vector
    keeps its strongest edge, so mutual near-dups always land in one
    component; only long weak chains can split, which for DEDUP is
    the conservative direction (a split cluster keeps an extra doc,
    never drops one). The qualifying pairs still stream through one
    shuffle to be ranked, but are never materialized into the
    iterative component computation, which is where unbounded edges
    actually hurt (per-iteration joins over the full edge list).

    ``local_components`` switches the component step from the general
    iterative ``connected_components`` to the per-bucket local
    union-find (:func:`_bucket_local_clusters`) — valid because this
    graph's edges are bucket-confined by construction; results are
    identical (tested at three SFs and multiple densities) and the
    iterative machinery's per-round shuffles disappear. This is the
    production shape for THIS operator's graph; the iterative path
    remains the general-graph operator (q56/q62's cross-bucket
    shingle graphs genuinely need it)."""
    from .dedup import connected_components

    if bands is not None:
        # OR-amplified candidates (srp_banded_pairs): ~b x the recall
        # of one AND-only table at linear extra cost (SCALING.md). A
        # banded pair can collide in ANY band, so edges are NOT
        # bucket-confined and the per-bucket local union-find does
        # not apply — banding routes to the general iterative CC.
        if local_components:
            raise ValueError(
                "bands and local_components are mutually exclusive: "
                "banded candidate edges span band-buckets"
            )
        near = (
            srp_banded_pairs(
                vectors, dim, planes_per_band=NUM_PLANES, bands=bands,
                vec_col=vec_col, id_col=id_col,
            )
            .filter(F.col("cosine") >= F.lit(threshold))
            .withColumn("bucket", F.lit(0))
            .select("bucket", "id_a", "id_b", "cosine")
        )
    else:
        near = (
            lsh_bucketed_pairs(vectors, dim, vec_col, id_col)
            .filter(F.col("cosine") >= F.lit(threshold))
            .select("bucket", "id_a", "id_b", "cosine")
        )
    if local_components:
        # the bound (if any) applies inside the same per-bucket task —
        # no separate symmetrize+window shuffle
        return _bucket_local_clusters(near, max_neighbors).orderBy("vec_id")
    if max_neighbors is not None:
        sym = near.select(
            "bucket", F.col("id_a").alias("u"), F.col("id_b").alias("w"),
            "cosine",
        ).unionByName(
            near.select(
                "bucket", F.col("id_b").alias("u"),
                F.col("id_a").alias("w"), "cosine",
            )
        )
        wn = Window.partitionBy("u").orderBy(
            F.col("cosine").desc(), F.col("w").asc()
        )
        near = (
            sym.withColumn("_rn", F.row_number().over(wn))
            .filter(F.col("_rn") <= F.lit(max_neighbors))
            .select(
                "bucket", F.col("u").alias("id_a"), F.col("w").alias("id_b")
            )
        )
    comp = connected_components(near, src="id_a", dst="id_b")
    w = Window.partitionBy("component")
    return (
        comp.withColumnRenamed("v", "vec_id")
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn(
            "is_canonical",
            (F.col("vec_id") == F.col("component")).cast("int"),
        )
        .select("vec_id", "component", "cluster_size", "is_canonical")
        .orderBy("vec_id")
    )


def q93_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, dim=64)


# q96: the BOUNDED semantic dedup — q93 with (a) each vector keeping
# only its m strongest qualifying neighbors (edge volume <= m*n
# instead of output-sensitive) and (b) the per-bucket LOCAL
# component step (one shuffle, no iterations — the graph is
# bucket-confined by construction). The production shape at scale;
# graded with its own stage-mirrored oracle, results identical to
# q93's on every tested corpus/density.
Q96_MAX_NEIGHBORS = 4


def q96_bounded_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, dim=64, max_neighbors=Q96_MAX_NEIGHBORS, local_components=True
    )


Q93_SQL = f"""
WITH RECURSIVE bucketed AS (
  SELECT e.vec_id, e.embedding, {_BUCKET_SQL} AS bucket FROM embeddings e
), near AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE ROUND(
      list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)
    >= {SEMANTIC_DEDUP_THRESHOLD}
), edges AS (
  SELECT id_a AS u, id_b AS w FROM near
  UNION
  SELECT id_b AS u, id_a AS w FROM near
), reach(u, w) AS (
  SELECT u, w FROM edges
  UNION
  SELECT r.u, e.w FROM reach r JOIN edges e ON r.w = e.u
), comp AS (
  SELECT u AS vec_id, LEAST(u, MIN(w)) AS component FROM reach GROUP BY u
)
SELECT vec_id, component,
  COUNT(*) OVER (PARTITION BY component) AS cluster_size,
  CAST(vec_id = component AS INT) AS is_canonical
FROM comp
"""


Q96_SQL = f"""
WITH RECURSIVE bucketed AS (
  SELECT e.vec_id, e.embedding, {_BUCKET_SQL} AS bucket FROM embeddings e
), near AS (
  SELECT * FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      ROUND(
        list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cosine
    FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  ) WHERE cosine >= {SEMANTIC_DEDUP_THRESHOLD}
), sym AS (
  SELECT id_a AS u, id_b AS w, cosine FROM near
  UNION ALL
  SELECT id_b AS u, id_a AS w, cosine FROM near
), bounded AS (
  SELECT u, w FROM (
    SELECT u, w,
      ROW_NUMBER() OVER (PARTITION BY u ORDER BY cosine DESC, w) AS rn
    FROM sym
  ) WHERE rn <= {Q96_MAX_NEIGHBORS}
), edges AS (
  SELECT u, w FROM bounded
  UNION
  SELECT w AS u, u AS w FROM bounded
), reach(u, w) AS (
  SELECT u, w FROM edges
  UNION
  SELECT r.u, e.w FROM reach r JOIN edges e ON r.w = e.u
), comp AS (
  SELECT u AS vec_id, LEAST(u, MIN(w)) AS component FROM reach GROUP BY u
)
SELECT vec_id, component,
  COUNT(*) OVER (PARTITION BY component) AS cluster_size,
  CAST(vec_id = component AS INT) AS is_canonical
FROM comp
"""


# --------------------------------------------------------------------------
# q115/q116: the index-staleness reports as graded queries — the drift
# metrics the persisted families' rebuild rules read are themselves
# oracle-checked, not just unit-tested. q115 exercises the SRP
# occupancy-drift path end to end (build on half the corpus, snapshot
# occupancy, append the other half, diff); q116 the frozen-centroid
# IVF report (occupancy skew + centroid shift + one-Lloyd-step
# assignment churn) on the same frozen centroids q66 serves with.
Q115_PLANES = 6


def q115_srp_occupancy_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = SRPIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0), dim=64, planes=Q115_PLANES
    )
    base = idx.occupancy()
    grown = idx.add(emb.filter(F.col("vec_id") % 2 == 1))
    return grown.staleness(baseline=base)


def _q115_sql() -> str:
    bucket = _bucket_sql_for(Q115_PLANES, "e")
    return f"""
WITH base AS (
  SELECT bucket, COUNT(*) AS c FROM (
    SELECT {bucket} AS bucket FROM embeddings e WHERE e.vec_id % 2 = 0
  ) GROUP BY bucket
), occ AS (
  SELECT bucket, COUNT(*) AS c_now FROM (
    SELECT {bucket} AS bucket FROM embeddings e
  ) GROUP BY bucket
), m AS (
  SELECT CAST(SUM(c_now) AS BIGINT) AS tot, COUNT(*) AS l,
         MAX(c_now) AS mx, CAST(SUM(c_now * c_now) AS BIGINT) AS s2
  FROM occ
), met AS (
  SELECT tot AS n_rows, l AS n_partitions,
    ROUND(mx * l / CAST(tot AS DOUBLE), 6) AS load_factor_max,
    ROUND(sqrt(GREATEST(CAST(l AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE), 0.0)) / tot, 6)
      AS occupancy_cov,
    ROUND(mx / CAST(tot AS DOUBLE), 6) AS top_mass
  FROM m
), j AS (
  SELECT COALESCE(c_now, 0) AS c_now, COALESCE(c, 0) AS c_base
  FROM occ FULL OUTER JOIN base USING (bucket)
), t AS (SELECT SUM(c_now) AS tn, SUM(c_base) AS tb FROM j),
d AS (
  SELECT
    ROUND(CAST(SUM(CAST(ROUND(abs(
        c_now / CAST(tn AS DOUBLE) - c_base / CAST(tb AS DOUBLE)
      ), 6) AS DECIMAL(18,6))) AS DOUBLE) / 2.0, 6) AS total_variation,
    ROUND(SUM(CASE WHEN c_base = 0 THEN c_now ELSE 0 END)
      / CAST(MAX(tn) AS DOUBLE), 6) AS new_bucket_mass,
    ROUND(MAX(tn) / CAST(MAX(tb) AS DOUBLE), 6) AS growth_ratio
  FROM j CROSS JOIN t
)
SELECT met.*, d.* FROM met CROSS JOIN d
"""


Q115_SQL = _q115_sql()


def q116_ivf_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = frozen_ivf_centroids(spark)
    idx = IVFIndex(cents, ivf_assign(emb, cents), "embedding", "vec_id")
    return idx.staleness()


def _q116_sql() -> str:
    from .ivf_centroids_frozen import CENTROIDS

    dim = len(CENTROIDS[0])
    d2m = (
        f"ROUND(list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (a.v[i] - mv.centroid[i]) * (a.v[i] - mv.centroid[i]))), 6)"
    )
    shift_d2 = (
        f"ROUND(list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (mv.centroid[i] - c.centroid[i])"
        " * (mv.centroid[i] - c.centroid[i]))), 6)"
    )
    cent_n2 = (
        f"ROUND(list_sum(list_transform(generate_series(1, {dim}), "
        "i -> c.centroid[i] * c.centroid[i])), 6)"
    )
    return f"""
WITH {_frozen_ivf_assigned_sql()}, occ AS (
  SELECT list_id, COUNT(*) AS c FROM assigned GROUP BY list_id
), m AS (
  SELECT CAST(SUM(c) AS BIGINT) AS tot, COUNT(*) AS l, MAX(c) AS mx,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM occ
), met AS (
  SELECT tot AS n_rows, l AS n_partitions,
    ROUND(mx * l / CAST(tot AS DOUBLE), 6) AS load_factor_max,
    ROUND(sqrt(GREATEST(CAST(l AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE), 0.0)) / tot, 6)
      AS occupancy_cov,
    ROUND(mx / CAST(tot AS DOUBLE), 6) AS top_mass
  FROM m
), dimvals AS (
  SELECT list_id, i, v[i] AS x
  FROM assigned CROSS JOIN generate_series(1, {dim}) AS g(i)
), meandims AS (
  SELECT list_id, i,
    ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
      / COUNT(*), 6) AS mval
  FROM dimvals GROUP BY list_id, i
), meanvecs AS (
  SELECT list_id, list(mval ORDER BY i) AS centroid
  FROM meandims GROUP BY list_id
), shifts AS (
  SELECT ROUND(sqrt({shift_d2} / {cent_n2}), 6) AS rel_shift
  FROM meanvecs mv JOIN cent c USING (list_id)
), shift AS (
  SELECT
    ROUND(CAST(SUM(CAST(rel_shift AS DECIMAL(18,6))) AS DOUBLE)
      / COUNT(*), 6) AS centroid_shift_mean,
    MAX(rel_shift) AS centroid_shift_max
  FROM shifts
), redists AS (
  SELECT a.vec_id, a.list_id AS old_list, mv.list_id AS new_list, {d2m} AS d2
  FROM assigned a CROSS JOIN meanvecs mv
), reassigned AS (
  SELECT vec_id, old_list, new_list FROM (
    SELECT vec_id, old_list, new_list,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, new_list) AS rn
    FROM redists) WHERE rn = 1
), churn AS (
  SELECT ROUND(SUM(CASE WHEN new_list <> old_list THEN 1 ELSE 0 END)
    / CAST(COUNT(*) AS DOUBLE), 6) AS assignment_churn
  FROM reassigned
)
SELECT met.*, shift.*, churn.*
FROM met CROSS JOIN shift CROSS JOIN churn
"""


Q116_SQL = _q116_sql()


QUERIES = {
    "q29_cosine_topk": q29_cosine_topk,
    "q30_embedding_norms": q30_embedding_norms,
    "q46_srp_near_dup": q46_srp_near_dup,
    "q50_cosine_near_dup": q50_cosine_near_dup,
    "q66_ivf_topk": q66_ivf_topk,
    "q79_knn_join": q79_knn_join,
    "q83_label_cohesion": q83_label_cohesion,
    "q89_quantization_audit": q89_quantization_audit,
    "q90_label_outliers": q90_label_outliers,
    "q91_srp_ann_topk": q91_srp_ann_topk,
    "q93_semantic_dedup": q93_semantic_dedup,
    "q94_margin_ann_topk": q94_margin_ann_topk,
    "q96_bounded_semantic_dedup": q96_bounded_semantic_dedup,
    "q98_quantized_ann_topk": q98_quantized_ann_topk,
    "q101_quantized_srp_ann": q101_quantized_srp_ann,
    "q108_quantized_ivf_ann": q108_quantized_ivf_ann,
    "q115_srp_occupancy_drift": q115_srp_occupancy_drift,
    "q116_ivf_staleness": q116_ivf_staleness,
}

ORACLE = {
    "q115_srp_occupancy_drift": Q115_SQL,
    "q116_ivf_staleness": Q116_SQL,
    "q79_knn_join": Q79_SQL,
    "q83_label_cohesion": Q83_SQL,
    "q89_quantization_audit": Q89_SQL,
    "q90_label_outliers": Q90_SQL,
    "q29_cosine_topk": Q29_SQL,
    "q30_embedding_norms": Q30_SQL,
    "q46_srp_near_dup": Q46_SQL,
    "q50_cosine_near_dup": Q50_SQL,
    "q91_srp_ann_topk": Q91_SQL,
    "q93_semantic_dedup": Q93_SQL,
    "q94_margin_ann_topk": Q94_SQL,
    "q96_bounded_semantic_dedup": Q96_SQL,
    "q98_quantized_ann_topk": Q98_SQL,
    "q101_quantized_srp_ann": Q101_SQL,
    "q66_ivf_topk": Q66_SQL,
    "q108_quantized_ivf_ann": Q108_SQL,
}
