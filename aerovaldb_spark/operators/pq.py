"""Product quantization (PQ) + asymmetric-distance (ADC) ANN — the
100 TB embedding-serving rung past int8 (q89/q98's 4×): vectors
compress to M sub-space code indices (the frozen artifact: M=16
4-dim sub-spaces, K=16 → 64 logical bits; the ephemeral rung carries
16 tinyint bytes, the PERSISTED layout nibble-packs them to 8 bytes
vs 256 bytes float32 — 32× stored), and query scoring is M table
lookups + adds per candidate instead of a dim-length dot product
(16 adds vs 64 multiply-adds).

Frozen-model-as-data (the q66/q100 pattern): the per-sub-space KMeans
codebooks are trained ONCE (``tools/gen_pq_codebooks.py`` over raw
vectors → ``pq_codebooks_frozen.py``; ``tools/gen_pq_residual_codebooks.py``
over residuals → ``pq_residual_codebooks_frozen.py``) and everything
downstream — encode (nearest sub-centroid, round6 distances, ties to
the lowest code), the per-query ADC lookup table, and the probed
serve path — is deterministic column arithmetic, so the graded
queries carry FULL DuckDB oracles (codebooks as VALUES rows). ADC
sums accumulate exact integer MICROS in bigints (each addend is a
round6 value, so its micros are exact — order-free like the oracle's
DECIMAL GROUP BY sum, bit-identical to the previous decimal fold)
because a SQL GROUP BY's double-sum order is unspecified.

The serving ladder, graded:
- q129 ``pq_adc_topk``: brute-force ADC over the whole corpus — the
  compression rung alone (every row scanned, but at 1/16 the bytes
  and 1/4 the arithmetic).
- q130 ``PQIVFIndex``: nibble-packed PQ codes stored in the IVF
  layout (list_id-partitioned assignments + frozen coarse centroids,
  shared ``_save_ivf_layout``) — probing directory-prunes to
  n_probe/n_lists of the data, each probed row is 8 BYTES, and
  scoring it is 16 lookup-adds through the inline unpack.
  The full q114-q116 lifecycle: incremental ``add`` under the frozen
  coarse centroids + module codebooks (handle fingerprint-guarded),
  ``staleness`` via ivf_staleness_report over DECODED
  reconstructions (PQ codes, unlike per-vector-scaled int8, decode
  back into the original float space, so centroid shift stays
  measurable), ``maybe_rebuild`` with the staged swap.
- q131 ``pq_adc_rerank_topk``: PQ as candidate generator + exact
  re-rank over raw vectors — |Q|·k·expand raw reads, not the corpus.
- q133 ``ResidualPQIVFIndex``: TRUE IVF-PQ (Jégou et al., PAMI
  2011) — codes quantize the RESIDUAL (vector − assigned coarse
  centroid), so the 64 logical bits spend their resolution on what
  the coarse quantizer missed; the ADC table becomes per
  (query, probed list) because the query's residual differs per
  list. Same bytes, same layout, measurably higher codes-only recall
  (SCALING.md r14 table) — the fix for raw-PQ's q130 recall floor.
- q134/q135 ``topk(..., rerank_expand=)``: the COMPOSED production
  serve path — directory-pruned probes → packed-ADC shortlist →
  exact re-rank touching only |Q|·k·expand raw rows (q134 composes
  it on the raw-code index, q135 on the residual index — the
  recommended 100 TB shape).

The reference has no vector search at all (its nearest neighbor is a
glob scan, src/aerovaldb/jsondb/jsonfiledb.py); this family is part
of the builder's pipeline surface.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves the pandas_udf type
# hints: `from __future__ import annotations` stringifies them, and
# pyspark's get_type_hints evaluates the strings in THIS module's
# globals, so `pd` must be a module-level name.
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._round import round6
from ..catalog import load_table
from .pq_codebooks_frozen import (
    CODEBOOKS,
    PQ_DSUB,
    PQ_K,  # noqa: F401 — re-exported (tests/tools import it from here)
    PQ_M,
)
from .pq_residual_codebooks_frozen import RESIDUAL_CODEBOOKS
from ._staging import require_meta_family
from .similarity import (
    IVFIndex,
    _ivf_fp_from,
    Q66_K,
    Q66_N_PROBE,
    _append_assignments,
    _compact_assignments,
    _dbl,
    _frozen_ivf_prefix_sql,
    _load_ivf_frames,
    _probe_lists,
    _pruned_by_probes,
    _read_baseline,
    _save_ivf_layout,
    _write_baseline,
    BUILD_REPORT_DIR,
    frozen_ivf_centroids,
    ivf_assign,
    ivf_rebuild_verdict,
    ivf_staleness_report,
)

# the graded composed-serve operating point (SCALING.md carries the
# full expand sweep; 10 is the knee on the iid-like test corpus)
RERANK_EXPAND = 10


def _cb_col(books=None) -> "F.Column":
    """A frozen codebook table as one (constant-folded) nested array
    literal: cb[m][k][j], all 1-based under element_at."""
    if books is None:
        books = CODEBOOKS
    return F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in cent])
                    for cent in book
                ]
            )
            for book in books
        ]
    )


def _name(col, what: str) -> str:
    """The flat ADC builders compile to ONE SQL string (a single
    F.expr) instead of dozens of py4j Column calls. SQL text can only
    reference columns by name, so these builders take names, not
    Column expressions."""
    if not isinstance(col, str):
        raise TypeError(
            f"{what} needs a column NAME (the flat SQL builders "
            f"cannot embed an anonymous Column expression); got "
            f"{type(col).__name__} — alias the expression in a prior "
            "select and pass its name"
        )
    return f"`{col}`"


def _np_books(books):
    """Frozen codebooks as an (M, K, DSUB) float64 ndarray — the
    executor-side constant of the Arrow-vectorized encode/LUT."""
    import numpy as np

    return np.asarray(books, dtype=np.float64)


def _np_d2_table(v2d, C):
    """(n, M, K) round6 squared sub-distances between each row's M
    sub-vectors and every codebook entry — the ONE distance both
    encode and the ADC table compute, vectorized over the batch.

    Bit-identical to the original per-row expression fold:

    - subtraction/multiply are the same IEEE double ops;
    - the DSUB adds are LEFT-ASSOCIATED exactly like the fold
      (whose ``0.0 + t1`` first step equals ``t1`` bit-for-bit —
      squares are nonnegative);
    - round6 is applied via the validated half-away model
      (``_round.round6_py``): at scale 0, Spark's
      ``F.round(y, 0)`` provably equals half-away-from-zero on the
      binary double, and the sub-distances are nonnegative, so
      ``floor(y) + (y - floor(y) >= 0.5)`` IS that rounding —
      the vectorized transcription of ``round6_py``.

    Why numpy at all (guide §4.2): the M×K×DSUB arithmetic is ~1k
    expression nodes per row. The interpreted higher-order fold paid
    ~10k Catalyst evals/row (measured ~9 s to encode 2,000 rows);
    flattening it into literal SQL trees made the generated Java
    exceed the JVM's 64 KB method limit, so codegen FAILED and fell
    back to interpreted execution while adding ~5 s of plan
    compilation per action. Handing whole Arrow batches to numpy
    does the same arithmetic at memory bandwidth and keeps the plan
    tiny."""
    import numpy as np

    n = v2d.shape[0]
    M, K, DSUB = C.shape
    lut = np.empty((n, M, K), dtype=np.float64)
    for m in range(M):
        sub = v2d[:, m * DSUB:(m + 1) * DSUB]          # (n, DSUB)
        d = sub[:, None, :] - C[m][None, :, :]          # (n, K, DSUB)
        t = d * d
        s = t[..., 0]
        for j in range(1, DSUB):                        # left-assoc
            s = s + t[..., j]
        y = s * 1_000_000.0
        f = np.floor(y)
        lut[:, m, :] = (f + ((y - f) >= 0.5)) / 1_000_000.0
    return lut


def _vec_batch(series):
    """A pandas Series of array cells as an (n, dim) float64 matrix
    (None cells → a mask; Arrow hands float32 storage back as numpy
    arrays, and the float64 widening is exact — identical to the
    JVM-side CAST AS DOUBLE)."""
    import numpy as np

    vals = series.to_numpy()
    mask = np.array([v is None for v in vals])
    if mask.all():
        return None, mask
    first = next(v for v in vals if v is not None)
    dim = len(first)
    out = np.zeros((len(vals), dim), dtype=np.float64)
    for i, v in enumerate(vals):
        if v is not None:
            out[i] = np.asarray(v, dtype=np.float64)
    return out, mask


def _codes_udf(books):
    """Arrow-batched encoder: array<vector> → array<tinyint> of M
    nearest-code indices (round6 d2, ties to the LOWEST code — the
    ivf_assign convention; ``np.argmin`` keeps the first minimum,
    identical to the old strict-``<`` fold). One vectorized numpy
    pass per batch; the codebook ndarray is captured once in the
    closure and shipped with the task."""
    import pandas as pd

    C = _np_books(books)

    @F.pandas_udf("array<tinyint>")
    def enc(vs: pd.Series) -> pd.Series:
        import numpy as np

        v2d, mask = _vec_batch(vs)
        out = [None] * len(vs)
        if v2d is not None:
            codes = np.argmin(_np_d2_table(v2d, C), axis=2).astype(
                np.int8
            )
            for i in range(len(vs)):
                if not mask[i]:
                    out[i] = codes[i]
        return pd.Series(out)

    return enc


def _lut_udf(books):
    """Arrow-batched ADC-table builder: array<vector> →
    array<array<double>> of M×K round6 sub-distances (the per-query
    lookup table; scoring any candidate afterwards is M lookups in
    codegen'd JVM arithmetic)."""
    import pandas as pd

    C = _np_books(books)

    @F.pandas_udf("array<array<double>>")
    def lut(vs: pd.Series) -> pd.Series:
        v2d, mask = _vec_batch(vs)
        out = [None] * len(vs)
        if v2d is not None:
            t = _np_d2_table(v2d, C)
            for i in range(len(vs)):
                if not mask[i]:
                    out[i] = [row for row in t[i]]
        return pd.Series(out)

    return lut


_UDF_CACHE: dict = {}


def _cached_udf(kind: str, books):
    """One UDF object per (kind, codebook identity) — re-creating the
    pandas_udf per call would re-register and re-pickle the closure
    every time a query is constructed."""
    key = (kind, id(books))
    if key not in _UDF_CACHE:
        maker = _codes_udf if kind == "codes" else _lut_udf
        _UDF_CACHE[key] = maker(books)
    return _UDF_CACHE[key]


def pq_lut_col(vec_col, books=None) -> "F.Column":
    """The per-query ADC lookup table: lut[m][k] = round6 d2 between
    the query's m-th sub-vector and codebook entry (m, k) — M×K
    doubles computed ONCE per (query row); scoring any candidate
    afterwards is M lookups. Arrow-vectorized (see
    :func:`_np_d2_table` for the bit-identity argument); accepts a
    column name or Column."""
    if books is None:
        books = CODEBOOKS
    return _cached_udf("lut", books)(
        F.col(vec_col) if isinstance(vec_col, str) else vec_col
    )


def pq_codes_col(vec_col, books=None) -> "F.Column":
    """array<tinyint> of M sub-space code indices: per sub-vector,
    the nearest codebook entry (round6 d2, ties to the LOWEST code —
    the ivf_assign tie convention). Well-defined for every vector
    including all-zeros (no per-vector scale division, unlike q89's
    int8 path). Arrow-vectorized — the M×K table never materializes
    as a column, so the multiply-reference re-evaluation hazard (the
    r13 pack-after-encode 9×/11× finding) is gone by construction:
    ArrowEvalPython materializes its output once."""
    if books is None:
        books = CODEBOOKS
    return _cached_udf("codes", books)(
        F.col(vec_col) if isinstance(vec_col, str) else vec_col
    )


def _adc_col(lut, codes) -> "F.Column":
    """ADC distance: sum over m of lut[m][codes[m]] — exact
    order-free accumulation in LONG micros (each term is a round6
    double, i.e. a 6-dp value whose exact integer micros
    ``floor(t*1e6 + 0.5)`` recovers — the term is within 1 ulp of the
    6-dp value, so the product sits ≪ 0.5 from the integer), summed
    as bigints (exact, like the previous DECIMAL(38,6) fold, but flat
    and codegen-able) and divided once back to double — the same
    final double the decimal cast produced, matching the oracle's
    GROUP BY decimal sum."""
    lt = _name(lut, "_adc_col lut")
    ct = _name(codes, "_adc_col codes")
    acc = None
    for m in range(1, PQ_M + 1):
        t = (
            f"element_at(element_at({lt}, {m}), "
            f"CAST(element_at({ct}, {m}) AS INT) + 1)"
        )
        tm = f"FLOOR({t} * 1000000.0D + 0.5D)"
        acc = tm if acc is None else f"({acc} + {tm})"
    return F.expr(f"CAST(({acc}) / 1000000.0D AS DOUBLE)")


def pack_codes_col(codes) -> "F.Column":
    """Nibble-pack an M-entry code array (values 0..K-1, K<=16) into
    M/2 bytes — the persisted layout's 2x on top of tinyint codes
    (the index families store packed: 8 bytes/vector vs 256 float32 =
    32×). Each byte carries (even_code*16 + odd_code) shifted by -128
    so the 0..255 pack fits tinyint; :func:`unpack_code` inverts it
    exactly (pure integer arithmetic, roundtrip property-tested)."""
    return F.array(
        *[
            (
                F.element_at(codes, 2 * i + 1).cast("int") * 16
                + F.element_at(codes, 2 * i + 2).cast("int")
                - 128
            ).cast("tinyint")
            for i in range(PQ_M // 2)
        ]
    )


def unpack_code(packed, m) -> "F.Column":
    """The ``m``-th (1-based, Column or plain int) code index from a
    packed array — the inline unpack the serve path runs per lookup
    (two int ops; stays in whole-stage codegen). A plain-int ``m``
    resolves the odd/even branch at plan-construction time, leaving a
    branch-free arithmetic leaf."""
    if isinstance(m, int):
        b = (
            F.element_at(packed, (m + 1) // 2).cast("int") + 128
        )
        return (
            F.floor(b / 16).cast("int") if m % 2 == 1 else b % 16
        )
    b = (
        F.element_at(packed, F.floor((m + 1) / 2).cast("int")).cast(
            "int"
        )
        + 128
    )
    return F.when(m % 2 == 1, F.floor(b / 16).cast("int")).otherwise(
        b % 16
    )


def unpack_codes_col(packed) -> "F.Column":
    """Full M-entry code array from the packed form (build's
    ``pq_codes_col`` output, exactly)."""
    return F.array(
        *[
            unpack_code(packed, m).cast("tinyint")
            for m in range(1, PQ_M + 1)
        ]
    )


def _unpack_code_sql(packed_name: str, m: int) -> str:
    """SQL text of :func:`unpack_code` for a plain-int ``m`` — the
    odd/even branch resolved at build time, matching the int fast
    path exactly."""
    b = f"(CAST(element_at({packed_name}, {(m + 1) // 2}) AS INT) + 128)"
    if m % 2 == 1:
        return f"CAST(FLOOR({b} / 16) AS INT)"
    return f"({b} % 16)"


def _adc_packed_col(lut, packed) -> "F.Column":
    """:func:`_adc_col` over the packed layout — the same exact
    long-micros accumulation, lookups go through the inline unpack."""
    lt = _name(lut, "_adc_packed_col lut")
    pt = _name(packed, "_adc_packed_col packed")
    acc = None
    for m in range(1, PQ_M + 1):
        t = (
            f"element_at(element_at({lt}, {m}), "
            f"{_unpack_code_sql(pt, m)} + 1)"
        )
        tm = f"FLOOR({t} * 1000000.0D + 0.5D)"
        acc = tm if acc is None else f"({acc} + {tm})"
    return F.expr(f"CAST(({acc}) / 1000000.0D AS DOUBLE)")


def pq_rebuild_verdict(
    report,
    build_report=None,
    churn_growth: float = 2.0,
    occupancy_growth: float = 2.0,
    min_churn: float = 0.05,
):
    """:func:`~.similarity.ivf_rebuild_verdict` adapted to PQ's one
    measurement difference: staleness runs over lossy RECONSTRUCTIONS,
    which gives assignment_churn a constant build-time floor (~0.36
    on the test corpus for raw codes, lower for residual codes — the
    reconstruction is tighter — but never zero; both far past the
    float family's absolute 0.25 rule, which would cry wolf on a
    freshly built index). So the churn trigger here is GROWTH over
    the stored build baseline: trip when current churn ≥
    max(``churn_growth`` × build churn, ``min_churn``) — the
    ``min_churn`` floor keeps the trigger armed when the build-time
    churn was exactly 0.0 (a degenerate corpus whose reconstructions
    assign perfectly; a pure growth rule would either never fire or
    fire on 0 ≥ 0). Without a baseline the churn trigger is skipped,
    like occupancy. Occupancy triggers are inherited unchanged."""
    from .similarity import RebuildVerdict, _report_dict

    base_v = ivf_rebuild_verdict(
        report,
        build_report,
        churn_threshold=float("inf"),
        occupancy_growth=occupancy_growth,
    )
    reasons = list(base_v.reasons)
    if build_report is not None:
        cur = _report_dict(report)
        base = _report_dict(build_report)
        bc, cc = base.get("assignment_churn"), cur.get("assignment_churn")
        if bc is not None and cc is not None:
            bar = max(churn_growth * bc, min_churn)
            if cc >= bar:
                reasons.append(
                    f"assignment_churn {cc} >= {bar} "
                    f"(max of {churn_growth}x build-time {bc} and the "
                    f"{min_churn} floor — growth over the "
                    "reconstruction floor; a refit would move this "
                    "fraction of members)"
                )
    return RebuildVerdict(bool(reasons), tuple(reasons))


def _exact_rerank(
    cand: DataFrame,
    vectors: DataFrame,
    query: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """The shared exact-L2 re-rank tail: ``cand`` (query_id,
    neighbor_id — any ADC shortlist) broadcasts into the raw corpus
    scan, so only |Q|·|cand/query| raw vectors are ever read; the
    round6 exact distance re-ranks the shortlist. Output (query_id,
    ann_rank, neighbor_id, l2_d2), ties on neighbor_id."""
    raw = vectors.select(
        F.col(id_col).alias("neighbor_id"), _dbl(vec_col).alias("_cv")
    )
    qraw = query.select(
        F.col(id_col).alias("query_id"), _dbl(vec_col).alias("_qv")
    )
    l2 = round6(
        F.aggregate(
            F.zip_with("_cv", "_qv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        raw.join(
            F.broadcast(cand.select("query_id", "neighbor_id")),
            "neighbor_id",
        )
        .join(F.broadcast(qraw), "query_id")
        .withColumn("l2_d2", l2)
        .withColumn("ann_rank", F.row_number().over(w))
        .filter(F.col("ann_rank") <= k)
        .select("query_id", "ann_rank", "neighbor_id", "l2_d2")
    )


def pq_adc_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force ADC top-k (ascending approximate L2): corpus rows
    carry 16-byte codes, queries broadcast their lookup tables, and
    each candidate costs M lookup-adds — the compression rung alone,
    before IVF pruning (q130) bounds how much gets scanned. Output
    (query_id, ann_rank, neighbor_id, adc_d2), self-matches excluded,
    ties on neighbor_id."""
    corpus = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        pq_codes_col(vec_col).alias("_codes"),
    )
    probes = query.select(
        F.col(id_col).alias("query_id"),
        pq_lut_col(vec_col).alias("_lut"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        corpus.join(
            F.broadcast(probes),
            F.col("neighbor_id") != F.col("query_id"),
        )
        .withColumn("adc_d2", _adc_col("_lut", "_codes"))
        .withColumn("ann_rank", F.row_number().over(w))
        .filter(F.col("ann_rank") <= k)
        .select("query_id", "ann_rank", "neighbor_id", "adc_d2")
    )


def pq_adc_rerank_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    expand: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ as a CANDIDATE GENERATOR + exact re-rank — the production
    serving shape (and the answer to PQ's recall on hard iid-like
    corpora, where the 64-logical-bit codes alone recall ~0.35@10:
    the measured candidate-recall curve is expand=3 → 0.69, 5 → 0.77,
    10 → 0.91, 20 → 0.995 on the sf0.001 corpus — SCALING.md
    operating points). The ADC pass scans CODES ONLY (1/16 the
    stored bytes); only the k·expand winners per query ever touch a
    raw vector, via a broadcast of the candidate set into the corpus
    scan — at 100 TB, the raw-vector reads are |Q|·k·expand rows, not
    the corpus. Output (query_id, ann_rank, neighbor_id, l2_d2),
    exact-distance ranked, ties on neighbor_id."""
    cand = pq_adc_topk(vectors, query, k * expand, vec_col, id_col)
    return _exact_rerank(cand, vectors, query, k, vec_col, id_col)


class PQIVFIndex:
    """PQ codes in the IVF layout — the 100 TB serve shape: the
    ``_save_ivf_layout`` directory scheme (frozen coarse centroids +
    assignments PARTITIONED BY list_id, one-row meta fingerprint), so
    probing n_probe of n_lists lists is a directory-pruned scan, and
    the scanned bytes are nibble-packed 8-byte codes instead of
    256-byte floats (32x) — the two wins compose multiplicatively.
    Codebooks are the frozen MODULE artifact (retrain via
    tools/gen_pq_codebooks.py); the coarse centroids are per-index
    frozen data, fingerprint-guarded exactly like IVFIndex (a held
    handle refuses to append after a rebuild swap).

    This base class encodes RAW vectors;
    :class:`ResidualPQIVFIndex` overrides the three encode/serve
    hooks (``_books`` / ``_encode_packed`` / ``_probe_luts`` plus
    reconstruction) to quantize residuals — everything else (layout,
    lifecycle, re-rank composition) is shared."""

    APPEND_DATASETS = ("assignments",)
    FAMILY = "PQIVFIndex"

    def __init__(self, centroids: DataFrame, assignments: DataFrame,
                 id_col: str = "vec_id"):
        self.centroids = centroids
        self.assignments = assignments
        self.id_col = id_col
        self._frozen_fp: tuple | None = None
        # True only for disk-backed handles (set by load()): the
        # probed-id IN prefilter directory-prunes the partitioned
        # parquet scan at planning time, at the cost of one eager
        # collect job per serve. An ephemeral build has no scan to
        # prune — topk's inner join on the probe frame already
        # restricts to probed lists — so it skips the prefilter job.
        self._scan_pruned = False

    @classmethod
    def _books(cls):
        return CODEBOOKS

    @classmethod
    def _encode_packed(cls, assigned: DataFrame, centroids: DataFrame,
                       vec_col: str, id_col: str) -> DataFrame:
        """Encode + pack: the Arrow-batched encoder materializes the
        tinyint codes once (ArrowEvalPython output is a real column —
        the r13 multiply-reference re-evaluation hazard cannot recur),
        then the nibble pack is 8 integer expressions in codegen. The
        base family encodes the raw vector; ``centroids`` is unused
        here (the residual override joins it)."""
        return assigned.select(
            id_col,
            "list_id",
            pq_codes_col(vec_col, cls._books()).alias("_unpacked"),
        ).select(
            id_col,
            pack_codes_col(F.col("_unpacked")).alias("codes"),
            "list_id",
        )

    @classmethod
    def build(
        cls,
        vectors: DataFrame,
        centroids: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "PQIVFIndex":
        assignments = cls._encode_packed(
            ivf_assign(
                vectors, centroids, vec_col, id_col,
                dim=PQ_M * PQ_DSUB,
            ),
            centroids,
            vec_col,
            id_col,
        )
        return cls(centroids, assignments, id_col)

    def add(
        self,
        vectors: DataFrame,
        path: str | None = None,
        vec_col: str = "embedding",
    ) -> "PQIVFIndex":
        """Incremental append: assign new RAW vectors to the nearest
        FROZEN coarse centroid and encode them under the frozen
        codebooks — deterministic, so ``build(old ∪ new)`` ==
        ``build(old).add(new)`` bit-for-bit (tested). The frozen
        centroids are verified against the persisted meta fingerprint
        first (the IVFIndex.add contract). Appended ids must not
        collide with existing ones."""
        cls = type(self)
        if path is not None:
            IVFIndex._verify_frozen(self, vectors.sparkSession, path)
        new = cls._encode_packed(
            ivf_assign(
                vectors, self.centroids, vec_col, self.id_col,
                dim=PQ_M * PQ_DSUB,
            ),
            self.centroids,
            vec_col,
            self.id_col,
        )
        if path is None:
            out = cls(
                self.centroids,
                self.assignments.unionByName(new),
                self.id_col,
            )
            out._frozen_fp = self._frozen_fp
            out._scan_pruned = self._scan_pruned
            return out
        _append_assignments(new, path, "list_id", "centroids")
        return cls.load(new.sparkSession, path, self.id_col)

    def save(self, path: str) -> None:
        # pq_m rides the one-row meta so load() can refuse a foreign
        # code layout (different PQ_M build, or a pre-packed-format
        # store) WITHOUT an eager scan of assignments
        self._frozen_fp = _save_ivf_layout(
            self.centroids, self.assignments, path, type(self).FAMILY,
            extra={"pq_m": PQ_M},
        )

    @classmethod
    def compact(
        cls, spark: SparkSession, path: str, id_col: str = "vec_id"
    ) -> "PQIVFIndex":
        """One file per list directory — run after many ``add``s.
        The family tag is checked BEFORE the rewrite: raw and
        residual layouts are bit-compatible, so a cross-family
        compact would otherwise mutate the foreign layout first and
        only raise at the post-compact load — leaving a crashed
        compact's recovery state under the wrong family's
        maintenance (r14 review)."""
        from ._staging import read_meta_row

        meta = read_meta_row(spark, path)
        require_meta_family(
            meta.asDict() if meta is not None else None, cls.FAMILY,
            path,
        )
        _compact_assignments(spark, path, "list_id")
        return cls.load(spark, path, id_col)

    @classmethod
    def load(
        cls, spark: SparkSession, path: str, id_col: str = "vec_id"
    ) -> "PQIVFIndex":
        centroids, assignments, md = _load_ivf_frames(spark, path)
        require_meta_family(md, cls.FAMILY, path)
        # layout guard: the centroid fingerprint the shared meta
        # carries says nothing about the CODE layout, and serving an
        # unpacked (or different-PQ_M) code table through the packed
        # unpack arithmetic would return garbage distances with no
        # error. The meta's pq_m column (written by every save since
        # it was introduced) decides from the ALREADY-READ one-row
        # meta; a pre-pq_m layout falls back to the one-row
        # assignments probe this guard originally was.
        stored_m = md.get("pq_m") if md else None
        if stored_m is not None:
            if int(stored_m) != PQ_M:
                raise ValueError(
                    f"PQ index at {path!r} was built with "
                    f"PQ_M={int(stored_m)} but this build expects "
                    f"PQ_M={PQ_M} — rebuild the index under the "
                    "current codebooks"
                )
        else:
            row = assignments.select(F.size("codes").alias("n")).first()
            if row is not None and row["n"] != PQ_M // 2:
                raise ValueError(
                    f"PQ index at {path!r} stores {row['n']}-entry "
                    f"code arrays but this build expects nibble-packed "
                    f"{PQ_M // 2}-byte rows (PQ_M={PQ_M}) — the layout "
                    "predates the packed format or was written under "
                    "different codebooks; rebuild the index"
                )
        idx = cls(centroids, assignments, id_col)
        idx._frozen_fp = _ivf_fp_from(md)
        idx._scan_pruned = True
        return idx

    def reconstruct_col(self) -> "F.Column":
        """Decode ``codes`` back to a float vector (concatenated
        codebook entries) — lossy, but it lives in the ORIGINAL
        space, which is what lets this family measure centroid shift
        where the per-vector-scaled int8 store cannot."""
        cb = _cb_col(type(self)._books())
        return F.flatten(
            F.array(
                *[
                    F.element_at(
                        F.element_at(cb, m + 1),
                        unpack_code(F.col("codes"), m + 1) + 1,
                    )
                    for m in range(PQ_M)
                ]
            )
        )

    def _recon_frame(self) -> DataFrame:
        """Assignments + a ``_recon`` decoded-vector column — the
        staleness input (the residual family overrides to add the
        coarse centroid back)."""
        return self.assignments.withColumn("_recon", self.reconstruct_col())

    def staleness(
        self, sample_fraction: float | None = None
    ) -> DataFrame:
        """Occupancy skew + centroid shift + assignment churn over
        the DECODED reconstructions against the frozen coarse
        centroids — the full :func:`ivf_staleness_report` (metric
        definitions and the measured rebuild rule live there).
        Reconstruction error adds a constant floor to the shift
        columns; the meaningful read is GROWTH over the stored
        build-time baseline, which carries the same floor."""
        return ivf_staleness_report(
            self.centroids,
            self._recon_frame(),
            "_recon",
            self.id_col,
            sample_fraction,
        )

    def save_build_report(self, path: str) -> None:
        """Persist the build-time staleness row — the baseline
        maybe_rebuild's occupancy-growth triggers compare against."""
        _write_baseline(self.staleness(), path, BUILD_REPORT_DIR)

    @classmethod
    def maybe_rebuild(
        cls,
        spark: SparkSession,
        path: str,
        vectors: DataFrame | None = None,
        n_lists: int | None = None,
        sample_fraction: float | None = None,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        **thresholds,
    ):
        """Staleness → verdict → staged rebuild+swap (the q114-q116
        loop). A rebuild re-fits the COARSE centroids over the
        current raw corpus and re-encodes under the frozen module
        codebooks; PQ codes are lossy, so like the int8 family the
        raw ``vectors`` must be supplied when the verdict trips
        (raises otherwise — no refit over reconstructions is
        fabricated). Codebook retraining itself is a model refresh
        (tools/gen_pq_codebooks.py / gen_pq_residual_codebooks.py —
        the residual books are trained against a coarse-centroid
        table, so refresh them alongside any planned large coarse
        refit), out of scope for index maintenance. Returns
        ``(index, verdict, report)``."""
        from ._staging import recover_before_rebuild

        recover_before_rebuild(path, spark)
        idx = cls.load(spark, path, id_col)
        report = idx.staleness(sample_fraction).collect()[0]
        base = _read_baseline(spark, path, BUILD_REPORT_DIR)
        verdict = pq_rebuild_verdict(
            report,
            base.collect()[0] if base is not None else None,
            **thresholds,
        )
        if not verdict.rebuild:
            return idx, verdict, report
        if vectors is None:
            raise ValueError(
                f"{cls.__name__}.maybe_rebuild: the verdict says "
                f"rebuild ({'; '.join(verdict.reasons)}) but PQ codes "
                "are lossy — pass the current raw corpus as vectors= "
                "for the coarse-centroid refit"
            )
        from ._staging import rebuild_root, refresh_root

        k = n_lists if n_lists is not None else idx.centroids.count()

        def _fresh(staging: str) -> None:
            refit = IVFIndex.build(vectors, k, vec_col, id_col)
            fresh = cls.build(
                vectors, refit.centroids, vec_col, id_col
            )
            fresh.save(staging)
            fresh.save_build_report(staging)

        rebuild_root(path, _fresh)
        refresh_root(spark, path)
        return cls.load(spark, path, id_col), verdict, report

    def _probe_luts(
        self, query: DataFrame, n_probe: int, vec_col: str
    ) -> DataFrame:
        """(query_id, list_id, _lut): probe selection on the RAW
        query vector (coarse centroids live in float space) plus the
        per-probe ADC lookup table. For raw codes the LUT is the same
        for every probed list (it depends only on the query), so
        computing it per probe row costs n_probe identical M×K folds
        per query — negligible next to the probed scan, and it keeps
        one code path with the residual family, whose LUT genuinely
        differs per list."""
        probe = _probe_lists(
            query, self.centroids, n_probe, vec_col, self.id_col,
            dim=PQ_M * PQ_DSUB,
        )
        return probe.select(
            "query_id",
            "list_id",
            pq_lut_col("qvec", type(self)._books()).alias("_lut"),
        )

    def topk(
        self,
        query: DataFrame,
        k: int = 10,
        n_probe: int = Q66_N_PROBE,
        vec_col: str = "embedding",
        rerank_expand: int | None = None,
        vectors: DataFrame | None = None,
    ) -> DataFrame:
        """Serve top-k: probe selection on the RAW query vector,
        probed list ids become the partition-pruning filter (collect
        bounded by n_lists ints — the shared `_pruned_by_probes`
        policy), and scoring inside probed lists is ADC lookups
        against the query's broadcast table. Ascending adc_d2, ties
        on id.

        ``rerank_expand`` composes the FULL production serve path in
        one call (q134/q135's graded shape): the probed-ADC pass
        shortlists k·rerank_expand candidates per query, then
        :func:`_exact_rerank` broadcasts the shortlist into the raw
        ``vectors`` scan — which must be supplied, since the index
        stores only 8-byte codes — and re-ranks on exact round6 L2.
        Output columns become (query_id, ann_rank, neighbor_id,
        l2_d2); the raw reads are |Q|·k·rerank_expand rows, never the
        corpus."""
        from ._scope import scoped_persist

        if rerank_expand is not None:
            if rerank_expand < 1:
                raise ValueError(
                    f"rerank_expand={rerank_expand}: the shortlist "
                    "must hold at least k candidates (expand >= 1); "
                    "pass None for the codes-only serve"
                )
            if vectors is None:
                raise ValueError(
                    "topk(rerank_expand=...) needs the raw corpus as "
                    "vectors= — the index stores only PQ codes, and "
                    "the exact re-rank reads |Q|*k*expand raw rows "
                    "from it"
                )
        shortlist_k = k * rerank_expand if rerank_expand else k
        probe = scoped_persist(self._probe_luts(query, n_probe, vec_col))
        # ephemeral builds skip the prefilter and its eager collect
        # job (see __init__._scan_pruned); the broadcast inner join on
        # the probe frame below restricts to probed lists either way
        pruned = (
            _pruned_by_probes(self.assignments, probe, "list_id")
            if self._scan_pruned
            else self.assignments
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_d2").asc(), F.col("neighbor_id").asc()
        )
        adc = (
            pruned.join(F.broadcast(probe), "list_id")
            .filter(F.col(self.id_col) != F.col("query_id"))
            .withColumn(
                "adc_d2",
                _adc_packed_col("_lut", "codes"),
            )
            .select(
                "query_id",
                F.col(self.id_col).alias("neighbor_id"),
                "adc_d2",
            )
            .withColumn("ann_rank", F.row_number().over(w))
            .filter(F.col("ann_rank") <= shortlist_k)
            .select("query_id", "ann_rank", "neighbor_id", "adc_d2")
        )
        if rerank_expand is None:
            return adc
        return _exact_rerank(
            adc, vectors, query, k, vec_col, self.id_col
        )


class ResidualPQIVFIndex(PQIVFIndex):
    """TRUE IVF-PQ: identical layout, lifecycle and byte budget to
    :class:`PQIVFIndex`, but the M sub-space codes quantize the
    RESIDUAL (vector − assigned coarse centroid) under the
    residual-trained frozen codebooks. Residuals concentrate near the
    origin once the coarse quantizer has soaked up between-list
    variance, so the same 64 logical bits resolve finer structure —
    the standard IVF-PQ design and the measured fix for the raw
    family's recall floor (SCALING.md r14 operating points).

    Serving consequence: the ADC lookup table is per (query, probed
    list) — the query's residual differs against each probed
    centroid — so ``_probe_luts`` computes n_probe DISTINCT M×K
    tables per query (still |Q|·n_probe·M·K doubles, broadcast).
    Reconstruction adds the coarse centroid back before measuring
    staleness. Cross-family adds are refused by the meta family tag
    (raw and residual codes are bit-compatible layouts with
    incompatible meanings — the exact silent-corruption hazard the
    tag exists for)."""

    FAMILY = "ResidualPQIVFIndex"

    @classmethod
    def _books(cls):
        return RESIDUAL_CODEBOOKS

    @classmethod
    def _encode_packed(cls, assigned: DataFrame, centroids: DataFrame,
                       vec_col: str, id_col: str) -> DataFrame:
        """Residual encode: join the (broadcast, n_lists-row) coarse
        centroids, materialize the residual as a NAMED column (the
        encoder consumes it whole through one Arrow batch), then
        encode + pack like the base family."""
        res = assigned.join(
            F.broadcast(centroids.select("list_id", "centroid")),
            "list_id",
        ).select(
            id_col,
            "list_id",
            F.zip_with(
                _dbl(vec_col), "centroid", lambda x, y: x - y
            ).alias("_res"),
        )
        return res.select(
            id_col,
            "list_id",
            pq_codes_col("_res", cls._books()).alias("_unpacked"),
        ).select(
            id_col,
            pack_codes_col(F.col("_unpacked")).alias("codes"),
            "list_id",
        )

    def _recon_frame(self) -> DataFrame:
        """centroid + decoded residual, in the original float space —
        the residual family's reconstruction needs the coarse
        centroid back (verdict r13, item #2's lifecycle note)."""
        return (
            self.assignments.join(
                F.broadcast(self.centroids.select("list_id", "centroid")),
                "list_id",
            )
            .withColumn("_dec", self.reconstruct_col())
            .withColumn(
                "_recon",
                F.zip_with("centroid", "_dec", lambda c, d: c + d),
            )
            .drop("_dec", "centroid")
        )

    def _probe_luts(
        self, query: DataFrame, n_probe: int, vec_col: str
    ) -> DataFrame:
        """Per-(query, probed list) residual LUT: join the probed
        centroid, materialize the query residual as a named column
        (same re-evaluation discipline as the encode), then the M×K
        table over the residual codebooks."""
        probe = _probe_lists(
            query, self.centroids, n_probe, vec_col, self.id_col,
            dim=PQ_M * PQ_DSUB,
        ).join(
            F.broadcast(self.centroids.select("list_id", "centroid")),
            "list_id",
        ).select(
            "query_id",
            "list_id",
            F.zip_with(
                "qvec", "centroid", lambda x, y: x - y
            ).alias("_qres"),
        )
        return probe.select(
            "query_id",
            "list_id",
            pq_lut_col("_qres", type(self)._books()).alias("_lut"),
        )


# --------------------------------------------------------------------------
# graded queries


def q129_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, emb.filter(F.col("vec_id") < 5), k=Q66_K)


def q131_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_rerank_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=Q66_K, expand=10
    )


def q130_pq_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    index = PQIVFIndex.build(emb, frozen_ivf_centroids(spark))
    return index.topk(
        emb.filter(F.col("vec_id") < 5), k=Q66_K, n_probe=Q66_N_PROBE
    )


def q133_pq_residual_ivf_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    index = ResidualPQIVFIndex.build(emb, frozen_ivf_centroids(spark))
    return index.topk(
        emb.filter(F.col("vec_id") < 5), k=Q66_K, n_probe=Q66_N_PROBE
    )


def q134_pq_ivf_rerank_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    index = PQIVFIndex.build(emb, frozen_ivf_centroids(spark))
    return index.topk(
        emb.filter(F.col("vec_id") < 5),
        k=Q66_K,
        n_probe=Q66_N_PROBE,
        rerank_expand=RERANK_EXPAND,
        vectors=emb,
    )


def q135_pq_residual_rerank_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    index = ResidualPQIVFIndex.build(emb, frozen_ivf_centroids(spark))
    return index.topk(
        emb.filter(F.col("vec_id") < 5),
        k=Q66_K,
        n_probe=Q66_N_PROBE,
        rerank_expand=RERANK_EXPAND,
        vectors=emb,
    )


def _books_values_sql(books) -> str:
    return ",\n    ".join(
        f"({m}, {k}, [{', '.join(repr(x) for x in cent)}])"
        for m, book in enumerate(books)
        for k, cent in enumerate(book)
    )


def _pq_codes_sql(include_emb: bool = True) -> str:
    """Oracle CTE fragment: frozen codebooks as VALUES rows, per
    (vector, sub-space, code) round6 distances (``pqd`` — also the
    query-side ADC table), nearest-code assignment (``pqcodes``)."""
    emb = (
        "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        if include_emb
        else ""
    )
    return f"""cb(m, k, c) AS (
  VALUES
    {_books_values_sql(CODEBOOKS)}
), {emb}psub AS (
  SELECT vec_id, m, v[m*{PQ_DSUB}+1 : m*{PQ_DSUB}+{PQ_DSUB}] AS s
  FROM emb CROSS JOIN (
    SELECT unnest(generate_series(0, {PQ_M - 1})) AS m)
), pqd AS (
  SELECT vec_id, m, k,
    ROUND(list_sum(list_transform(generate_series(1, {PQ_DSUB}),
      i -> (s[i] - c[i]) * (s[i] - c[i]))), 6) AS d2
  FROM psub JOIN cb USING (m)
), pqcodes AS (
  SELECT vec_id, m, k FROM (
    SELECT vec_id, m, k,
      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn
    FROM pqd) WHERE rn = 1
)"""


def _pq_residual_sql() -> str:
    """Oracle CTE fragment for the RESIDUAL family, composed after
    ``_frozen_ivf_prefix_sql`` (which provides cent / emb / assigned
    / probes): residual codebooks as VALUES, corpus residuals +
    nearest-code assignment (``ccodes``), and the per-(query, probed
    list) residual ADC table (``qd``) — the table is per list because
    the query residual differs against each probed centroid."""
    dim = PQ_M * PQ_DSUB
    sub_d2 = (
        f"ROUND(list_sum(list_transform(generate_series(1, {PQ_DSUB}),"
        " i -> (s[i] - c[i]) * (s[i] - c[i]))), 6)"
    )
    return f"""rcb(m, k, c) AS (
  VALUES
    {_books_values_sql(RESIDUAL_CODEBOOKS)}
), cres AS (
  SELECT a.vec_id, a.list_id,
    list_transform(generate_series(1, {dim}),
      i -> a.v[i] - ct.centroid[i]) AS r
  FROM assigned a JOIN cent ct USING (list_id)
), csub AS (
  SELECT vec_id, list_id, m, r[m*{PQ_DSUB}+1 : m*{PQ_DSUB}+{PQ_DSUB}] AS s
  FROM cres CROSS JOIN (
    SELECT unnest(generate_series(0, {PQ_M - 1})) AS m)
), cd AS (
  SELECT vec_id, list_id, m, k, {sub_d2} AS d2
  FROM csub JOIN rcb USING (m)
), ccodes AS (
  SELECT vec_id, list_id, m, k FROM (
    SELECT vec_id, list_id, m, k,
      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn
    FROM cd) WHERE rn = 1
), qres AS (
  SELECT p.query_id, p.list_id,
    list_transform(generate_series(1, {dim}),
      i -> p.qv[i] - ct.centroid[i]) AS r
  FROM probes p JOIN cent ct USING (list_id)
), qsub AS (
  SELECT query_id, list_id, m, r[m*{PQ_DSUB}+1 : m*{PQ_DSUB}+{PQ_DSUB}] AS s
  FROM qres CROSS JOIN (
    SELECT unnest(generate_series(0, {PQ_M - 1})) AS m)
), qd AS (
  SELECT query_id, list_id, m, k, {sub_d2} AS d2
  FROM qsub JOIN rcb USING (m)
), rscored AS (
  SELECT p.query_id, cc.vec_id AS neighbor_id,
    CAST(SUM(CAST(qd.d2 AS DECIMAL(18,6))) AS DOUBLE) AS adc_d2
  FROM probes p
  JOIN ccodes cc ON cc.list_id = p.list_id AND cc.vec_id <> p.query_id
  JOIN qd ON qd.query_id = p.query_id AND qd.list_id = p.list_id
         AND qd.m = cc.m AND qd.k = cc.k
  GROUP BY p.query_id, cc.vec_id
)"""


_RERANK_TAIL_SQL = f"""cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY adc_d2, neighbor_id) AS rn
    FROM __ADC__) WHERE rn <= {Q66_K * RERANK_EXPAND}
), rer AS (
  SELECT cand.query_id, cand.neighbor_id,
    ROUND(list_sum(list_transform(generate_series(1, {PQ_M * PQ_DSUB}),
      i -> (cv.v[i] - qv.v[i]) * (cv.v[i] - qv.v[i]))), 6) AS l2_d2
  FROM cand
  JOIN emb cv ON cv.vec_id = cand.neighbor_id
  JOIN emb qv ON qv.vec_id = cand.query_id
)
SELECT query_id, ann_rank, neighbor_id, l2_d2 FROM (
  SELECT query_id, neighbor_id, l2_d2,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY l2_d2, neighbor_id) AS ann_rank
  FROM rer) WHERE ann_rank <= {Q66_K}"""


def _q129_sql() -> str:
    return f"""
WITH {_pq_codes_sql()}, scored AS (
  SELECT qd.vec_id AS query_id, c.vec_id AS neighbor_id,
    CAST(SUM(CAST(qd.d2 AS DECIMAL(18,6))) AS DOUBLE) AS adc_d2
  FROM pqcodes c
  JOIN pqd qd ON qd.m = c.m AND qd.k = c.k
    AND qd.vec_id < 5 AND qd.vec_id <> c.vec_id
  GROUP BY qd.vec_id, c.vec_id
)
SELECT query_id, ann_rank, neighbor_id, adc_d2 FROM (
  SELECT query_id, neighbor_id, adc_d2,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY adc_d2, neighbor_id) AS ann_rank
  FROM scored) WHERE ann_rank <= {Q66_K}
"""


_Q130_SCORED_SQL = """scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
    CAST(SUM(CAST(qd.d2 AS DECIMAL(18,6))) AS DOUBLE) AS adc_d2
  FROM probes p
  JOIN assigned a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
  JOIN pqcodes c ON c.vec_id = a.vec_id
  JOIN pqd qd ON qd.vec_id = p.query_id AND qd.m = c.m AND qd.k = c.k
  GROUP BY p.query_id, a.vec_id
)"""


def _q130_sql() -> str:
    return f"""
WITH {_frozen_ivf_prefix_sql(Q66_N_PROBE)}, {_pq_codes_sql(include_emb=False)}, {_Q130_SCORED_SQL}
SELECT query_id, ann_rank, neighbor_id, adc_d2 FROM (
  SELECT query_id, neighbor_id, adc_d2,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY adc_d2, neighbor_id) AS ann_rank
  FROM scored) WHERE ann_rank <= {Q66_K}
"""


def _q131_sql() -> str:
    return f"""
WITH {_pq_codes_sql()}, adc AS (
  SELECT qd.vec_id AS query_id, c.vec_id AS neighbor_id,
    CAST(SUM(CAST(qd.d2 AS DECIMAL(18,6))) AS DOUBLE) AS adc_d2
  FROM pqcodes c
  JOIN pqd qd ON qd.m = c.m AND qd.k = c.k
    AND qd.vec_id < 5 AND qd.vec_id <> c.vec_id
  GROUP BY qd.vec_id, c.vec_id
), {_RERANK_TAIL_SQL.replace("__ADC__", "adc")}
"""


def _q133_sql() -> str:
    return f"""
WITH {_frozen_ivf_prefix_sql(Q66_N_PROBE)}, {_pq_residual_sql()}
SELECT query_id, ann_rank, neighbor_id, adc_d2 FROM (
  SELECT query_id, neighbor_id, adc_d2,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY adc_d2, neighbor_id) AS ann_rank
  FROM rscored) WHERE ann_rank <= {Q66_K}
"""


def _q134_sql() -> str:
    return f"""
WITH {_frozen_ivf_prefix_sql(Q66_N_PROBE)}, {_pq_codes_sql(include_emb=False)}, {_Q130_SCORED_SQL}, {_RERANK_TAIL_SQL.replace("__ADC__", "scored")}
"""


def _q135_sql() -> str:
    return f"""
WITH {_frozen_ivf_prefix_sql(Q66_N_PROBE)}, {_pq_residual_sql()}, {_RERANK_TAIL_SQL.replace("__ADC__", "rscored")}
"""


QUERIES = {
    "q129_pq_adc_topk": q129_pq_adc_topk,
    "q130_pq_ivf_topk": q130_pq_ivf_topk,
    "q131_pq_rerank_topk": q131_pq_rerank_topk,
    "q133_pq_residual_ivf_topk": q133_pq_residual_ivf_topk,
    "q134_pq_ivf_rerank_topk": q134_pq_ivf_rerank_topk,
    "q135_pq_residual_rerank_topk": q135_pq_residual_rerank_topk,
}

ORACLE = {
    "q129_pq_adc_topk": _q129_sql(),
    "q130_pq_ivf_topk": _q130_sql(),
    "q131_pq_rerank_topk": _q131_sql(),
    "q133_pq_residual_ivf_topk": _q133_sql(),
    "q134_pq_ivf_rerank_topk": _q134_sql(),
    "q135_pq_residual_rerank_topk": _q135_sql(),
}
