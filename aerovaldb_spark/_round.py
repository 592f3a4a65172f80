"""Shared 6-decimal rounding, bit-identical to DuckDB's ROUND(x, 6).

The two engines disagree on computed doubles near a .5 boundary at the
6th decimal: DuckDB rounds the SCALED value (one IEEE multiply by 1e6,
then half-away-from-zero, then unscale), while Spark's ``F.round``
rounds the EXACT binary value of the input. When the multiply rounds a
just-below-half product up to an exact .5 (e.g.
0.9276314999999999 * 1e6 → 927631.5), DuckDB reports ...632 and Spark
...631 — observed on exactly one row each of q22/q76/q84 at sf0.1
(doc 3202's quality_score, one avg_nll).

``round6`` performs DuckDB's scaled computation in Spark:
``F.round(x * 1e6, 0) / 1e6``. Spark's Round rounds
``BigDecimal.valueOf(x)`` — the SHORTEST decimal repr of x, not its
exact binary expansion — with HALF_UP (half away from zero). At scale
0 the two models provably agree (no double's shortest repr crosses an
integer-half boundary its exact value doesn't), so on the shared IEEE
product this matches DuckDB's half-away exactly; do NOT assume the
same when generalizing to other scales — that shortcut is precisely
the divergence this module exists to fix. Validated bit-for-bit
against DuckDB over 400k random positive AND negative doubles (tools
session, zero mismatches), plus the two observed divergent corpus
values.

Use this for any ROUND(<computed double ratio/log/score>, 6) that an
oracle mirrors with DuckDB ROUND — every such site in the engine now
does (all 41 former F.round(x, 6) call sites migrated, re-verified
0/90 parity failures at sf0.001, sf0.01 AND sf0.1). Values rounded as
DECIMAL types must NOT be migrated (decimal rounding is exact by
construction).
``round6_py`` is the Python twin for Arrow-batched scorers that must
stay bit-identical to a batch query (e.g. the streaming LM gate).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1_000_000.0


def round6(c: Column | str) -> Column:
    if isinstance(c, str):
        c = F.col(c)
    return F.round(c * F.lit(_SCALE), 0) / F.lit(_SCALE)


def round6_py(v: float) -> float:
    y = v * _SCALE
    a = abs(y)
    f = math.floor(a)
    i = f + 1.0 if a - f >= 0.5 else f
    return (-i if y < 0 else i) / _SCALE
