"""Physical-plan inspection: the scale-discipline checks.

At 100 TB the difference between a right and wrong plan is hours vs
days: a dimension join that fails to broadcast becomes a full shuffle
of the fact table; a filter that misses pushdown scans everything.
These helpers make those properties assertable in tests and
inspectable during development (`python -m aerovaldb_spark.plans`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    import re

    # Count detail headers "(n) Exchange" — each node appears once in
    # the tree and once in the detail section of a formatted plan.
    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.MULTILINE))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out


def scan_columns(df: DataFrame) -> list[str]:
    """ReadSchema column lists of every scan (column-pruning check)."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line.removeprefix("ReadSchema:").strip())
    return out


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (wider is better).

    AQE wraps the plan in AdaptiveSparkPlan and hides codegen spans
    until execution, so re-derive the plan with AQE off for the count.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        from pyspark.sql import functions as F

        # fresh logical plan → planning happens under the AQE-off conf
        # (df's own queryExecution may be cached from earlier calls)
        plan = formatted_plan(df.where(F.lit(True)))
        ids = {
            line.split("codegen id : ")[1].strip()
            for line in plan.splitlines()
            if "codegen id : " in line
        }
        return len(ids)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def plan_report(df: DataFrame) -> dict:
    return {
        "broadcast_join": has_broadcast_join(df),
        "shuffles": shuffle_count(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": scan_columns(df),
        "codegen_spans": wholestage_codegen_ids(df),
    }
