"""Dump plan reports for the headline queries.

Usage: python -m aerovaldb_spark.plans [sf_dir] [query_name ...]
(no names → the bench HEADLINE set)
"""

from __future__ import annotations

import json
import sys

from ..catalog import clear_table_cache
from ..operators import ALL_QUERIES
from ..session import get_spark
from . import plan_report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plans", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    clear_table_cache()
    from bench import HEADLINE  # noqa: E402  (repo root on sys.path)

    names = sys.argv[2:] or HEADLINE
    for name in names:
        rep = plan_report(ALL_QUERIES[name](spark, sf_dir))
        print(name, json.dumps(rep))


if __name__ == "__main__":
    main()
