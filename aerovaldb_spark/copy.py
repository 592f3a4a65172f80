"""Copy CLI (reference utils/copy.py:53-71, console script
``aerovaldbcp``): copy every asset from one resource to another.

Usage::

    python -m aerovaldb_spark.copy <source> <dest>

Resource strings are anything :func:`aerovaldb_spark.plugins.open`
accepts (``spark:<path>``, ``json_files:<tree>``, ``sqlitedb:<file>``,
bare sniffed paths, entry-point schemes). Spark→Spark pairs take the
distributed table-at-a-time path; mixed pairs fall back to the
per-URI copy.
"""

from __future__ import annotations

import argparse

from .db import copy_db_contents


def main() -> None:
    parser = argparse.ArgumentParser(
        description=(
            "Utility for copying contents from one aerovaldb resource "
            "to another."
        )
    )
    parser.add_argument(
        "source", type=str, help="Resource string of the source instance"
    )
    parser.add_argument(
        "dest", type=str, help="Resource string of the destination instance"
    )
    args = parser.parse_args()
    copy_db_contents(args.source, args.dest)


if __name__ == "__main__":
    main()
