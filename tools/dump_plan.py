"""Dump a declared query's ``explain("formatted")`` plan to a file.

Usage::

    python tools/dump_plan.py <sf_dir> <query> <outfile> [--execute]

``--execute`` runs the query first (count), so plans built on
localCheckpoint()-ed frames show the executed shape.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    execute = "--execute" in sys.argv
    sf_dir, name, outfile = args

    import __spark_entry__ as entry
    from jaccard_join_duckdb_spark import get_spark

    spark = get_spark(
        app_name="jjds-dump-plan",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.session.timeZone": "UTC",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entry.queries(), **getattr(entry, "extra_queries", dict)()}
    df = qs[name](spark, sf_dir)
    if execute:
        df.count()
        df = qs[name](spark, sf_dir)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    with open(outfile, "w") as f:
        f.write(plan)
    print(f"wrote {outfile} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
