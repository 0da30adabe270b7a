"""SQL REPL / batch runner — the `datafusion-cli` analog (SURVEY.md §3.3;
/root/reference/datafusion-cli/src/main.rs:130, exec.rs:64,123).

    python -m arrow_datafusion_spark.cli [--sf-dir DIR] [-c "SQL"] [-f file.sql]

With no -c/-f, reads statements from stdin (`;`-terminated, like
exec_from_repl). Testdata tables are pre-registered as views. Dot-commands
(command.rs analog): `.tables`, `.schema <table>`, `.quit`.
"""

from __future__ import annotations

import argparse
import sys


def _print_df(df, max_rows: int = 100) -> None:
    df.show(n=max_rows, truncate=False)


def _statements(text: str):
    """Split on top-level semicolons (no string-literal awareness needed for
    the fixture SQL; mirrors exec_from_lines' line-joining loop)."""
    for stmt in text.split(";"):
        stmt = stmt.strip()
        if stmt:
            yield stmt


def run(statements, ctx, out=sys.stdout) -> int:
    for stmt in statements:
        if stmt.startswith("."):
            cmd, *rest = stmt.split()
            if cmd == ".quit":
                return 0
            if cmd == ".tables":
                # SHOW TABLES now returns the reference's 4-column catalog
                # layout (table_catalog, table_schema, table_name,
                # table_type) — print user tables like datafusion-cli does
                for row in ctx.sql("SHOW TABLES").collect():
                    if row.table_schema != "information_schema":
                        print(row.table_name, file=out)
                continue
            if cmd == ".schema" and rest:
                ctx.sql(f"DESCRIBE {rest[0]}").show(truncate=False)
                continue
            print(f"unknown command: {cmd}", file=sys.stderr)
            continue
        try:
            _print_df(ctx.sql(stmt))
        except Exception as exc:  # keep the REPL alive, like the reference
            print(f"error: {exc}", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="adfspark-cli", description=__doc__)
    p.add_argument("--sf-dir", default=None, help="testdata dir to register")
    p.add_argument("-c", "--command", help="run one SQL string and exit")
    p.add_argument("-f", "--file", help="run statements from a .sql file")
    args = p.parse_args(argv)

    from arrow_datafusion_spark.context import SessionContext
    from arrow_datafusion_spark.session import DEFAULT_SF_DIR, build_spark, load_tables

    spark = build_spark(app="adfspark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    ctx = SessionContext(spark)
    load_tables(spark, args.sf_dir or DEFAULT_SF_DIR)

    if args.command:
        return run(_statements(args.command), ctx)
    if args.file:
        with open(args.file) as fh:
            return run(_statements(fh.read()), ctx)
    return run(_statements(sys.stdin.read()), ctx)


if __name__ == "__main__":
    sys.exit(main())
