"""CLI (datafusion-cli analog) — statement splitting, dot-commands, batch run."""
from __future__ import annotations

import io

from arrow_datafusion_spark import cli
from arrow_datafusion_spark.context import SessionContext
from arrow_datafusion_spark.session import load_tables


def test_statement_split():
    stmts = list(cli._statements("SELECT 1;\n  .tables ;; SELECT 2 ;"))
    assert stmts == ["SELECT 1", ".tables", "SELECT 2"]


def test_run_sql_and_dot_commands(spark, sf_dir, capsys):
    load_tables(spark, sf_dir)
    ctx = SessionContext(spark)
    out = io.StringIO()
    rc = cli.run(
        [
            "SELECT r_name FROM region ORDER BY r_name LIMIT 2",
            ".tables",
            ".quit",
            "SELECT should_never_run FROM nowhere",
        ],
        ctx,
        out=out,
    )
    assert rc == 0
    assert "region" in out.getvalue()
    shown = capsys.readouterr().out
    assert "AFRICA" in shown and "AMERICA" in shown


def test_run_keeps_going_on_error(spark, sf_dir, capsys):
    load_tables(spark, sf_dir)
    ctx = SessionContext(spark)
    rc = cli.run(["SELECT * FROM definitely_missing", "SELECT 41+1 AS v"], ctx)
    assert rc == 0
    assert "42" in capsys.readouterr().out
