"""SQL-script entry surface: the reference's view-chain idiom.

The reference constructs its whole pipeline as an ordered list of SQL
statements — `CREATE TEMPORARY VIEW` per stage, executed in dependency
order (EnrichmentApp.run(), EnrichmentApp.java:59-110: src →
src_extended → src_extended_proc → src_exploded → dims → join views).
A user coming from it writes SQL, not DataFrame code; this module runs
the same idiom on Spark SQL: feed it the statement list, get the final
statement's DataFrame back. Views are temp (session-scoped), exactly
like `tEnv.executeSql(CREATE TEMPORARY VIEW ...)`.

Dialect notes for migrating reference SQL (documented divergences):
- `PROCTIME()` → `current_timestamp()` (micro-batch granularity; make
  it an injectable column for deterministic tests, SURVEY §7.3).
- `FROM t, LATERAL TABLE(split(x)) AS T(ip)` → built-in
  `LATERAL explode(split(x, ';')) AS T(ip)` or a registered Python
  UDTF (`functions/udtf.py`) for custom table functions.
- `JOIN dim FOR SYSTEM_TIME AS OF t.proc_time ON ...` → a plain join
  against the dim view; in streaming the static side is re-read per
  micro-batch, which IS processing-time-as-of at batch granularity.
- Connector DDL (`WITH ('connector'='kafka', ...)`) → source
  construction stays in code/config (`sources/`, `app.py`); SQL views
  start from registered tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_sql_script(
    spark: SparkSession, statements: list[str] | str
) -> DataFrame | None:
    """Execute SQL statements in order; return the last statement's
    DataFrame (None for an all-DDL script).

    A single string is split on ';' at line ends (a trailing ';' and
    blank statements are tolerated) — the shape of a .sql file.
    """
    if isinstance(statements, str):
        statements = [s.strip() for s in statements.split(";\n")]
    result: DataFrame | None = None
    for stmt in statements:
        stmt = stmt.strip().rstrip(";").strip()
        if not stmt:
            continue
        result = spark.sql(stmt)
    return result
