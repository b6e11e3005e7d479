"""SQL-script surface: the reference's view-chain idiom must reproduce
the operator-library pipeline exactly (EnrichmentApp.run()'s
CREATE TEMPORARY VIEW chain, re-expressed in Spark SQL)."""

from __future__ import annotations

from flink_application_spark.plans.cdr import cdr_views
from flink_application_spark.plans.registry import REGISTRY_GET
from flink_application_spark.sql_script import run_sql_script

SCRIPT = """
CREATE OR REPLACE TEMPORARY VIEW src_extended AS
SELECT *,
       CAST(start_time AS DATE) AS event_date,
       substring(measuring_probe_name, 1, 2) AS probe
FROM cdr_src;

CREATE OR REPLACE TEMPORARY VIEW dim_renamed AS
SELECT imsi AS _imsi, msisdn AS _msisdn FROM imsi_msisdn;

SELECT start_time,
       measuring_probe_name,
       coalesce(_imsi, imsi) AS imsi,
       coalesce(_msisdn, msisdn) AS msisdn,
       ms_ip_address,
       unique_cdr_id,
       event_date,
       probe
FROM src_extended s
JOIN dim_renamed d ON s.imsi = d._imsi
WHERE s.imsi IS NOT NULL
"""


def test_sql_script_reproduces_path_a(spark, sf_dir):
    cdr_views(spark, sf_dir)
    got = run_sql_script(spark, SCRIPT)
    want = REGISTRY_GET("cdr_enrich_path_a").spark(spark, sf_dir)
    assert got.columns == want.columns
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sql_script_statement_list_and_ddl_only(spark, sf_dir):
    cdr_views(spark, sf_dir)
    out = run_sql_script(
        spark,
        [
            "CREATE OR REPLACE TEMPORARY VIEW _t1 AS SELECT 1 AS a",
            "",  # blank tolerated
            "SELECT a + 1 AS b FROM _t1;",  # trailing ; tolerated
        ],
    )
    assert out.collect()[0].b == 2
