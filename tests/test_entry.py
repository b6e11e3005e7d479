"""Smoke checks of the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "start_time",
        "measuring_probe_name",
        "imsi",
        "msisdn",
        "ms_ip_address",
        "unique_cdr_id",
        "event_date",
        "probe",
    ]


def test_queries_and_oracles_aligned():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert qs, "registry must not be empty"
