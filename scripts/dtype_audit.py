"""Dtype-level oracle audit — strongest local proxy for the driver's
type-sensitive value hash.

For every registered query with an oracle, renders BOTH sides to pandas
(DuckDB ``.df()``, Spark ``.toPandas()``) and diffs the per-column
dtypes. DuckDB HUGEINT converts to float64/object while Spark bigint
converts to int64, which is (per the round-1 verdict) exactly the class
of mismatch that flips the driver's hash even when values are equal.

Run: python scripts/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_application_spark.oracle import duckdb_connect
from flink_application_spark.plans.registry import REGISTRY, _load_all
from flink_application_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    con = duckdb_connect(sf_dir)
    _load_all()
    bad = 0
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            continue
        try:
            sdf = spec.spark(spark, sf_dir).toPandas()
            odf = con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            bad += 1
            continue
        s_t = {c: str(t) for c, t in sdf.dtypes.items()}
        o_t = {c: str(t) for c, t in odf.dtypes.items()}
        if set(s_t) != set(o_t):
            print(f"COLS  {name}: spark={sorted(s_t)} oracle={sorted(o_t)}")
            bad += 1
            continue
        diffs = {c: (s_t[c], o_t[c]) for c in s_t if s_t[c] != o_t[c]}
        if diffs:
            print(f"DTYPE {name}: {diffs}")
            bad += 1
    print(f"done; {bad} queries with dtype/col diffs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
