"""Registry-wide plan doctor: print every advisory finding per query.

Usage: python scripts/plan_doctor.py [sf_dir] [name_substring] [--execute]

Complement of plan_audit.py: the audit counts, the doctor advises.
Expect the allowlisted classes to show up as `warn` (1-row scalar
appends → NESTED_LOOP, the pinned quadratic oracle baselines →
CARTESIAN is absent because those use broadcast NLJ); `error`
findings on a registered query are a bug."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_application_spark.doctor import diagnose
from flink_application_spark.plans.registry import REGISTRY, _load_all
from flink_application_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--execute"]
    execute = "--execute" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    needle = args[1] if len(args) > 1 else ""
    spark = get_spark("plan-doctor")
    _load_all()
    n_findings = n_errors = 0
    for name, spec in sorted(REGISTRY.items()):
        if needle and needle not in name:
            continue
        try:
            df = spec.spark(spark, sf_dir)
            if execute:
                df.collect()
            findings = diagnose(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name:45s} ERROR {e}")
            continue
        for f in findings:
            n_findings += 1
            n_errors += f.severity == "error"
            print(f"{name:45s} {f.severity:5s} {f.code}: {f.message}")
    print(f"\n{n_findings} findings, {n_errors} errors")
    return 1 if n_errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
