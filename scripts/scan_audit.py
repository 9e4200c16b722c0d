"""Plan-only duplicate-scan audit (round 12).

Builds every registered query's DataFrame at the given SF dir (no
execution beyond whatever the builder itself materializes) and counts
`Scan parquet` operators in the formatted plan. Catalyst has no
cross-subtree CSE, so a query whose plan scans the same table N times
re-tokenizes / re-aggregates that chain N times — the round-12 class of
fix (persist the shared relation, release via checkpoint_result).

Note: the formatted explain lists each operator in the tree AND in the
details section, so raw counts are ~2× the true scan count; ranking is
unaffected. Builders that eagerly materialize intermediates
(localCheckpoint loops) surface only their post-checkpoint stub — their
scan counts read low, not high (no false positives).

Usage: python scripts/scan_audit.py [sf_dir] [min_scans]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    min_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from recommedation_system_under_flink_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="scan_audit")
    qs = entrymod.queries()
    rows = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            # duplicate-scan metric: max times any ONE table is scanned
            # (scanning many DIFFERENT tables once each is not a smell)
            import re

            tables = re.findall(r"Location: \S+ \[[^\]]*?([a-z_]+\.parquet)", plan)
            per = {}
            for t in tables:
                per[t] = per.get(t, 0) + 1
            dup = max(per.values()) if per else 0
            rows.append((dup, name))
        except Exception as e:  # noqa: BLE001 — audit must not die mid-sweep
            print(f"ERR {name}: {type(e).__name__}: {e}", flush=True)
    rows.sort(reverse=True)
    for n, name in rows:
        if n >= min_scans:
            print(f"{n:4d}  {name}", flush=True)
    print(f"-- audited {len(rows)} queries at {sf}; raw counts are ~2x true")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
