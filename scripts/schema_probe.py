"""Fixture schema probe — run at the START of every round.

The driver regenerates /root/testdata/sf*/ between rounds and physical
encodings can change silently (round 1 -> 2: events.ts flipped from
parquet TIMESTAMP(NANOS) to timestamp[us]). This prints the arrow
schema of every fixture table at every SF and diffs against the
expectation baked in below; a mismatch means sources/tables.py
adapters need re-checking BEFORE trusting last round's green tests.

Usage:  python scripts/schema_probe.py [testdata_root]
Exit 0 = all schemas match EXPECTED; 1 = drift detected (printed).
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

#: field name -> arrow type string, per table (sf-invariant).
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64", "c_name": "string", "c_nationkey": "int32",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int32", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string",
        "o_totalprice": "double", "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64",
        "l_linenumber": "int32", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64", "ts": "timestamp[us]", "user_id": "int64",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "int64", "text": "string", "lang": "string",
        "source": "string", "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64", "embedding": "list<element: float>", "label": "int32",
    },
}


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    drift = 0
    for sf_dir in sorted(glob.glob(os.path.join(root, "sf*"))):
        for table, want in EXPECTED.items():
            path = os.path.join(sf_dir, f"{table}.parquet")
            if not os.path.exists(path):
                print(f"MISSING {path}")
                drift += 1
                continue
            schema = pq.ParquetFile(path).schema_arrow
            got = {f.name: str(f.type) for f in schema}
            if got != want:
                drift += 1
                print(f"DRIFT   {sf_dir}/{table}:")
                for k in sorted(set(want) | set(got)):
                    w, g = want.get(k, "<absent>"), got.get(k, "<absent>")
                    if w != g:
                        print(f"        {k}: expected {w}, got {g}")
    if drift:
        print(f"\n{drift} table(s) drifted — re-check sources/tables.py adapters")
        return 1
    print("all fixture schemas match expectations")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
