#!/usr/bin/env python
"""Profile the driver correctness gate: time each queries() entry (Spark
collect) and its DuckDB oracle at sf0.01, print a sorted per-query table.
Used to budget the gate so the driver harness completes the full registry."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from networkx_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    spark = get_spark("gate-profile", cores=4, shuffle_partitions=4,
                      extra_conf={"spark.sql.autoBroadcastJoinThreshold": "1MB"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    rows = []
    t_all = time.time()
    for name in sorted(qs):
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            n = len(df.collect())
            t_spark = time.time() - t0
        except Exception as exc:  # noqa: BLE001
            rows.append((name, -1.0, -1.0, f"SPARK ERR {exc}"))
            continue
        t1 = time.time()
        t_duck = 0.0
        if name in sqls:
            try:
                con.execute(sqls[name]).fetchall()
                t_duck = time.time() - t1
            except Exception as exc:  # noqa: BLE001
                rows.append((name, t_spark, -1.0, f"DUCK ERR {exc}"))
                continue
        rows.append((name, t_spark, t_duck, n))

    total = time.time() - t_all
    rows.sort(key=lambda r: -(r[1] + max(r[2], 0)))
    for name, ts, td, n in rows:
        print(f"{ts + max(td, 0):8.2f}  spark={ts:7.2f} duck={td:6.2f}  {name}  ({n})")
    print(f"TOTAL {total:.1f}s for {len(rows)} queries")
    payload = {n: {"spark": round(ts, 3), "duck": round(td, 3)}
               for n, ts, td, _ in rows}
    with open("/tmp/gate_profile.json", "w") as f:
        json.dump(payload, f)
    # committed cost snapshot driving the cheapest-first registry order
    # (entry_queries._reorder_registry)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "networkx_spark", "gate_costs.json"), "w") as f:
        json.dump(payload, f, indent=0, sort_keys=True)


if __name__ == "__main__":
    main()
