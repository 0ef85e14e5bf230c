#!/usr/bin/env python3
"""DuckDB per-query baseline timing: median of 3 (1 unmeasured warm run)
over the sf parquet tables, same oracle SQL as the correctness gate.

Usage: python3 tools/duck_median.py <sfDir> <oracle_sql.json> <query> [...]
Prints "<query> <median_sec>" per line. Run ONE query per process from a
shell loop with `timeout` if quadratic oracles may be in the list.
(Driver-side tooling only — not part of the shipped library.)
"""
import sys, os, json, time
import duckdb

def main(sf_dir, oracle_path, names):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    for name in names:
        if name not in oracles:
            print(f"{name} no_oracle")
            continue
        sql = oracles[name]
        con.execute(sql).fetchall()  # warm (parquet footer/OS cache)
        ts = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            ts.append(time.time() - t0)
        print(f"{name} {sorted(ts)[1]:.4f}", flush=True)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
