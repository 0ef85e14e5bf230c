#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name> result parquet, executes the matching SQL from
<outDir>/oracle_sql.json in DuckDB over the same sf parquet tables, sorts
columns by name and rows by all columns, and hash-compares values.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
(Driver-side tooling only — not part of the shipped library.)
"""
import sys, os, json, glob, hashlib, math
import duckdb
import numpy as np
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def _norm(v) -> str:
    """Dtype-tolerant canonical form: int32/int64/float32/float64 and
    Python scalars that are numerically equal hash identically."""
    if v is None:
        return "<null>"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "<nan>"
        # Whole floats render WITH a trailing .0 ("19525.0"), ints without:
        # the driver's gate distinguishes int from float (round-3 failures
        # were all DuckDB HUGEINT columns surfacing as float64, vs Spark
        # int64), so int-vs-float drift must FAIL here too. (A bare
        # %.9g would render 19525.0 as "19525" == repr(int) — a no-op.)
        if f == 0:
            f = 0.0  # normalize -0.0
        if f == int(f) and abs(f) < 2**53:
            return repr(float(f))
        return f"{f:.9g}"
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_norm(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return repr(v)

def hash_df(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        for v in df[c]:
            try:
                if pd.isna(v):
                    h.update(b"<null>")
                    continue
            except ValueError:
                pass  # arrays: pd.isna is elementwise
            h.update(_norm(v).encode())
        h.update(b"|")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = bad = 0
    seen = set()
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        seen.add(name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows"
                  + (" [VACUOUS]" if len(got) == 0 else ""))
            continue
        want = con.execute(oracles[name]).df()
        g, w = canon(got), canon(want)
        schema_ok = list(g.columns) == list(w.columns)
        rows_ok = len(g) == len(w)
        hg, hw = hash_df(g), hash_df(w)
        if schema_ok and rows_ok and hg == hw:
            tag = " [VACUOUS]" if len(g) == 0 else ""
            print(f"  [OK]   {name}: {len(g)} rows{tag}")
            ok += 1
        else:
            print(f"  [FAIL] {name}: cols {list(g.columns)} vs {list(w.columns)}; "
                  f"rows {len(g)} vs {len(w)}; hash {'=' if hg==hw else '!='}")
            if schema_ok and rows_ok:
                for c in g.columns:
                    if hash_df(g[[c]]) != hash_df(w[[c]]):
                        gd = g[c]; wd = w[c]
                        try:
                            diff = (gd != wd)
                            idx = diff[diff].index[:3]
                            print(f"    col {c} ({gd.dtype} vs {wd.dtype}): "
                                  f"got {gd.loc[idx].tolist()} want {wd.loc[idx].tolist()}")
                        except Exception as e:
                            print(f"    col {c}: dtypes {gd.dtype} vs {wd.dtype} ({e})")
            bad += 1
    # A query that threw inside Verify writes no result dir — that is a
    # FAIL, not a skip (round-1 ADVICE: broken queries silently passed).
    for name in sorted(set(oracles) - seen):
        print(f"  [FAIL] {name}: no result directory (query threw in Verify?)")
        bad += 1
    print(f"{ok} ok, {bad} fail")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
