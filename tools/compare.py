#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and diff them (columns sorted by name, rows
sorted, exact value compare with float diagnostics).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, math, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; Spark-written corpora (the
        # EdgeCorpusSpec empty/one-row dirs) are DIRECTORIES of part files
        path = f"{sfdir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{outdir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            # Dtype-kind drift (int vs float) means the driver's hash gate
            # would fail even when values are numerically equal — e.g. DuckDB
            # HUGEINT coerced to float64 by pandas vs Spark LongType. Flag it
            # instead of silently downgrading to a float compare.
            int_kinds = ("i", "u")
            if (gv.dtype.kind in int_kinds) != (ev.dtype.kind in int_kinds):
                bad.append(
                    f"{c} (dtype kind mismatch: engine {gv.dtype} vs oracle "
                    f"{ev.dtype} — driver hashes these differently; cast the "
                    f"oracle, e.g. ::bigint for HUGEINT sums)")
                continue
            if gv.dtype.kind == "f" or ev.dtype.kind == "f":
                gv2 = gv.astype(float); ev2 = ev.astype(float)
                neq = ~((gv2 == ev2) | (gv2.isna() & ev2.isna()))
                if neq.any():
                    md = (gv2 - ev2).abs().max()
                    bad.append(f"{c} ({int(neq.sum())} diffs, maxabs={md:.3e})")
            else:
                if not gv.equals(ev):
                    ga, ea = gv.astype(str), ev.astype(str)
                    neq = ga != ea
                    if neq.any():
                        i = neq.idxmax()
                        bad.append(f"{c} ({int(neq.sum())} diffs, e.g. {ga[i]!r} != {ea[i]!r})")
        if bad:
            print(f"FAIL {name}: {'; '.join(bad)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
