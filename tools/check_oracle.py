#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate:
run Verify first (scala), then this script compares each result parquet
against DuckDB executing the oracle SQL over the same fixture tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # The DRIVER's canonicalizer crashes on array cells (round-5 q164) —
    # mirror that as a hard failure instead of papering over it.
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     hasattr(v, "tolist") and not pd.api.types.is_scalar(v)).any():
            raise ValueError(
                f"column {c!r} holds array cells — the driver harness cannot "
                "hash these; reshape the query to scalar rows or a joined string")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def kind(dt) -> str:
    """Collapse dtypes to the hash-relevant kind (int/float/bool/other).
    The driver hashes typed values, so DuckDB HUGEINT->float64 vs Spark
    int64 is a mismatch even when every value compares equal (round-5
    q132/q142/q144/q151)."""
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    return "other"


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result files")
            n_bad += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        kinds_g = [kind(got[c].dtype) for c in got.columns]
        kinds_e = [kind(exp[c].dtype) for c in exp.columns]
        if kinds_g != kinds_e:
            bad = [(c, g, e) for c, g, e in
                   zip(got.columns, kinds_g, kinds_e) if g != e]
            print(f"FAIL {name}: dtype kind mismatch (driver hash would "
                  f"differ even if values match): {bad}")
            n_bad += 1
            continue
        # exact value compare (mirrors a hash match); sentinel so null==null
        sent = "\x00<null>\x00"
        eq = got.astype(object).where(pd.notnull(got), sent) \
            .eq(exp.astype(object).where(pd.notnull(exp), sent))
        if not eq.all().all():
            bad_cols = [c for c in eq.columns if not eq[c].all()]
            ix = eq[bad_cols[0]].idxmin() if bad_cols else 0
            print(f"FAIL {name}: value mismatch cols={bad_cols} "
                  f"e.g. row {ix}: got={got.iloc[ix].to_dict()} exp={exp.iloc[ix].to_dict()}")
            n_bad += 1
            continue
        print(f"OK   {name}: {len(got)} rows")
    # queries without oracle: just check rows exist
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name in oracles or not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        status = "OK  " if n > 0 else "WARN"
        print(f"{status} {name}: {n} rows (no oracle)")
    print(f"{'ALL GREEN' if n_bad == 0 else str(n_bad) + ' FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
