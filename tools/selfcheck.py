#!/usr/bin/env python3
"""Dev-side correctness self-check mirroring the driver's DuckDB oracle:
for each SparkEntry query output under <outdir>, run the oracle SQL in
DuckDB over the same sf parquet tables and compare values (columns sorted
by name, rows sorted by all columns). Not part of the shipped library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.floor("us").astype("datetime64[us]")
        elif s.dtype == object:
            import decimal
            if s.map(lambda v: isinstance(v, decimal.Decimal)).any():
                # Decimal output columns are driver-UNSAFE: the driver hashes
                # the exact representation (Spark parquet -> Decimal objects,
                # DuckDB .df() -> float64), so they can never hash-match even
                # when values are equal. Flag loudly instead of masking.
                print(f"  WARNING: decimal-typed column {c!r} — driver hash will fail; emit DOUBLE on both sides")
                df[c] = s.map(lambda v: str(v) if v is not None else None)
            else:
                df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata = single files; Spark-written twins (SkewGen) =
        # directories named <t>.parquet — glob those
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    import glob
    bad, ok, rows_only = [], [], []
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            bad.append((name, "NO SPARK OUTPUT"))
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            bad.append((name, f"oracle error: {e}"))
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            bad.append((name, f"columns: spark={list(g.columns)} duck={list(e.columns)}"))
            continue
        if len(g) != len(e):
            bad.append((name, f"rowcount: spark={len(g)} duck={len(e)}"))
            continue
        diffs = []
        for c in g.columns:
            a, b = g[c], e[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eqs = (a.astype(float).fillna(1e308) - b.astype(float).fillna(1e308)).abs() == 0
            else:
                eqs = (a.astype(str).where(~a.isna(), "<NA>") == b.astype(str).where(~b.isna(), "<NA>"))
            if not eqs.all():
                i = int((~eqs).idxmax())
                diffs.append(f"{c}: {int((~eqs).sum())} diffs, e.g. row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
        if diffs:
            bad.append((name, "; ".join(diffs[:3])))
        else:
            ok.append(name)
    for name in sorted(set(g.name for g in []) ):
        pass
    import os
    all_outs = {os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)}
    rows_only = sorted(all_outs - set(oracle))
    print(f"OK ({len(ok)}): {' '.join(ok)}")
    print(f"ROWS-ONLY ({len(rows_only)}): {' '.join(rows_only)}")
    if bad:
        print(f"FAIL ({len(bad)}):")
        for n, msg in bad:
            print(f"  {n}: {msg[:500]}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
