#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf parquet tables, and
compares: row count, column names, values (doubles at 1e-9 rel tolerance,
exact otherwise), after sorting columns by name and rows by all columns.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to naive ns, categoricals to str
    import datetime
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (datetime.date, datetime.datetime)) or v is None).all() \
                and df[c].notna().any():
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

# Driver-compare contract, calibrated against CORRECTNESS_r08:
#   - float values: last-ulp diffs PASS the driver (its hasher rounds), so
#     compare at 1e-9 relative tolerance;
#   - types: int vs float vs Decimal vs str vs bool are DISTINCT (9 r08
#     queries failed on exactly this), but date vs timestamp are one family.
def values_match(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or abs(af - bf) <= 1e-9 * max(abs(af), abs(bf), 1.0)
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(values_match(x, y) for x, y in zip(a, b))
    return a == b

def compare(name, spark_df, duck_df):
    errs = []
    raw_s, raw_d = spark_df.copy(), duck_df.copy()
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return [f"columns differ: spark={list(s.columns)} duck={list(d.columns)}"]
    if len(s) != len(d):
        return [f"row count differs: spark={len(s)} duck={len(d)}"]
    # The driver hashes typed values: int64 5 vs float64 5.0 vs Decimal('5')
    # vs date vs str all hash differently. Compare dtype *kinds* so a local
    # pass implies a driver pass.
    def kind(col):
        k = col.dtype.kind
        if k == "O":
            nn = col.dropna()
            if not len(nn):
                return "O:empty"
            # driver canonicalizes the whole date/timestamp family together;
            # inspect ALL non-null values so a heterogeneous column (Decimal
            # in row 0, float later) is flagged rather than slipping past.
            ts = {type(v).__name__ for v in nn}
            ts = {"dt" if t in ("date", "datetime", "Timestamp") else t for t in ts}
            if len(ts) > 1:
                return "O:mixed{" + ",".join(sorted(ts)) + "}"
            t = next(iter(ts))
            return t if t == "dt" else f"O:{t}"
        return {"i": "int", "u": "int", "f": "float", "b": "bool",
                "M": "dt", "m": "td"}.get(k, k)
    for c in s.columns:
        ks, kd = kind(raw_s[c]), kind(raw_d[c])
        if ks != kd:
            errs.append(f"col {c}: dtype kind differs: spark={ks}({raw_s[c].dtype}) duck={kd}({raw_d[c].dtype})")
    if errs:
        return errs
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(sv, dv)) if not values_match(x, y)]
        if bad:
            i, x, y = bad[0]
            errs.append(f"col {c}: {len(bad)} mismatches, first row {i}: spark={x!r} duck={y!r}")
    return errs

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    qdirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for qd in qdirs:
        name = os.path.basename(qd)
        files = glob.glob(f"{qd}/*.parquet")
        if not files:
            results[name] = ["no spark output parquet"]
            continue
        spark_df = pq.ParquetDataset(files).read().to_pandas()
        if name not in oracles:
            results[name] = [] if len(spark_df) > 0 else ["rows-only check: 0 rows"]
            results[name] and None
            print(f"  {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            # Arrow path (not fetchdf): preserves DECIMAL as Decimal objects,
            # DATE as date objects, and surfaces HUGEINT (sum of BIGINT!) as
            # Decimal — the type lens the driver's hasher sees. fetchdf
            # flattens all of those to float64 and hides driver-side
            # type mismatches (the round-8 lesson: 9 queries passed locally
            # and failed the driver on exactly this).
            duck_df = con.execute(oracles[name]).arrow().to_pandas()
        except Exception as e:
            results[name] = [f"oracle SQL failed: {e}"]
            continue
        results[name] = compare(name, spark_df, duck_df)
    n_ok = sum(1 for v in results.values() if not v)
    print(f"\n== {n_ok}/{len(results)} queries match ==")
    for name, errs in sorted(results.items()):
        status = "OK " if not errs else "FAIL"
        print(f"[{status}] {name}")
        for e in errs:
            print(f"       {e}")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
