#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [<jsonOut>]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle_sql.json query in DuckDB over the sf parquet tables,
and compares: row count, column names (sorted), and a hash of all
values (rows sorted, columns sorted by name).

With <jsonOut> given, also writes a machine-readable record in the
driver's CORRECTNESS shape — per query
{"rows_match": bool, "schema_match": bool, "hash_match": bool,
 "err": str|None} — so every round commits a SELF-PRODUCED parity
record (round 20, VERDICT r19 task 1: the round's correctness claim
must never again depend on a driver artifact that can arrive empty).

NOT part of the shipped library — dev-only harness mirroring the
driver, using the driver-side python stack.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, strip tz
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    errs_path = f"{out_dir}/errors.json"
    errs = json.load(open(errs_path)) if os.path.exists(errs_path) else {}
    n_pass = n_fail = 0
    record = {}

    def rec(name, rows=False, schema=False, hash_=False, err=None):
        record[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": hash_, "err": err}

    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            why = errs.get(name, "no spark output (not recorded as err — check Verify log)")
            print(f"ERR  {name}: {why[:200]}"); n_fail += 1
            rec(name, err=str(why)[:500]); continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            rec(name, err=str(e)[:500]); continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}"); n_fail += 1
            rec(name, rows=len(got) == len(want)); continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1
            rec(name, schema=True); continue
        ok = True
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            # The driver hashes canonical per-dtype string renderings, so an
            # int column on one engine vs float on the other (DuckDB HUGEINT
            # sums -> pandas float64) is a hard FAIL there — mirror that.
            if (a.dtype.kind in 'iu') != (b.dtype.kind in 'iu') and \
               (a.dtype.kind in 'iuf' and b.dtype.kind in 'iuf'):
                print(f"FAIL {name}: col {c} dtype mismatch "
                      f"spark={a.dtype} oracle={b.dtype} (int-vs-float hashes differ)")
                ok = False; break
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                same = np.array_equal(a.astype('float64'), b.astype('float64'), equal_nan=True)
            else:
                same = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
            if not same:
                mism = np.where(~(pd.Series(a).astype(str) == pd.Series(b).astype(str)))[0][:3]
                print(f"FAIL {name}: col {c} differs at rows {mism.tolist()}"
                      f" got={a[mism][:3]} want={b[mism][:3]}")
                ok = False; break
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            rec(name, rows=True, schema=True, hash_=True)
        else:
            n_fail += 1
            rec(name, rows=True, schema=True)
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": record}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
