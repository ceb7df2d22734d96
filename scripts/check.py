#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name> parquet (Spark result) against DuckDB
running oracle_sql.json[name] over <sfDir>/*.parquet. Sorts columns by
name and rows by all columns, then compares cell values exactly.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cells to comparable primitives BEFORE sorting — an
    # ndarray/list/dict cell is unhashable and crashes sort_values
    # (the driver comparator's vec_pq failure mode in round 11); the
    # catalog contract now bans such outputs, but the local gate should
    # diagnose rather than crash if one slips through.
    def norm(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)
    df = df.map(norm)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
        elif not got.equals(want):
            diff = (got != want).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())} differing rows, e.g.")
            for i in idx:
                print(f"  spark: {got.loc[i].to_dict()}")
                print(f"  duck : {want.loc[i].to_dict()}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    # rows-only queries (no oracle): rows > 0 AND, when a committed
    # golden hash exists for this scale factor, the canonical output
    # hash must match it — the determinism sweeps prove these outputs
    # are bit-reproducible, so a hash drift means a semantic
    # regression, not noise. Regenerate after an intentional change:
    #   python3 scripts/check.py <sfDir> <outDir> --write-golden
    import hashlib
    golden_path = os.path.join(os.path.dirname(__file__), "golden_hashes.json")
    write_golden = "--write-golden" in sys.argv
    sf_key = os.path.basename(sf_dir.rstrip("/"))
    golden = {}
    if os.path.exists(golden_path):
        golden = json.load(open(golden_path))
    new_golden = {}
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name} (rows-only: no output)")
            n_bad += 1
            continue
        df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        nrows = len(df)
        digest = hashlib.sha256(
            df.to_csv(index=False).encode("utf-8")).hexdigest()[:16]
        new_golden[name] = digest
        want = golden.get(sf_key, {}).get(name)
        if nrows == 0:
            print(f"FAIL {name} (rows-only: 0 rows)")
            n_bad += 1
        elif want is not None and not write_golden and digest != want:
            print(f"FAIL {name} (rows-only: hash {digest} != golden {want})")
            n_bad += 1
        else:
            tag = "golden" if want is not None or write_golden else "no-golden"
            print(f"ok   {name} (rows-only: {nrows} rows, {tag} {digest})")
            n_ok += 1
    if write_golden:
        golden[sf_key] = new_golden
        json.dump(golden, open(golden_path, "w"), indent=1, sort_keys=True)
        print(f"\nwrote {len(new_golden)} golden hashes for {sf_key} -> {golden_path}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
