#!/usr/bin/env python3
"""Driver-compare simulation: for each query result parquet written by
graft.Verify, run the matching oracle SQL in DuckDB over the same sf tables
and compare (schema by sorted column names, values by row-sorted hash).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, hashlib
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Result types that survive duckdb's python fetchall() as plain ints but turn
# into decimal128/float64 when fetched through arrow/pandas (the driver path).
# An oracle query outputting one of these hash-mismatches on the driver even
# when every value is bit-identical — fail loudly here instead.
BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

def banned_cols(con, sql):
    desc = con.sql(f"DESCRIBE ({sql})").fetchall()
    return [(name, typ) for name, typ, *_ in desc
            if any(b in typ.upper() for b in BANNED_TYPES)]

def canon(val):
    if isinstance(val, float):
        # repr gives shortest round-trip; distinguishes any bit difference
        return repr(val)
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return repr(val)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_bad += 1; continue
        try:
            leaks = banned_cols(con, sql)
            if leaks:
                print(f"FAIL {name}: oracle type leak (driver-visible): "
                      + ", ".join(f"{c}:{t}" for c, t in leaks)
                      + " — CAST to BIGINT/DOUBLE in the oracle SQL")
                n_bad += 1; continue
            actual = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            a_cols = [c for c in actual.columns]
            a_rows = actual.fetchall()
            # fetch the oracle through arrow to mirror the driver's typed path
            e_tab = con.sql(sql).arrow()
            e_cols = e_tab.column_names
            e_rows = [tuple(d[c] for c in e_cols) for d in e_tab.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}"); n_bad += 1; continue
        if sorted(a_cols) != sorted(e_cols):
            print(f"FAIL {name}: cols spark={sorted(a_cols)} oracle={sorted(e_cols)}")
            n_bad += 1; continue
        if len(a_rows) != len(e_rows):
            print(f"FAIL {name}: rows spark={len(a_rows)} oracle={len(e_rows)}")
            n_bad += 1; continue
        ha, he = table_hash(a_cols, a_rows), table_hash(e_cols, e_rows)
        if ha != he:
            print(f"FAIL {name}: hash mismatch ({len(a_rows)} rows)")
            # show first differing row for debugging
            oa = sorted(range(len(a_cols)), key=lambda i: a_cols[i])
            oe = sorted(range(len(e_cols)), key=lambda i: e_cols[i])
            sa = sorted("|".join(canon(r[i]) for i in oa) for r in a_rows)
            se = sorted("|".join(canon(r[i]) for i in oe) for r in e_rows)
            for x, y in zip(sa, se):
                if x != y:
                    print(f"  cols : {sorted(a_cols)}")
                    print(f"  spark: {x[:300]}")
                    print(f"  duck : {y[:300]}")
                    break
            n_bad += 1; continue
        print(f"OK   {name} ({len(a_rows)} rows)")
        n_ok += 1
    # rows-only queries (no oracle)
    for res_dir in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(res_dir)
        if name in oracle or not os.path.isdir(res_dir):
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM '{res_dir}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
        except Exception as e:
            print(f"ROWS {name}: ERR {str(e).splitlines()[0]}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
