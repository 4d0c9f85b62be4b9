#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

Reads each <verify_out_dir>/<name>/ parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB against the sf_dir tables,
and compares: schema (column names), row count, and values (columns
sorted by name, rows sorted by all columns, exact compare; floats
compared to 1e-9 relative so we can SEE near-misses distinctly from
hard mismatches — the real driver may be stricter, aim for exact).
"""
import json, math, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        return ("f", v)
    return v

# Column types that hash-mismatch in the REAL driver even when values are
# equal: the driver loads the oracle via DuckDB->pandas (DECIMAL/HUGEINT ->
# float64) but reads Spark parquet so decimals stay python Decimal objects;
# LIST/STRUCT columns break pandas sort_values (unhashable numpy arrays).
# Final outputs must be DOUBLE/BIGINT/STRING/DATE only.
HAZARD = ("DECIMAL", "HUGEINT", "STRUCT", "[]")

def hazards(rel, side):
    out = []
    for c, t in zip(rel.columns, [str(t) for t in rel.types]):
        if any(h in t for h in HAZARD):
            out.append(f"{side}.{c}:{t}")
    return out

def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    rows = [tuple(r[i] for i in order) for r in data]
    return sorted(cols), rows

def cmp_rows(a, b):
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    try:
        a = sorted(a, key=lambda r: tuple(str(x) for x in r))
        b = sorted(b, key=lambda r: tuple(str(x) for x in r))
    except Exception as e:
        return f"sort failed: {e}"
    exact = True
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return f"row {i}: arity {len(ra)} vs {len(rb)}"
        for j, (x, y) in enumerate(zip(ra, rb)):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12):
                    exact = False
                    continue
            return f"row {i} col {j}: {x!r} vs {y!r}"
    return "OK" if exact else "OK (float-close, not bit-exact)"

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name:28s} NO SPARK OUTPUT"); n_bad += 1; continue
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        haz = hazards(spark_rel, "spark")
        if name in oracle:
            try:
                haz += hazards(con.sql(oracle[name]), "oracle")
            except Exception:
                pass
        if haz:
            print(f"{name:28s} DRIVER-HAZARD TYPES: {', '.join(haz)}")
            n_bad += 1
            continue
        scols, srows = rows_of(spark_rel)
        if name not in oracle:
            print(f"{name:28s} rows-only: {len(srows)} rows "
                  f"{'OK' if len(srows) > 0 else 'EMPTY!'}")
            n_ok += len(srows) > 0; n_bad += len(srows) == 0
            continue
        try:
            ocols, orows = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"{name:28s} ORACLE SQL ERROR: {e}"); n_bad += 1; continue
        if scols != ocols:
            print(f"{name:28s} SCHEMA MISMATCH spark={scols} oracle={ocols}")
            n_bad += 1; continue
        verdict = cmp_rows(srows, orows)
        print(f"{name:28s} {verdict}  ({len(srows)} rows)")
        # the real driver hashes values EXACTLY: float-close is a failure
        if verdict == "OK": n_ok += 1
        else: n_bad += 1
    # completeness sweep: a query that THREW inside graft.Verify writes
    # no output dir and would otherwise vanish from this report entirely
    # (the only trace being a "[verify] <name> failed" stderr line in a
    # log nobody greps). Ground truth is Verify's selected_queries.json
    # (EVERY selected name, including rows-only queries with no oracle
    # SQL — ADVICE r14 #1); fall back to oracle keys for dumps from
    # pre-r15 Verify builds that didn't emit the list.
    sel_path = f"{out_dir}/selected_queries.json"
    expected = (set(json.load(open(sel_path))) if os.path.exists(sel_path)
                else set(oracle))
    for name in sorted(expected - set(names)):
        print(f"{name:28s} MISSING SPARK OUTPUT (query failed in Verify?)")
        n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
