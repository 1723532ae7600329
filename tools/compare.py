#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle correctness gate:
for each <name>.parquet under OUTDIR, run oracle_sql.json[name] in DuckDB
over the sf tables, sort columns by name and rows by value, compare."""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"{name}: MISSING spark output"); fails += 1; continue
    try:
        got_rel = con.sql(f"SELECT * FROM parquet_scan('{res_dir}/*.parquet')")
        exp_rel = con.sql(sql)
        got, exp = got_rel.fetchdf(), exp_rel.fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"{name}: SCHEMA got {gc} want {ec}"); fails += 1; continue
    # dtype check at the DuckDB level, BEFORE pandas coercion (fetchdf
    # silently turns DECIMAL into float64 — the r6 evt_range_join_sql
    # blind spot). Modeled on the driver's observed behavior: integer
    # widths and DATE-vs-TIMESTAMP normalize away in its value hash
    # (23 such queries were fully green in r6), but DECIMAL vs DOUBLE is
    # representation-visible and fails — so families collapse, DECIMAL
    # stays its own family.
    def fam(t):
        t = str(t)
        if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            return "int"
        if t in ("FLOAT", "DOUBLE"):
            return "float"
        if t.startswith("DECIMAL"):
            return t  # exact precision/scale: any drift is hash-visible
        if t in ("DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE"):
            return "datetime"
        return t
    gt = dict(zip(got_rel.columns, (fam(t) for t in got_rel.types)))
    et = dict(zip(exp_rel.columns, (fam(t) for t in exp_rel.types)))
    dbad = [(c, gt[c], et[c]) for c in gc if gt[c] != et[c]]
    if dbad:
        print(f"{name}: DTYPES differ {dbad}"); fails += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[ec].sort_values(ec).reset_index(drop=True)
    if len(g) != len(e):
        print(f"{name}: ROWS got {len(g)} want {len(e)}"); fails += 1; continue
    ok = True
    for c in gc:
        gv, ev = g[c].tolist(), e[c].tolist()
        if gv != ev:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b
                   and not (a != a and b != b)][:3]
            if bad:
                print(f"{name}: VALUES col {c} diff e.g. {bad}")
                ok = False
    if not ok:
        fails += 1
    else:
        print(f"{name}: OK ({len(g)} rows)")
sys.exit(1 if fails else 0)
