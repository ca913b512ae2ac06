#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracleSql in
DuckDB over the sf tables, compare to the engine's Verify parquet dump.
Both sides are fetched through DuckDB (fetchall), columns sorted by
name, values compared exactly."""
import sys, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon_type(t):
    """Arrow type → canonical string. Normalizes differences the driver's
    gate is known to tolerate (Spark parquet timestamps are tz=UTC, DuckDB
    fetches naive timestamps; same instant, same hash) while keeping the
    ones it is sensitive to (decimal precision/scale, int vs float —
    the round-1 q04/q07/q13/q18/q24 failure class)."""
    s = str(t)
    if s.startswith("timestamp"):
        return "timestamp[us]"
    if s == "large_string":
        return "string"
    return s

def fetch(sql):
    schema = con.execute(sql).fetch_arrow_table().schema
    types = {f.name: canon_type(f.type) for f in schema}
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order],
            [tuple(r[i] for i in order) for r in rows],
            types)

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append(name); print(f"FAIL {name}: no engine output"); continue
    try:
        ecols, erows, etypes = fetch(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        ocols, orows, otypes = fetch(sql)
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {e}"); continue
    msgs = []
    if ecols != ocols:
        msgs.append(f"cols eng={ecols} ora={ocols}")
    elif etypes != otypes:
        diff = {c: (etypes.get(c), otypes.get(c))
                for c in set(etypes) | set(otypes)
                if etypes.get(c) != otypes.get(c)}
        msgs.append(f"types (eng, ora) differ: {diff}")
    elif len(erows) != len(orows):
        msgs.append(f"rows eng={len(erows)} ora={len(orows)}")
    else:
        for i, (er, orow) in enumerate(zip(erows, orows)):
            for c, (x, y) in zip(ecols, zip(er, orow)):
                # exact: same type-kind and equal value, str-render equal
                if str(x) != str(y) or (type(x).__name__ != type(y).__name__):
                    msgs.append(f"row {i} col {c}: eng={x!r}({type(x).__name__}) ora={y!r}({type(y).__name__})")
                    break
            if msgs:
                break
    print(("FAIL" if msgs else "OK  ") + f" {name} rows={len(erows)}")
    for m in msgs[:3]:
        print(f"     {m}")
    if msgs:
        fails.append(name)
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} OK")
sys.exit(1 if fails else 0)
