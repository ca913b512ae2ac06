#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracleSql in
DuckDB over the sf tables, compare to the engine's Verify parquet dump.
Both sides are fetched through DuckDB (fetchall), columns sorted by
name, values compared exactly.

Modes:
  default     — value/type compare with the known-tolerated timestamp-tz
                normalization (canon_type below).
  --strict    — ZERO normalization: sha256 over (full Arrow schema string
                + canonical value render) per side; any physical
                difference (tz annotation, large_string vs string,
                decimal precision) fails. Strictly stricter than the
                driver's gate, so a 33/33 here is a real green
                (round-2 verdict "What's wrong" #2: the old default mode
                could not fail where the driver's gate fails).
"""
import sys, json, glob, hashlib, decimal, datetime
import duckdb

args = [a for a in sys.argv[1:] if a != "--strict"]
STRICT = "--strict" in sys.argv[1:]
sf_dir, out_dir = args[0], args[1]
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
    if STRICT:
        return str(t)
    s = str(t)
    if s.startswith("timestamp"):
        return "timestamp[us]"
    if s == "large_string":
        return "string"
    return s

def render(v):
    """Canonical value render for the strict sha256 (type-tagged so that
    e.g. int 1 and decimal 1 can never collide)."""
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(render(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    return "s:" + str(v)

def fetch(sql):
    tbl = con.execute(sql).fetch_arrow_table()
    schema = tbl.schema
    types = {f.name: canon_type(f.type) for f in schema}
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    scols = [cols[i] for i in order]
    srows = [tuple(r[i] for i in order) for r in rows]
    sha = None
    if STRICT:
        h = hashlib.sha256()
        for c in scols:
            h.update(f"{c}::{types[c]}\n".encode())
        for r in srows:
            h.update(("\x1f".join(render(v) for v in r) + "\n").encode())
        sha = h.hexdigest()
    return scols, srows, types, sha

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append(name); print(f"FAIL {name}: no engine output"); continue
    try:
        ecols, erows, etypes, esha = fetch(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        ocols, orows, otypes, osha = fetch(sql)
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
        if not msgs and STRICT and esha != osha:
            msgs.append(f"strict sha mismatch eng={esha[:16]} ora={osha[:16]}")
    tag = "FAIL" if msgs else "OK  "
    sha_note = f" sha={esha[:12]}" if STRICT and not msgs else ""
    print(f"{tag} {name} rows={len(erows)}{sha_note}")
    for m in msgs[:3]:
        print(f"     {m}")
    if msgs:
        fails.append(name)
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} OK" + (" [strict]" if STRICT else ""))
sys.exit(1 if fails else 0)
