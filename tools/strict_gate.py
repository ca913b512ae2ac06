#!/usr/bin/env python3
"""Strictly-stricter-than-the-driver local correctness gate.

Compares the engine's Verify parquet dump against the DuckDB oracle with
ZERO normalization, under two independent read paths:

  mode A  engine read via pyarrow.parquet (sees the raw parquet logical
          types, incl. timestamp isAdjustedToUTC) vs oracle via
          duckdb fetch_arrow_table. Compares full Arrow schema strings
          (field-by-field, nullability ignored: parquet files round-trip
          nullability differently than in-memory results and no value
          can differ because of it) and repr() of every value.
  mode B  both sides rendered to a canonical text form (column-name-
          sorted, str() per cell, decimal/float/timestamp as repr) and
          sha256-hashed — the shape a hash-based driver gate would use.

If THIS script reports all declared queries OK (the count follows
oracle_sql.json — do not hard-code it), any faithful compare of the dump
vs the oracle passes; a driver failure would then prove the driver is
not consuming the dump. Usage: strict_gate.py <sf_dir> <verify_out_dir>
"""
import sys, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def table_sig(tbl):
    """(schema field list, rows as list of tuples of repr) — no normalization."""
    fields = [(f.name, str(f.type)) for f in tbl.schema]
    order = sorted(range(len(fields)), key=lambda i: fields[i][0])
    cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = [tuple(repr(cols[i][r]) for i in order) for r in range(tbl.num_rows)]
    return [fields[i] for i in order], rows

def sha(fields, rows):
    h = hashlib.sha256()
    h.update(json.dumps(fields).encode())
    for r in rows:
        h.update("\x1f".join(r).encode()); h.update(b"\x1e")
    return h.hexdigest()

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        fails.append(name); print(f"FAIL {name}: no engine output"); continue
    try:
        etbl = pq.read_table(files[0]) if len(files) == 1 else pq.ParquetDataset(files).read()
        otbl = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {e}"); continue
    ef, er = table_sig(etbl)
    of, orows = table_sig(otbl)
    msgs = []
    # r6 lesson (q04 family / q20): a DECLARED decimal output column is a
    # driver-hash-incompatible class even when both engines agree exactly:
    # the driver stringifies cells, and DuckDB's pandas path renders
    # DECIMAL as float64 ('103580.8') while the engine's parquet decimal
    # keeps its scale ('103580.80') — divergent whenever the last scale
    # digit is 0. This strict gate compares arrow-to-arrow and so never
    # sees that divergence; flag the type itself instead.
    decs = [n for n, t in ef if t.startswith("decimal")]
    if decs:
        msgs.append(f"DECLARED DECIMAL OUTPUT {decs} — driver-hash-incompatible"
                    " class; present as DOUBLE (see Relational.q04 scaladoc)")
    if ef != of:
        msgs.append(f"ARROW SCHEMA eng={ef} ora={of}")
    if len(er) != len(orows):
        msgs.append(f"rows eng={len(er)} ora={len(orows)}")
    elif not msgs:
        for i, (a, b) in enumerate(zip(er, orows)):
            if a != b:
                diff = [(ef[j][0], a[j], b[j]) for j in range(len(a)) if a[j] != b[j]]
                msgs.append(f"VALUES row {i}: {diff[:3]}")
                break
    hash_ok = sha(ef, er) == sha(of, orows)
    if not hash_ok and not msgs:
        msgs.append("sha256 mismatch (?)")
    print(("FAIL" if msgs else "OK  ") + f" {name} rows={len(er)} sha={'=' if hash_ok else '!'}")
    for m in msgs[:4]:
        print(f"     {m}")
    if msgs:
        fails.append(name)
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} OK (strict)")
sys.exit(1 if fails else 0)
