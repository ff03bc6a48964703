#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same testdata
parquet tables, and compare (columns sorted by name, rows sorted, values
exact; floats compared to 9 decimal places).

Usage: python3 tools/local_verify.py <sfDir> <outDir>
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def sort_key(row):
    # None-safe, mixed-type-safe total order (None sorts first per column)
    return tuple((v is None, str(type(v)), str(v)) for v in row)

def rows_of(cols, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [cols[i] for i in order]
    return sorted(
        (tuple(norm(c[j]) for c in cols) for j in range(len(cols[0]) if cols else 0)),
        key=sort_key,
    ), [names[i] for i in order]

def type_tag(t):
    """Normalized arrow type label. Deliberately distinguishes decimal from
    int64 (the driver's hasher does; Python value compare can't — Decimal(5)==5)
    while ignoring representation-only differences (string vs large_string,
    timestamp unit/tz)."""
    import pyarrow as pa
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_tag(t.value_type)}>"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)

def type_tags(tbl, names_sorted):
    return {n: type_tag(tbl.schema.field(n).type) for n in names_sorted}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        tbl = pq.read_table(res_dir)
        s_names = tbl.column_names
        s_cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        try:
            cur = con.execute(sql)
            o_names = [d[0] for d in cur.description]
            o_tbl = cur.fetch_arrow_table()
            o_cols = [o_tbl.column(i).to_pylist() for i in range(o_tbl.num_columns)]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        s_rows, s_sorted = rows_of(s_cols, s_names)
        o_rows, o_sorted = rows_of(o_cols, o_names)
        if s_sorted != o_sorted:
            print(f"FAIL {name}: schema {s_sorted} != {o_sorted}"); n_fail += 1; continue
        s_types, o_types = type_tags(tbl, s_sorted), type_tags(o_tbl, o_sorted)
        bad_types = {n: (s_types[n], o_types[n]) for n in s_sorted if s_types[n] != o_types[n]}
        if bad_types:
            print(f"FAIL {name}: column types differ (spark, oracle): {bad_types}")
            n_fail += 1; continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows {len(s_rows)} != {len(o_rows)}"); n_fail += 1
            for r in s_rows[:3]: print("  spark:", r)
            for r in o_rows[:3]: print("  duck :", r)
            continue
        diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        if diff:
            print(f"FAIL {name}: {len(diff)}/{len(s_rows)} rows differ; first:")
            for a, b in diff[:3]:
                print("  spark:", a); print("  duck :", b)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
