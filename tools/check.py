#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs DuckDB oracle SQL against the fixture parquet tables and compares
with the parquet dumps Verify.scala wrote. Compare discipline mirrors
the driver: sort columns by name, then compare row-by-row values (rows
sorted by all columns as a safety net). Dev tooling only — the shipped
Scala library has no Python dependency.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import decimal, json, math, sys

import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_type(t):
    """Collapse an arrow type to the equivalence class the driver's
    dtype-sensitive hash sees after pandas conversion. Integer widths
    collapse (pandas upcasts int8..int64 to int64 — r3 evidence: Spark
    INT vs DuckDB BIGINT queries hash green), but DuckDB HUGEINT
    arrives as decimal128(38,0), which pandas keeps as object/Decimal
    and the driver hash rejects — the exact r3 llm_text_stats failure.
    Decimal WIDTHS collapse too: pandas keeps every decimal as a python
    Decimal whose ==/hash are numeric, so decimal(38,2) vs decimal(22,2)
    with equal values is green for the driver (DuckDB SUM over DECIMAL
    always widens to precision 38 — width-strictness here would fail
    locally where the driver passes). Floats stay width-strict."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_floating(t):
        return str(t)
    return str(t)


def fetch(cur):
    """Fetch a cursor as (cols, type-class list, row tuples) via arrow so
    dtypes are visible. Rows AND types are extracted POSITIONALLY (column
    arrays zipped / schema types listed), never via name-keyed dicts —
    duplicate output column names would silently collapse there and mask
    a real value or dtype mismatch. Arrow's to_pylist restores
    Decimal/datetime python values that norm() already knows how to
    canonicalize."""
    tbl = cur.arrow()
    cols = tbl.column_names
    types = [norm_type(t) for t in tbl.schema.types]
    rows = list(zip(*(c.to_pylist() for c in tbl.columns))) if cols else []
    return cols, types, rows


def norm(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def canon(cols, types, rows):
    """Reorder columns by name (the driver's compare discipline),
    carrying dtypes along positionally. sorted() is stable, so duplicate
    column names keep their relative order on both sides."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], [types[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            o_cols, o_types, o_rows = fetch(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            g_cols, g_types, g_rows = fetch(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            continue
        # The driver's pandas compare crashes on array/map-typed cells
        # ("unhashable type: numpy.ndarray"); reject them here so the
        # local gate can never pass where the driver fails.
        bad_cols = {g_cols[i] for r in g_rows for i, v in enumerate(r)
                    if isinstance(v, (list, dict))}
        bad_cols |= {o_cols[i] for r in o_rows for i, v in enumerate(r)
                     if isinstance(v, (list, dict))}
        if bad_cols:
            print(f"FAIL {name}: complex-typed output columns "
                  f"{sorted(bad_cols)} — driver harness cannot hash these; "
                  "serialize to strings or explode to scalar rows")
            n_bad += 1
            continue
        oc, ot_sorted, orows = canon(o_cols, o_types, o_rows)
        gc, gt_sorted, grows = canon(g_cols, g_types, g_rows)
        if oc != gc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={gc}")
            n_bad += 1
            continue
        mism = [(c, ot, st) for c, ot, st in zip(oc, ot_sorted, gt_sorted)
                if ot != st]
        if mism:
            detail = ", ".join(f"{c}: oracle {ot} vs spark {st}"
                               for c, ot, st in mism)
            print(f"FAIL {name}: dtype mismatch ({detail}) — the driver's "
                  "hash is dtype-sensitive; CAST the oracle to the Spark "
                  "type")
            n_bad += 1
            continue
        if orows == grows:
            print(f"OK   {name} ({len(orows)} rows)")
            n_ok += 1
            continue
        # Retry order-insensitively to distinguish order vs value bugs.
        if sorted(map(str, orows)) == sorted(map(str, grows)):
            print(f"WARN {name}: values match but ROW ORDER differs")
            n_bad += 1
            continue
        print(f"FAIL {name}: values differ (oracle {len(orows)} rows, "
              f"spark {len(grows)} rows)")
        shown = 0
        oset, gset = set(map(str, orows)), set(map(str, grows))
        for r in orows:
            if str(r) not in gset and shown < 3:
                print(f"  oracle-only: {r}")
                shown += 1
        shown = 0
        for r in grows:
            if str(r) not in oset and shown < 3:
                print(f"  spark-only:  {r}")
                shown += 1
        # Persist the full diff (capped) as a round artifact so a
        # flaky driver-side hash mismatch leaves an inspectable trail
        # instead of a bare flag. Per-column mismatch counts are
        # computed over positionally aligned rows when the row counts
        # match — that names the offending COLUMN even when the
        # row-set diff is huge.
        diff = {"query": name, "columns": oc,
                "oracle_rows": len(orows), "spark_rows": len(grows),
                "oracle_only": [list(map(str, r)) for r in orows
                                if str(r) not in gset][:50],
                "spark_only": [list(map(str, r)) for r in grows
                               if str(r) not in oset][:50]}
        if len(orows) == len(grows):
            col_mism = {}
            for a, b in zip(orows, grows):
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        col_mism[oc[i]] = col_mism.get(oc[i], 0) + 1
            diff["per_column_mismatches"] = col_mism
        with open(f"{out_dir}/DIFF_{name}.json", "w") as f:
            json.dump(diff, f, indent=1)
        print(f"  full diff -> {out_dir}/DIFF_{name}.json")
        n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
