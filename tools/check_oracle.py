#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool, not engine code).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by `sbt "runMain graft.Verify <sf> <out>"`,
runs the matching oracle_sql.json query in DuckDB over the same sf tables, and
compares row-by-row after sorting columns by name and rows by value (mirrors
the driver: sorted-column value hash).
"""
import json
import decimal
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        # Keep Decimal distinct from int/float: the driver hashes typed
        # values, so a DuckDB HUGEINT (sum(INT) without CAST ... AS BIGINT)
        # must FAIL here too, not compare equal via Python's Decimal == int.
        return "dec:" + str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def norm_type(t):
    """Normalize an Arrow type to the driver's hash granularity.

    The driver's hash is type-sensitive down to decimal precision/scale and
    integer width; the ONLY divergence it forgives (proven by passing
    q80/q168 in round 10) is the timestamp unit (Spark parquet = us/ns vs
    DuckDB = us) and tz annotation. Everything else must match exactly.
    """
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    return str(t)


def type_diffs(got_tbl, exp_tbl, cols):
    diffs = []
    gs, es = got_tbl.schema, exp_tbl.schema
    for c in cols:
        gt = norm_type(gs.field(c).type)
        et = norm_type(es.field(c).type)
        if gt != et:
            diffs.append(f"{c}: got {gt} != exp {et}")
    return diffs


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_tbl = pq.read_table(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        gcols = sorted(got_tbl.column_names)
        ecols = sorted(exp_tbl.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        tdiffs = type_diffs(got_tbl, exp_tbl, gcols)
        if tdiffs:
            print(f"FAIL {name}: output type drift (driver hash is "
                  f"type-sensitive): {'; '.join(tdiffs)}")
            n_fail += 1
            continue
        # Round-11 lesson (VERDICT.md): the driver's hash canonicalizes
        # DECIMAL cells scale-insensitively on one side only, so ANY decimal
        # output column is driver-incompatible even when both engines agree
        # value- and type-exactly. Forbid the class outright.
        dec_cols = [c for c in gcols
                    if "decimal" in str(got_tbl.schema.field(c).type).lower()
                    or "decimal" in str(exp_tbl.schema.field(c).type).lower()]
        if dec_cols:
            print(f"FAIL {name}: driver-incompatible DECIMAL output column(s) "
                  f"{dec_cols} — cast to DOUBLE in both plans "
                  f"(see DriverOutput.noDecimals)")
            n_fail += 1
            continue
        got = sorted((tuple(norm(r[c]) for c in gcols) for r in got_tbl.to_pylist()),
                     key=repr)
        exp = sorted((tuple(norm(r[c]) for c in ecols) for r in exp_tbl.to_pylist()),
                     key=repr)
        if got == exp:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  first diff at sorted row {i}:\n   got {g}\n   exp {e}")
                    break
            else:
                tag = "got" if len(got) > len(exp) else "exp"
                extra = (got if len(got) > len(exp) else exp)[min(len(got), len(exp))]
                print(f"  extra {tag} row: {extra}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
