#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
testdata parquet tables, sorts columns by name, and compares values
exactly (row count, schema-ish, cell values).
"""
import json
import math
import os
import sys
import threading

import duckdb
import pandas as pd

# Optional per-oracle-query wall cap (seconds). Unset/0 = no cap (the
# driver's behavior). Used by the sf10 decade sweep, where a handful of
# ORACLE formulations are quadratic (e.g. the n-squared cosine self-
# join) even though the Spark side is blocked/indexed — a TIMEOUT row
# records "oracle intractable at this scale", distinct from FAIL.
ORACLE_TIMEOUT_SEC = float(os.environ.get("GRAFT_ORACLE_TIMEOUT_SEC", "0") or 0)

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver: sort columns by name, then sort ROWS by all
    columns (this is where the driver crashes on array-valued columns —
    we deliberately let the same crash surface here), then re-index."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cell_eq(a, b) -> bool:
    """STRICT canonical comparison, matching the driver's value hashing.

    No float coercion: a Spark DECIMAL read back as decimal.Decimal
    ('123.456000') must NOT equal DuckDB's float64 123.456 — the driver
    hashes canonical representations and sees those as different, so the
    local gate must too (round-1 lesson: local green was a lie for all
    11 decimal-projecting queries)."""
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single parquet FILES; Spark-generated scale-up
        # dirs (graft.ScaleUp) are DIRECTORIES of part files - glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = n_timeout = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            # Per-query cursor closes the cancel/fire race STRUCTURALLY:
            # the timer interrupts a connection that no other query will
            # ever run on, so a timer that fires after fetchdf() returns
            # (the window the old Event guard narrowed but could not
            # close) interrupts a cursor that is closed on the next line
            # — it cannot abort the NEXT query. Cursors share the parent
            # connection's catalog, so the table views stay visible.
            timer = None
            qcon = con
            if ORACLE_TIMEOUT_SEC > 0:
                qcon = con.cursor()

                def _interrupt(c=qcon):
                    try:
                        c.interrupt()
                    except Exception:
                        pass  # cursor already closed — the query won

                timer = threading.Timer(ORACLE_TIMEOUT_SEC, _interrupt)
                timer.start()
            try:
                exp = canon(qcon.execute(sql).fetchdf())
            finally:
                if timer is not None:
                    timer.cancel()
                if qcon is not con:
                    qcon.close()
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"TIMEOUT {name}: oracle exceeded {ORACLE_TIMEOUT_SEC:.0f}s "
                      "(oracle-side cost, recorded separately from FAIL)")
                n_timeout += 1
                continue
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        # fast path: strict pandas equality (same dtypes, same values,
        # NaN==NaN like cell_eq) — sound because equal-and-same-dtype
        # implies cell_eq cell-wise; anything else falls through to the
        # exact per-cell walk (needed at sf10 where 500k-row outputs
        # make the pure-python walk the dominant gate cost)
        if got.equals(exp):
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cell_eq(got[c].iloc[i], exp[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], exp[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    tail = f", {n_timeout} oracle-timeout" if n_timeout else ""
    print(f"\n{n_pass} pass, {n_fail} fail{tail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
