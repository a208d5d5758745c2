#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate (SURVEY.md §5.2 t2).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
<sfDir> parquet tables; compares row count, column names (sorted), and
canonicalized values. Mirrors SURVEY.md §5.3: floats %.4f (strict: -0.0000
is NOT normalized — the driver's canonicalizer distinguishes it, r8
postmortem), NULL literal, timestamps µs, columns sorted by name.

Driver-strength hard checks beyond value compare (VERDICT r8 #2):
 - any DECIMAL-typed column in a Spark result parquet FAILS the entry
   (Spark types BIGINT*1.0 as DECIMAL while DuckDB yields DOUBLE; use
   1e0 literals — the r8 x246/x247/x262/x268 mechanism);
 - any float cell equal to IEEE -0.0 on the Spark side FAILS the entry
   (sign-unstable mathematically-zero outputs must be quantized or
   normalized with `+ 0e0`, the x214 mechanism).
"""
import sys, json, glob, datetime, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def knife_edge(v):
    """SURVEY §5.4 hazard #1: a float whose 4-decimal rounding sits on a
    half boundary (|frac(x*1e4) - 0.5| < 1e-6) — the two engines' float
    accumulation orders can legally round it apart (the q15 10x-soak
    near-miss). Surfaced as a warning BEFORE the driver's gate trips."""
    if not isinstance(v, float) or math.isnan(v) or math.isinf(v):
        return False
    frac = abs(v * 10000.0) % 1.0
    return abs(frac - 0.5) < 1e-6

def near_zero(v):
    """SURVEY §5.4 hazard #2 (r8 x214 postmortem): an output that is
    mathematically zero but computed as a float residue has an
    accumulation-order-dependent SIGN — it legally rounds to -0.0000 in
    one engine and 0.0000 in the other. Flag any tiny-but-nonzero float
    so sign-unstable zeros surface as warnings before the driver trips."""
    if not isinstance(v, float) or math.isnan(v) or math.isinf(v):
        return False
    return v != 0.0 and abs(v) < 5e-5

def neg_zero(v):
    return isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0

def canon(v):
    if v is None: return "NULL"
    # pandas NULL timestamps surface as NaT (not None) — strftime would
    # throw. Queries avoid bare NULL timestamps via sentinels (x142), but
    # the tool shouldn't crash on one either.
    if v != v and not isinstance(v, float): return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        # STRICT: -0.0000 stays distinct (the driver distinguishes it);
        # a Spark-side -0.0 additionally hard-fails the entry below.
        return f"{v:.4f}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool): return "true" if v else "false"
    return str(v)

def run(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # <t>.parquet is either a single file (driver corpus) or a
        # directory of part files (re-materialized 10x corpus)
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_edge = n_zero = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            # fetchdf (pandas) on BOTH sides, mirroring the driver's compare
            # path: DuckDB HUGEINT (e.g. sum(INTEGER)) becomes float64 in
            # pandas, so an uncast integer sum canonicalizes as "1435.0000"
            # vs Spark's BIGINT "1435" — the r1 x51/x58 hash failures.
            # fetchall() hides this (HUGEINT -> python int).
            ref_df = con.execute(sql).fetchdf()
            ref_cols = list(ref_df.columns)
            ref = list(ref_df.itertuples(index=False, name=None))
            got_df = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
            got_cols = list(got_df.columns)
            got = list(got_df.itertuples(index=False, name=None))
            # hard check (a): the Spark result's PHYSICAL schema must be
            # decimal-free — the driver canonicalizes DECIMAL columns
            # differently from DOUBLE (r8 x246/x247/x262/x268).
            phys = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()
            dec = [f"{c[0]}:{c[1]}" for c in phys if "DECIMAL" in str(c[1])]
            if dec:
                print(f"FAIL {name}: DECIMAL-typed Spark output "
                      f"({', '.join(dec)}) — use 1e0 literals or cast AS DOUBLE")
                n_fail += 1; continue
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(ref_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols oracle={sorted(ref_cols)} spark={sorted(got_cols)}")
            n_fail += 1; continue
        if len(ref) != len(got):
            print(f"FAIL {name}: rows oracle={len(ref)} spark={len(got)}")
            n_fail += 1; continue
        # driver sorts columns by name before hashing
        rperm = sorted(range(len(ref_cols)), key=lambda i: ref_cols[i])
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        bad = None
        edges = 0
        zeros = 0
        negz = 0
        onegz = 0
        try:
            for i, (r, g) in enumerate(zip(ref, got)):
                edges += sum(1 for j in rperm if knife_edge(r[j]))
                edges += sum(1 for j in gperm if knife_edge(g[j]))
                zeros += sum(1 for j in rperm if near_zero(r[j]))
                zeros += sum(1 for j in gperm if near_zero(g[j]))
                # hard check (b): Spark-side IEEE -0.0 — a sign-unstable
                # mathematically-zero output (r8 x214); quantize it or
                # normalize with `+ 0e0` in the query.
                negz += sum(1 for j in gperm if neg_zero(g[j]))
                # oracle-side -0.0 (r10 x259 catch at sf0.1): DuckDB's
                # accumulation order can round a mathematically-zero
                # residue to -0.0000 where Spark lands +0.0000 — same
                # defect class, opposite engine. Warn (the fix is a
                # `+ 0e0` normalizer in BOTH dialects).
                onegz += sum(1 for j in rperm if neg_zero(r[j]))
                rc = tuple(canon(r[j]) for j in rperm)
                gc = tuple(canon(g[j]) for j in gperm)
                if rc != gc and bad is None:
                    bad = (i, rc, gc)
        except Exception as e:
            # canonicalization crash (e.g. an unforeseen dtype) must fail
            # THIS query, not abort the remaining inventory
            print(f"FAIL {name}: canon error {e}"); n_fail += 1; continue
        if edges:
            print(f"WARN {name}: {edges} knife-edge rounding value(s) "
                  f"(|frac(x*1e4)-0.5| < 1e-6) — hash may legally diverge")
            n_edge += 1
        if zeros:
            print(f"WARN {name}: {zeros} near-zero float(s) (0<|x|<5e-5) — "
                  f"sign-unstable if mathematically zero; consider quantizing")
            n_zero += 1
        if onegz:
            print(f"WARN {name}: {onegz} ORACLE-side -0.0 cell(s) — "
                  f"normalize both dialects with `+ 0e0` (r10 x259 class)")
            n_zero += 1
        if negz:
            print(f"FAIL {name}: {negz} Spark-side -0.0 cell(s) — "
                  f"normalize with `+ 0e0` or emit integer micro-units")
            n_fail += 1; continue
        if bad:
            i, rc, gc = bad
            print(f"FAIL {name}: row {i} oracle={rc} spark={gc}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ref)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_edge} knife-edge warn / {n_zero} near-zero warn ==")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if run(sys.argv[1], sys.argv[2]) else 0)
