#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB over the sf parquet tables and compares against the engine's Verify
output (column-name-sorted, row-sorted, value-level). Dev tool only — the
shipped library is pure Scala/Spark.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    produced = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    npass = nfail = 0
    BIG = 200_000  # above this, compare inside DuckDB (no Python materialization)

    def compare_in_duckdb(name):
        """EXCEPT ALL both directions with round-9 on doubles AND decimals
        — mirroring canon(), but multithreaded and O(1) Python memory.
        Known residual edge vs canon(): Python round() is banker's
        (half-to-even) while DuckDB round() is half-away-from-zero, so a
        value landing EXACTLY on a 5 at the 10th digit can pass one path
        and fail the other; engine queries already pre-round outputs well
        inside 9 digits, so this never fires in practice.
        Returns (ok, n_rows, detail)."""
        con.execute(f"CREATE OR REPLACE TEMP TABLE __got AS SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        try:
            con.execute(f"CREATE OR REPLACE TEMP TABLE __exp AS {oracles[name]}")
        except Exception as e:
            return False, 0, f"oracle error {e}"
        gi = con.execute("PRAGMA table_info('__got')").fetchall()
        ei = con.execute("PRAGMA table_info('__exp')").fetchall()
        gcols = sorted((r[1], r[2]) for r in gi)
        ecols = sorted((r[1], r[2]) for r in ei)
        if [c for c, _ in gcols] != [c for c, _ in ecols]:
            return False, 0, f"columns {[c for c,_ in gcols]} != {[c for c,_ in ecols]}"
        # Floats: round-9 on DOUBLE (canon() parity). DECIMALs: cast to a
        # WIDE decimal with scale 9 — exact integer arithmetic up to 29
        # integer digits, so a wrong total beyond 2^53 still fails (a
        # DOUBLE cast would compare lossily there).
        def _sel(c, t):
            if t.upper() in ("DOUBLE", "FLOAT", "REAL"):
                return f'round(CAST("{c}" AS DOUBLE), 9) AS "{c}"'
            if t.upper().startswith("DECIMAL"):
                return f'CAST("{c}" AS DECIMAL(38, 9)) AS "{c}"'
            return f'"{c}"'
        sel = ", ".join(_sel(c, t) for c, t in gcols)
        n1 = con.execute(f"SELECT count(*) FROM (SELECT {sel} FROM __got EXCEPT ALL SELECT {sel} FROM __exp)").fetchone()[0]
        n2 = con.execute(f"SELECT count(*) FROM (SELECT {sel} FROM __exp EXCEPT ALL SELECT {sel} FROM __got)").fetchone()[0]
        ng = con.execute("SELECT count(*) FROM __got").fetchone()[0]
        ne = con.execute("SELECT count(*) FROM __exp").fetchone()[0]
        ok = n1 == 0 and n2 == 0 and ng == ne
        return ok, ng, None if ok else f"rows {ng} vs {ne}, asym diff {n1}/{n2}"

    for name in sorted(produced):
        if name in oracles:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            if n > BIG:
                ok, ng, detail = compare_in_duckdb(name)
                if ok:
                    print(f"PASS {name} ({ng} rows, in-db compare)")
                    npass += 1
                else:
                    print(f"FAIL {name}: {detail}")
                    nfail += 1
                continue
        got_rel = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        gcols = [d[0] for d in got_rel.description]
        grows = got_rel.fetchall()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(grows)} rows" + (" EMPTY!" if not grows else ""))
            continue
        try:
            exp_rel = con.execute(oracles[name])
            ecols = [d[0] for d in exp_rel.description]
            erows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            nfail += 1
            continue
        gc, gr = canon(gcols, grows)
        ec, er = canon(ecols, erows)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            nfail += 1
            continue
        if gr == er:
            print(f"PASS {name} ({len(gr)} rows)")
            npass += 1
        else:
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}")
            er_set, gr_set = set(er), set(gr)
            only_g = [r for r in gr if r not in er_set][:3]
            only_e = [r for r in er if r not in gr_set][:3]
            for r in only_g: print(f"   engine-only: {r}")
            for r in only_e: print(f"   oracle-only: {r}")
            nfail += 1
    missing = set(oracles) - produced
    for name in sorted(missing):
        print(f"MISSING output for declared oracle: {name}")
        nfail += 1
    print(f"== {npass} pass, {nfail} fail, {len(produced - set(oracles))} rows-only")
    return 1 if nfail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
