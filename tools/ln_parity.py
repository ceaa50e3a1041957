#!/usr/bin/env python3
"""Cross-engine ln-quantization parity check for the NLL nano-grid fold.

graft.LnParityProbe (test scope) dumps Spark-side readings for the two
argument families the text_*_nll model frames quantize:
  <out>_int: id, lnc_nano = CAST(round(ln(id)*1e9, 0) AS LONG), ln_raw
  <out>_mix: id, x in (0,1], nll_nano = CAST(round(-ln(x)*1e9, 0) AS LONG), ln_raw
This script recomputes both in DuckDB and reports (a) raw last-ulp ln
disagreements (expected: nonzero — the engines' libm differ) and (b)
grid disagreements after the 1e-9 rounding (required: ZERO — the grid
must absorb the ulp noise for the oracle compare to hold).

Usage: tools/ln_parity.py [target/ln_parity]
Exit nonzero on any grid disagreement.
"""
import sys, glob
import duckdb

def main(prefix="target/ln_parity"):
    con = duckdb.connect()
    bad = 0
    for fam, expr_nano, expr_raw in (
            ("int", "CAST(round(ln(id) * 1e9) AS BIGINT)", "ln(id)"),
            ("mix", "CAST(round(-ln(x) * 1e9) AS BIGINT)", "ln(x)")):
        files = glob.glob(f"{prefix}_{fam}/*.parquet")
        if not files:
            print(f"{fam}: no probe dump at {prefix}_{fam} "
                  f"(run: sbt 'Test/runMain graft.LnParityProbe')")
            bad += 1
            continue
        spark_nano = "lnc_nano" if fam == "int" else "nll_nano"
        grid, raw, n = con.execute(f"""
            WITH s AS (SELECT * FROM read_parquet('{files[0]}'))
            SELECT
              SUM(CASE WHEN {spark_nano} <> {expr_nano} THEN 1 ELSE 0 END),
              SUM(CASE WHEN ln_raw <> {expr_raw} THEN 1 ELSE 0 END),
              COUNT(*)
            FROM s""").fetchone()
        print(f"{fam}: n={n} raw_ulp_diffs={raw} ({100.0*raw/n:.2f}%) "
              f"grid_diffs={grid}")
        if grid:
            bad += 1
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
