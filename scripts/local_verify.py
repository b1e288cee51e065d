#!/usr/bin/env python3
"""Local pre-check of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in <outDir>, executes the matching oracle SQL from
oracle_sql.json in DuckDB over the same sf tables and compares
(rows, schema names, values) with rows+columns sorted — approximating the
driver's hash-match. Usage: python3 scripts/local_verify.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    qdirs = sorted(d for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d))
    for qd in qdirs:
        name = os.path.basename(qd)
        try:
            got = con.execute(f"SELECT * FROM '{qd}/*.parquet'").fetchdf()
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)" + (" EMPTY!" if len(got)==0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        g = got.reindex(sorted(got.columns), axis=1)
        e_ = exp.reindex(sorted(exp.columns), axis=1)
        if list(g.columns) != list(e_.columns):
            results[name] = f"SCHEMA-MISMATCH got={list(g.columns)} exp={list(e_.columns)}"
            continue
        if len(g) != len(e_):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e_)}"
            continue
        g = g.sort_values(by=list(g.columns), ignore_index=True)
        e_ = e_.sort_values(by=list(e_.columns), ignore_index=True)
        bad = []
        for c in g.columns:
            gv, ev = g[c], e_[c]
            if str(gv.dtype) != str(ev.dtype):
                bad.append(f"{c}: dtype {gv.dtype} vs {ev.dtype}")
            try:
                # NB: Series.where(cond, None) fills NaN (None = default),
                # so nulls must be replaced via a sentinel object instead
                NULL = object()
                neq = (gv.astype(object).mask(gv.isna(), NULL) !=
                       ev.astype(object).mask(ev.isna(), NULL))
                n_bad = int(neq.sum())
                if n_bad:
                    i = neq[neq].index[0]
                    bad.append(f"{c}: {n_bad} diffs e.g. [{i}] {gv[i]!r} vs {ev[i]!r}")
            except Exception as ex:
                bad.append(f"{c}: compare error {ex}")
        results[name] = "OK" if not bad else "VALUES: " + "; ".join(bad[:3])
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only ("))
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
