#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/queries/Snapshots.scala.

For each named query, reads its result parquet from a `graft.Verify` dump
(run at the gate scale factor, sf0.01) and emits a constant DuckDB
`VALUES` oracle pinning the exact output — the same pattern as the
hand-written w2_marker_pages snapshot. Only DETERMINISTIC queries belong
here; if one of them intentionally changes, re-run:

    sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
    python3 scripts/gen_snapshots.py /tmp/verify_out

Usage: gen_snapshots.py <verify_out_dir>
"""
import sys, os
import duckdb

QUERIES = [
    "c5_json_partition",
    "d2_minhash_pairs",
    "d3_simhash_pairs",
    "d4_jaccard_verified",
    "d7_winnow_pairs",
    "d8_neardup_survivors",
    "p1_chunk_index_build",
    "s13_binary_decode",
    "s6_drive_fetch",
    "s8_config_scan",
    "t3_langid_agreement",
    "c9_cdc_chunks",
    "d14_cluster_sizes",
    "d15_incremental_neardup",
    "d16_incremental_embed",
    "st6_stream_ingest",
    "st7_stream_embed_ingest",
    "t5_bpe_tokens",
    "v6_embedding_neardup",
    "r3_mmr_rerank",
]

SQL_TYPE = {
    "int64": "BIGINT",
    "int32": "INTEGER",
    "float64": "DOUBLE",
    "bool": "BOOLEAN",
    "object": "VARCHAR",
}


def lit(v, dtype):
    if v is None or (isinstance(v, float) and v != v):
        raise SystemExit("NULL in snapshot — driver compare can't hash nulls")
    if dtype == "object":
        return "'" + str(v).replace("'", "''") + "'"
    if dtype == "bool":
        return "true" if v else "false"
    # coerce numpy scalars to python before repr (numpy>=2 reprs as
    # np.float64(…), which would corrupt the SQL)
    return repr(float(v) if dtype == "float64" else int(v))


def values_sql(df):
    dtypes = [str(df[c].dtype) for c in df.columns]
    for c, d in zip(df.columns, dtypes):
        if d not in SQL_TYPE:
            raise SystemExit(f"unmapped dtype {d} for column {c}")
    rows = []
    for t in df.itertuples(index=False):
        cells = [f"CAST({lit(v, d)} AS {SQL_TYPE[d]})" for v, d in zip(t, dtypes)]
        rows.append(" (" + ", ".join(cells) + ")")
    cols = ", ".join(df.columns)
    order = ", ".join(df.columns[:2])
    return ("SELECT * FROM (VALUES\n" + ",\n".join(rows) +
            f"\n) AS t({cols}) ORDER BY {order}")


def main(out_dir):
    con = duckdb.connect()
    entries = []
    for name in QUERIES:
        df = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        sql = values_sql(df)
        body = sql.replace('"""', '"' * 2 + '\\"')
        entries.append(f'    "{name}" ->\n      """{body}""",\n')
    scala = (
        "package graft.queries\n\n"
        "/** GENERATED — do not edit by hand; regenerate with\n"
        "  * scripts/gen_snapshots.py (header there documents the workflow).\n"
        "  *\n"
        "  * Constant `VALUES` oracles pinning the exact output of the\n"
        "  * deterministic-but-not-SQL-expressible queries (sketch-based dedup,\n"
        "  * the chunk+embed pipeline, the stub media decode, language id, the\n"
        "  * greedy JSON partitioner) at the correctness-gate scale factor.\n"
        "  * The algorithmic properties behind each are asserted structurally\n"
        "  * in ScalaTest (DedupEquivalenceSpec and friends); the snapshots\n"
        "  * make the driver's hash gate sensitive to ANY behavior drift.\n"
        "  */\n"
        "object Snapshots {\n"
        "  val oracles: Map[String, String] = Map(\n"
        + "".join(entries) +
        "  )\n}\n"
    )
    path = os.path.join(os.path.dirname(__file__), "..",
                        "src/main/scala/graft/queries/Snapshots.scala")
    with open(path, "w") as f:
        f.write(scala)
    print(f"wrote {os.path.normpath(path)}: {len(entries)} snapshots, "
          f"{len(scala.splitlines())} lines")


if __name__ == "__main__":
    main(sys.argv[1])
