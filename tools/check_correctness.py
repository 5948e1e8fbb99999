"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` in DuckDB (tables pre-registered as views), then
compares row count, sorted-by-name schema, and a value hash computed
the way the driver does (sort columns by name, sort rows, hash
stringified values).  Prints one JSON object mirroring
CORRECTNESS_r{N}.json so mismatches are visible before the driver runs.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    """Dtype-SENSITIVE stringification: the driver's value hash
    distinguishes int 5 from float 5.0 (the round-1 token_stats_by_lang
    failure was exactly a DuckDB HUGEINT->float vs Spark bigint
    artifact), so floats keep their float repr here."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("check-correctness")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
        except Exception:
            rec["err"] = "spark: " + traceback.format_exc(limit=3).replace("\n", " | ")
            report[name] = rec
            print(f"{name}: SPARK ERROR", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            rec["err"] = "no_oracle"
            report[name] = rec
            print(f"{name}: no_oracle spark_rows={rec['spark_rows']}", flush=True)
            continue
        try:
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            rec["oracle_rows"] = len(o_rows)
        except Exception:
            rec["err"] = "oracle: " + traceback.format_exc(limit=3).replace("\n", " | ")
            report[name] = rec
            print(f"{name}: ORACLE ERROR", flush=True)
            continue
        rec["rows_match"] = len(s_rows) == len(o_rows)
        rec["schema_match"] = sorted(s_cols) == sorted(o_cols)
        rec["hash_match"] = (
            rec["schema_match"]
            and _hash_rows(s_cols, s_rows) == _hash_rows(o_cols, o_rows)
        )
        report[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} "
            f"spark={rec['spark_rows']} oracle={rec['oracle_rows']} "
            f"schema={rec['schema_match']} hash={rec['hash_match']}",
            flush=True,
        )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "CORRECTNESS_local.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    bad = [n for n, r in report.items() if r["err"] or not (r["rows_match"] and r["schema_match"] and r["hash_match"])]
    print(f"\n{len(report) - len(bad)}/{len(report)} green; issues: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
