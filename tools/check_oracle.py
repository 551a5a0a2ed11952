"""Local emulation of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle over the same parquet, compare row count +
column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive canonical rows, dtype-aware.

    The driver hashes pandas values, so an integer-valued float64 column
    (e.g. a DuckDB HUGEINT window sum landing as float) hashes differently
    from Spark's int64 even though ``%.9g`` renders both as "1".  Prefixing
    each scalar with its dtype kind ("i:" / "f:" / "b:") makes that class of
    mismatch visible locally instead of only in the driver's gate.
    """
    import numpy as np

    df = df[sorted(df.columns)].copy()
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, (bool, np.bool_)):
                vals.append(f"b:{bool(v)}")
            elif isinstance(v, (int, np.integer)):
                vals.append(f"i:{int(v)}")
            elif isinstance(v, decimal.Decimal):
                # Decimals are exact — compare them exactly (scale-insensitive
                # via normalize) instead of degrading to the 9-digit float
                # canon, so a cents-level engine divergence on a high-magnitude
                # decimal aggregate stays visible.  A Decimal column paired
                # with a float oracle column is a dtype divergence the driver
                # would flag anyway; surface it locally too.
                vals.append("NaN" if v.is_nan() else f"d:{v.normalize()}")
            elif isinstance(v, (float, np.floating)):
                f = float(v)
                if math.isnan(f):
                    vals.append("NaN")
                else:
                    vals.append(f"f:{f:.9g}")
            elif isinstance(v, (list, tuple)) or "ndarray" in type(v).__name__:
                vals.append(str([f"{x:.7g}" if isinstance(x, float) else str(x) for x in v]))
            elif v is None or v is pd.NaT:
                vals.append("NULL")
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


def _components_simhash60_iterative(con, Q):
    """Cross-engine twin of the ``dedup_components_simhash60`` oracle
    that stays tractable at sf1: the registered oracle's recursive CTE
    materializes full reachability (every (node, reachable-label) pair
    — quadratic per component), which DuckDB cannot finish on the sf1
    pair graph.  This replays the SAME fixpoint as iterative min-label
    propagation over temp tables — new_label(v) = min(label(v),
    min over neighbors' labels) until no change, with a pointer-
    doubling shortcut (label := label[label]) per round so convergence
    is O(log diameter) rounds — and then restates the identical output
    columns.  Same answer, bounded memory; used by THIS replay tool
    only (the driver's sf0.01 gate still runs the registered pure-SQL
    oracle, so the entry stays fully SQL-oracled there)."""
    pairs_sql = Q._simhash_pairs_oracle(bits=60)
    con.execute("DROP TABLE IF EXISTS _c60_edges")
    con.execute(
        f"CREATE TEMP TABLE _c60_edges AS WITH pairs AS ({pairs_sql}) "
        "SELECT id_a AS s, id_b AS d FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs"
    )
    con.execute("DROP TABLE IF EXISTS _c60_lab")
    con.execute(
        "CREATE TEMP TABLE _c60_lab AS "
        "SELECT DISTINCT s AS id, s AS comp FROM _c60_edges"
    )
    for _ in range(64):  # ≥ log2(diameter) for any plausible graph
        con.execute("DROP TABLE IF EXISTS _c60_next")
        con.execute(
            "CREATE TEMP TABLE _c60_next AS "
            "SELECT l.id, least(l.comp, coalesce(n.m, l.comp)) AS comp "
            "FROM _c60_lab l LEFT JOIN ("
            "  SELECT e.s AS id, min(l2.comp) AS m "
            "  FROM _c60_edges e JOIN _c60_lab l2 ON l2.id = e.d "
            "  GROUP BY e.s) n USING (id)"
        )
        changed = con.execute(
            "SELECT count(*) FROM _c60_lab l JOIN _c60_next n USING (id) "
            "WHERE n.comp < l.comp"
        ).fetchone()[0]
        # pointer-doubling shortcut: comp := comp's comp
        con.execute("DROP TABLE IF EXISTS _c60_lab")
        con.execute(
            "CREATE TEMP TABLE _c60_lab AS "
            "SELECT a.id, b.comp FROM _c60_next a "
            "JOIN _c60_next b ON b.id = a.comp"
        )
        if changed == 0:
            break
    else:
        raise RuntimeError("simhash60 components: no fixpoint in 64 rounds")
    return con.execute(
        "SELECT l.id AS doc_id, l.comp AS component, s.component_size "
        "FROM _c60_lab l JOIN (SELECT comp, count(*) AS component_size "
        "FROM _c60_lab GROUP BY comp) s USING (comp)"
    ).fetchdf()


#: entries whose registered pure-SQL oracle is correct but intractable
#: at the sf1 replay scale; each maps to an iterative same-fixpoint
#: restatement used by this tool only
ITERATIVE_ORACLES = {
    "dedup_components_simhash60": _components_simhash60_iterative,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import label_maker_dask_spark.queries as Q

    # sf1-scale replays need a bigger driver heap than the 1g default
    # (e.g. the market-basket pair fan-out OOMs there); size it like
    # tools/scaling_probe.py does via LMDS_DRIVER_MEM when replaying
    # /root/repo/.scratch/sf1
    mem = os.environ.get("LMDS_DRIVER_MEM", "4g")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", mem)
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver testdata ships single files; tools/make_scaled.py writes
        # Spark DIRECTORIES under the same name — glob those for DuckDB
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    unknown = only - set(Q.QUERIES)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2

    failures = []
    ran = 0
    for name, fn in Q.QUERIES.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        oracle = Q.ORACLES.get(name)
        if oracle is None:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            continue
        try:
            if name in ITERATIVE_ORACLES:
                odf = ITERATIVE_ORACLES[name](con, Q)
            else:
                odf = con.execute(oracle).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            failures.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures.append(name)
            continue
        cs, co = canon(sdf), canon(odf)
        if cs != co:
            diff = [i for i, (a, b) in enumerate(zip(cs, co)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at {len([1 for a,b in zip(cs,co) if a!=b])} rows")
            for i in diff:
                print(f"   spark : {cs[i]}")
                print(f"   oracle: {co[i]}")
            failures.append(name)
        else:
            print(f"OK   {name}: {len(sdf)} rows")
    print(f"\n{ran - len(failures)}/{ran} passing ({len(Q.QUERIES)} in catalog)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
