"""Local replica of the driver's correctness gate: run each Spark query and
its DuckDB oracle side-by-side, compare row count + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...] [--write rN]

``--write rN`` (full-registry sweeps only) records the result as
``CORRECTNESS_sweep_rN.json`` at the repo root in the driver's row format;
``kafka_to_nexus_spark.rotation.load_rounds`` counts it as a green round
for every matching query, which is what keeps the verification-window
staleness policy satisfiable now that the registry exceeds 3 driver
windows (VERDICT r11 #1).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kafka_to_nexus_spark import queries as Q
from kafka_to_nexus_spark.session import get_spark


def normalize(df) -> list[tuple]:
    """Column-name-sorted, row-sorted stringified values (driver analog)."""
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False):
        row = []
        for v in rec:
            if isinstance(v, float):
                if v == 0:
                    v = 0.0  # canonicalize -0.0: engines differ on round()'s sign
                row.append(f"{v:.6f}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


_DTYPE_CANON = {
    "int8": "int", "int16": "int", "int32": "int", "int64": "int",
    "uint8": "int", "uint16": "int", "uint32": "int", "uint64": "int",
    "Int64": "int", "Int32": "int",
    "float32": "float", "float64": "float",
    "bool": "bool", "boolean": "bool",
    "object": "object", "string": "object",
}


def schema_of(df) -> dict[str, str]:
    """Canonicalized pandas dtypes per column (driver-style schema check,
    tolerant of width differences the value hash also tolerates)."""
    out = {}
    for c in df.columns:
        name = str(df[c].dtype)
        if name.startswith("datetime64"):
            name = "datetime"
        out[c] = _DTYPE_CANON.get(name, name)
    return out


def main() -> int:
    argv = list(sys.argv[1:])
    write_round = None
    tiered = "--tiered" in argv
    if tiered:
        argv.remove("--tiered")
    if "--write" in argv:
        i = argv.index("--write")
        try:
            write_round = argv[i + 1]
        except IndexError:
            print("ERROR: --write needs a round tag (e.g. --write r12)")
            return 2
        if not write_round.startswith("r") or not write_round[1:].isdigit():
            print(f"ERROR: --write tag must look like r12, got {write_round!r}")
            return 2
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if write_round and only:
        # a sweep artifact must mean "the FULL registry ran" — a subset
        # write could never create a false green, but it would dilute
        # what the artifact certifies
        print("ERROR: --write is only valid for full-registry sweeps")
        return 2
    if tiered and not write_round:
        print("ERROR: --tiered only applies to --write sweeps")
        return 2
    skipped_twins: list[str] = []
    if tiered:
        # VERDICT r12 #6: the round-close sweep grows linearly with the
        # registry — frozen cross-check twins sit out on odd rounds per
        # rotation.sweep_names (never more than 2 rounds stale, never
        # when their behavior or their production sibling's changed);
        # the artifact records what sat out so the skip is auditable
        from kafka_to_nexus_spark import rotation

        all_names = list(Q.queries())
        only = set(rotation.sweep_names(all_names, int(write_round[1:])))
        skipped_twins = sorted(set(all_names) - only)
        if skipped_twins:
            print(f"tiered sweep: skipping frozen twins {skipped_twins}")
    # corpus-constant oracles (bm25/unigram) must embed stats from the SAME
    # tier the views point at, or every non-default tier false-fails
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(
        app_name="oracle-check",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in Q.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = Q.queries(), Q.oracle_sql(sf_dir)
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not silently check nothing and exit 0
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            records[name] = {"err": str(e)[:300]}
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        finally:
            # release per-query persisted intermediates (bench.py does the
            # same): one query's cache must not eat executor memory for
            # every query after it in a full-registry sweep
            spark.catalog.clearCache()
        if name not in oracles:
            # rows-only row, same weaker shape the driver records for
            # oracle-less queries (absent axes count as matched) —
            # explicitly TAGGED (ADVICE r12) so the artifact never
            # passes off "Spark ran without exception" as hash-verified
            records[name] = {
                "spark_rows": len(spark_df),
                "err": None,
                "rows_only": True,
            }
            print(f"SKIP {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            records[name] = {"err": str(e)[:300]}
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": len(spark_df),
            "oracle_rows": len(duck_df),
            "err": None,
        }
        records[name] = rec
        sa, sb = schema_of(spark_df), schema_of(duck_df)
        rec["schema_match"] = sa == sb
        if sa != sb:
            failures.append(name)
            diff = {c: (sa.get(c), sb.get(c)) for c in set(sa) | set(sb) if sa.get(c) != sb.get(c)}
            print(f"FAIL {name}: schema mismatch: {diff}")
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        rec["rows_match"] = len(a) == len(b)
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
        elif a != b:
            failures.append(name)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        else:
            rec["hash_match"] = True
            print(f"OK   {name}: {len(a)} rows")
    spark.stop()
    if write_round:
        if skipped_twins:
            # audit row, never a green: err is non-None by design so
            # load_rounds can never mistake it for a certified query
            records["_sweep_meta"] = {
                "err": "meta row (not a query)",
                "tiered": True,
                "skipped_frozen_twins": skipped_twins,
            }
        out = Path(__file__).resolve().parents[1] / (
            f"CORRECTNESS_sweep_{write_round}.json"
        )
        out.write_text(json.dumps(records, indent=2) + "\n")
        print(f"wrote {out} ({len(records)} rows)")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
