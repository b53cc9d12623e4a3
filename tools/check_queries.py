"""Driver-sim hash check for a subset of queries: python tools/check_queries.py q1 q2 ...

Mirrors the /verify harness (pandas .df() fetch, columns sorted by
name, sha256 of sorted row renders) but only for the named queries —
the fast inner loop while developing a new operator. No args = all.
"""

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as mod  # noqa: E402
from spark_ij_spark.session import TABLE_NAMES, get_spark  # noqa: E402


def vhash(rows):
    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            # float(v) first: numpy>=2 reprs np.float64(1.5) as
            # 'np.float64(1.5)' while the Spark side is a plain float —
            # repr of the coerced builtin is version-stable
            f = float(v)
            return "NaN" if math.isnan(f) else repr(f)
        return str(v)

    return hashlib.sha256(
        "\n".join(sorted("|".join(norm(v) for v in r) for r in rows)).encode()
    ).hexdigest()[:12]


def main() -> int:
    only = set(sys.argv[1:])
    sf = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("check-sim", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, osql = mod.queries(), mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not silently skip everything and exit 0
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        spark.stop()
        return 2
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf)
        scols = sorted(sdf.columns)
        srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
        if name not in osql:
            print(f"  {name}: rows-only {len(srows)}")
            continue
        dpdf = con.execute(osql[name]).df()
        dcols = sorted(dpdf.columns)
        drows = [tuple(r) for r in dpdf[dcols].itertuples(index=False, name=None)]
        ok = vhash(srows) == vhash(drows) and scols == dcols
        bad += not ok
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} rows={len(srows)}/{len(drows)}")
        if not ok and scols == dcols and len(srows) == len(drows):
            # key=repr: rows with NULLs are not orderable natively
            for a, b in zip(sorted(srows, key=repr), sorted(drows, key=repr)):
                if tuple(map(str, a)) != tuple(map(str, b)):
                    print("    spark ", a)
                    print("    duckdb", b)
                    break
        elif not ok:
            print("    spark cols ", scols)
            print("    duckdb cols", dcols)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
