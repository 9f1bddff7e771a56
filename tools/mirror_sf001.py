"""Driver-contract verification per .claude/skills/verify: fresh
vanilla SparkSession at sf0.01, DuckDB oracle side-by-side, value
multiset compare via %.9g. Usage:
  python /tmp/verify_driver.py            # flagship + determinism probe
  python /tmp/verify_driver.py q1 q2 ...  # targeted queries
  python /tmp/verify_driver.py --all      # every oracled query
"""
import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("verify")
    .getOrCreate()
)

duck = duckdb.connect()
for t in TABLES:
    duck.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append("%.9g" % v)
            elif isinstance(v, bool):
                vals.append(str(bool(v)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def check(name, qfn, osql):
    sdf = qfn(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.execute(osql)
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    ok_schema = sorted(scols) == sorted(ocols)
    ok_rows = len(srows) == len(orows)
    ok_vals = ok_schema and canon(srows, scols) == canon(orows, ocols)
    # vacuity gate (r10 VERDICT #1): a query whose Spark AND oracle
    # sides both return 0 rows has compared empty sets — the hash
    # match proves nothing about its arithmetic. Treat as FAIL so
    # silent-vacuity (m11_ljung_box, 8 rounds) is caught mechanically.
    if ok_schema and ok_rows and ok_vals and len(srows) == 0:
        print(f"VACUOUS {name}: 0 rows on both sides — oracle match is empty")
        return False
    status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
    print(
        f"{status} {name}: rows {len(srows)}/{len(orows)} "
        f"schema={ok_schema} values={ok_vals}"
    )
    if status == "FAIL" and ok_schema:
        a, b = canon(srows, scols), canon(orows, ocols)
        diff_a = [x for x in a if x not in b][:3]
        diff_b = [x for x in b if x not in a][:3]
        print("  spark-only:", diff_a)
        print("  oracle-only:", diff_b)
    elif status == "FAIL":
        print("  spark cols:", sorted(scols))
        print("  oracle cols:", sorted(ocols))
    return status == "OK"


args = sys.argv[1:]
Q = E.queries()
O = E.oracle_sql()

if not args:
    df = E.entry(spark)
    rows1 = canon([tuple(r) for r in df.collect()], df.columns)
    rows2 = canon(
        [tuple(r) for r in E.entry(spark).collect()], df.columns
    )
    assert len(rows1) >= 1, "entry() returned 0 rows"
    assert rows1 == rows2, "entry() is NONDETERMINISTIC"
    print(f"OK entry(): {len(rows1)} rows, deterministic across 2 runs")
    sys.exit(0)

names = list(Q) if args == ["--all"] else args
fails = 0
for name in names:
    if name not in Q:
        print(f"SKIP {name}: not in queries()")
        continue
    if name not in O:
        n = len(Q[name](spark, SF).collect())
        print(f"ROWS-ONLY {name}: {n} rows")
        if n == 0:
            print(f"VACUOUS {name}: rows-only query returned 0 rows")
            fails += 1
        continue
    try:
        if not check(name, Q[name], O[name]):
            fails += 1
    except Exception as ex:  # noqa: BLE001
        print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:200]}")
        fails += 1
print(f"done: {len(names)} checked, {fails} failing")
sys.exit(1 if fails else 0)
