"""Flag queries whose Spark or DuckDB output contains a negative zero
in any float column — each is a latent value-hash flake ('-0' vs '0'
under %.9g)."""
import math
import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").appName("nz").getOrCreate())
duck = duckdb.connect()
for t in TABLES:
    duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def has_negzero(rows):
    for r in rows:
        for v in r:
            if isinstance(v, float) and v == 0.0 and math.copysign(1, v) < 0:
                return True
    return False

Q, O = E.queries(), E.oracle_sql()
flagged = []
for name in sorted(O):
    try:
        srows = [tuple(r) for r in Q[name](spark, SF).collect()]
        orows = duck.execute(O[name]).fetchall()
    except Exception as ex:
        print("ERR", name, type(ex).__name__)
        continue
    s, o = has_negzero(srows), has_negzero(orows)
    if s or o:
        flagged.append(name)
        print(f"NEGZERO {name}: spark={s} duck={o}")
print("flagged:", flagged)
