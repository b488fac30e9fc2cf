"""Sweep the registry for output columns the driver's hasher cannot handle.

The driver canonicalizes results via pandas sort_values/factorize, which
dies on list/dict cells (TypeError: unhashable type) and hash-diverges on
Decimal (Spark Decimal object vs DuckDB float64). Any checked query must
therefore emit only scalar columns: string/int/float/bool/date/timestamp/
binary. This tool builds each query's plan (no execution) and reports
columns typed Array/Map/Struct/Decimal.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from event_stream_for_k8s_spark.plans import REGISTRY
from event_stream_for_k8s_spark.session import get_spark

BAD = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)

SKIP_PREFIXES = ("stream_", "source_", "sink_")  # streaming/side-effect queries


def main() -> None:
    spark = get_spark()
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    bad = {}
    errs = {}
    for name, q in sorted(REGISTRY.items()):
        try:
            df = q.spark(spark, sf_dir)
            cols = [
                (f.name, f.dataType.simpleString())
                for f in df.schema.fields
                if isinstance(f.dataType, BAD)
            ]
            if cols:
                bad[name] = cols
        except Exception as e:  # noqa: BLE001
            errs[name] = repr(e)[:120]
    for name, cols in bad.items():
        print(f"BAD {name}: {cols}")
    for name, e in errs.items():
        print(f"ERR {name}: {e}")
    print(f"\n{len(bad)} queries with driver-unsafe output columns, "
          f"{len(errs)} plan errors, {len(REGISTRY)} total")


if __name__ == "__main__":
    main()
