#!/usr/bin/env python
"""Dev loop: run one (or more) registered queries against their DuckDB
oracles at sf0.01 and print PASS/FAIL — the single-query slice of
tests/test_parity.py for iterating on a new operator.

Usage: python tools/check_query.py NAME [NAME...]
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

SF = os.environ.get("WCS_TEST_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from tests.oracle_harness import compare, duck_connection
    from wal_consumer_spark.plans import all_specs
    from wal_consumer_spark.session import get_spark

    spark = get_spark(app_name="wcs-check-query")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(SF)
    specs = all_specs()
    rc = 0
    for name in sys.argv[1:]:
        spec = specs[name]
        try:
            sdf = spec.spark(spark, SF).toPandas()
            if spec.oracle is None:
                print(f"{name}: rows={len(sdf)} (no oracle)")
                continue
            ddf = con.execute(spec.oracle).fetchdf()
            compare(sdf, ddf, name)
            print(f"PASS {name} ({len(sdf)} rows)")
            if len(sdf) == 0:
                print(f"  WARNING: {name} returns 0 rows — vacuous")
        except AssertionError as ex:
            rc = 1
            print(f"FAIL {name}: {str(ex)[:400]}")
        except Exception as ex:
            rc = 1
            print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:400]}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
