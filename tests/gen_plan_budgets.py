"""Regenerate tests/plan_budgets.json — the per-query Exchange budget.

Run after INTENTIONALLY changing a query's shuffle structure::

    python tests/gen_plan_budgets.py

The budget is the count of Exchange operators in the query's initial
physical plan at sf0.001 under the pytest session config (local[4],
4 shuffle partitions).  test_plans.test_registry_exchange_budget asserts
every query stays AT OR UNDER its recorded budget, so an accidental
extra shuffle (a lost broadcast hint, a repartition sneaking in, a
window repartitioning on a new key) fails CI instead of shipping; a
query that *improves* (fewer exchanges) keeps passing — rerun this
script to ratchet the budget down.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "plan_budgets.json")


def count_exchanges(plan: str) -> int:
    import re
    return len(re.findall(r"\(\d+\) Exchange", plan))


def main():
    import contextlib
    import io

    from pdf_extractor_spark.queries import REGISTRY
    from pdf_extractor_spark.session import get_spark

    spark = get_spark("gen_plan_budgets", master="local[4]",
                      shuffle_partitions=4)
    budgets = {}
    for name in sorted(REGISTRY):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            REGISTRY[name].spark(spark, SF_DIR).explain("formatted")
        budgets[name] = count_exchanges(buf.getvalue())
        print(f"{name}: {budgets[name]}")
    with open(OUT, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT} ({len(budgets)} queries)")


if __name__ == "__main__":
    main()
