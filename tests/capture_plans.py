"""Capture `.explain("formatted")` for a list of registry keys.

    python tests/capture_plans.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt per key. Used for the judge-facing
plans/r14/ before/after captures (run from the r13 snapshot for _before,
from the working tree for _after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpt_database_sync_spark.plans.inspect import plan_string  # noqa: E402
from cpt_database_sync_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name=f"capture-plans-{suffix}")
    from cpt_database_sync_spark.plans.registry import all_specs  # noqa: PLC0415

    specs = all_specs()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = plan_string(df)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name}_{suffix} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
