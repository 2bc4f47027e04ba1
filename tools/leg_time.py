"""Time individual queries() keys in isolation with the noop sink.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python tools/leg_time.py [-n REPS] [--cold] key [key ...]

Per guide section 1.4, the timed action is a noop-format write (computes
every column of every row, no sink cost, no optimizer pruning as with
count()). Default is the bench's warm min-of-N convention (one untimed
warm pass per key, then min of N timed passes); --cold skips the warm
pass. Prints one JSON line {key: {"min": s, "runs": [...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from kafka_connect_storage_cloud_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    cold = False
    if "-n" in args:
        i = args.index("-n")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--cold" in args:
        cold = True
        args.remove("--cold")
    keys = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("kcsc-leg-time")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for key in keys:
        if key not in qs:
            out[key] = {"err": "not in queries()"}
            continue
        spark.sparkContext.setJobDescription(f"leg_time: {key}")
        if not cold:
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[key] = {"min": min(runs), "runs": runs}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
