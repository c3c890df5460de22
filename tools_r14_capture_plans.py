"""Capture .explain('formatted') for registry queries into plans/r14/.

    python tools_r13_capture_plans.py before [name ...]
    python tools_r13_capture_plans.py after  [name ...]

With no names, captures every registry query. Store-backed queries may run
store-build jobs on first touch; plans are captured after that (steady state,
the shape the bench times).
"""
from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
names = sys.argv[2:]

from demo_apache_beam_spark.plans.inspect import explain_str
from demo_apache_beam_spark.queries import REGISTRY
from demo_apache_beam_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(REPO_ROOT, "plans", "r14")
os.makedirs(out_dir, exist_ok=True)

spark = get_spark("plan-capture", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))

todo = names or list(REGISTRY)
for name in todo:
    spec = REGISTRY[name]
    try:
        df = spec.fn(spark, sf_dir)
        plan = explain_str(df)
    except Exception as e:  # capture the failure, keep going
        plan = f"ERROR building plan: {type(e).__name__}: {e}\n"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(name, "ok" if not plan.startswith("ERROR") else "ERROR", flush=True)
