"""Mechanical round-close gate (VERDICT r9 item 1) — the committed
state must be SELF-CERTIFYING: two consecutive rounds shipped code whose
verification artifacts were stale or missing, and only the judge's own
sweep proved the registry green. This tool makes that impossible to
forget by turning the round-close checklist into one command with a
hard exit code:

    python -m demo_apache_beam_spark.tools.round_close

1. **Full-registry sweep at BOTH scale factors** (sf0.01 + sf0.1) in
   fresh driver-style subprocesses (``verify_driver`` — plain session,
   exactly how the driver calls the registry), writing the combined
   results to ``VERIFY_r{N}.json`` at the repo root.
2. **Count gate** — each sweep must cover exactly ``len(REGISTRY)``
   queries at HEAD (a sweep taken before the last registry edit cannot
   certify it — the r8 failure mode where the k-means pair landed after
   the sweep).
3. **Status gate** — every query's status must be ``ok`` (oracle hash
   match) or ``rows_only`` (documented non-SQL-expressible); any
   mismatch/error fails the gate.
4. **Artifact regeneration** — QUERIES.md and PLANS.md regenerate from
   the live registry (subprocesses too: gen_plans_md stops its session).
5. **Cleanliness gate** — ``git status`` must show NONE of
   (VERIFY_r{N}.json, QUERIES.md, PLANS.md) dirty afterwards; if they
   are, the tool prints the list and exits nonzero — commit them and
   re-run (all three generators are deterministic at a fixed HEAD, so
   the re-run reproduces identical bytes and passes).

``--skip-sweep`` re-checks gates 2/3/5 against an existing
``VERIFY_r{N}.json`` without paying the ~10-minute double sweep — for
iterating on the docs half; the committed close must come from a full
run. Round number: ``$SPARK_GRAFT_ROUND``, else 1 + the highest
committed ``BENCH_r*.json`` (the same inference bench.py uses).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
ARTIFACTS = ("QUERIES.md", "PLANS.md")


def infer_round() -> int:
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    rounds = [
        int(m.group(1))
        for fn in os.listdir(REPO)
        if (m := re.match(r"BENCH_r(\d+)\.json$", fn))
    ]
    return (max(rounds) + 1) if rounds else 1


def run_sweeps() -> dict:
    sweeps = {}
    for sf in SF_DIRS:
        tag = os.path.basename(sf)
        out_json = os.path.join(REPO, f".verify_{tag}.tmp.json")
        env = dict(
            os.environ, SPARK_GRAFT_VERIFY_SF=sf, SPARK_GRAFT_VERIFY_JSON=out_json
        )
        print(f"== sweep {sf} ==", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "demo_apache_beam_spark.tools.verify_driver"],
            cwd=REPO,
            env=env,
        )
        # a sweep that died before writing its JSON (Spark failed to
        # start, OOM kill) must surface as a GATE FAILURE with the
        # nonzero rc attached — not an unhandled FileNotFoundError
        # traceback that skips the report entirely (review r10)
        try:
            with open(out_json) as fh:
                sweeps[tag] = json.load(fh)
        except (OSError, json.JSONDecodeError) as exc:
            sweeps[tag] = {
                "queries": {},
                "fails": [f"sweep produced no result JSON: {exc}"],
            }
        else:
            # unlink OUTSIDE the load's except: a failed cleanup must
            # not overwrite a successfully loaded green sweep with a
            # bogus gate failure (review r10)
            try:
                os.unlink(out_json)
            except OSError:
                pass
        sweeps[tag]["exit_code"] = rc
    return sweeps


def check_gates(doc: dict, n_registry: int) -> list[str]:
    problems = []
    for tag, sweep in doc["sweeps"].items():
        qs = sweep["queries"]
        if len(qs) != n_registry:
            problems.append(
                f"{tag}: sweep covers {len(qs)} queries but the registry "
                f"at HEAD holds {n_registry} — the sweep cannot certify HEAD"
            )
        bad = {
            name: r["status"]
            for name, r in qs.items()
            if r["status"] not in ("ok", "rows_only")
        }
        if bad or sweep.get("fails"):
            problems.append(f"{tag}: non-green statuses: {bad or sweep['fails']}")
        if sweep.get("exit_code", 0) != 0:
            # a sweep can write green-looking JSON and still die on the
            # way out — a nonzero subprocess is never a certification
            problems.append(
                f"{tag}: verify_driver exited {sweep['exit_code']}"
            )
    return problems


def main(argv: list[str]) -> int:
    skip_sweep = "--skip-sweep" in argv
    round_n = infer_round()
    verify_path = os.path.join(REPO, f"VERIFY_r{round_n:02d}.json")

    from demo_apache_beam_spark.queries import REGISTRY

    n_registry = len(REGISTRY)

    if skip_sweep:
        if not os.path.exists(verify_path):
            print(f"FAIL: --skip-sweep but {verify_path} does not exist")
            return 2
        doc = json.load(open(verify_path))
    else:
        doc = {
            "round": round_n,
            "registry_count": n_registry,
            "sweeps": run_sweeps(),
        }
        with open(verify_path, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
        print(f"wrote {verify_path}")

    problems = check_gates(doc, n_registry)
    if doc.get("registry_count") != n_registry:
        problems.append(
            f"VERIFY file records registry_count={doc.get('registry_count')} "
            f"but HEAD holds {n_registry}"
        )

    # Bench gate (VERDICT r11 #1/#2): a committed BENCH_FULL_r{N}.json
    # taken before the round's last registry edit silently goes stale —
    # r11 shipped a 194-query bench against a 195-query registry. The
    # close now refuses a bench whose query count differs from the
    # registry at HEAD, or one missing the hardware canary that makes
    # cross-round comparison measurable.
    bench_path = os.path.join(REPO, f"BENCH_FULL_r{round_n}.json")
    try:
        with open(bench_path) as fh:
            bench = json.load(fh)
    except FileNotFoundError:
        problems.append(
            f"BENCH_FULL_r{round_n}.json missing — run `python bench.py` "
            "at HEAD before closing the round"
        )
    except (OSError, json.JSONDecodeError) as exc:
        problems.append(f"BENCH_FULL_r{round_n}.json unreadable: {exc}")
    else:
        n_bench = len(bench.get("queries") or {})
        if n_bench != n_registry:
            problems.append(
                f"BENCH_FULL_r{round_n}.json covers {n_bench} queries but "
                f"the registry at HEAD holds {n_registry} — re-run bench.py"
            )
        if not (bench.get("canary") or {}).get("spark_fixed_job_sec"):
            problems.append(
                f"BENCH_FULL_r{round_n}.json has no hardware canary — "
                "re-run bench.py at HEAD"
            )

    # regenerate the human-readable artifacts from the live registry —
    # subprocesses: gen_plans_md owns (and stops) a SparkSession
    for mod in ("gen_queries_md", "gen_plans_md"):
        print(f"== regenerate via {mod} ==", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", f"demo_apache_beam_spark.tools.{mod}"],
            cwd=REPO,
        )
        if rc != 0:
            problems.append(f"{mod} exited {rc}")

    dirty = subprocess.check_output(
        ["git", "status", "--porcelain", "--", os.path.basename(verify_path)]
        + list(ARTIFACTS)
        + [f"BENCH_FULL_r{round_n}.json"],
        cwd=REPO,
        text=True,
    ).strip()
    if dirty:
        problems.append(
            "round artifacts not committed (commit them and re-run):\n" + dirty
        )

    if problems:
        print("\nROUND CLOSE: FAIL")
        for p in problems:
            print(" -", p)
        return 1
    print(
        f"\nROUND CLOSE: PASS — {n_registry} queries green at both SFs, "
        f"artifacts committed ({os.path.basename(verify_path)}, "
        + ", ".join(ARTIFACTS)
        + ")"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
