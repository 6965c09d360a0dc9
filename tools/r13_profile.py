"""Per-stage profiler for one registry query (r13 optimization round).

Runs a registry entry ``reps`` times at a given core count with the
Spark event log enabled, then aggregates the log into per-stage wall /
task-time / GC / deserialization numbers so 32-core vs 8-core runs can
be compared stage by stage (the r12 driver found 3-4x ANTI-scaling at
local[32] on the near-dup paths; this tool is how we find which stage).

Usage: python tools/r13_profile.py <cpus> <query_name> [reps]
Prints one JSON line per run plus a per-stage table sorted by wall.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    cpus = int(sys.argv[1])
    qname = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    logdir = tempfile.mkdtemp(prefix="r13_eventlog_")
    from bigdatasearchpro_spark.registry import QUERIES
    from bigdatasearchpro_spark.session import get_spark

    spark = get_spark(
        "r13_profile",
        cpus=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file://" + logdir,
        },
    )
    from bigdatasearchpro_spark.sources.files import load_table

    load_table(spark, SF_DIR, "nation").count()  # warm

    walls = []
    for i in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"{qname} rep{i}")
        t0 = time.time()
        df = QUERIES[qname](spark, SF_DIR)
        df.count()
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({"query": qname, "cpus": cpus, "walls": walls,
                      "min": min(walls)}))
    spark.stop()

    # ---- aggregate the event log ----------------------------------
    stages: dict[tuple, dict] = {}
    task_agg: dict[tuple, dict] = defaultdict(
        lambda: {"n": 0, "run_ms": 0, "gc_ms": 0, "deser_ms": 0,
                 "ser_ms": 0, "fetch_ms": 0, "max_ms": 0}
    )
    import glob
    import io
    import subprocess

    files = [p for p in glob.glob(os.path.join(logdir, "**", "events_*"),
                                  recursive=True) if os.path.isfile(p)]
    for path in files:
        if path.endswith(".zstd"):
            raw = subprocess.run(["unzstd", "-c", path],
                                 capture_output=True).stdout
            f = io.StringIO(raw.decode("utf-8", "replace"))
        else:
            f = open(path, encoding="utf-8")
        with f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    key = (si["Stage ID"], si["Stage Attempt ID"])
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    stages[key] = {
                        "name": si.get("Stage Name", "")[:90],
                        "wall_ms": (comp - sub) if sub and comp else None,
                        "n_tasks": si.get("Number of Tasks"),
                    }
                elif et == "SparkListenerTaskEnd":
                    key = (ev["Stage ID"], ev["Stage Attempt ID"])
                    tm = ev.get("Task Metrics") or {}
                    a = task_agg[key]
                    a["n"] += 1
                    rt = tm.get("Executor Run Time", 0)
                    a["run_ms"] += rt
                    a["gc_ms"] += tm.get("JVM GC Time", 0)
                    a["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                    a["ser_ms"] += tm.get("Result Serialization Time", 0)
                    srm = tm.get("Shuffle Read Metrics") or {}
                    a["fetch_ms"] += srm.get("Fetch Wait Time", 0)
                    a["max_ms"] = max(a["max_ms"], rt)

    rows = []
    for key, s in stages.items():
        a = task_agg.get(key, {})
        rows.append({
            "stage": key[0], "wall_ms": s["wall_ms"], "tasks": s["n_tasks"],
            "run_ms": a.get("run_ms", 0), "gc_ms": a.get("gc_ms", 0),
            "deser_ms": a.get("deser_ms", 0), "max_task_ms": a.get("max_ms", 0),
            "name": s["name"],
        })
    rows.sort(key=lambda r: -(r["wall_ms"] or 0))
    total_wall = sum(r["wall_ms"] or 0 for r in rows)
    total_deser = sum(r["deser_ms"] for r in rows)
    total_gc = sum(r["gc_ms"] for r in rows)
    print(f"# stages={len(rows)} total_stage_wall={total_wall}ms "
          f"total_deser={total_deser}ms total_gc={total_gc}ms")
    print(f"{'stage':>5} {'wall':>7} {'tasks':>5} {'run':>8} {'gc':>6} "
          f"{'deser':>7} {'maxtask':>7}  name")
    for r in rows[:25]:
        print(f"{r['stage']:>5} {r['wall_ms'] or -1:>7} {r['tasks']:>5} "
              f"{r['run_ms']:>8} {r['gc_ms']:>6} {r['deser_ms']:>7} "
              f"{r['max_task_ms']:>7}  {r['name']}")


if __name__ == "__main__":
    main()
