#!/usr/bin/env python3
"""Per-stage diagnosis of the dedup scaling pair: which stage of
minhash_lsh_capped fails to scale local[8] -> local[32]?

Runs one warmup rep + one timed rep at local[N] on the 320k scaling
corpus, then dumps per-stage metrics (task count, elapsed, total
executor run/CPU time) for the timed rep from the Spark REST API.

Usage: python tools/dedup_stage_probe.py <cores> [corpus_docs]
"""
import datetime
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
docs = int(sys.argv[2]) if len(sys.argv) > 2 else 320000

from readability_py_spark.operators import merged_queries  # noqa: E402
from readability_py_spark.operators.dedup import release_caches  # noqa: E402
from readability_py_spark.session import build_session  # noqa: E402

sf_dir = os.path.join(REPO, ".data", f"documents_scale_{docs}")
spark = build_session(
    app_name=f"dedup-stage-probe-{cores}",
    master=f"local[{cores}]",
    shuffle_partitions=str(2 * cores),
)
spark.sparkContext.setLogLevel("WARN")
fn = merged_queries(include_retired=True)[0][os.environ.get("SPARK_GRAFT_DEDUP_QUERY", "minhash_lsh_capped")]


def rep():
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    release_caches()
    return wall


w_warm = rep()
mark = datetime.datetime.now(datetime.timezone.utc)
w_timed = rep()

ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId
stages = json.load(
    urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
)


def ts(s):
    # "2026-08-17T13:00:00.000GMT"
    return datetime.datetime.strptime(
        s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
    )


rows = []
for st in stages:
    sub = ts(st["submissionTime"])
    if sub < mark:
        continue
    dur = (ts(st["completionTime"]) - ts(st["firstTaskLaunchedTime"])).total_seconds()
    rows.append(
        {
            "id": st["stageId"],
            "tasks": st["numCompleteTasks"],
            "elapsed_s": round(dur, 2),
            "run_s": round(st["executorRunTime"] / 1000, 2),
            "cpu_s": round(st["executorCpuTime"] / 1e9, 2),
            "in_mb": round(st["inputBytes"] / 1e6, 1),
            "sh_r_mb": round(st["shuffleReadBytes"] / 1e6, 1),
            "sh_w_mb": round(st["shuffleWriteBytes"] / 1e6, 1),
            "name": st["name"].split("\n")[0][:70],
        }
    )

rows.sort(key=lambda r: -r["elapsed_s"])
print(f"WALL warmup={w_warm:.2f}s timed={w_timed:.2f}s cores={cores}")
print(
    f"{'id':>4} {'tasks':>5} {'elapsed':>8} {'run':>8} {'cpu':>8} "
    f"{'in_mb':>7} {'shR':>7} {'shW':>7}  name"
)
for r in rows:
    print(
        f"{r['id']:>4} {r['tasks']:>5} {r['elapsed_s']:>8.2f} {r['run_s']:>8.2f} "
        f"{r['cpu_s']:>8.2f} {r['in_mb']:>7.1f} {r['sh_r_mb']:>7.1f} "
        f"{r['sh_w_mb']:>7.1f}  {r['name']}"
    )
print(f"SUM elapsed={sum(r['elapsed_s'] for r in rows):.2f}s over {len(rows)} stages")

sqls = json.load(
    urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql?details=true&planDescription=false&length=50"
    )
)
last = max(sqls, key=lambda s: s["id"])
print(f"\nSQL exec id={last['id']} duration={last.get('duration')}ms — node metrics:")
for node in last.get("nodes", []):
    mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
    interesting = {
        k: v
        for k, v in mets.items()
        if any(
            t in k
            for t in ("time total", "stage duration", "output rows", "time in")
        )
    }
    if interesting:
        print(f"  [{node['nodeId']:>3}] {node['nodeName'][:60]}: {interesting}")
spark.stop()
