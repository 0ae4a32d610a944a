#!/usr/bin/env python3
"""Identify the dominant stage of minhash_lsh_capped by its SQL-metric
accumulables (maps stage -> physical plan nodes). One rep, no warmup —
identification only, not timing.

Usage: python tools/dedup_stage_id.py <cores> [corpus_docs]
"""
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
    app_name=f"dedup-stage-id-{cores}",
    master=f"local[{cores}]",
    shuffle_partitions=str(2 * cores),
)
spark.sparkContext.setLogLevel("WARN")
fn = merged_queries(include_retired=True)[0][os.environ.get("SPARK_GRAFT_DEDUP_QUERY", "minhash_lsh_capped")]

t0 = time.monotonic()
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
wall = time.monotonic() - t0
release_caches()

ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId


def get(path):
    return json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}"))


stages = get("stages?status=complete")
stages.sort(key=lambda s: -s["executorRunTime"])
print(f"WALL {wall:.2f}s cores={cores}")
for st in stages[:4]:
    print(
        f"\n== stage {st['stageId']} tasks={st['numCompleteTasks']} "
        f"run={st['executorRunTime']/1000:.1f}s cpu={st['executorCpuTime']/1e9:.1f}s "
        f"in={st['inputBytes']/1e6:.1f}MB shR={st['shuffleReadBytes']/1e6:.1f}MB "
        f"shW={st['shuffleWriteBytes']/1e6:.1f}MB"
    )
    detail = get(f"stages/{st['stageId']}/0")
    accs = detail.get("accumulatorUpdates", [])
    for a in accs[:40]:
        print(f"   acc: {a.get('name')} = {a.get('value')}")

jobs = get("jobs")
print("\n== jobs ==")
for j in sorted(jobs, key=lambda j: j["jobId"]):
    print(
        f"  job {j['jobId']} stages={sorted(j['stageIds'])} "
        f"name={j['name'].split(chr(10))[0][:60]}"
    )
spark.stop()
