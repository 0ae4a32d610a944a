#!/usr/bin/env python3
"""One-off diagnosis: is the dedup scaling pair GC/heap-bound?

Runs minhash_lsh_capped on the 320k scaling corpus at local[N] with a
given driver heap, printing wall + total JVM GC time for the timed rep.
Usage: python tools/dedup_heap_probe.py <cores> <heap> [corpus_docs]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
heap = sys.argv[2]
docs = int(sys.argv[3]) if len(sys.argv) > 3 else 320000
os.environ["SPARK_DRIVER_MEM"] = heap

from readability_py_spark.operators import merged_queries  # noqa: E402
from readability_py_spark.operators.dedup import release_caches  # noqa: E402
from readability_py_spark.session import build_session  # noqa: E402

sf_dir = os.path.join(REPO, ".data", f"documents_scale_{docs}")
spark = build_session(
    app_name=f"dedup-heap-probe-{cores}-{heap}",
    master=f"local[{cores}]",
    shuffle_partitions=str(2 * cores),
)
spark.sparkContext.setLogLevel("WARN")
fn = merged_queries(include_retired=True)[0]["minhash_lsh_capped"]


def gc_ms():
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def rep():
    g0, t0 = gc_ms(), time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    g = gc_ms() - g0
    release_caches()
    return wall, g


rep()  # warmup
w, g = rep()
print(f"RESULT cores={cores} heap={heap} wall={w:.2f}s gc={g/1000:.2f}s gc_frac={g/1000/w:.3f}")
spark.stop()
