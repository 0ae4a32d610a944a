#!/usr/bin/env python3
"""Generate the seeded synthetic pages corpus to parquet, in parallel
(multiprocessing), for the scaling bench. Deterministic: worker k
generates rows [k*chunk, (k+1)*chunk) with the same per-row seeds as
readability_py_spark.sources.fixtures.generate_pages_rows.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _gen_chunk(args):
    start, stop, seed, oversize_every = args
    import pyarrow as pa

    from readability_py_spark.sources.fixtures import generate_page_row

    cols = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for k in range(start, stop):
        r = generate_page_row(k, seed, oversize_every=oversize_every)
        for c in cols:
            cols[c].append(r[c])
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        }
    )


def generate_parquet(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    procs: int = 32,
    oversize_every: int = 0,
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # write to a temp dir and rename atomically so an interrupted run
    # never leaves a partial corpus that looks complete
    final_dir = out_dir
    out_dir = out_dir + ".tmp"
    if os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    chunk = max(1, n_rows // (procs * 4))
    jobs = [
        (s, min(s + chunk, n_rows), seed, oversize_every)
        for s in range(0, n_rows, chunk)
    ]
    with mp.Pool(procs) as pool:
        tables = pool.map(_gen_chunk, jobs)
    table = pa.concat_tables(tables)
    # several files → several input splits for the Spark scan
    n_files = max(8, procs)
    rows_per_file = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        lo = i * rows_per_file
        if lo >= table.num_rows:
            break
        pq.write_table(
            table.slice(lo, rows_per_file),
            os.path.join(out_dir, f"part-{i:04d}.parquet"),
        )
    os.rename(out_dir, final_dir)
    return table.num_rows


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".data", "pages_bench")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120000
    print(generate_parquet(out, n), "rows →", out)
