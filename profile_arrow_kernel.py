#!/usr/bin/env python
"""Profile extract_batch_fn (the mapInArrow kernel) including its
Arrow conversion layer, single-process. Not part of the bench contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow as pa
import pyarrow.parquet as pq

from libswish3_spark.config import default_config
from libswish3_spark.pipeline import extract_batch_fn

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH = 2000


def build_batches():
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    sources = t.column("source").to_pylist()
    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    batches = []
    for a in range(0, len(ids), BATCH):
        chunk_ids = [str(d) for d in ids[a : a + BATCH]]
        spans = [
            [
                {
                    "kind": "text",
                    "text": f"<html><head><title>doc {d} from {s}</title></head><body>{x}</body></html>",
                    "media_ref": "",
                    "offset": 0,
                }
            ]
            for d, x, s in zip(
                ids[a : a + BATCH], texts[a : a + BATCH], sources[a : a + BATCH]
            )
        ]
        batches.append(
            pa.RecordBatch.from_arrays(
                [
                    pa.array(chunk_ids, pa.string()),
                    pa.array(spans, pa.list_(span_t)),
                    pa.array(["HTML"] * len(chunk_ids), pa.string()),
                ],
                names=["doc_id", "spans", "parser"],
            )
        )
    return batches


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "--time"
    batches = build_batches()
    n = sum(b.num_rows for b in batches)
    fn = extract_batch_fn(default_config())
    list(fn(batches[:1]))  # warm

    def run():
        tot = 0
        for out in fn(batches):
            tot += out.num_rows
        return tot

    if mode == "--cprofile":
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        run()
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(40)
    else:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{n} docs in {best:.3f}s = {n / best:.0f} docs/s/core (arrow kernel)")


if __name__ == "__main__":
    main()
