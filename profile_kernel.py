#!/usr/bin/env python
"""Single-process extraction-kernel profiler (guide §1: measure first).

Loads sf documents via pyarrow, wraps them exactly like the bench
corpus (_html_wrap), and runs parse_to_state serially — no Spark, so
cProfile sees the pure kernel. Not part of the bench contract.

Usage: python profile_kernel.py [ndocs] [--cprofile|--time] [--parser HTML]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow.parquet as pq

from libswish3_spark.config import default_config
from libswish3_spark.parser import parse_to_state

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_docs(n: int) -> list[tuple[str, str]]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    ids = t.column("doc_id").to_pylist()[:n]
    texts = t.column("text").to_pylist()[:n]
    sources = t.column("source").to_pylist()[:n]
    return [
        (
            str(d),
            f"<html><head><title>doc {d} from {s}</title></head><body>{x}</body></html>",
        )
        for d, x, s in zip(ids, texts, sources)
    ]


def run(docs, cfg, parser="HTML"):
    total = 0
    for doc_id, html in docs:
        st = parse_to_state(
            doc_id,
            [{"kind": "text", "text": html, "media_ref": "", "offset": 0}],
            parser,
            cfg,
        )
        total += st.nwords
    return total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    mode = sys.argv[2] if len(sys.argv) > 2 else "--time"
    parser = sys.argv[4] if "--parser" in sys.argv else "HTML"
    docs = load_docs(n)
    cfg = default_config()
    run(docs[:200], cfg, parser)  # warm regex/table caches
    if mode == "--cprofile":
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        total = run(docs, cfg, parser)
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(45)
        print(f"nwords={total}")
    else:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            total = run(docs, cfg, parser)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(
            f"{n} docs in {best:.3f}s best-of-3 = {n / best:.0f} docs/s/core, nwords={total}"
        )


if __name__ == "__main__":
    main()
