#!/usr/bin/env python
"""Measure the reference C engine's real single-node throughput.

BASELINE.md's original finding stands: karpet/libswish3 publishes no
benchmark numbers. This script *produces* them — it compiles the
reference's own sources (read-only, in place at $REFERENCE_PATH) into a
scratch ``swish_lint`` binary and times it over the exact corpus shape
bench.py uses (sf documents HTML-wrapped), alongside this repo's
pure-Python parse kernel on the same docs. Nothing from the reference
is copied anywhere; the binary is built in /tmp purely as a measuring
stick.

Prereqs (present in this sandbox): gcc, make-level libc headers,
libxml2 dev (pkg-config libxml-2.0), zlib.

Outputs one JSON line:
  {"reference_single_proc_docs_per_sec": ..., "reference_16way_docs_per_sec": ...,
   "ours_single_core_docs_per_sec": ..., "reference_total_words": N,
   "ours_total_words": N, "words_match": true, ...}

Parity check: swish_lint's corpus-wide ``total words`` must equal the
sum of our kernel's per-doc nwords over the identical HTML bytes — the
strongest single-number cross-engine validation available (word counts
fold parser, tokenizer, metaname and bump-word semantics together).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BUILD = "/tmp/refbuild"
CORPUS = "/tmp/refcorpus"
NPROC = 16  # matches bench.py's 4N level (16 of 32 cores)
# filelist repetition: 5000 docs parse in ~0.17 s single-process —
# too short to time; ×32 (160k parse units, page-cached reads) runs
# ~5 s single / ~0.5 s 16-way
REP = int(os.environ.get("REFBENCH_REP", "32"))

# the subset of acconfig.h.in facts true on this box (autoheader would
# generate the same ones; autoconf is not installed so we pin them)
_ACCONFIG = """\
#define HAVE_LIBXML2 1
#define HAVE_STDINT_H 1
#define HAVE_STDIO_H 1
#define HAVE_STDLIB_H 1
#define HAVE_STRING_H 1
#define HAVE_STRINGS_H 1
#define HAVE_SYS_STAT_H 1
#define HAVE_SYS_TYPES_H 1
#define HAVE_UNISTD_H 1
#define HAVE_GETRUSAGE 1
#define HAVE_SYS_RESOURCE_H 1
#define HAVE_TIMES 1
#define HAVE_SYS_PARAM_H 1
#define HAVE_DLFCN_H 1
#define HAVE_INTTYPES_H 1
#define VERSION "refbench"
"""


def build_swish_lint() -> str:
    os.makedirs(BUILD, exist_ok=True)
    binary = os.path.join(BUILD, "swish_lint")
    if os.path.exists(binary):
        return binary
    with open(os.path.join(BUILD, "acconfig.h"), "w") as f:
        f.write(_ACCONFIG)
    lib = os.path.join(REFERENCE, "src", "libswish3")
    srcs = sorted(
        os.path.join(lib, f)
        for f in os.listdir(lib)
        # utf8.c is #include'd by string.c; getruntime.c duplicates
        # times.c's get_cpu_secs (the autotools build picks one)
        if f.endswith(".c") and f not in ("utf8.c", "getruntime.c")
    )
    xml2 = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "libxml-2.0"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    cmd = (
        ["gcc", "-O2", "-w", "-o", binary,
         os.path.join(REFERENCE, "src", "swish_lint.c")]
        + srcs + ["-I", BUILD, "-I", lib] + xml2 + ["-lz", "-lm"]
    )
    subprocess.run(cmd, check=True)
    return binary


def write_corpus() -> tuple[list[str], int]:
    """sf documents → the same HTML wrap bench.py's corpus uses."""
    import pyarrow.parquet as pq

    os.makedirs(CORPUS, exist_ok=True)
    df = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pandas()
    paths = []
    for r in df.itertuples():
        p = os.path.join(CORPUS, f"{r.doc_id}.html")
        if not os.path.exists(p):
            with open(p, "w") as f:
                f.write(
                    f"<html><head><title>doc {r.doc_id} from {r.source}"
                    f"</title></head><body>{r.text}</body></html>"
                )
        paths.append(p)
    return paths, len(df)


def run_ref(binary: str, filelist: str) -> tuple[float, int]:
    env = dict(os.environ, LC_ALL="C.utf8")
    t0 = time.perf_counter()
    out = subprocess.run(
        [binary, "--filelist", filelist, "--tokenize", "1"],
        capture_output=True, text=True, env=env, check=True,
    ).stdout
    dt = time.perf_counter() - t0
    words = 0
    for line in out.splitlines():
        if line.startswith("total words:"):
            words = int(line.split(":")[1])
    return dt, words


def main() -> int:
    binary = build_swish_lint()
    paths, n_base = write_corpus()
    big = paths * REP
    n = len(big)
    flist = os.path.join(CORPUS, "bench_filelist.txt")
    with open(flist, "w") as f:
        f.write("\n".join(big) + "\n")

    # single process, best of 2
    best_dt, ref_words = min(run_ref(binary, flist) for _ in range(2))
    single = n / best_dt

    # NPROC-way sharded (the reference ships no parallel driver; this
    # bounds what a hand-sharded C deployment could do on one box)
    shards = []
    for k in range(NPROC):
        p = os.path.join(CORPUS, f"bench_shard{k}.txt")
        with open(p, "w") as f:
            f.write("\n".join(big[k::NPROC]) + "\n")
        shards.append(p)
    env = dict(os.environ, LC_ALL="C.utf8")
    par_best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        procs = [
            subprocess.Popen(
                [binary, "--filelist", s, "--tokenize", "1"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env,
            )
            for s in shards
        ]
        for p in procs:
            assert p.wait() == 0
        par_best = max(par_best, n / (time.perf_counter() - t0))

    # our kernel, single core, same bytes (no Spark: isolates the parse)
    from libswish3_spark.config import default_config
    from libswish3_spark.parser import parse_to_state

    cfg = default_config()
    docs = [(os.path.basename(p), open(p).read()) for p in paths]
    for d, h in docs[:100]:
        parse_to_state(d, [("text", h, "")], "HTML", cfg)
    ours_words = 0
    t0 = time.perf_counter()
    for d, h in docs:
        ours_words += parse_to_state(d, [("text", h, "")], "HTML", cfg).nwords
    ours = n_base / (time.perf_counter() - t0)

    # reference words are over n = n_base*REP identical parses
    ref_words_base = ref_words // REP
    result = {
        "reference_single_proc_docs_per_sec": round(single, 1),
        f"reference_{NPROC}way_docs_per_sec": round(par_best, 1),
        "ours_single_core_docs_per_sec": round(ours, 1),
        "reference_total_words": ref_words_base,
        "ours_total_words": ours_words,
        "words_match": ref_words_base == ours_words,
        "n_docs": n_base,
        "rep": REP,
        "sf_dir": SF_DIR,
    }
    print(json.dumps(result))
    return 0 if result["words_match"] else 1


if __name__ == "__main__":
    sys.exit(main())
