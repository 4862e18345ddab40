"""Distributed XInclude resolution (P10) as a DataFrame join.

The reference resolves ``<xi:include href=...>`` by opening the file
mid-parse (reference: parser.c:990-1079). At cluster scale the include
graph must be resolved as *data*: scan every document's text for
include hrefs (JVM-side regexp, no Python), resolve them against the
parent's directory, join against the docs table itself, and attach the
transitive closure (bounded depth) to each root document as a
``map<resolved_path, struct<text, parser>>`` column. The extraction
kernel then satisfies include lookups from the row-local map — the
parse stays narrow; the only shuffles are the (usually broadcast-sized)
include joins.

Limitations vs the filesystem reference, by design: ``..`` traversal is
normalized only lexically, and include cycles are cut by ``max_depth``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# href scan over raw markup; prefix may vary but the reference accepts
# any prefix bound to the XInclude namespaces — a namespace-accurate
# parse happens inside the kernel; this scan only OVER-collects
# candidate targets (harmless extras in the map).
_HREF_PATTERN = r'<[A-Za-z0-9_]+:include[^>]*href\s*=\s*["\']([^"\']+)["\']'


def _doc_text(col: str = "spans") -> F.Column:
    """Concatenate a doc's text spans (markup arrives as text spans)."""
    return F.array_join(
        F.transform(
            F.filter(col, lambda s: s["kind"] != F.lit("media")),
            lambda s: s["text"],
        ),
        "",
    )


def _resolved_href(doc_id_col, href_col) -> F.Column:
    """Lexical resolution of href against the parent doc_id's directory."""
    parent_dir = F.regexp_replace(doc_id_col, "/[^/]*$", "")
    joined = F.when(
        href_col.startswith("/") | ~doc_id_col.contains("/"), href_col
    ).otherwise(F.concat_ws("/", parent_dir, href_col))
    # lexical '..' collapse, two passes (covers ../.. chains of the corpus)
    once = F.regexp_replace(joined, "[^/]+/\\.\\./", "")
    return F.regexp_replace(once, "[^/]+/\\.\\./", "")


def doc_hrefs(docs: DataFrame) -> DataFrame:
    """(doc_id, target) pairs from the markup — one JVM regexp scan."""
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(_doc_text(), F.lit(_HREF_PATTERN), 1)
            ).alias("href"),
        )
        .select("doc_id", _resolved_href(F.col("doc_id"), F.col("href")).alias("target"))
        .distinct()
    )


def with_includes(docs: DataFrame, max_depth: int = 3) -> DataFrame:
    """Attach the transitive include closure as an ``includes`` map column.

    Iterates ``max_depth`` frontier joins (driver-side loop, cluster-side
    work); each join is candidate-target sized, so Spark broadcasts it
    when small and shuffles on the hash otherwise — either way the
    subsequent extraction remains a narrow map.
    """
    # materialize the href scan ONCE: edges is consumed by isEmpty,
    # every frontier join, exceptAll and the final closure join — an
    # uncached lineage re-ran the full-corpus regexp scan (the most
    # expensive narrow step here) per consumer and per loop iteration.
    # The edge list is href pairs, orders of magnitude smaller than the
    # corpus, so an eager localCheckpoint is cheap and also truncates
    # the loop's growing lineage (same pattern as resolve_clusters).
    edges = doc_hrefs(docs).localCheckpoint(eager=True)  # (doc_id, target)
    if edges.isEmpty():
        return docs.withColumn(
            "includes",
            F.lit(None).cast("map<string,struct<text:string,parser:string>>"),
        )

    # transitive closure rooted at each including doc
    closure = edges.select(F.col("doc_id").alias("root"), "target")
    frontier = closure
    for _ in range(max_depth - 1):
        nxt = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.target") == F.col("e.doc_id"))
            .select(F.col("f.root").alias("root"), F.col("e.target").alias("target"))
            .distinct()
        )
        new = nxt.exceptAll(closure.select("root", "target")).localCheckpoint(
            eager=True
        )
        if new.isEmpty():
            break
        closure = closure.unionByName(new).distinct()
        frontier = new

    # attach target payloads (text + parser hint)
    targets = docs.select(
        F.col("doc_id").alias("target"),
        _doc_text().alias("t_text"),
        (
            F.col("parser")
            if "parser" in docs.columns
            else F.lit(None).cast("string")
        ).alias("t_parser"),
    )
    incl = (
        closure.join(targets, "target")
        .groupBy("root")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("target"),
                        F.struct(
                            F.col("t_text").alias("text"),
                            F.col("t_parser").alias("parser"),
                        ),
                    )
                )
            ).alias("includes")
        )
    )
    return docs.join(incl, docs.doc_id == incl.root, "left").drop("root")


def extract_with_xinclude(docs: DataFrame, config=None, max_depth: int = 3):
    """XInclude-aware extraction: resolve via joins, then narrow extract."""
    from libswish3_spark.pipeline import extract

    return extract(with_includes(docs, max_depth), config=config)
