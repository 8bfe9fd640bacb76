#!/usr/bin/env python
"""Capture .explain('formatted') for every bench entry (guide §1).

Writes plans/r13/<name>_<tag>.txt for the 10 headline queries and the 28
operator-library bench entries. Run BEFORE optimizing with tag=before and
after with tag=after; the judge checks plan claims against these files.

Usage: python plans/r13/capture_plans.py before [only_name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[2])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

OUT_DIR = Path(__file__).resolve().parent


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from duckdb_read_spark.catalog import register_tables
    from duckdb_read_spark.conf import RUNTIME_CONFS
    from duckdb_read_spark.queries import QUERIES

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r13-plan-capture")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, sf_dir)

    import bench as bench_mod

    names = list(bench_mod.BENCH_QUERIES)
    for name in names:
        if only and name not in only:
            continue
        df = spark.sql(QUERIES[name].spark)
        (OUT_DIR / f"{name}_{tag}.txt").write_text(plan_text(df))
        print(f"captured {name}")

    if not only or "b10_full_sort" in only:
        df = spark.sql(bench_mod._B10_FULL_SORT)
        (OUT_DIR / f"b10_full_sort_{tag}.txt").write_text(plan_text(df))
        print("captured b10_full_sort")

    from duckdb_read_spark.op_queries import OP_QUERIES

    op_names = [
        "q51_asof_union_op", "q55_ngram_jaccard", "q63_cosine_topk_pandas",
        "q66_simhash_neardup", "q71_rollup_reaggregate", "q74_clean_corpus",
        "q78_term_frequencies", "q80_dup_clusters", "q83_pack_sequences",
        "q93_dup_clusters_banded", "q85_repetition_stats",
        "q86_profile_columns", "q108_paragraph_dedup", "q110_entropy_stats",
        "q111_corpus_lm_score", "q114_bm25_search", "q115_tfidf_vectors",
        "q120_chunk_documents", "q122_iceberg_interop",
        "q123_clone_lifecycle", "q124_fts_sql_surface",
        "q125_gapfill_date_spine", "q131_iceberg_v2_deletes",
        "q133_positional_join", "q134_temperature_mix",
        "q135_delta_deletion_vectors", "q137_change_data_feed",
        # r13: streaming drains are bench entries now (VERDICT item 8);
        # the captured plan is the post-drain read (the drain itself is
        # a streaming query — its micro-batch plan is not a batch
        # explain), same convention as the lifecycle entries
        "q107_sliding_window_stream", "q109_session_window_stream",
        "q112_create_stream_sql", "q118_stream_versioned_sink",
        "q139_stream_table_source",
    ]
    for name in op_names:
        if only and name not in only:
            continue
        try:
            df = OP_QUERIES[name].runner(spark, sf_dir)
            (OUT_DIR / f"{name}_{tag}.txt").write_text(plan_text(df))
            print(f"captured {name}")
        except Exception as exc:  # keep going; record the failure
            (OUT_DIR / f"{name}_{tag}.txt").write_text(f"CAPTURE FAILED: {exc}\n")
            print(f"FAILED {name}: {exc}")

    if not only or "q55_prefix_tier" in only:
        # r13 item 7 evidence: the PPJoin positional filter lives in the
        # opt-in prefix tier (the declared q55 keeps the naive tier — it
        # is still faster at fixture scale; see OPTIMIZATION_r13.md)
        from duckdb_read_spark import operators as ops
        from duckdb_read_spark.catalog import load_table
        from duckdb_read_spark.op_queries import _SHINGLE_DF_CAP

        docs = load_table(spark, sf_dir, "documents")
        df = ops.ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                                     max_shingle_df=_SHINGLE_DF_CAP,
                                     prefix_filter=True)
        (OUT_DIR / f"q55_prefix_tier_{tag}.txt").write_text(plan_text(df))
        print("captured q55_prefix_tier")

    if not only or "q94_recursive_chain" in only:
        from duckdb_read_spark.plans.recursive import (
            materialize_recursive_inputs,
        )

        text = materialize_recursive_inputs(
            spark, QUERIES["q94_recursive_chain"].spark)
        df = spark.sql(text)
        (OUT_DIR / f"q94_recursive_chain_{tag}.txt").write_text(plan_text(df))
        print("captured q94_recursive_chain")

    spark.stop()


if __name__ == "__main__":
    main()
