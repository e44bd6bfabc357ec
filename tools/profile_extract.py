"""Phase profiler for the fused extraction path (scaling-gate diagnosis).

Times each sequential phase of ``bench.run_obie_extract`` separately so the
fixed-vs-parallel cost split is visible:

    gen        driver-side corpus generation (outside the gate timing)
    prepare    createDataFrame + repartition + cache + count
    fit        training (constant-size sample)
    vocab      unknown_vocabulary_df(...)               [corpus scan]
    linkmap    py_link_map or distributed build_link_map
    mapstage   the fused mapInPandas count              [the parallel work]

Usage:  SPARK_GRAFT_CPUS=32 OBIE_BENCH_DOCS=96000 python tools/profile_extract.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("OBIE_BENCH_DOCS", "96000"))
    train_docs = int(os.environ.get("OBIE_TRAIN_DOCS", "60"))

    from obiemachinelearningframework_spark.session import get_spark

    spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from obiemachinelearningframework_spark.fixtures import generate_corpus
    from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline
    from obiemachinelearningframework_spark.operators import fused as Fz

    t = {}
    t0 = time.perf_counter()
    c = generate_corpus("soccer", n_docs=n_docs, seed=42)
    t["gen"] = time.perf_counter() - t0

    pipe = OBIEPipeline(spark, c["ontology"])
    t0 = time.perf_counter()
    inst = pipe.prepare(spark.createDataFrame(c["source"])).repartition(cpus, "doc_key").cache()
    inst.count()
    t["prepare"] = time.perf_counter() - t0

    gold = spark.createDataFrame(c["gold_triples"])
    train_keys = inst.select("doc_key").orderBy("doc_key").limit(min(train_docs, n_docs))
    t0 = time.perf_counter()
    pipe.fit(inst.join(train_keys, "doc_key", "left_semi").cache(), gold)
    t["fit"] = time.perf_counter() - t0

    # --- extract, phase by phase (mirrors extract_fused's sequence) ---
    t0 = time.perf_counter()
    win_df = Fz.unknown_vocabulary_df(inst, pipe.ontology)
    head = win_df.take(Fz.LINK_MAP_DRIVER_MAX + 1)
    t["vocab"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if len(head) <= Fz.LINK_MAP_DRIVER_MAX:
        link_map = Fz.py_link_map([r["text"] for r in head], pipe.ontology)
        branch = "driver"
    else:
        from obiemachinelearningframework_spark.operators.linking import build_link_map

        win_df = win_df.localCheckpoint(eager=True)
        rows = build_link_map(win_df, pipe.ontology, spark).collect()
        link_map = {}
        for r in sorted(rows, key=lambda r: (r["token"], r["rank"])):
            link_map.setdefault(r["token"], []).append((r["type_id"], r["class_id"]))
        branch = "distributed"
    t["linkmap"] = time.perf_counter() - t0

    import pandas as pd
    from obiemachinelearningframework_spark.operators.fused import extract_fused

    t0 = time.perf_counter()
    link_df = spark.createDataFrame(
        pd.DataFrame(
            [
                (tok, tid, cls, rank)
                for tok, alts in link_map.items()
                for rank, (tid, cls) in enumerate(alts, start=1)
            ],
            columns=["token", "type_id", "class_id", "rank"],
        )
    ) if link_map else None
    n = extract_fused(
        inst, pipe.ontology, pipe.weights, pipe.thresholds,
        link_map_df=link_df,
    ).count()
    t["mapstage"] = time.perf_counter() - t0

    # full-path reference number (what bench.py times): re-run end to end
    t0 = time.perf_counter()
    n2 = pipe.predict_fused(inst).count()
    t["full_extract"] = time.perf_counter() - t0

    print(
        f"cpus={cpus} docs={n_docs} "
        f"linkmap={len(link_map)} branch={branch} triples={n}/{n2}"
    )
    for k, v in t.items():
        print(f"  {k:14s} {v:8.2f}s")


if __name__ == "__main__":
    main()
