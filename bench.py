"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...}

--scaling mode: run the SAME job at local[8] and local[32] (the sandbox
proxy for N vs 4N executors, per BASELINE.md §3) in separate processes and
write BENCH/BASELINE.md with throughput at both levels + scaling
efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


HEADLINE = [
    "mentions_dict",
    "high_frequency",
    "triples_kg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simhash",
    "doc_fingerprint",
    "cosine_topk",
    "ann_lsh_buckets",
    "pricing_summary",
    "sessionize_events",
    "token_count_bpe",
    "multimodal_image_stats",
]

OBIE_BENCH_DOCS = int(os.environ.get("OBIE_BENCH_DOCS", "300"))
OBIE_TRAIN_DOCS = int(os.environ.get("OBIE_TRAIN_DOCS", "60"))


def run_obie_extract(spark, n_docs: int, train_docs: int = OBIE_TRAIN_DOCS):
    """Flagship OBIE job: train the model on a FIXED-size sample (training
    is a constant-cost planning step at production scale — the model does
    not grow with the corpus), then run the data-parallel extraction
    (mentions -> candidates -> features -> score -> fill -> triples) over
    the whole corpus. Returns (n_triples, extract_seconds, fit_seconds):
    extraction throughput is what scales with cluster size."""
    from pyspark.sql import functions as F

    from obiemachinelearningframework_spark.fixtures import generate_corpus
    from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline

    c = generate_corpus("soccer", n_docs=n_docs, seed=42)
    pipe = OBIEPipeline(spark, c["ontology"])
    cpus = spark.sparkContext.defaultParallelism
    # cluster the instance table by doc_key at the source — the whole
    # extraction plan keys on doc_key prefixes, so this is the only
    # corpus-sized exchange the job ever does
    inst = pipe.prepare(spark.createDataFrame(c["source"])).repartition(cpus, "doc_key").cache()
    inst.count()
    gold = spark.createDataFrame(c["gold_triples"])
    train_keys = (
        inst.select("doc_key").orderBy("doc_key").limit(min(train_docs, n_docs))
    )
    t0 = time.perf_counter()
    pipe.fit(inst.join(train_keys, "doc_key", "left_semi").cache(), gold)
    fit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = pipe.predict(inst)
    n_triples = out["triples"].count()
    extract_s = time.perf_counter() - t0
    return n_triples, extract_s, fit_s


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from obiemachinelearningframework_spark.session import get_spark
    from obiemachinelearningframework_spark import queries as Q

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers outside timing
    Q._docs(spark, sf_dir).count()

    timings: dict[str, float] = {}
    total = 0.0
    triple_count = 0
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        if name == "triples_kg":
            triple_count = n

    obie_triples, extract_s, fit_s = run_obie_extract(spark, OBIE_BENCH_DOCS)
    timings["obie_fit"] = round(fit_s, 3)
    timings["obie_extract"] = round(extract_s, 3)
    total += fit_s + extract_s

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "triples_kg_rows": triple_count,
        "obie_docs": OBIE_BENCH_DOCS,
        "obie_triples": obie_triples,
        "obie_triples_per_sec": round(obie_triples / extract_s, 2),
    }
    print(json.dumps(out))


def scaling() -> None:
    """Run the identical bench at local[8] and local[32]; write BENCH/BASELINE.md.

    The corpus is enlarged (OBIE_SCALING_DOCS, default 1500) so executor-side
    work dominates the fixed per-action driver overhead — the regime a real
    cluster runs in; the same rationale as measuring cluster scaling on a
    saturated workload rather than an idle-latency one."""
    runs: dict[int, list] = {8: [], 32: []}
    scaling_docs = os.environ.get("OBIE_SCALING_DOCS", "1500")
    repeats = int(os.environ.get("OBIE_SCALING_REPEATS", "3"))
    # interleave the two configs and repeat: the sandbox VM suffers bursty
    # hypervisor steal (3-4x wall-time swings), so a single A-then-B pass
    # confounds config with luck; min-of-k per config estimates the
    # uncontended capability each side actually has
    for rep in range(repeats):
        for cpus in (8, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), OBIE_BENCH_DOCS=scaling_docs)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
            runs[cpus].append(json.loads(line))
            print(f"rep{rep} local[{cpus}]: {line}")

    results = {
        cpus: min(rs, key=lambda r: r["queries"]["obie_extract"]) for cpus, rs in runs.items()
    }
    r8, r32 = results[8], results[32]
    thr8 = r8["obie_triples_per_sec"]
    thr32 = r32["obie_triples_per_sec"]
    q8, q32 = r8["value"], r32["value"]
    eff_obie = (thr32 / thr8) / 4.0
    eff_total = (q8 / q32) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — two-parallelism scaling evidence\n\n"
            "Identical job + input at `local[8]` vs `local[32]` (sandbox proxy for N vs 4N\n"
            "executors per BASELINE.md §3). Throughput = triples/sec of the data-parallel\n"
            f"extraction phase (mentions -> candidates -> features -> score -> fill ->\n"
            f"triples) over {r8['obie_docs']} generated source-code docs; the model is\n"
            "trained once on a fixed 60-doc sample (constant-cost planning step —\n"
            "the model does not grow with the corpus).\n\n"
            "| parallelism | headline total (s) | obie_fit (s) | obie_extract (s) | triples | triples/sec |\n"
            "|---|---|---|---|---|---|\n"
            f"| local[8] | {q8} | {r8['queries']['obie_fit']} | {r8['queries']['obie_extract']} | {r8['obie_triples']} | {thr8} |\n"
            f"| local[32] | {q32} | {r32['queries']['obie_fit']} | {r32['queries']['obie_extract']} | {r32['obie_triples']} | {thr32} |\n\n"
            f"- Extraction scaling efficiency (thr32/thr8)/4 = **{eff_obie:.3f}**\n"
            f"- Headline-suite wall-time ratio normalized (t8/t32)/4 = **{eff_total:.3f}**\n\n"
            "Method: configs interleaved and repeated (min-of-"
            f"{repeats} per config) because the sandbox VM shows bursty hypervisor\n"
            "steal time with 3-4x wall-time swings; the minimum estimates each\n"
            "config's uncontended capability. Caveats: (1) one JVM shares memory\n"
            "bandwidth across threads — a real 4x executor group scales I/O and\n"
            "memory bandwidth too; (2) the headline micro-queries at sf0.1 run\n"
            "0.2-6 s each and are dominated by fixed per-action costs, so their\n"
            "ratio is NOT a scaling signal — the extraction phase is the saturated\n"
            "workload.\n\n"
            f"all runs local[8] extract (s): {[r['queries']['obie_extract'] for r in runs[8]]}\n\n"
            f"all runs local[32] extract (s): {[r['queries']['obie_extract'] for r in runs[32]]}\n\n"
            f"raw best local[8]: `{json.dumps(r8)}`\n\n"
            f"raw best local[32]: `{json.dumps(r32)}`\n"
        )
    print(f"scaling efficiency (obie triples/sec): {eff_obie:.3f}")


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
