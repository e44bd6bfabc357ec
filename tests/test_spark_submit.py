"""End-to-end spark-submit drive of the north rule's execution mode: the
package shipped via --py-files (tools/make_pyfiles.py), train then extract
through spark_submit_job.py in SEPARATE JVMs (exactly how a cluster runs
it), triples written partitioned by (repo, lang), lineage + metrics
checkpointed, and the content-sha256 invariant asserted by the job itself.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)


def _submit(*args: str) -> subprocess.CompletedProcess:
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", os.path.join(ROOT, "dist", "obie_spark.zip"),
        os.path.join(ROOT, "spark_submit_job.py"), *args,
    ]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    # the packaged zip must be the import source on the cluster; strip the
    # repo from PYTHONPATH so a stale zip cannot silently fall back
    env["PYTHONPATH"] = ""
    return subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                          cwd="/tmp", env=env)


def test_submit_train_then_extract(spark, tmp_path):
    sys.path.insert(0, ROOT)
    from tools.make_pyfiles import build

    build()

    from obiemachinelearningframework_spark.fixtures import generate_corpus

    c = generate_corpus("soccer", n_docs=40, seed=5)
    src_dir, gold_dir = str(tmp_path / "source"), str(tmp_path / "gold")
    spark.createDataFrame(c["source"]).write.parquet(src_dir)
    spark.createDataFrame(c["gold_triples"]).write.parquet(gold_dir)

    weights = str(tmp_path / "weights.jsonl")
    p = _submit("train", "--source", src_dir, "--gold", gold_dir,
                "--weights", weights)
    assert p.returncode == 0, p.stderr[-3000:]
    assert os.path.exists(weights)

    out = str(tmp_path / "triples")
    ck = str(tmp_path / "ck")
    p = _submit("extract", "--source", src_dir, "--weights", weights,
                "--output", out, "--checkpoint-dir", ck)
    assert p.returncode == 0, p.stderr[-3000:]
    assert "sha256 mismatches: 0" in p.stdout

    # (repo, lang) partitioned layout on disk
    parts = glob.glob(f"{out}/repo=*/lang=*")
    assert parts, f"no partitioned output under {out}"
    # lineage manifest + metrics committed; the content digest must ride IN
    # the manifest (atomic with the stage commit) — the resume path refuses
    # a committed manifest that lacks it
    assert os.path.exists(f"{ck}/triples/_MANIFEST.json")
    man = json.load(open(f"{ck}/triples/_MANIFEST.json"))
    assert man.get("meta", {}).get("content_digest"), man
    metrics = [json.loads(l) for l in open(f"{ck}/_metrics.jsonl")]
    assert any(m.get("n_triples", 0) > 0 for m in metrics)

    # idempotent resume: a re-run against the committed manifest does no
    # extraction work and exits cleanly
    p = _submit("extract", "--source", src_dir, "--weights", weights,
                "--output", out, "--checkpoint-dir", ck)
    assert p.returncode == 0, p.stderr[-3000:]
    assert "resume: triples stage already committed" in p.stdout


def test_submit_code_domain(spark, tmp_path):
    """The graft's target payload IS source code — drive the cluster
    entrypoint end-to-end on the code-domain fixture (Module/imports/
    calls ontology) through real spark-submit."""
    sys.path.insert(0, ROOT)
    from tools.make_pyfiles import build

    build()

    from obiemachinelearningframework_spark.fixtures import generate_corpus

    c = generate_corpus("code", n_docs=40, seed=11)
    src_dir, gold_dir = str(tmp_path / "source"), str(tmp_path / "gold")
    spark.createDataFrame(c["source"]).write.parquet(src_dir)
    spark.createDataFrame(c["gold_triples"]).write.parquet(gold_dir)

    weights = str(tmp_path / "weights.jsonl")
    p = _submit("train", "--domain", "code", "--source", src_dir,
                "--gold", gold_dir, "--weights", weights)
    assert p.returncode == 0, p.stderr[-3000:]

    out, ck = str(tmp_path / "triples"), str(tmp_path / "ck")
    p = _submit("extract", "--domain", "code", "--source", src_dir,
                "--weights", weights, "--output", out, "--checkpoint-dir", ck)
    assert p.returncode == 0, p.stderr[-3000:]
    assert "sha256 mismatches: 0" in p.stdout
    assert glob.glob(f"{out}/repo=*/lang=*")
    metrics = [json.loads(l) for l in open(f"{ck}/_metrics.jsonl")]
    assert any(m.get("n_triples", 0) > 0 for m in metrics)
