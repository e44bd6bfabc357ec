"""The code import-graph query: pure-Python pinning of the synthesized
registry entry, plus the same regex patterns over genuine multi-line
Python sources (the production content shape per BASELINE input_hint) to
pin the extraction itself — including from-imports, duplicate-edge
dedup, and dangling-module resolution."""

import re

import pandas as pd
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.queries import (
    FROM_RE,
    IMPORT_RE,
    MOD_SPACE,
    q_code_import_graph,
)

SF_DIR = "/root/testdata/sf0.001"


def test_import_graph_matches_python(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    got = {(r.src, r.dst): r.resolved
           for r in q_code_import_graph(spark, SF_DIR).collect()}
    defined = {f"mod_{d}" for d in docs.doc_id}
    expect = {}
    for d in docs.doc_id:
        targets = {
            f"mod_{(d * 7 + 1) % MOD_SPACE}",
            f"mod_{(d * 13 + 5) % MOD_SPACE}",
            f"mod_{(d * 31 + 11) % MOD_SPACE}",
        }
        for t in targets:
            expect[(f"mod_{d}", t)] = int(t in defined)
    assert got == expect
    # at this SF the module space (1000) exceeds the corpus (500 docs),
    # so both resolution outcomes are genuinely exercised
    assert 0 in got.values() and 1 in got.values()


def test_import_patterns_on_real_python_source(spark):
    sources = [
        ("repo/a.py",
         "import mod_1\nimport mod_2 as m2\nfrom mod_3 import util\n"
         "def f():\n    return util()\n"),
        ("repo/b.py",
         "# import mod_9 in a comment still counts for a regex scanner\n"
         "from mod_1 import x\nimport mod_1\n"),
        ("repo/c.py", "def g():\n    pass\n"),
    ]
    sdf = spark.createDataFrame(sources, ["path", "content"])
    edges = (
        sdf.select(
            "path",
            F.explode(
                F.concat(
                    F.regexp_extract_all("content", F.lit(IMPORT_RE), F.lit(1)),
                    F.regexp_extract_all("content", F.lit(FROM_RE), F.lit(1)),
                )
            ).alias("dst"),
        )
        .distinct()
    )
    got = {(r.path, r.dst) for r in edges.collect()}
    expect = set()
    for path, content in sources:
        for m in re.findall(IMPORT_RE, content):
            expect.add((path, m))
        for m in re.findall(FROM_RE, content):
            expect.add((path, m))
    assert got == expect
    assert ("repo/a.py", "mod_1") in got and ("repo/a.py", "mod_3") in got
    assert ("repo/b.py", "mod_1") in got          # deduped across both forms
    assert not any(p == "repo/c.py" for p, _ in got)  # no imports -> no edges
