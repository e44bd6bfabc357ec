"""Round-3 exploration upgrades, pinned end to end:

* the dictionary-token span gate (EntityRecognitionExplorer.java:135-187):
  a LOWERCASE two-token surface the capitalized-run heuristic can never
  see (and whose whitespace defeats the literal dictionary patterns)
  reaches fuzzy linking and survives all the way to a triple, on both the
  relational and the fused path;
* top-k fuzzy retrieval into exploration (LuceneRetrieval.java:39-40):
  with TWO string-equidistant link alternatives, the trained feature
  scorer flips the decision AWAY from the deterministic rank-1 candidate
  because document context (evidence frequency) favors rank 2 — the
  round-2 top-1-only collapse decided this by string similarity alone.
"""

import pandas as pd
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.fixtures.ontology import Ontology, _closure
from obiemachinelearningframework_spark.operators.linking import build_link_map
from obiemachinelearningframework_spark.operators.mentions import (
    UNKNOWN_KIND,
    detect_mentions,
)
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


def test_lowercase_span_gate_to_triple(spark):
    c = generate_corpus("soccer", n_docs=30, seed=21)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst_train = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    pipe.fit(inst_train, spark.createDataFrame(c["gold_triples"]))

    # lowercase + double space: the capitalized-run gate cannot enumerate
    # it, the literal dictionary pattern for "jonas varga" cannot match it
    # (.? glue spans one char) — ONLY the dictionary-token gate (both
    # tokens appear in dictionary surfaces) admits the span
    content = ("jonas  varga plays for FC Riverton. "
               "jonas  varga was born in 1994.")
    src = pd.DataFrame(
        [("r0", "doc.txt", "deadbeef", "en", content)],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    inst = pipe.prepare(spark.createDataFrame(src))

    unknowns = {
        r["text"]
        for r in detect_mentions(inst, c["ontology"], emit_unknown=True)
        .filter(F.col("kind") == UNKNOWN_KIND).collect()
    }
    assert "jonas  varga" in unknowns, sorted(unknowns)[:20]

    rel = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe.predict(inst)["triples"].select("subj", "pred", "obj").collect()
    }
    fused = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe.predict_fused(inst).select("subj", "pred", "obj").collect()
    }
    assert ("player_jonas_varga", "team", "team_riverton") in rel, sorted(rel)
    assert rel == fused


def _flip_ontology() -> Ontology:
    classes = pd.DataFrame(
        [("Player", None, False, False, 0), ("Team", None, False, False, 0)],
        columns=["class_id", "parent_class_id", "is_datatype", "is_auxiliary", "level"],
    )
    slots = pd.DataFrame(
        [("Player", "team", "Team", False, False, 1)],
        columns=["owner_class_id", "slot_name", "range_class_id", "is_list",
                 "is_datatype", "max_cardinality"],
    )
    individuals = pd.DataFrame(
        [
            ("player_anna_kron", "Player", "Anna Kron"),
            ("team_nodrex", "Team", "FC Nodrex"),
            ("team_nodrix", "Team", "FC Nodrix"),
        ],
        columns=["individual_id", "class_id", "label"],
    )
    dictionary = pd.DataFrame(
        [
            ("player_anna_kron", "individual", "anna kron"),
            ("team_nodrex", "individual", "fc nodrex"),
            ("team_nodrex", "individual", "nodrex"),
            ("team_nodrix", "individual", "fc nodrix"),
            ("team_nodrix", "individual", "nodrix"),
        ],
        columns=["type_id", "kind", "surface_form"],
    )
    parents = {r[0]: r[1] for r in classes.itertuples(index=False)}
    return Ontology(
        name="fliptest", classes=classes, slots=slots, individuals=individuals,
        dictionary=dictionary, closure=_closure(parents), root_class_id="Player",
        slot_order=["team"],
    )


def test_context_flips_ambiguous_link_away_from_rank1(spark):
    ont = _flip_ontology()
    pipe = OBIEPipeline(spark, ont)

    # training: the gold team is always mentioned TWICE (full + short form),
    # the distractor once — evidence frequency marks the gold filler
    rows, gold = [], []
    for i in range(12):
        g, d = ("Nodrex", "Nodrix") if i % 2 == 0 else ("Nodrix", "Nodrex")
        content = (f"Anna Kron joined FC {g} this week. "
                   f"{g.lower()} confirmed the transfer. "
                   f"A rumour involving FC {d} was denied.")
        rows.append(("r0", f"doc{i}.txt", "cafebabe", "en", content))
        dk = f"r0/doc{i}.txt@cafebabe"
        gold.append((dk, "player_anna_kron", "team", f"team_{g.lower()}"))
    inst = pipe.prepare(spark.createDataFrame(
        pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    )).cache()
    pipe.fit(inst, spark.createDataFrame(
        pd.DataFrame(gold, columns=["doc_key", "subj", "pred", "obj"])
    ))

    # "Nodrax" is string-equidistant from both teams' short surfaces
    # (lev_sim 0.833, identical gram jaccard) — the deterministic rank-1
    # tie-break picks team_nodrex (type_id asc). The document's context
    # (the exact "nodrix" mention elsewhere) must flip the decision to
    # team_nodrix via the evidence-frequency features.
    content = ("Anna Kron joined Nodrax this week. "
               "nodrix confirmed the transfer.")
    test_src = pd.DataFrame(
        [("r0", "probe.txt", "cafebabe", "en", content)],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    tinst = pipe.prepare(spark.createDataFrame(test_src))

    unk = spark.createDataFrame([("d", "Nodrax", 0, 6, 0)],
                                ["doc_key", "text", "onset", "offset", "sent_idx"])
    links = build_link_map(unk, ont, spark).orderBy("rank").collect()
    assert [r["type_id"] for r in links] == ["team_nodrex", "team_nodrix"], links

    rel = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe.predict(tinst)["triples"].select("subj", "pred", "obj").collect()
    }
    fused = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe.predict_fused(tinst).select("subj", "pred", "obj").collect()
    }
    assert ("player_anna_kron", "team", "team_nodrix") in rel, sorted(rel)
    assert ("player_anna_kron", "team", "team_nodrex") not in rel, sorted(rel)
    assert rel == fused
