"""Fuzzy entity linking: unseen typos must link to the right individual."""

from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.linking import (
    fuzzy_link_tokens,
    unknown_capitalized_tokens,
)
from obiemachinelearningframework_spark.operators.mentions import detect_mentions, prepare_instances


def test_fuzzy_links_unseen_typos(spark):
    c = generate_corpus("disease", n_docs=60, seed=42)
    inst = prepare_instances(spark.createDataFrame(c["source"]))
    mentions = detect_mentions(inst, c["ontology"])
    unknown = unknown_capitalized_tokens(inst, mentions)
    linked = fuzzy_link_tokens(unknown, c["ontology"], spark).toPandas()

    # gold mentions that were NOT findable by dictionary (the "...um" typos)
    gold = c["gold_nodes"]
    typos = gold[gold.text.notna() & gold.text.str.endswith("um") & (gold.slot_name == "compound")]
    assert len(typos) > 0, "fixture should contain unseen typos"
    got = set(zip(linked.doc_key, linked.individual_id, linked.onset.astype(int)))
    hit = sum(1 for t in typos.itertuples() if (t.doc_key, t.individual_id, int(t.onset)) in got)
    assert hit >= 0.9 * len(typos), f"linked {hit}/{len(typos)} typo mentions"

    # precision: the RANK-1 link must not invent wrong individuals for
    # known-good rows (ranks 2..top_k are retrieval alternatives for the
    # scorer to disambiguate, not assertions)
    from obiemachinelearningframework_spark.operators.linking import (
        apply_link_map,
        build_link_map,
    )

    top1 = apply_link_map(
        unknown, build_link_map(unknown, c["ontology"], spark).filter("rank = 1")
    ).toPandas()
    merged = top1.merge(
        typos[["doc_key", "onset", "individual_id"]].astype({"onset": int}),
        on=["doc_key", "onset"],
        suffixes=("_pred", "_gold"),
    )
    if len(merged):
        assert (merged.individual_id_pred == merged.individual_id_gold).mean() >= 0.95


def test_multi_token_misspelled_span_links(spark):
    """A two-token surface misspelled in BOTH tokens must link as one span
    (EntityRecognitionExplorer's 8->1 span enumeration, reduced here to the
    fuzzy-similarity gate): 'Jonaz Vargo' -> player_jonas_varga."""
    from obiemachinelearningframework_spark.fixtures.ontology import soccer_ontology
    from obiemachinelearningframework_spark.operators.mentions import detect_mentions, UNKNOWN_KIND
    from obiemachinelearningframework_spark.operators.linking import fuzzy_link_tokens
    from pyspark.sql import functions as F

    ont = soccer_ontology()
    assert (ont.dictionary.surface_form == "jonas varga").any()
    content = "The match report praised Jonaz Vargo for a great season."
    inst = spark.createDataFrame([("d1", content)], ["doc_key", "content"])
    raw = detect_mentions(inst, ont, emit_unknown=True)
    unknown = raw.filter(F.col("kind") == UNKNOWN_KIND).select(
        "doc_key", "text", "onset", "offset", "sent_idx"
    )
    texts = {r["text"] for r in unknown.collect()}
    assert "Jonaz Vargo" in texts           # the 2-token span was enumerated
    linked = fuzzy_link_tokens(unknown, ont, spark).collect()
    by_ind = {r["individual_id"]: r for r in linked}
    assert "player_jonas_varga" in by_ind, [r.asDict() for r in linked]
    r = by_ind["player_jonas_varga"]
    assert content[r["onset"]:r["offset"]] == "Jonaz Vargo"


def test_fused_link_map_covers_multi_token_spans(spark):
    """The fused kernel's link map (distributed unknown-surface scan + py
    scoring mirror) must agree with the relational path on the same span,
    and its values are ORDERED top-k alternative lists."""
    from obiemachinelearningframework_spark.fixtures.ontology import soccer_ontology
    from obiemachinelearningframework_spark.operators.fused import (
        py_link_map, unknown_vocabulary_df,
    )

    ont = soccer_ontology()
    inst = spark.createDataFrame(
        [("d1", "Jonaz Vargo and Mateo Silva signed today.")], ["doc_key", "content"]
    )
    vocab = [r["text"] for r in unknown_vocabulary_df(inst, ont).collect()]
    assert any(" " in v for v in vocab)
    lm = py_link_map(vocab, ont)
    assert lm["jonaz vargo"][0][0] == "player_jonas_varga"


def test_link_map_auto_matches_distributed(spark):
    """The driver-gated fast path must emit exactly the distributed join's
    (token, type_id, class_id, rank) rows on a real fixture vocabulary."""
    from obiemachinelearningframework_spark.operators.linking import (
        build_link_map,
        link_map_auto,
    )

    c = generate_corpus("disease", n_docs=60, seed=42)
    inst = prepare_instances(spark.createDataFrame(c["source"]))
    mentions = detect_mentions(inst, c["ontology"])
    unknown = unknown_capitalized_tokens(inst, mentions)
    cols = ["token", "type_id", "class_id", "rank"]
    fast = link_map_auto(unknown, c["ontology"], spark)
    assert "lev_sim" not in fast.columns  # proves the driver path was taken
    a = sorted(map(tuple, fast.select(cols).collect()))
    b = sorted(map(tuple, build_link_map(unknown, c["ontology"], spark).select(cols).collect()))
    assert a == b and len(a) > 0
