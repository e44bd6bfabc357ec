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

    # precision: links must not invent wrong individuals for known-good rows
    merged = linked.merge(
        typos[["doc_key", "onset", "individual_id"]].astype({"onset": int}),
        on=["doc_key", "onset"],
        suffixes=("_pred", "_gold"),
    )
    if len(merged):
        assert (merged.individual_id_pred == merged.individual_id_gold).mean() >= 0.95
