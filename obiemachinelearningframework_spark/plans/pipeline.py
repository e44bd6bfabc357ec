"""End-to-end OBIE pipeline plan: train + predict.

Mirrors the reference's run lifecycle (``run/AbstractOBIERunner``):
corpus construction -> NER -> (train: sampling + learner) -> prediction ->
evaluation — with every per-document loop batched into DataFrame stages
over all documents at once (legal because the reference's sampling is
per-document independent; SURVEY.md §3.2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..operators.candidates import generate_candidates, propose_roots
from ..operators.filler import greedy_fill, scored_pairs
from ..operators.mentions import detect_mentions, prepare_instances
from ..operators.features import build_pairs, compute_features
from ..operators.trainer import (
    label_pairs,
    model_weights_df,
    thresholds_from_weights,
    train_weights,
)
from ..operators.triples import materialize_triples


class OBIEPipeline:
    def __init__(self, spark, ontology, min_ner_length: int = 2, fuzzy_linking: bool = True):
        self.spark = spark
        self.ontology = ontology
        self.min_ner_length = min_ner_length
        self.fuzzy_linking = fuzzy_linking
        self.weights: pd.DataFrame | None = None
        self.thresholds: dict = {}

    # ---------------------------------------------------------------- stages

    def prepare(self, source_df: DataFrame) -> DataFrame:
        return prepare_instances(source_df)

    def mentions(self, instances: DataFrame) -> DataFrame:
        base = detect_mentions(instances, self.ontology, self.min_ner_length)
        if self.fuzzy_linking:
            from ..operators.linking import fuzzy_link_tokens, unknown_capitalized_tokens

            unknown = unknown_capitalized_tokens(instances, base)
            linked = fuzzy_link_tokens(unknown, self.ontology, self.spark)
            base = base.unionByName(linked).dropDuplicates(
                ["doc_key", "kind", "type_id", "onset", "offset"]
            )
        return base

    def roots_and_candidates(self, mentions: DataFrame):
        return propose_roots(mentions, self.ontology), generate_candidates(mentions, self.ontology)

    # ----------------------------------------------------------------- train

    def fit(self, instances: DataFrame, gold_triples: DataFrame,
            splits: DataFrame | None = None, train_split: str = "train") -> "OBIEPipeline":
        inst = instances
        if splits is not None:
            train_keys = splits.filter(F.col("split") == train_split).select("doc_key")
            inst = instances.join(train_keys, "doc_key", "left_semi")
        mentions = self.mentions(inst).cache()
        roots, candidates = self.roots_and_candidates(mentions)
        pairs = build_pairs(roots, candidates, inst).cache()
        feats = compute_features(pairs, self.ontology)
        labels = label_pairs(pairs, gold_triples)
        self.weights = train_weights(feats, labels)
        self.thresholds = thresholds_from_weights(self.weights)
        mentions.unpersist()
        pairs.unpersist()
        return self

    # --------------------------------------------------------------- predict

    def predict(self, instances: DataFrame, alias_edges: DataFrame | None = None) -> dict:
        assert self.weights is not None, "fit() or load_weights() first"
        w_df = model_weights_df(self.spark, self.weights)
        # cache each fan-out point: roots/candidates both read mentions, and
        # pairs reads both — without caching the mention UDF chain re-runs
        # once per downstream branch
        mentions = self.mentions(instances).cache()
        roots, candidates = self.roots_and_candidates(mentions)
        roots = roots.cache()
        candidates = candidates.cache()
        pairs = scored_pairs(roots, candidates, instances, w_df, self.ontology)
        # cache the fixpoints: canonicalization below runs iterative actions
        # and must not recompute the scoring chain per iteration
        assignments = greedy_fill(pairs, self.ontology, self.thresholds).cache()
        triples = materialize_triples(assignments).cache()
        # cross-doc canonicalization: entity ids from dictionary grounding
        # and fuzzy linking are already canonical individual ids (the
        # similarity join in operators/linking.py maps every surface variant
        # onto its dictionary entry BEFORE candidates are built), so the
        # entity graph here has only identity self-edges and connected
        # components is the identity map — skip the iterative loop. Supply
        # alias_edges to merge entities discovered equal by other evidence;
        # the CC operator itself is exercised directly in tests.
        from ..operators.canonicalize import (
            canonicalization_edges,
            canonicalize_triples,
            connected_components,
        )

        if alias_edges is not None:
            comps = connected_components(canonicalization_edges(triples, alias_edges))
            triples = canonicalize_triples(triples, comps)
        else:
            triples = triples.dropDuplicates(["doc_key", "subj", "pred", "obj"])
        return {
            "mentions": mentions,
            "roots": roots,
            "candidates": candidates,
            "assignments": assignments,
            "triples": triples,
        }

    # ----------------------------------------------------------- model (de)ser

    def save_weights(self, path: str) -> None:
        self.weights.to_json(path, orient="records", lines=True, double_precision=15)

    def load_weights(self, path: str) -> "OBIEPipeline":
        self.weights = pd.read_json(path, orient="records", lines=True)
        self.thresholds = thresholds_from_weights(self.weights)
        return self
