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
from ..operators.mentions import UNKNOWN_KIND, detect_mentions, prepare_instances
from ..operators.features import build_pairs, compute_features
from ..operators.trainer import (
    label_pairs,
    model_weights_df,
    thresholds_from_weights,
    train_weights,
)
from ..operators.triples import materialize_triples


class OBIEPipeline:
    def __init__(self, spark, ontology, min_ner_length: int = 2, fuzzy_linking: bool = True,
                 trainer: str = "auto", ds_mode: bool = False, train_as_kb: bool = False):
        """``trainer``: 'numpy' (driver full-batch GD — exact, for
        fixture-sized training samples), 'distributed' (Spark ML L-BFGS
        over executor-assembled sparse vectors — no corpus-sized driver
        collect), 'liblinear' (the reference's LibLinearScorer analog:
        L1-regularized, scorer/LibLinearScorer.java:31-41), 'hashed'
        (distributed + signed feature hashing — no driver collect of the
        feature VOCABULARY either; the escape hatch for corpora whose
        bow/char-gram vocabulary outgrows HASH_VOCAB_MAX), or 'auto'
        (numpy up to TRAIN_COLLECT_MAX_PAIRS labeled pairs, then
        distributed, escalating to hashed when the approximate distinct
        feature count exceeds HASH_VOCAB_MAX), or 'numpy_scheduled'
        (numpy GD under the reference's epoch-strategy schedule —
        ``trainer.objective_epochs``: objective-signal epochs 1 and the
        seeded ~10%, model-disagreement emphasis otherwise;
        DefaultSlotFillingRunner.java:36-48,96-131).

        ``ds_mode``: the reference's enableDistantSupervision — the
        TokenContext family additionally fires at the positions of ALL
        NERL mentions of the assigned class/individual
        (templates/TokenContextTemplate.java:157-232), applied identically
        at fit and predict time (relational + fused).

        ``train_as_kb``: TrainAsKnowledgeBaseTemplate wiring — the
        training gold becomes the KnowledgeBaseTemplate's KB: masked
        leave-one-doc-out at fit time (a doc cannot see its own gold) and
        unmasked at predict time (held-out docs are not in the KB). An
        explicit ``kb_triples`` argument to predict()/predict_fused()
        still overrides."""
        self.spark = spark
        self.ontology = ontology
        self.min_ner_length = min_ner_length
        self.fuzzy_linking = fuzzy_linking
        self.trainer = trainer
        self.ds_mode = ds_mode
        self.train_as_kb = train_as_kb
        self._kb_triples: DataFrame | None = None
        self.weights: pd.DataFrame | None = None
        self.thresholds: dict = {}
        self._predict_caches: list = []

    def release_caches(self) -> None:
        """Unpersist the caches the last predict() pinned (mentions + the
        pairs table). Call after materializing its outputs; predict() also
        calls it on entry, so repeated predicts (e.g. the AL loop) never
        accumulate cached corpora."""
        for c in self._predict_caches:
            c.unpersist()
        self._predict_caches = []

    TRAIN_COLLECT_MAX_PAIRS = 200_000

    # ---------------------------------------------------------------- stages

    def prepare(self, source_df: DataFrame) -> DataFrame:
        return prepare_instances(source_df)

    def _n_shuffle(self) -> int:
        return int(self.spark.conf.get("spark.sql.shuffle.partitions"))

    def _mentions_with_caches(self, instances: DataFrame):
        """Mentions clustered by doc_key — THE one corpus-sized exchange of
        the whole extraction plan. Every downstream join / window / groupBy
        / dropDuplicates keys on a doc_key-prefixed key set, and
        hash-partitioning on doc_key satisfies ClusteredDistribution for
        any superset, so Catalyst inserts no further exchange on the big
        tables (checked in PLANS.md). Explicit partition count (not bare
        repartition("doc_key")) so AQE cannot coalesce the exchange down
        before the feature explode multiplies the data ~50x.

        Returns (mentions_df, caches_to_unpersist)."""
        dedup_keys = ["doc_key", "kind", "type_id", "onset", "offset"]
        n = self._n_shuffle()
        if not self.fuzzy_linking:
            base = detect_mentions(instances, self.ontology, self.min_ner_length)
            return base.repartition(n, "doc_key"), []
        from ..operators.linking import apply_link_map, link_map_auto

        # one kernel pass emits detected mentions AND uncovered capitalized
        # tokens; cached so the link-map sub-job does not re-run the regex
        # kernel (mention-sized, cheap to hold)
        raw = detect_mentions(
            instances, self.ontology, self.min_ner_length, emit_unknown=True
        ).cache()
        unknown = raw.filter(F.col("kind") == UNKNOWN_KIND).select(
            "doc_key", "text", "onset", "offset", "sent_idx"
        )
        links = link_map_auto(unknown, self.ontology, self.spark)
        linked = apply_link_map(unknown, links)
        base = raw.filter(F.col("kind") != UNKNOWN_KIND).unionByName(linked)
        return base.repartition(n, "doc_key").dropDuplicates(dedup_keys), [raw]

    def mentions(self, instances: DataFrame) -> DataFrame:
        return self._mentions_with_caches(instances)[0]

    def _ds_context(self, mentions: DataFrame, instances: DataFrame):
        if not self.ds_mode:
            return None
        from ..operators.features import ds_token_context

        return ds_token_context(mentions, instances)

    def roots_and_candidates(self, mentions: DataFrame):
        # candidates is a union of per-slot branches — union loses the
        # partitioning property, so re-declare doc_key clustering on the
        # (small, mention-sized) candidate table; the (root x candidate)
        # join and everything after it then stays exchange-free
        cands = generate_candidates(mentions, self.ontology).repartition(
            self._n_shuffle(), "doc_key"
        )
        return propose_roots(mentions, self.ontology), cands

    # ----------------------------------------------------------------- train

    def fit(self, instances: DataFrame, gold_triples: DataFrame,
            splits: DataFrame | None = None, train_split: str = "train") -> "OBIEPipeline":
        inst = instances
        if splits is not None:
            train_keys = splits.filter(F.col("split") == train_split).select("doc_key")
            inst = instances.join(train_keys, "doc_key", "left_semi")
        mentions, caches = self._mentions_with_caches(inst)
        mentions = mentions.cache()
        roots, candidates = self.roots_and_candidates(mentions)
        pairs = build_pairs(roots, candidates, inst).cache()
        kb_fit = None
        if self.train_as_kb:
            # fit-time KB view = the training gold WITH doc_key, which
            # compute_features masks leave-one-doc-out; kept (doc_key-free)
            # for predict-time membership
            kb_fit = gold_triples.select("doc_key", "subj", "pred", "obj")
            self._kb_triples = gold_triples.select("subj", "pred", "obj").distinct()
        feats = compute_features(pairs, self.ontology, kb_triples=kb_fit,
                                 ds_context=self._ds_context(mentions, inst))
        labels = label_pairs(pairs, gold_triples)
        mode = self.trainer
        labels_pdf = None
        if mode == "auto":
            # the labeled-pair count decides whether a driver collect is
            # safe. Probe with a BOUNDED limit+collect instead of a
            # count(): when the numpy path wins (the common fixture/bench
            # case) the probe result IS the label table that
            # train_weights would re-collect — one action over the pairs
            # chain instead of two (round-5: obie_fit phase profile put
            # the count at ~2s of an ~8s fit)
            head = labels.limit(self.TRAIN_COLLECT_MAX_PAIRS + 1).toPandas()
            if len(head) <= self.TRAIN_COLLECT_MAX_PAIRS:
                mode = "numpy"
                labels_pdf = head
            else:
                # second escalation: when even the feature VOCABULARY is
                # too big to collect (assemble_vectors' named path pulls
                # the distinct feature strings through the driver), switch
                # to signed feature hashing — one cheap approx-distinct
                # aggregation decides
                from ..operators.trainer import HASH_VOCAB_MAX

                n_vocab = feats.agg(
                    F.approx_count_distinct("feature").alias("n")
                ).collect()[0]["n"]
                mode = "hashed" if n_vocab > HASH_VOCAB_MAX else "distributed"
        if mode == "distributed":
            from ..operators.trainer import train_weights_distributed

            self.weights = train_weights_distributed(feats, labels)
        elif mode == "hashed":
            from ..operators.trainer import train_weights_hashed

            self.weights = train_weights_hashed(feats, labels)
        elif mode == "liblinear":
            from ..operators.trainer import train_weights_liblinear

            self.weights = train_weights_liblinear(feats, labels)
        elif mode == "numpy_scheduled":
            self.weights = train_weights(feats, labels, epoch_schedule=True,
                                         labels_pdf=labels_pdf)
        else:
            self.weights = train_weights(feats, labels, labels_pdf=labels_pdf)
        self.thresholds = thresholds_from_weights(self.weights)
        for c in [mentions, pairs, *caches]:
            c.unpersist()
        return self

    # --------------------------------------------------------------- predict

    def predict(self, instances: DataFrame, alias_edges: DataFrame | None = None,
                kb_triples: DataFrame | None = None) -> dict:
        assert self.weights is not None, "fit() or load_weights() first"
        if kb_triples is None and self.train_as_kb:
            kb_triples = self._kb_triples
        w_df = model_weights_df(self.spark, self.weights)
        # two cache points only: mentions (the regex kernel feeds both the
        # roots and the candidates branch — without it the expensive UDF
        # scan runs twice) and pairs (inside scored_pairs: feeds the feature
        # pass and the score join-back). roots/candidates are single-reader
        # projections of cached mentions — caching them would only add
        # materialization stages.
        mentions, caches = self._mentions_with_caches(instances)
        mentions = mentions.cache()
        # eager materialization: AQE submits the downstream broadcast/shuffle
        # query stages in parallel, and several of them read this cache — if
        # it is still lazy they RACE and each recomputes the regex kernel
        # (observed: 3 concurrent duplicate kernel jobs). One count pins it.
        mentions.count()
        # the raw kernel cache only exists to feed the mentions cache just
        # materialized — release it now, or every predict() call pins a
        # corpus-mention-sized block for the session lifetime
        for c in caches:
            c.unpersist()
        # mentions + the pairs cache inside scored_pairs stay pinned while
        # the returned (lazy) DataFrames are in use; release_caches() frees
        # them once the caller has materialized its outputs
        self.release_caches()
        self._predict_caches.append(mentions)
        roots, candidates = self.roots_and_candidates(mentions)
        from ..operators.trainer import hashed_dim

        pairs = scored_pairs(roots, candidates, instances, w_df, self.ontology, kb_triples,
                             cache_registry=self._predict_caches,
                             hashed_dim=hashed_dim(self.weights),
                             ds_context=self._ds_context(mentions, instances))
        assignments = greedy_fill(pairs, self.ontology, self.thresholds)
        triples = materialize_triples(assignments)
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
            # the CC loop below runs iterative actions — cache the fixpoint
            # input so the scoring chain is not recomputed per iteration
            triples = triples.cache()
            ent_ids = self.spark.createDataFrame(
                self.ontology.individuals[["individual_id"]].rename(
                    columns={"individual_id": "id"}
                )
            )
            comps = connected_components(
                canonicalization_edges(triples, alias_edges, entity_ids=ent_ids)
            )
            triples = canonicalize_triples(triples, comps)
        return {
            "mentions": mentions,
            "roots": roots,
            "candidates": candidates,
            "scored_pairs": pairs,
            "assignments": assignments,
            "triples": triples,
        }

    def predict_fused(self, instances: DataFrame, kb_triples: DataFrame | None = None,
                      carry_cols: tuple = ()) -> DataFrame:
        """Map-only hot path: the whole per-document inference fused into
        one mapInPandas stage with the model broadcast
        (``operators/fused.py``). Emits triples only; asserted equal to
        ``predict()['triples']`` in tests/test_fused_parity.py. This is the
        plan shape the 10^12-file job runs: a scan-shaped job with no
        corpus-sized shuffle, so throughput scales with executors.
        ``carry_cols`` (e.g. ``("repo", "lang")``) ride through the kernel
        onto every triple so the partitioned sink needs no corpus join."""
        assert self.weights is not None, "fit() or load_weights() first"
        from ..operators.fused import extract_fused

        if kb_triples is None and self.train_as_kb:
            kb_triples = self._kb_triples
        return extract_fused(
            instances, self.ontology, self.weights, self.thresholds,
            min_ner_length=self.min_ner_length, kb_triples=kb_triples,
            fuzzy_linking=self.fuzzy_linking, carry_cols=carry_cols,
            ds_mode=self.ds_mode,
        )

    # ----------------------------------------------------------- model (de)ser

    def save_weights(self, path: str) -> None:
        self.weights.to_json(path, orient="records", lines=True, double_precision=15)

    def load_weights(self, path: str) -> "OBIEPipeline":
        self.weights = pd.read_json(path, orient="records", lines=True)
        self.thresholds = thresholds_from_weights(self.weights)
        return self
