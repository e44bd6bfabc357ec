"""Mention detection (regex + dictionary NER) — the scan/filter/project layer.

Re-creates the behavior of the reference's ``ner/regex/AbstractRegExNERL``
(``annotateClasses``/``annotateIndividuals``, ``:62-158``): every ontology
class/individual contributes a set of precompiled patterns; all patterns run
over every document; matches shorter than ``min_ner_length`` are dropped;
matches of datatype classes additionally get a semantic interpretation
(``IDatatypeInterpreter.interpret``).

Execution model: the pattern table is compiled ONCE on the driver from the
broadcast ontology tables, shipped to executors, and applied inside
``mapInPandas`` over Arrow batches — the reference's per-class
``parallelStream`` (:71) becomes partition parallelism. At 100 TB the scan
partitions by (repo, lang); filters on those columns prune at the source.
For dictionaries beyond ~10^4 surface forms the literal-pattern family
should be swapped for an Aho-Corasick automaton inside the same UDF; the
interface (pattern rows in, mention rows out) is unchanged.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions import interpreter
from ..functions.patterns import FLAGS, compile_pattern_table
from ..functions.tokenize import sent_index_of, sentence_bounds

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.StringType()),
        T.StructField("kind", T.StringType()),          # class | individual
        T.StructField("type_id", T.StringType()),
        T.StructField("class_id", T.StringType()),
        T.StructField("individual_id", T.StringType()),
        T.StructField("is_datatype", T.BooleanType()),
        T.StructField("text", T.StringType()),
        T.StructField("onset", T.IntegerType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("sent_idx", T.IntegerType()),
        T.StructField("dt_value", T.StringType()),
    ]
)


def prepare_instances(source_df: DataFrame) -> DataFrame:
    """Source table -> instances: stable doc_key + per-row sha256 invariant
    (BASELINE.json.input_hint: sha256(content) equality source→sink)."""
    return source_df.withColumn(
        "doc_key",
        F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.substring("commit", 1, 8)),
    ).withColumn("sha256", F.sha2(F.col("content"), 256))


def detect_mentions(instances: DataFrame, ontology, min_ner_length: int = 2) -> DataFrame:
    """instances(doc_key, content, ...) -> mentions DataFrame.

    One output row per (pattern match x type); duplicates from overlapping
    pattern families (dictionary + auto-generated) collapsed on
    (doc_key, kind, type_id, onset, offset). Ambiguous spans (two types
    matching the same text) are KEPT — disambiguation is the slot-filling
    scorer's job, as in the reference.
    """
    pattern_rows = compile_pattern_table(ontology)
    spark = instances.sparkSession
    bc = spark.sparkContext.broadcast(pattern_rows)
    min_len = min_ner_length

    def run(batches):
        compiled = [
            (r["type_id"], r["kind"], r["class_id"], bool(r["is_datatype"]), re.compile(r["pattern"], FLAGS))
            for r in bc.value
        ]
        for pdf in batches:
            out = {k: [] for k in MENTION_SCHEMA.fieldNames()}
            for doc_key, content in zip(pdf["doc_key"], pdf["content"]):
                content = content or ""
                bounds = sentence_bounds(content)
                for type_id, kind, class_id, is_dt, pat in compiled:
                    for m in pat.finditer(content):
                        text = m.group(0)
                        if len(text) < min_len:
                            continue
                        dt_value = None
                        if is_dt:
                            dt_value = interpreter.interpret_match(m)
                            if dt_value is None:
                                # dictionary-matched string datatype: the
                                # lowercased surface IS the interpreted value
                                dt_value = text.lower()
                        out["doc_key"].append(doc_key)
                        out["kind"].append(kind)
                        out["type_id"].append(type_id)
                        out["class_id"].append(class_id)
                        out["individual_id"].append(type_id if kind == "individual" else None)
                        out["is_datatype"].append(is_dt)
                        out["text"].append(text)
                        out["onset"].append(m.start())
                        out["offset"].append(m.end())
                        out["sent_idx"].append(sent_index_of(bounds, m.start()) if bounds else 0)
                        out["dt_value"].append(dt_value)
            yield pd.DataFrame(out)

    mentions = instances.select("doc_key", "content").mapInPandas(run, schema=MENTION_SCHEMA)
    return mentions.dropDuplicates(["doc_key", "kind", "type_id", "onset", "offset"])
