"""BinaryClassificationRunner (run/DefaultBinaryClassificationRunner.java
+ objfunc/BinaryClassificationObjectiveFunction.java:31-39): document-level
root-individual classification, trained on the exact-match objective's
per-candidate decomposition, evaluated by the objective itself."""

import pandas as pd
import pytest

from obiemachinelearningframework_spark.fixtures.ontology import Ontology, _closure
from obiemachinelearningframework_spark.operators.mentions import prepare_instances
from obiemachinelearningframework_spark.plans.binary import BinaryClassificationRunner

PLAYERS = [
    ("p_alva", "Alva Reng"), ("p_bodo", "Bodo Klim"),
    ("p_cira", "Cira Voss"), ("p_dren", "Dren Pol"),
]


def _ontology() -> Ontology:
    classes = pd.DataFrame(
        [("Player", None, False, False, 0)],
        columns=["class_id", "parent_class_id", "is_datatype", "is_auxiliary", "level"],
    )
    slots = pd.DataFrame(
        [], columns=["owner_class_id", "slot_name", "range_class_id", "is_list",
                     "is_datatype", "max_cardinality"],
    )
    individuals = pd.DataFrame(
        [(pid, "Player", name) for pid, name in PLAYERS],
        columns=["individual_id", "class_id", "label"],
    )
    dictionary = pd.DataFrame(
        [(pid, "individual", name.lower()) for pid, name in PLAYERS],
        columns=["type_id", "kind", "surface_form"],
    )
    return Ontology(
        name="binary", classes=classes, slots=slots, individuals=individuals,
        dictionary=dictionary, closure=_closure({"Player": None}),
        root_class_id="Player", slot_order=[],
    )


def _docs(n, offset=0):
    rows, gold = [], []
    for i in range(n):
        g = PLAYERS[(i + offset) % 4]
        d = PLAYERS[(i + offset + 1) % 4]
        content = (f"{g[1]} scored twice tonight. {g[1]} celebrated the win. "
                   f"{d[1]} watched from the bench.")
        rows.append(("r0", f"doc{offset}_{i}.txt", "beefcafe", "en", content))
        gold.append((f"r0/doc{offset}_{i}.txt@beefcafe", g[0]))
    src = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    gold = pd.DataFrame(gold, columns=["doc_key", "individual_id"])
    return src, gold


@pytest.fixture(scope="module")
def runner(spark):
    ont = _ontology()
    r = BinaryClassificationRunner(spark, ont)
    src, gold = _docs(24)
    r.fit(prepare_instances(spark.createDataFrame(src)), spark.createDataFrame(gold))
    return r


def test_binary_runner_heldout_exact_match(runner, spark):
    src, gold = _docs(12, offset=2)
    inst = prepare_instances(spark.createDataFrame(src))
    pred = runner.predict(inst)
    acc = runner.exact_match_accuracy(pred, spark.createDataFrame(gold))
    assert acc >= 0.9, acc


def test_binary_runner_threshold_rejects_empty_doc(runner, spark):
    src = pd.DataFrame(
        [("r0", "none.txt", "beefcafe", "en", "Nothing relevant happened today.")],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    pred = runner.predict(prepare_instances(spark.createDataFrame(src)))
    assert pred.count() == 0
