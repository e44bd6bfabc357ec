"""Exploration gating: sibling-differentiability, evidence-free class
candidates, InvestigationRestriction, auxiliary pattern inheritance."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures.ontology import (
    Ontology,
    _closure,
    disease_ontology,
    soccer_ontology,
)
from obiemachinelearningframework_spark.functions.patterns import compile_pattern_table
from obiemachinelearningframework_spark.operators.candidates import (
    generate_candidates,
    is_differentiable_to_all_siblings,
)
from obiemachinelearningframework_spark.operators.evaluator import TreeComparator


@pytest.fixture(scope="module")
def diff_ontology():
    """Tiny ontology with a sibling-differentiable class: Surgery and
    Medication are siblings under Treatment; Medication owns a 'drug' slot
    Surgery lacks -> Medication is differentiable, Surgery is not
    (Surgery's slots are a subset of nobody's concern: it has none)."""
    classes = pd.DataFrame(
        [
            ("Case", None, False, False, 0),
            ("Treatment", None, False, False, 0),
            ("Surgery", "Treatment", False, False, 1),
            ("Medication", "Treatment", False, False, 1),
            ("Drug", None, False, False, 0),
        ],
        columns=["class_id", "parent_class_id", "is_datatype", "is_auxiliary", "level"],
    )
    slots = pd.DataFrame(
        [
            ("Case", "treatment", "Treatment", False, False, 1),
            ("Medication", "drug", "Drug", False, False, 1),
        ],
        columns=["owner_class_id", "slot_name", "range_class_id", "is_list", "is_datatype", "max_cardinality"],
    )
    individuals = pd.DataFrame(
        [("case_1", "Case", "Case One")], columns=["individual_id", "class_id", "label"]
    )
    dictionary = pd.DataFrame(
        [("case_1", "individual", "case one"), ("Surgery", "class", "surgery")],
        columns=["type_id", "kind", "surface_form"],
    )
    parents = {r[0]: r[1] for r in classes.itertuples(index=False)}
    return Ontology(
        name="difftest", classes=classes, slots=slots, individuals=individuals,
        dictionary=dictionary, closure=_closure(parents), root_class_id="Case",
        slot_order=["treatment"],
    )


def test_differentiability_predicate(diff_ontology):
    # Medication owns 'drug', Surgery does not -> differentiable
    assert is_differentiable_to_all_siblings(diff_ontology, "Medication", "Treatment")
    # Surgery has no slot its sibling lacks -> not differentiable
    assert not is_differentiable_to_all_siblings(diff_ontology, "Surgery", "Treatment")
    # no siblings -> not differentiable (reference :718-720)
    assert not is_differentiable_to_all_siblings(diff_ontology, "Case", "Case")


def test_soccer_positions_not_differentiable():
    ont = soccer_ontology()
    for pos in ["Goalkeeper", "Defender", "Midfielder", "Striker"]:
        assert not is_differentiable_to_all_siblings(ont, pos, "Position")


def test_evidence_free_candidates(spark, diff_ontology):
    """Medication (differentiable) gets ONE schema-level candidate per doc
    with no textual anchor; Surgery needs a mention."""
    mentions = spark.createDataFrame(
        [
            ("d1", "individual", "case_1", "Case", "case_1", False, "Case One", 0, 8, 0, None, "ner"),
            ("d1", "class", "Surgery", "Surgery", None, False, "surgery", 20, 27, 0, None, "ner"),
            ("d2", "individual", "case_1", "Case", "case_1", False, "Case One", 0, 8, 0, None, "ner"),
        ],
        "doc_key string, kind string, type_id string, class_id string, individual_id string, "
        "is_datatype boolean, text string, onset int, offset int, sent_idx int, dt_value string, src string",
    )
    cands = generate_candidates(mentions, diff_ontology).collect()
    med = [r for r in cands if r.class_id == "Medication"]
    sur = [r for r in cands if r.class_id == "Surgery"]
    assert {(r.doc_key, r.onset) for r in med} == {("d1", -1), ("d2", -1)}
    assert [r.src for r in med] == ["schema", "schema"]
    assert {(r.doc_key, r.onset) for r in sur} == {("d1", 20)}  # evidence-gated


def test_investigation_restriction_candidates(spark):
    ont = soccer_ontology()
    mentions = spark.createDataFrame(
        [
            ("d1", "individual", "team_riverton", "Team", "team_riverton", False, "Riverton", 0, 8, 0, None, "ner"),
            ("d1", "class", "Goalkeeper", "Goalkeeper", None, False, "keeper", 12, 18, 0, None, "ner"),
        ],
        "doc_key string, kind string, type_id string, class_id string, individual_id string, "
        "is_datatype boolean, text string, onset int, offset int, sent_idx int, dt_value string, src string",
    )
    allc = generate_candidates(mentions, ont)
    only_team = generate_candidates(mentions, ont, restrict_slots=frozenset(["team"]))
    assert set(r.slot_name for r in allc.collect()) >= {"team", "position"}
    assert set(r.slot_name for r in only_team.collect()) == {"team"}
    none = generate_candidates(mentions, ont, restrict_slots=frozenset())
    assert none.count() == 0


def test_investigation_restriction_evaluator():
    """Restricted slots are invisible to the comparison
    (OBIEState.java:232-261)."""
    gold = {"class_id": "Player", "individual_id": "p1", "dt_value": None, "text": None,
            "slots": {"team": [{"class_id": "Team", "individual_id": "t1", "dt_value": None,
                                "text": None, "slots": {}}],
                      "position": [{"class_id": "Goalkeeper", "individual_id": None,
                                    "dt_value": None, "text": None, "slots": {}}]}}
    pred = {"class_id": "Player", "individual_id": "p1", "dt_value": None, "text": None,
            "slots": {"team": [{"class_id": "Team", "individual_id": "t1", "dt_value": None,
                                "text": None, "slots": {}}],
                      "position": [{"class_id": "Striker", "individual_id": None,
                                    "dt_value": None, "text": None, "slots": {}}]}}
    full = TreeComparator(frozenset(), frozenset()).compare(gold, pred)
    assert full == (2, 1, 1)  # root + team match; position wrong
    restricted = TreeComparator(
        frozenset(), frozenset(), restrict_slots=frozenset(["team"])
    ).compare(gold, pred)
    assert restricted == (2, 0, 0)  # position invisible


def test_aux_pattern_inheritance():
    """Auxiliary classes inherit their slot-range classes' patterns
    (AbstractRegExNERL.java:251-282): the soccer Honour aux class must own
    pattern rows even though 'Honour' itself never appears in text."""
    ont = soccer_ontology()
    rows = compile_pattern_table(ont)
    aux_rows = [r for r in rows if r["type_id"] == "Honour"]
    assert aux_rows, "Honour inherited no patterns"
    import re as _re

    pats = [_re.compile(r["pattern"], 2 | 16) for r in aux_rows]  # I | DOTALL
    assert any(p.search("won the champions trophy in") for p in pats)


def test_disease_domain_unaffected_by_differentiability():
    ont = disease_ontology()
    cls = ont.classes
    for c in cls.class_id:
        row = cls.set_index("class_id").loc[c]
        parent = row.parent_class_id
        if is_differentiable_to_all_siblings(ont, c, parent or c):
            # any differentiable class in the fixtures would change the
            # candidate tables and break parity pins — there are none
            raise AssertionError(f"unexpected differentiable fixture class {c}")
