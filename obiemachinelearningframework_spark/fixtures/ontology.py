"""Data-driven ontology tables.

The reference compiles an OWL ontology to Java classes (OWL2JavaBin) and
navigates them by reflection (``ReflectionUtils.getSlots /
getAssignableSubClasses``, used e.g. at
``explorer/SlotFillerExplorer.java:271`` and
``explorer/utils/ExplorationUtils.java:375-380`` in the reference).
We replace the compiled schema with five plain tables that are broadcast
to every executor:

    classes(class_id, parent_class_id, is_datatype, is_auxiliary, level)
    slots(owner_class_id, slot_name, range_class_id, is_list, is_datatype,
          max_cardinality)
    individuals(individual_id, class_id, label)
    dictionary(type_id, kind, surface_form)        # kind: class|individual
    closure(ancestor_class_id, descendant_class_id)  # reflexive-transitive

``is_auxiliary`` mirrors ``ExplorationUtils.isAuxiliary``
(reference ``explorer/utils/ExplorationUtils.java:62-110``): a class with a
single implementation, no individuals and no siblings, whose mention
evidence is inherited rather than textual.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd


@dataclass
class Ontology:
    name: str
    classes: pd.DataFrame
    slots: pd.DataFrame
    individuals: pd.DataFrame
    dictionary: pd.DataFrame
    closure: pd.DataFrame
    root_class_id: str = ""
    # slot evaluation/exploration order for the beam sweep (deterministic,
    # stands in for the reference's reflection field order)
    slot_order: list = field(default_factory=list)
    # hand-made regex patterns per datatype class (the reference's
    # getHandMadePatternForClasses hook, ner/regex/BasicRegExPattern.java:258)
    datatype_patterns: dict = field(default_factory=dict)

    def to_spark(self, spark):
        """Materialize the five tables as (small, broadcastable) DataFrames."""
        return {
            "classes": spark.createDataFrame(self.classes),
            "slots": spark.createDataFrame(self.slots),
            "individuals": spark.createDataFrame(self.individuals),
            "dictionary": spark.createDataFrame(self.dictionary),
            "closure": spark.createDataFrame(self.closure),
        }

    @property
    def class_depth(self) -> dict:
        """class_id -> hierarchy level (HierarchyTemplate's depth feature,
        ``templates/HierarchyTemplate.java:117-119``)."""
        return dict(zip(self.classes.class_id, self.classes.level))

    def subclasses_of(self, class_id: str) -> list:
        c = self.closure
        return sorted(c[c.ancestor_class_id == class_id].descendant_class_id.tolist())

    def individuals_of(self, class_id: str) -> pd.DataFrame:
        descendants = set(self.subclasses_of(class_id))
        ind = self.individuals
        return ind[ind.class_id.isin(descendants)]


def _closure(parents: dict) -> pd.DataFrame:
    """Reflexive-transitive closure of the parent relation (computed once on
    the driver; ontologies are tiny — this is the broadcast side of every
    subclass join, never a distributed recursive join)."""
    rows = []
    for c in parents:
        node = c
        rows.append((c, c))
        while parents.get(node):
            node = parents[node]
            rows.append((node, c))
    return pd.DataFrame(rows, columns=["ancestor_class_id", "descendant_class_id"]).drop_duplicates()


_CITIES = [
    "Riverton", "Eastwick", "Northvale", "Southmere", "Westbrook", "Lakewood",
    "Stonebridge", "Ashford", "Clearwater", "Maplewood", "Oakdale", "Pinehurst",
    "Elmwood", "Birchfield", "Cedarville", "Willowbank", "Hazelton", "Foxborough",
    "Greenfield", "Silverlake", "Goldcrest", "Ironbridge", "Copperhill", "Bluewater",
    "Redcliffe", "Whitehaven", "Blackwood", "Greystone", "Brightwater", "Fairview",
    "Sunnydale", "Moorland", "Heathrow", "Kingsport", "Queensferry", "Dukefield",
    "Earlton", "Barondale", "Knightsbridge", "Squireton",
]

_POSITIONS = {
    "Goalkeeper": ["goalkeeper", "keeper", "shot stopper"],
    "Defender": ["defender", "centre back", "full back"],
    "Midfielder": ["midfielder", "playmaker", "central midfielder"],
    "Striker": ["striker", "forward", "centre forward"],
}

_FIRST = [
    "Viktor", "Mateo", "Jonas", "Luca", "Emil", "Henrik", "Pavel", "Andres",
    "Bruno", "Casper", "Dario", "Elias", "Felix", "Gustav", "Hugo", "Ivan",
    "Jakob", "Karim", "Leon", "Milan",
]
_LAST = [
    "Sorensen", "Petrov", "Almeida", "Kowalski", "Lindqvist", "Moreau",
    "Novak", "Olsen", "Petersen", "Quintana", "Rasmussen", "Silva",
    "Tanaka", "Ullmann", "Varga", "Weber", "Xavier", "Ypsilanti",
    "Zimmermann", "Andersen",
]

HONOURS = ["Champions Trophy", "Golden Boot", "League Title", "Continental Cup"]


def player_pool() -> list:
    """60 deterministic (player_id, full_name) pairs shared across docs —
    the same player appearing in many documents is what makes cross-doc
    canonicalization (connected components) meaningful."""
    pool = []
    for i in range(60):
        first = _FIRST[i % len(_FIRST)]
        last = _LAST[(i * 7 + i // len(_FIRST)) % len(_LAST)]
        name = f"{first} {last}"
        pool.append((f"player_{name.lower().replace(' ', '_')}", name))
    # ensure uniqueness (the arithmetic above guarantees it, but assert anyway)
    assert len({p[0] for p in pool}) == len(pool)
    return pool


def soccer_ontology() -> Ontology:
    """Domain A — 'soccer-player-like' slot filling (FIXTURES.md F3).

    Shape mirrors the reference's SoccerPlayer example
    (/root/reference/README.md:15-19): one root class with individual-valued
    list slots, a class-valued slot with siblings, datatype slots with and
    without units, and a list of auxiliary-class annotations.
    """
    classes = [
        ("Player", None, False, False, 0),
        ("Team", None, False, False, 0),
        ("Position", None, False, False, 0),
        *[(p, "Position", False, False, 1) for p in _POSITIONS],
        ("BirthYear", None, True, False, 0),
        ("Height", None, True, False, 0),
        ("Honour", None, False, True, 0),     # auxiliary: no individuals/siblings
        ("HonourName", None, True, False, 0),
        ("HonourYear", None, True, False, 0),
    ]
    classes_df = pd.DataFrame(
        classes, columns=["class_id", "parent_class_id", "is_datatype", "is_auxiliary", "level"]
    )
    slots = [
        ("Player", "team", "Team", True, False, 3),
        ("Player", "position", "Position", False, False, 1),
        ("Player", "birthYear", "BirthYear", False, True, 1),
        ("Player", "height", "Height", False, True, 1),
        ("Player", "honours", "Honour", True, False, 3),
        ("Honour", "honour_name", "HonourName", False, True, 1),
        ("Honour", "honour_year", "HonourYear", False, True, 1),
    ]
    slots_df = pd.DataFrame(
        slots,
        columns=["owner_class_id", "slot_name", "range_class_id", "is_list", "is_datatype", "max_cardinality"],
    )
    individuals = [(f"team_{c.lower()}", "Team", f"FC {c}") for c in _CITIES]
    individuals += [(pid, "Player", name) for pid, name in player_pool()]
    individuals_df = pd.DataFrame(individuals, columns=["individual_id", "class_id", "label"])

    dictionary = []
    for c in _CITIES:
        dictionary.append((f"team_{c.lower()}", "individual", f"fc {c.lower()}"))
        dictionary.append((f"team_{c.lower()}", "individual", c.lower()))
    for pid, name in player_pool():
        dictionary.append((pid, "individual", name.lower()))
    for pos, surfaces in _POSITIONS.items():
        for s in surfaces:
            dictionary.append((pos, "class", s))
    for h in HONOURS:
        dictionary.append(("HonourName", "class", h.lower()))
    dictionary_df = pd.DataFrame(dictionary, columns=["type_id", "kind", "surface_form"])

    parents = {row[0]: row[1] for row in classes}
    datatype_patterns = {
        "BirthYear": [r"(?<!\d)(19[5-9]\d|20[0-2]\d)(?!\d)"],
        "HonourYear": [r"(?<!\d)(19[5-9]\d|20[0-2]\d)(?!\d)"],
        "Height": [r"(?<!\d)(\d{1,3}(?:\.\d+)?) ?(cm|centimeters?|centimetres?)\b"],
    }
    return Ontology(
        name="soccer",
        datatype_patterns=datatype_patterns,
        classes=classes_df,
        slots=slots_df,
        individuals=individuals_df,
        dictionary=dictionary_df,
        closure=_closure(parents),
        root_class_id="Player",
        slot_order=["team", "position", "birthYear", "height", "honours"],
    )


_COMPOUNDS = [
    "Aberol", "Cortizan", "Dexalin", "Fenorex", "Gabitril", "Histarin",
    "Ibexol", "Juvaline", "Ketoral", "Lumirex", "Mexitil", "Norvaline",
    "Opravil", "Pexidron", "Quorazol", "Rivastin", "Sertoline", "Tacrovir",
    "Ursodiol", "Venlaxor", "Xylotan", "Zopremin", "Alprenol", "Betaxin",
    "Cloxacil", "Dorzamid", "Enaprol", "Flurazil", "Glipizex", "Hydrocort",
]


def disease_ontology() -> Ontology:
    """Domain B — 'disease-ontology-like' dictionary linking (FIXTURES.md F4):
    deeper hierarchy, dictionary-heavy NER (with misspellings for fuzzy
    linking), datatype-dense slots with units and written numbers."""
    classes = [
        ("Treatment", None, False, False, 0),
        ("Compound", None, False, False, 0),
        ("Dosage", None, True, False, 0),
        ("Duration", None, True, False, 0),
        ("Frequency", None, True, False, 0),
        ("Disease", None, False, False, 0),
    ]
    # 3-level disease hierarchy: 4 groups x 6 leaves
    for g in range(4):
        classes.append((f"DiseaseGroup{g}", "Disease", False, False, 1))
        for l in range(6):
            classes.append((f"Disease_{g}_{l}", f"DiseaseGroup{g}", False, False, 2))
    classes_df = pd.DataFrame(
        classes, columns=["class_id", "parent_class_id", "is_datatype", "is_auxiliary", "level"]
    )
    slots = [
        ("Treatment", "compound", "Compound", False, False, 1),
        ("Treatment", "dosage", "Dosage", False, True, 1),
        ("Treatment", "duration", "Duration", False, True, 1),
        ("Treatment", "frequency", "Frequency", False, True, 1),
    ]
    slots_df = pd.DataFrame(
        slots,
        columns=["owner_class_id", "slot_name", "range_class_id", "is_list", "is_datatype", "max_cardinality"],
    )
    individuals = [(f"compound_{c.lower()}", "Compound", c) for c in _COMPOUNDS]
    individuals_df = pd.DataFrame(individuals, columns=["individual_id", "class_id", "label"])

    dictionary = []
    for c in _COMPOUNDS:
        dictionary.append((f"compound_{c.lower()}", "individual", c.lower()))
        # misspelled variant within edit distance 2 (drop 3rd char) — exercises
        # fuzzy candidate retrieval (reference Jaccard/Lucene retrieval caps:
        # top-5, score >= 0.7)
        dictionary.append((f"compound_{c.lower()}", "individual", (c[:2] + c[3:]).lower()))
    dictionary_df = pd.DataFrame(dictionary, columns=["type_id", "kind", "surface_form"])

    parents = {row[0]: row[1] for row in classes}
    datatype_patterns = {
        "Dosage": [r"(?<!\d)(\d+(?:\.\d+)?) ?(mg|milligrams?|g|grams?)\b"],
        "Duration": [
            r"\b(\d+|one|two|three|four|five|six|seven|eight|nine|ten|eleven|twelve) ?(weeks?|days?|months?)\b"
        ],
        "Frequency": [
            r"\b(\d+|one|two|three|four|five|six|seven|eight|nine|ten|eleven|twelve) ?(?:times|x) ?(daily|per day|a day)\b"
        ],
    }
    return Ontology(
        name="disease",
        datatype_patterns=datatype_patterns,
        classes=classes_df,
        slots=slots_df,
        individuals=individuals_df,
        dictionary=dictionary_df,
        closure=_closure(parents),
        root_class_id="Treatment",
        slot_order=["compound", "dosage", "duration", "frequency"],
    )


# --------------------------------------------------------------- code domain

_LIBRARIES = [
    "numerix", "tablo", "gridflow", "vectra", "parsely", "logwood",
    "fastpath", "memoir", "quartzdb", "streamlet", "plotnine2", "crypta",
    "netherd", "tasker", "schemix", "bytecask", "lexware", "graphene2",
    "textura", "cachet", "formix", "signet", "tracerly", "bundlr",
]

_API_CALLS = [
    "loadframe", "fitmodel", "writesink", "parseargs", "mapreduce",
    "tokenize", "serialize", "hashjoin", "broadcast", "checkpoint",
    "repartition", "aggregate", "visualize", "normalize", "interpolate",
    "deduplicate",
]

_PARADIGMS = {
    "Functional": ["functional style", "pure functional design"],
    "ObjectOriented": ["object oriented design", "class based architecture"],
    "Procedural": ["procedural layout", "imperative structure"],
}

_MODULE_A = [
    "auth", "data", "query", "index", "batch", "sync", "cache", "proto",
    "metric", "config", "deploy", "worker", "router", "ledger", "signal",
    "vault", "audit", "beacon", "mesh", "relay",
]
_MODULE_B = [
    "core", "engine", "kit", "hub", "flow", "base", "works", "forge",
    "layer", "gate", "link", "pilot", "stack", "unit", "nest", "dock",
    "spine", "grid", "pulse", "frame",
]


def module_pool() -> list:
    """60 deterministic (module_id, name) pairs shared across docs — the
    same module documented in many repos drives cross-doc canonicalization,
    exactly like player_pool."""
    pool = []
    for i in range(60):
        a = _MODULE_A[i % len(_MODULE_A)]
        b = _MODULE_B[(i * 7 + i // len(_MODULE_A)) % len(_MODULE_B)]
        name = f"{a.capitalize()}{b}"
        pool.append((f"mod_{name.lower()}", name))
    assert len({p[0] for p in pool}) == len(pool)
    return pool


def code_ontology() -> Ontology:
    """Domain C — code-entity extraction, the north rule's native payload:
    one Module root per documented code unit with individual-valued list
    slots (imports -> Library, calls -> ApiCall), a class-valued slot with
    siblings (paradigm), a datatype slot (loc), and an auxiliary Release
    annotation with two datatype slots (version, release_year) — the same
    structural shapes the reference's SoccerPlayer example exercises
    (/root/reference/README.md:15-19), over source-code vocabulary."""
    classes = [
        ("Module", None, False, False, 0),
        ("Library", None, False, False, 0),
        ("ApiCall", None, False, False, 0),
        ("Paradigm", None, False, False, 0),
        *[(p, "Paradigm", False, False, 1) for p in _PARADIGMS],
        ("LineCount", None, True, False, 0),
        ("Release", None, False, True, 0),    # auxiliary: no individuals
        ("Version", None, True, False, 0),
        ("ReleaseYear", None, True, False, 0),
    ]
    classes_df = pd.DataFrame(
        classes, columns=["class_id", "parent_class_id", "is_datatype", "is_auxiliary", "level"]
    )
    slots = [
        ("Module", "imports", "Library", True, False, 3),
        ("Module", "paradigm", "Paradigm", False, False, 1),
        ("Module", "loc", "LineCount", False, True, 1),
        ("Module", "calls", "ApiCall", True, False, 3),
        ("Module", "releases", "Release", True, False, 3),
        ("Release", "version", "Version", False, True, 1),
        ("Release", "release_year", "ReleaseYear", False, True, 1),
    ]
    slots_df = pd.DataFrame(
        slots,
        columns=["owner_class_id", "slot_name", "range_class_id", "is_list", "is_datatype", "max_cardinality"],
    )
    individuals = [(f"lib_{c}", "Library", c) for c in _LIBRARIES]
    individuals += [(f"call_{c}", "ApiCall", c) for c in _API_CALLS]
    individuals += [(mid, "Module", name) for mid, name in module_pool()]
    individuals_df = pd.DataFrame(individuals, columns=["individual_id", "class_id", "label"])

    dictionary = []
    for c in _LIBRARIES:
        dictionary.append((f"lib_{c}", "individual", c))
    for c in _API_CALLS:
        dictionary.append((f"call_{c}", "individual", c))
    for mid, name in module_pool():
        dictionary.append((mid, "individual", name.lower()))
    for cls, surfaces in _PARADIGMS.items():
        for s in surfaces:
            dictionary.append((cls, "class", s))
    dictionary_df = pd.DataFrame(dictionary, columns=["type_id", "kind", "surface_form"])

    parents = {row[0]: row[1] for row in classes}
    datatype_patterns = {
        "LineCount": [r"(?<!\d)(\d{2,4})(?= lines\b)"],
        "Version": [r"(?<![\w.])v\d+\.\d+(?:\.\d+)?(?![\w.])"],
        "ReleaseYear": [r"(?<!\d)(19[5-9]\d|20[0-2]\d)(?!\d)"],
    }
    return Ontology(
        name="code",
        datatype_patterns=datatype_patterns,
        classes=classes_df,
        slots=slots_df,
        individuals=individuals_df,
        dictionary=dictionary_df,
        closure=_closure(parents),
        root_class_id="Module",
        slot_order=["imports", "paradigm", "loc", "calls", "releases"],
    )
