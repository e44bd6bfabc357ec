"""Auto-generated NER pattern algebra.

Re-creates (in Python, from observed behavior — not a code copy) the
fuzzy-pattern construction of the reference's
``ner/regex/BasicRegExPattern.java``:

* class/individual names are camel-case split (``:53-54``),
* special chars stripped, stop words (``:44-47``) and short tokens
  (``getMinTokenlength``) removed,
* the remaining 1..5 name tokens are composed into a single regex where
  trailing tokens are optional and joined by ``.?`` / optional dash
  (``buildRegExpr`` overloads ``:64-98``),
* wrapped in PRE/POST word-boundary groups (``:56-57``) and compiled
  case-insensitive + DOTALL (``:60``).

Pattern compilation happens once on the driver against the broadcast
ontology tables; executors only ever see precompiled pattern strings.
"""

from __future__ import annotations

import re

STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such that "
    "the their then there these they this to was will with his her from who whom".split()
)

PRE_BOUNDS = r"(\b|(?<= ))"
POST_BOUNDS = r"(\b|(?= ))"
FLAGS = re.IGNORECASE | re.DOTALL

# fixed-width equivalent of the reference's variable-width camel-case
# lookbehind (Python `re` requires fixed-width lookbehind)
_CAMEL = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
_NON_WORD = re.compile(r"[\W_]+")


def split_name(name: str) -> list[str]:
    """Camel-case + special-char split of an ontology class/individual name."""
    parts: list[str] = []
    for chunk in _NON_WORD.split(name):
        if not chunk:
            continue
        parts.extend(p for p in _CAMEL.split(chunk) if p)
    return parts


def name_tokens(name: str, min_token_length: int = 3, extra_stop_words: frozenset = frozenset()) -> list[str]:
    """Stop-word / short-token pruning (BasicRegExPattern.java:123-134)."""
    out = []
    for w in split_name(name):
        lw = w.lower()
        if lw in STOP_WORDS or lw in extra_stop_words:
            continue
        if len(w) < min_token_length:
            continue
        out.append(w)
    return out


def _expr_tail_optional(p1: str, p2: list[str] | None, p3: str | None) -> str:
    """buildRegExpr(p1, p2[], p3): first token literal, each following token
    optional with `.?` glue and optional dash between them."""
    buf = ""
    if p2:
        for i, w in enumerate(p2):
            buf += "(" + ".?" + re.escape(w)
            if i + 1 != len(p2):
                buf += "(-)?"
            buf += ")?"
    return (
        re.escape(p1)
        + "(" + buf + ")?"
        + ("" if not p3 else "(.?" + re.escape(p3) + ")?")
    )


def _expr_head_alt(p1: str, p2: str, p3: list[str] | None, p4: str | None) -> str:
    """buildRegExpr(p1, p2, p3[], p4): `p1(.?p2)?|p2` head alternation, then
    optional alternated middle tokens and optional tail."""
    mid = "|".join(".?" + re.escape(w) for w in (p3 or []))
    return (
        "(" + re.escape(p1) + "(.?" + re.escape(p2) + ")?|" + re.escape(p2) + ")("
        + ("" if not mid else "(" + mid + ")?")
        + ("" if not p4 else "(.?" + re.escape(p4) + ")?")
        + ")?"
    )


def build_name_pattern(names: list[str]) -> str | None:
    """Compose the pruned name tokens exactly as the reference's size-switch
    (BasicRegExPattern.java:139-164; >5 tokens falls through to the 5-token
    arm, i.e. tokens beyond the 5th are ignored)."""
    if not names:
        return None
    n = len(names)
    if n == 1:
        core = _expr_tail_optional(names[0], None, None)
    elif n == 2:
        core = _expr_tail_optional(names[0], [names[1]], None)
    elif n == 3:
        core = _expr_head_alt(names[0], names[1], [names[2]], None)
    elif n == 4:
        core = _expr_head_alt(names[0], names[1], [names[2]], names[3])
    else:
        core = _expr_head_alt(names[0], names[1], [names[2], names[3]], names[4])
    return PRE_BOUNDS + core + POST_BOUNDS


def name_pattern_probes(names: list[str]) -> tuple[str, ...]:
    """Guaranteed-literal prefilter for ``build_name_pattern``: every match
    MUST contain one of these lowercase substrings, by construction of the
    size-switch — the 1/2-token arms make ``names[0]`` mandatory
    (`_expr_tail_optional`), the 3+-token arms match ``p1(...)?|p2``
    (`_expr_head_alt`), so ``names[0]`` or ``names[1]`` is present.
    ``match_document`` skips the regex scan when no probe occurs in the
    lowered content — the scan itself is the NER kernel's hot cost (one
    pass per pattern per document). Probes are advisory: non-ASCII names
    (where ``str.lower`` and ``re.IGNORECASE`` folding could disagree)
    return () = always scan."""
    if not names:
        return ()
    probes = names[:1] if len(names) <= 2 else names[:2]
    if any(not p.isascii() for p in probes):
        return ()
    return tuple(p.lower() for p in probes)


def surface_pattern(surface_form: str) -> str:
    """Exact (word-bounded, case-insensitive) pattern for a dictionary
    surface form — dictionary entries are matched literally
    (ner/dictionary/AbstractDictionary.java: lowercase surface-form set)."""
    return PRE_BOUNDS + re.escape(surface_form) + POST_BOUNDS


def surface_probes(surface_form: str) -> tuple[str, ...]:
    """Guaranteed-literal prefilter for ``surface_pattern``: the pattern is
    the escaped surface itself, so any match contains the lowercased
    surface verbatim. Non-ASCII -> () = always scan (see
    ``name_pattern_probes``)."""
    return (surface_form.lower(),) if surface_form.isascii() else ()


def compile_pattern_table(ontology, min_token_length: int = 3) -> list[dict]:
    """Driver-side pattern compilation → a broadcastable list of
    {type_id, kind, class_id, is_datatype, pattern} rows.

    Combines: (1) auto-generated name patterns for non-datatype classes,
    (2) auto-generated name patterns for individuals, (3) literal patterns
    for every dictionary surface form, (4) hand-made datatype patterns
    (the getHandMadePatternForClasses hook).
    """
    rows: list[dict] = []
    cls = ontology.classes
    ind_class = dict(zip(ontology.individuals.individual_id, ontology.individuals.class_id))

    dt_classes = set(cls[cls.is_datatype].class_id)
    for class_id in cls.class_id:
        if class_id in dt_classes:
            continue
        toks = name_tokens(class_id, min_token_length)
        pat = build_name_pattern(toks)
        if pat:
            rows.append({"type_id": class_id, "kind": "class", "class_id": class_id,
                         "is_datatype": False, "pattern": pat,
                         "probes": name_pattern_probes(toks)})
    for r in ontology.individuals.itertuples():
        toks = name_tokens(r.label, min_token_length)
        pat = build_name_pattern(toks)
        if pat:
            rows.append({"type_id": r.individual_id, "kind": "individual", "class_id": r.class_id,
                         "is_datatype": False, "pattern": pat,
                         "probes": name_pattern_probes(toks)})
    for r in ontology.dictionary.itertuples():
        class_id = r.type_id if r.kind == "class" else ind_class.get(r.type_id)
        rows.append({"type_id": r.type_id, "kind": r.kind, "class_id": class_id,
                     "is_datatype": r.type_id in dt_classes or class_id in dt_classes,
                     "pattern": surface_pattern(r.surface_form),
                     "probes": surface_probes(r.surface_form)})
    for class_id, pats in ontology.datatype_patterns.items():
        for pat in pats:
            rows.append({"type_id": class_id, "kind": "class", "class_id": class_id,
                         "is_datatype": True, "pattern": pat, "probes": ()})
    # auxiliary-class pattern extension (ner/regex/AbstractRegExNERL.java:
    # 251-282): auxiliary classes carry no meaningful name of their own, so
    # they INHERIT the patterns of their slot-range classes — a mention of
    # a related class also evidences the auxiliary class
    aux_classes = set(cls[cls.is_auxiliary].class_id)
    if aux_classes:
        by_class: dict = {}
        for r in rows:
            if r["kind"] == "class":
                by_class.setdefault(r["class_id"], []).append((r["pattern"], r["probes"]))
        for aux in sorted(aux_classes):
            related = ontology.slots[ontology.slots.owner_class_id == aux].range_class_id
            for rng in related:
                for pat, probes in by_class.get(rng, []):
                    rows.append({"type_id": aux, "kind": "class", "class_id": aux,
                                 "is_datatype": False, "pattern": pat,
                                 "probes": probes})
    # dedupe identical (type, pattern) pairs
    seen = set()
    out = []
    for r in rows:
        key = (r["type_id"], r["kind"], r["pattern"])
        if key not in seen:
            seen.add(key)
            out.append(r)
    return out
