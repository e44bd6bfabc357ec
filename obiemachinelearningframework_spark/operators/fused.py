"""Fused extraction kernel: the whole per-document inference in ONE map stage.

The OBIE prediction path (mentions -> roots -> candidates -> features ->
score -> greedy fill -> triples) is per-document decomposable: every join,
window and aggregate in the relational plan keys on a doc_key prefix, and
the model (weights + thresholds + ontology + fuzzy link map) is a small
broadcast. The reference itself runs this as a per-document sampler loop
(``run/AbstractOBIERunner.java:455-462``). This operator exploits that:
one ``mapInPandas`` pass over the instance table emits finished triples.

Why it exists next to the relational path (``plans/pipeline.py:predict``):
at cluster scale the relational plan is exchange-free but still pays a
fixed cost per stage (scheduling, broadcast construction, AQE planning)
that the fused kernel does not — extraction becomes a *map-only* job whose
throughput scales linearly with executors until the source scan saturates.
The only global coordination is the vocabulary-sized fuzzy link map,
built once from a cheap capitalized-token scan. The relational path stays
the composable implementation (and the one checked query-by-query against
the DuckDB oracles); ``tests/test_fused_parity.py`` asserts the two paths
emit EXACTLY the same triple set on both fixture domains.

Semantics mirrored line-by-line from:
* mentions: ``operators/mentions.py:match_document`` (shared code)
* roots: ``operators/candidates.py:propose_roots``
* candidates: ``operators/candidates.py:generate_candidates``
* features: ``operators/features.py:compute_features`` (the fused
  array-of-structs projection, incl. slice semantics of build_pairs)
* fill: ``operators/filler.py:greedy_fill``
* triples: ``operators/triples.py:materialize_triples``
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.patterns import compile_pattern_table
from .features import CTX_CHARS, IB_MAX_CHARS, IB_MAX_TOKENS
from .mentions import UNKNOWN_KIND, compile_patterns, match_document

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.StringType()),
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
    ]
)

AUX_SEP = "::"
_NONWORD = re.compile(r"\W+", re.ASCII)  # Spark's java \W is ASCII
LINK_MAP_DRIVER_MAX = 512  # vocabularies up to this size score on the
                           # driver (py_link_map); beyond it the distributed
                           # similarity join does the scoring — serial
                           # driver work is a fixed cost that caps scaling


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def ontology_spec(ontology, no_evidence_classes: frozenset = frozenset(),
                  restrict_slots: frozenset | None = None) -> dict:
    """Distill the broadcast ontology tables into plain-python lookup
    structures for the kernel (mirrors the branch selection of
    ``generate_candidates`` exactly, incl. the evidence-free class branch
    and InvestigationRestriction slot filtering)."""
    root_cls = ontology.root_class_id
    classes = ontology.classes.set_index("class_id")
    slots = ontology.slots[ontology.slots.owner_class_id == root_cls]
    if restrict_slots is not None:
        slots = slots[slots.slot_name.isin(restrict_slots)]
    ind_classes = set(ontology.individuals.class_id)

    slot_specs = []
    for s in slots.itertuples():
        rng = s.range_class_id
        desc = ontology.subclasses_of(rng)
        spec = {
            "slot_name": s.slot_name,
            "range": rng,
            "desc": set(desc),
            "card": int(s.max_cardinality) if s.is_list else 1,
        }
        if bool(classes.loc[rng].is_datatype):
            spec["kind"] = "dt"
        elif bool(classes.loc[rng].is_auxiliary):
            spec["kind"] = "aux"
            child_slots = ontology.slots[
                ontology.slots.owner_class_id == rng
            ].sort_values("slot_name")
            spec["children"] = [
                {
                    "slot_name": cs.slot_name,
                    "desc": set(ontology.subclasses_of(cs.range_class_id)),
                }
                for cs in child_slots.itertuples()
            ]
        elif any(c in ind_classes for c in desc):
            spec["kind"] = "ind"
        else:
            from .candidates import is_differentiable_to_all_siblings

            spec["kind"] = "cls"
            proper = set(d for d in desc if d != rng)
            # evidence-free classes (sibling-differentiable or whitelisted)
            # mirror generate_candidates' schema-level branch
            spec["free"] = sorted(
                c for c in proper
                if c in no_evidence_classes
                or is_differentiable_to_all_siblings(ontology, c, rng)
            )
            spec["proper"] = proper - set(spec["free"])
        slot_specs.append(spec)

    has_individuals = (ontology.individuals.class_id == root_cls).any()
    if has_individuals:
        anchor_classes = set(ontology.subclasses_of(root_cls))
        anchored = True
    else:
        anchor_slot = ontology.slot_order[0]
        srow = ontology.slots[ontology.slots.slot_name == anchor_slot].iloc[0]
        anchor_classes = set(ontology.subclasses_of(srow.range_class_id))
        anchored = False

    from .mentions import dictionary_token_set, linkable_span_band

    return {
        "root_cls": root_cls,
        "anchored": anchored,
        "anchor_classes": anchor_classes,
        "slots": slot_specs,
        "class_depth": {c: int(d) for c, d in ontology.class_depth.items()},
        # first/last-token span gate for unknown-span enumeration
        # (EntityRecognitionExplorer.java:150-161) + the lossless
        # linkable-length band that caps window enumeration
        "dict_tokens": dictionary_token_set(ontology),
        "span_band": linkable_span_band(ontology),
        # individual -> lowercased name, for the individual-name similarity
        # factor (StringSimilarityTemplate.java:109-111)
        "ind_labels": dict(
            zip(ontology.individuals.individual_id, ontology.individuals.label.str.lower())
        ),
    }


# ------------------------------------------------------------------ stages


def _doc_mentions(content, compiled, min_len, link_map, dict_tokens=None, span_band=None):
    """Mentions incl. fuzzy-linked unknown tokens, deduped on
    (kind, type_id, onset, offset) — detect_mentions + apply_link_map.
    ``link_map`` values are ORDERED candidate lists (ranks 1..top_k): every
    retrieved alternative becomes a mention, the scorer disambiguates
    (LuceneRetrieval.java:39-40)."""
    rows, unknowns = match_document(content, compiled, min_len, want_unknown=True,
                                    dict_tokens=dict_tokens, span_band=span_band)
    for text, on, off, sent in unknowns:
        for type_id, class_id in link_map.get(text.lower(), ()):
            rows.append(
                ("individual", type_id, class_id, type_id, False, text, on, off, sent, None, "fuzzy")
            )
    seen, out = set(), []
    for r in rows:
        key = (r[0], r[1], r[6], r[7])
        if key not in seen:
            seen.add(key)
            out.append(
                {
                    "kind": r[0], "type_id": r[1], "class_id": r[2],
                    "individual_id": r[3], "is_datatype": r[4], "text": r[5],
                    "onset": r[6], "offset": r[7], "sent_idx": r[8], "dt_value": r[9],
                    "src": r[10],
                }
            )
    return out


def _doc_roots(mentions, spec, doc_key):
    """propose_roots per document (candidates.py:47-96): anchor-individual
    mentions, containment suppression, earliest onset per individual,
    next_root_onset by discourse order."""
    m = [
        x for x in mentions
        if x["kind"] == "individual" and x["class_id"] in spec["anchor_classes"]
    ]
    # longest-match-wins containment suppression — same running-max scheme
    # as propose_roots (O(m log m), not O(m^2)): contained iff a strictly
    # earlier onset reaches >= my offset, or an equal onset reaches further
    m.sort(key=lambda x: x["onset"])
    kept, best_prev, i, n = [], -1, 0, len(m)
    while i < n:
        j = i
        while j < n and m[j]["onset"] == m[i]["onset"]:
            j += 1
        group = m[i:j]
        same_max = max(x["offset"] for x in group)
        for a in group:
            if not ((best_prev >= a["offset"]) or (same_max > a["offset"])):
                kept.append(a)
        best_prev = max(best_prev, same_max)
        i = j
    first = {}
    for x in kept:
        cur = first.get(x["individual_id"])
        if cur is None or x["onset"] < cur["onset"]:
            first[x["individual_id"]] = x
    roots = []
    for ind, x in first.items():
        root_id = (
            ind
            if spec["anchored"]
            else AUX_SEP.join([spec["root_cls"].lower(), doc_key, ind])
        )
        roots.append(
            {
                "root_id": root_id,
                "root_class_id": spec["root_cls"],
                "anchor_individual_id": ind,
                "onset": x["onset"],
                "offset": x["offset"],
                "sent_idx": x["sent_idx"],
            }
        )
    roots.sort(key=lambda r: (r["onset"], r["root_id"]))
    for i, r in enumerate(roots):
        r["next_root_onset"] = roots[i + 1]["onset"] if i + 1 < len(roots) else None
    return roots


def _doc_candidates(mentions, spec):
    """generate_candidates per document (candidates.py:99-223)."""
    cands = []
    for s in spec["slots"]:
        name, kind = s["slot_name"], s["kind"]
        if kind == "dt":
            best = {}
            for x in mentions:
                if x["class_id"] in s["desc"] and x["dt_value"] is not None:
                    k = (x["class_id"], x["dt_value"])
                    cur = best.get(k)
                    if cur is None or (x["onset"], x["offset"]) < (cur["onset"], cur["offset"]):
                        best[k] = x
            for (cls, dtv), x in best.items():
                cands.append(
                    {
                        "slot_name": name, "slot_kind": "dt", "class_id": cls,
                        "individual_id": None, "dt_value": dtv, "obj_id": dtv,
                        "text": x["text"], "onset": x["onset"], "offset": x["offset"],
                        "sent_idx": x["sent_idx"], "src": x["src"], "aux_values": {},
                    }
                )
        elif kind == "aux":
            # same-sentence pairing of the aux class's datatype-slot
            # mentions: per child slot, distinct (sent, value) earliest
            # occurrence; inner join across children within a sentence
            per_child = []
            for ch in s["children"]:
                by_sent = {}
                for x in mentions:
                    if x["class_id"] in ch["desc"] and x["dt_value"] is not None:
                        k = (x["sent_idx"], x["dt_value"])
                        cur = by_sent.get(k)
                        if cur is None or (x["onset"], x["offset"]) < (cur["onset"], cur["offset"]):
                            by_sent[k] = x
                per_child.append(by_sent)
            sents = set(k[0] for k in per_child[0]) if per_child else set()
            for bs in per_child[1:]:
                sents &= set(k[0] for k in bs)
            combos_out = {}
            for sent in sorted(sents):
                vals_lists = [
                    sorted(
                        [(k[1], x) for k, x in bs.items() if k[0] == sent],
                        key=lambda kv: kv[0],
                    )
                    for bs in per_child
                ]
                import itertools

                for combo in itertools.product(*vals_lists):
                    child_vals = [v for v, _ in combo]
                    xs = [x for _, x in combo]
                    obj_id = AUX_SEP.join([s["range"].lower()] + child_vals)
                    key = (obj_id, sent)
                    if key in combos_out:
                        continue
                    combos_out[key] = {
                        "slot_name": name, "slot_kind": "aux", "class_id": s["range"],
                        "individual_id": None, "dt_value": None, "obj_id": obj_id,
                        "text": xs[0]["text"],
                        "onset": min(x["onset"] for x in xs),
                        "offset": max(x["offset"] for x in xs),
                        "sent_idx": sent, "src": "ner",
                        "aux_values": dict(
                            zip([c["slot_name"] for c in s["children"]], child_vals)
                        ),
                    }
            cands.extend(combos_out.values())
        elif kind == "ind":
            best = {}
            for x in mentions:
                if x["kind"] == "individual" and x["class_id"] in s["desc"]:
                    k = (x["individual_id"], x["onset"])
                    cur = best.get(k)
                    if cur is None or x["offset"] < cur["offset"]:
                        best[k] = x
            for (ind, on), x in best.items():
                cands.append(
                    {
                        "slot_name": name, "slot_kind": "ind", "class_id": x["class_id"],
                        "individual_id": ind, "dt_value": None, "obj_id": ind,
                        "text": x["text"], "onset": on, "offset": x["offset"],
                        "sent_idx": x["sent_idx"], "src": x["src"], "aux_values": {},
                    }
                )
        else:  # cls
            for cls in s.get("free", []):
                # evidence-free candidate (sibling-differentiable or
                # whitelisted class): one per document, onset -1
                cands.append(
                    {
                        "slot_name": name, "slot_kind": "cls", "class_id": cls,
                        "individual_id": None, "dt_value": None, "obj_id": cls,
                        "text": cls, "onset": -1, "offset": -1,
                        "sent_idx": 0, "src": "schema", "aux_values": {},
                    }
                )
            best = {}
            for x in mentions:
                if x["kind"] == "class" and x["class_id"] in s["proper"]:
                    k = (x["class_id"], x["onset"])
                    cur = best.get(k)
                    if cur is None or x["offset"] < cur["offset"]:
                        best[k] = x
            for (cls, on), x in best.items():
                cands.append(
                    {
                        "slot_name": name, "slot_kind": "cls", "class_id": cls,
                        "individual_id": None, "dt_value": None, "obj_id": cls,
                        "text": x["text"], "onset": on, "offset": x["offset"],
                        "sent_idx": x["sent_idx"], "src": x["src"], "aux_values": {},
                    }
                )
    return cands


def _toks(s, min_chars):
    return [t for t in _NONWORD.split(s.lower()) if len(t) >= min_chars]


def _ds_context_maps(mentions, content):
    """Per-document mirror of features.ds_token_context (TokenContext
    distant-supervision mode, TokenContextTemplate.java:157-232): distinct
    context shapes around every mention, keyed by class and by individual.
    Returns (cls_map, ind_map): id -> set of "shape:tokens" strings."""
    cls_map, ind_map = {}, {}
    for x in mentions:
        onset, offset = x["onset"], x["offset"]
        left_raw = content[max(0, onset - CTX_CHARS) : max(onset, 0)]
        right_raw = content[max(offset, 0) : max(offset, 0) + CTX_CHARS]
        lt = [t for t in reversed(_NONWORD.split(left_raw.lower())) if t]
        rt = [t for t in _NONWORD.split(right_raw.lower()) if t]
        shapes = []
        for nm, arr, idx in (
            ("l1", lt, 0), ("l2", lt, 1), ("l3", lt, 2),
            ("r1", rt, 0), ("r2", rt, 1), ("r3", rt, 2),
        ):
            if idx < len(arr) and arr[idx]:
                shapes.append(f"{nm}:{arr[idx]}")
        for nm, a1, i1, a2, i2 in (
            ("l2l1", lt, 1, lt, 0), ("r1r2", rt, 0, rt, 1), ("l1r1", lt, 0, rt, 0),
        ):
            if i1 < len(a1) and a1[i1] and i2 < len(a2) and a2[i2]:
                shapes.append(f"{nm}:{a1[i1]} {a2[i2]}")
        if not shapes:
            continue
        if x["class_id"] is not None:
            cls_map.setdefault(x["class_id"], set()).update(shapes)
        if x["individual_id"] is not None:
            ind_map.setdefault(x["individual_id"], set()).update(shapes)
    return cls_map, ind_map


def _pair_features(r, c, content, stats, spec, kb, kb_stats=None, ds_maps=None):
    """The fused feature projection of features.py:compute_features for one
    (root, candidate) pair; yields (feature, value). Split into the
    candidate-only half (identical for every root — ``_cand_features``) and
    the root-dependent half (``_root_pair_features``) so ``_doc_fill`` can
    score the candidate half ONCE per candidate instead of once per
    (root, candidate) pair; this generator remains the parity surface the
    relational plan is pinned against."""
    yield from _cand_features(c, content, stats, spec, kb, kb_stats, ds_maps)
    yield from _root_pair_features(r, c, content, stats)


def _cand_features(c, content, stats, spec, kb, kb_stats=None, ds_maps=None):
    """Root-independent features of the pair projection (context windows,
    string similarity, BOW/n-grams, document stats, KB membership)."""
    slot = c["slot_name"]
    if ds_maps is not None:
        # TokenContext DS mode (mirrors the ds_context join in
        # compute_features): the distinct per-(doc, key) shape sets
        cls_map, ind_map = ds_maps
        if c["class_id"] is not None:
            for s in cls_map.get(c["class_id"], ()):
                yield f"ctxds[cls:{c['class_id']}]={s}", 1.0
        if c["individual_id"] is not None:
            for s in ind_map.get(c["individual_id"], ()):
                yield f"ctxds[ind:{c['individual_id']}]={s}", 1.0
    onset, offset = c["onset"], c["offset"]
    yield f"bias[{slot}]", 1.0
    cls = c["class_id"] if c["class_id"] is not None else "null"
    yield f"filler[{slot}]={cls}", 1.0
    # TokenContextTemplate ±2 window over the bounded slices
    left_raw = content[max(0, onset - CTX_CHARS) : max(onset, 0)]
    # clamp for evidence-free candidates (onset = offset = -1): the
    # relational plan's substring(content, offset + 1, CTX) treats pos 0 as
    # 1 and yields the doc head; Python's negative index would silently
    # yield '' and fork the two plans' features
    right_raw = content[max(offset, 0) : max(offset, 0) + CTX_CHARS]
    lt = [t for t in reversed(_NONWORD.split(left_raw.lower())) if t]
    rt = [t for t in _NONWORD.split(right_raw.lower()) if t]
    for nm, arr, idx in (
        ("ctx_l1", lt, 0), ("ctx_l2", lt, 1), ("ctx_l3", lt, 2),
        ("ctx_r1", rt, 0), ("ctx_r2", rt, 1), ("ctx_r3", rt, 2),
    ):
        if idx < len(arr) and arr[idx] != "":
            yield f"{nm}[{slot}]={arr[idx]}", 1.0
    # TokenContext combination features
    for nm, a1, i1, a2, i2 in (
        ("ctx_l2l1", lt, 1, lt, 0), ("ctx_r1r2", rt, 0, rt, 1), ("ctx_l1r1", lt, 0, rt, 0),
    ):
        if i1 < len(a1) and a1[i1] and i2 < len(a2) and a2[i2]:
            yield f"{nm}[{slot}]={a1[i1]} {a2[i2]}", 1.0
    # FrequencyTemplate has-max-evidence
    n_ev = stats["n_ev"][(slot, c["obj_id"])]
    if n_ev == stats["mx_ev"][slot]:
        yield f"max_evidence[{slot}]", 1.0
    # StringSimilarityTemplate bins
    if c["slot_kind"] == "cls":
        text, cid = c["text"], c["class_id"]
        sim = 1.0 - _levenshtein(text.lower(), cid.lower()) / max(len(text), len(cid))
        for bnd in (0.5, 0.7, 0.9):
            if sim >= bnd:
                yield f"strsim>={bnd}[{slot}]", 1.0
    # ... and the individual-name factor (StringSimilarityTemplate.java:
    # 109-111) — disambiguates same-span fuzzy link alternatives
    ind_label = spec["ind_labels"].get(c["individual_id"]) if c["individual_id"] else None
    if ind_label:
        text = c["text"]
        sim_i = 1.0 - _levenshtein(text.lower(), ind_label) / max(len(text), len(ind_label))
        for bnd in (0.5, 0.7, 0.9):
            if sim_i >= bnd:
                yield f"simind>={bnd}[{slot}]={c['individual_id']}", 1.0
    yield f"n_roots[{slot}]={min(stats['n_roots'], 6)}", 1.0
    het = "eq1" if stats["n_pairing"][(slot, c["obj_id"])] == 1 else "ne1"
    yield f"het[{slot}]={het}", 1.0
    yield f"variety[{slot}]={min(stats['variety'][slot], 5)}", 1.0
    yield f"pe[{slot}]={min(stats['n_ev_slots'], 6)}", 1.0
    if c["src"] == "fuzzy":
        yield f"fuzzy_ev[{slot}]", 1.0
    depth = spec["class_depth"].get(c["class_id"])
    if depth is not None:
        yield f"hier[{slot}]={depth}", 1.0
    if kb is not None and (slot, c["obj_id"]) in kb:
        yield f"kb[{slot}]", 1.0
    # KB datatype mean/stddev stats (KnowledgeBaseTemplate.java:600-669),
    # identical formulas to features.compute_features
    if kb_stats and c["dt_value"] is not None and slot in kb_stats:
        try:
            v = float(c["dt_value"])
        except (TypeError, ValueError):
            v = None
        if v is not None:
            import math

            med, dev = kb_stats[slot]
            delta = abs(v - med)
            if delta < 1000:
                yield f"kbstat_dist[{slot}]={int(delta // 10) * 10}", 1.0
            if dev > 0:
                band = 0.001 * dev
                wk = max(int(math.ceil(delta / band)), 1)
                bk = min(int(math.ceil(delta / band)) - 1, 10)
                if wk <= 10:
                    yield f"kbstat_within[{slot}]={wk}", 1.0
                if bk >= 1:
                    yield f"kbstat_beyond[{slot}]={bk}", 1.0
    # BOW over the mention surface
    bow = [t for t in _NONWORD.split(c["text"].lower()) if t]
    if bow:
        w = 1.0 / len(bow)
        for t in bow:
            yield f"bow[{slot}]={t}", w
        # BOWnGramsTemplate word bigrams
        if len(bow) >= 2:
            w2 = 1.0 / (len(bow) - 1)
            for i in range(len(bow) - 1):
                yield f"bow2[{slot}]={bow[i]} {bow[i + 1]}", w2
    # char 3-grams over #surface#
    mt = "#" + c["text"].lower() + "#"
    if len(mt) >= 3:
        grams = [mt[i : i + 3] for i in range(len(mt) - 2)]
    else:
        grams = [mt[0:3]]
    w = 1.0 / len(grams)
    for g in grams:
        yield f"c3g[{slot}]={g}", w


def _root_pair_features(r, c, content, stats):
    """Root-dependent features of the pair projection: distance bins,
    discourse-block indicators, root-class cooccurrence, in-between tokens.
    Identical expressions to features.compute_features (dist/cdist_bin/
    tokdist_bin/in_block/cooc/ib there)."""
    slot = c["slot_name"]
    onset = c["onset"]
    sent_dist = c["sent_idx"] - r["sent_idx"]
    if sent_dist < 0:
        b = "neg"
    elif sent_dist <= 3:
        b = str(sent_dist)
    else:
        b = "ge4"
    yield f"dist[{slot}]={b}", 1.0
    # GlobalLocalityTemplate char-distance bins — identical expression to
    # features.compute_features (cdist_bin there)
    cgap = onset - r["onset"]
    cmag = abs(cgap)
    if cmag <= 16:
        cb = "le16"
    elif cmag <= 64:
        cb = "le64"
    elif cmag <= 256:
        cb = "le256"
    elif cmag <= 1024:
        cb = "le1024"
    else:
        cb = "gt1024"
    yield f"cdist[{slot}]={'-' if cgap < 0 else '+'}{cb}", 1.0
    # LocalityTemplate token-distance bins — identical rules to
    # features.compute_features (tokdist_bin there)
    _gap0 = onset - r["offset"]
    if onset <= r["onset"]:
        tb = "neg"
    elif not (0 < _gap0 <= IB_MAX_CHARS):
        tb = "far"
    else:
        nt = len([t for t in _NONWORD.split(content[r["offset"]:onset].lower()) if t])
        tb = "le1" if nt <= 1 else "le3" if nt <= 3 else "le10" if nt <= 10 else "gt10"
    yield f"tokdist[{slot}]={tb}", 1.0
    after_root = onset > r["onset"]
    before_next = r["next_root_onset"] is None or onset < r["next_root_onset"]
    nearest = stats["nearest"].get((slot, onset, c["obj_id"])) == r["root_id"]
    if after_root:
        yield f"after_root[{slot}]", 1.0
    if before_next:
        yield f"before_next[{slot}]", 1.0
    if after_root and before_next:
        yield f"in_block[{slot}]", 1.0
    if nearest:
        yield f"nearest_root[{slot}]", 1.0
    if after_root and before_next and nearest:
        yield f"in_block_nearest[{slot}]", 1.0
    cls = c["class_id"] if c["class_id"] is not None else "null"
    yield f"cooc[{r['root_class_id']}+{slot}]={cls}", 1.0
    # in-between tokens (unit total mass)
    gap = onset - r["offset"]
    if after_root and 0 < gap <= IB_MAX_CHARS:
        ib = _toks(content[r["offset"] : onset], 2)[:IB_MAX_TOKENS]
        if ib:
            w = 1.0 / len(ib)
            for t in ib:
                yield f"ib[{slot}]={t}", w
            # InterTokenTemplate boundary tokens (position-marked)
            yield f"ib_first[{slot}]={ib[0]}", 1.0
            if len(ib) >= 2:
                yield f"ib_last[{slot}]={ib[-1]}", 1.0


def _doc_stats(roots, cands):
    """The window statistics of compute_features (w_obj / w_slot / w_doc /
    w_near) for one document's (roots x candidates) pair table."""
    n_roots = len(set(r["root_id"] for r in roots))
    n_ev, n_pairing, mx_ev, nearest = {}, {}, {}, {}
    occ, variety = {}, {}
    for c in cands:
        k = (c["slot_name"], c["obj_id"])
        occ[k] = occ.get(k, 0) + 1
        variety.setdefault(c["slot_name"], set()).add(c["obj_id"])
    for k, n in occ.items():
        n_ev[k] = n * len(roots)
        n_pairing[k] = n_roots
    for (slot, obj), n in n_ev.items():
        mx_ev[slot] = max(mx_ev.get(slot, 0), n)
    for c in cands:
        key = (c["slot_name"], c["onset"], c["obj_id"])
        if key in nearest:
            continue
        best = min(roots, key=lambda r: (abs(c["onset"] - r["onset"]), r["root_id"]))
        nearest[key] = best["root_id"]
    return {
        "n_roots": n_roots, "n_ev": n_ev, "n_pairing": n_pairing,
        "mx_ev": mx_ev, "nearest": nearest,
        "variety": {s: len(objs) for s, objs in variety.items()},
        "n_ev_slots": len(variety),
    }


def _doc_fill(roots, cands, content, stats, spec, weights, thresholds, kb, kb_stats=None,
              ds_maps=None):
    """Score every pair, then greedy_fill per (root, slot): best occurrence
    per distinct obj, rank distinct objs, accept top-card above threshold
    (filler.py:40-66). Returns accepted assignment dicts."""
    card = {s["slot_name"]: s["card"] for s in spec["slots"]}
    accepted = []
    # the candidate-only half of the projection is identical for every
    # root: score it ONCE per candidate (the heavy features — context
    # windows, BOW/n-grams, string similarity — all live here), then add
    # the cheap root-dependent half per pair. Sum order differs from the
    # single-generator order, which is already immaterial: the relational
    # plan sums the same features in shuffle order and parity holds.
    cand_partial = []
    for c in cands:
        s = 0.0
        for f, v in _cand_features(c, content, stats, spec, kb, kb_stats, ds_maps):
            w = weights.get(f)
            if w is not None:
                s += w * v
        cand_partial.append(s)
    for r in roots:
        per_slot = {}
        for c, s_c in zip(cands, cand_partial):
            score = s_c
            for f, v in _root_pair_features(r, c, content, stats):
                w = weights.get(f)
                if w is not None:
                    score += w * v
            per_slot.setdefault(c["slot_name"], []).append((score, c))
        for slot, rows in per_slot.items():
            by_obj = {}
            for score, c in rows:
                cur = by_obj.get(c["obj_id"])
                # w_obj: orderBy(score desc, onset asc) rank 1
                if cur is None or (-score, c["onset"]) < (-cur[0], cur[1]["onset"]):
                    by_obj[c["obj_id"]] = (score, c)
            ranked = sorted(
                by_obj.values(), key=lambda sc: (-sc[0], sc[1]["onset"], sc[1]["obj_id"])
            )
            th = thresholds.get(slot, 0.0)
            for score, c in ranked[: card.get(slot, 1)]:
                if score > th:
                    accepted.append({"root": r, "cand": c, "score": score})
    return accepted


def _doc_triples(doc_key, accepted):
    """materialize_triples per document (triples.py:23-37)."""
    out, seen = [], set()

    def emit(s, p, o):
        k = (s, p, o)
        if k not in seen:
            seen.add(k)
            out.append((doc_key, s, p, o))

    for a in accepted:
        emit(a["root"]["root_id"], a["cand"]["slot_name"], a["cand"]["obj_id"])
        if a["cand"]["slot_kind"] == "aux":
            for p, o in a["cand"]["aux_values"].items():
                emit(a["cand"]["obj_id"], p, o)
    return out


class HashedWeights:
    """Executor-side mirror of trainer.hash_feature_names for a
    feature-hashed model: ``get(name)`` returns sign(name) * w[bucket(name)]
    so ``_doc_fill``'s ``weights.get(f) * v`` computes exactly the margin
    the hashed trainer fitted. zlib.crc32 == Spark F.crc32 over UTF-8
    bytes (same CRC-32/ISO-HDLC polynomial); agreement is pinned
    cross-runtime by tests/test_trainer_hashed.py."""

    __slots__ = ("w", "dim")

    def __init__(self, w: dict, dim: int):
        self.w = w
        self.dim = dim

    def get(self, name, default=None):
        from zlib import crc32

        b = name.encode("utf-8")
        wv = self.w.get(f"__HASHED__{crc32(b) % self.dim}")
        if wv is None:
            return default
        return wv if crc32(b + b"#") % 2 == 1 else -wv


def extract_document(doc_key, content, compiled, link_map, spec, weights, thresholds,
                     min_len=2, kb=None, kb_stats=None, ds_mode=False):
    """content -> [(doc_key, subj, pred, obj)] — the full fused inference."""
    mentions = _doc_mentions(content, compiled, min_len, link_map,
                             dict_tokens=spec.get("dict_tokens"),
                             span_band=spec.get("span_band"))
    roots = _doc_roots(mentions, spec, doc_key)
    if not roots:
        return []
    cands = _doc_candidates(mentions, spec)
    if not cands:
        return []
    stats = _doc_stats(roots, cands)
    ds_maps = _ds_context_maps(mentions, content) if ds_mode else None
    if isinstance(kb, dict):
        # leave-one-doc-out mask: a (pred, obj) whose only source doc is
        # THIS doc is invisible here (compute_features' masked join)
        kb = {k for k, (n, only) in kb.items() if n > 1 or only != doc_key}
    accepted = _doc_fill(roots, cands, content, stats, spec, weights, thresholds, kb, kb_stats,
                         ds_maps)
    return _doc_triples(doc_key, accepted)


# ------------------------------------------------------------- the operator


def _grams3(s: str) -> set:
    """Distinct char 3-grams, mirroring linking._gram_df's expression
    (strings shorter than 3 chars produce an empty profile)."""
    return set(s[i : i + 3] for i in range(len(s) - 2)) if len(s) >= 3 else set()


def py_link_map(tokens, ontology, top_k=None) -> dict:
    """Pure-python mirror of linking.build_link_map for the fused path:
    both sides (distinct unknown tokens, dictionary surfaces) are
    vocabulary-sized, so scoring them on the driver replaces a ~6-stage
    similarity-join mini-job with microseconds of work. Asserted equal to
    the relational path by tests/test_fused_parity.py on the disease
    domain (which contains unseen typos). Thresholds, tie-breaks and the
    top-k retrieval match linking.py:30-35,86-99 exactly: the value is the
    ORDERED list of up to top_k (type_id, class_id) alternatives — the
    reference feeds every retrieved candidate into exploration
    (LuceneRetrieval.java:39-40)."""
    from .linking import MIN_JACCARD, MIN_LEV_SIM, TOP_K

    if top_k is None:
        top_k = TOP_K
    d = ontology.dictionary
    surfaces = [
        (str(t), str(s).lower())
        for t, s in zip(d[d.kind == "individual"].type_id, d[d.kind == "individual"].surface_form)
    ]
    dict_side = []
    for tid, surf in surfaces:
        sg = _grams3(surf)
        dict_side.append((tid, surf, sg, len(sg)))
    ind_class = dict(zip(ontology.individuals.individual_id, ontology.individuals.class_id))

    out = {}
    for tok in set(t.lower() for t in tokens):
        tg = _grams3(tok)
        if not tg:
            continue
        scored = []
        for tid, surf, sg, sn in dict_side:
            common = len(tg & sg)
            if common == 0:
                continue
            jac = common / (len(tg) + sn - common)
            lev_sim = 1.0 - _levenshtein(tok, surf) / max(len(tok), len(surf))
            if jac < MIN_JACCARD or lev_sim < MIN_LEV_SIM:
                continue
            scored.append(((-lev_sim, -jac, tid), tid))
        scored.sort()
        links = []
        for _, tid in scored[:top_k]:
            # mirror the relational path's INNER join against the
            # individuals table (linking.build_link_map): a dictionary
            # surface whose type has no individual row yields no link
            if tid in ind_class:
                links.append((tid, ind_class[tid]))
        if links:
            out[tok] = links
    return out


UNKNOWN_TEXT_SCHEMA = T.StructType([T.StructField("text", T.StringType())])


def unknown_vocabulary_df(instances: DataFrame, ontology) -> DataFrame:
    """Distinct unknown-span surfaces across the corpus — the fused link
    map's input. Runs the SAME span enumeration as the extraction kernel
    (``match_document`` with an empty pattern battery: both gates, no
    coverage filter — a sound over-approximation, since restricting a
    larger per-surface-independent map equals the map of the exact set).
    Arrow-batched and per-partition deduped; only the vocabulary-sized
    distinct surface set flows downstream. Python is unavoidable here: the
    dictionary-token gate needs token OFFSETS to cut exact content
    substrings, which regexp_extract_all cannot produce."""
    from .mentions import dictionary_token_set, linkable_span_band

    dict_toks = dictionary_token_set(ontology)
    band = linkable_span_band(ontology)
    bc = instances.sparkSession.sparkContext.broadcast((dict_toks, band))

    def scan(batches):
        dtoks, bnd = bc.value
        for pdf in batches:
            out = set()
            for content in pdf["content"]:
                _, unknowns = match_document(content, (), 2, True, dtoks, bnd)
                out.update(u[0] for u in unknowns)
            yield pd.DataFrame({"text": sorted(out)})

    return (
        instances.select("content")
        .mapInPandas(scan, schema=UNKNOWN_TEXT_SCHEMA)
        .distinct()
    )


def extract_fused(instances: DataFrame, ontology, weights_pdf: pd.DataFrame,
                  thresholds: dict, min_ner_length: int = 2,
                  kb_triples=None, link_map_df: DataFrame | None = None,
                  fuzzy_linking: bool = True,
                  carry_cols: tuple = (), ds_mode: bool = False) -> DataFrame:
    """instances(doc_key, content) -> triples(doc_key, subj, pred, obj).

    Map-only plan: a tiny link-map job (vocabulary-sized), then one
    mapInPandas stage over the corpus. Zero corpus-sized shuffles — this is
    the 10^12-file hot path (scan partitioned by (repo, lang); the model
    and link map broadcast).

    ``carry_cols``: instance columns (e.g. ``("repo", "lang")``) replicated
    onto every emitted triple inside the SAME map stage — the partitioned
    sink then needs no join back to the corpus at all (the round-2 write
    path broadcast one row per document; at 10^12 docs that OOMs every
    executor)."""
    from ..operators.trainer import THRESHOLD_PREFIX

    spark = instances.sparkSession

    def rows_to_map(rows) -> dict:
        """(token, type_id, class_id, rank) rows -> token -> ordered
        alternative list, the kernel's lookup shape."""
        m: dict = {}
        for r in sorted(rows, key=lambda r: (r["token"], r["rank"])):
            m.setdefault(r["token"], []).append((r["type_id"], r["class_id"]))
        return m

    if not fuzzy_linking:
        link_map = {}
    elif link_map_df is not None:
        link_map = rows_to_map(
            link_map_df.select("token", "type_id", "class_id", "rank").collect()
        )
    else:
        # the unknown-surface scan stays distributed (corpus-bound);
        # SCORING runs as the distributed similarity join
        # (linking.build_link_map) once the vocabulary is non-trivial —
        # driver-side python scoring is a serial fixed cost that erodes
        # scaling efficiency at high parallelism. py_link_map (asserted
        # equal in tests) remains the micro-vocabulary fast path, gated by
        # a hard-bounded take(MAX+1) — NO collect in this function scales
        # with the corpus vocabulary; the only unbounded collect below is
        # the LINKED map, which the similarity threshold bounds by the
        # dictionary size.
        # ONE corpus-scan job decides the branch: take() runs the scan
        # exactly once, and only the big-vocabulary branch (which re-reads
        # the surfaces for the similarity join) pins the scan result with
        # a checkpoint — eagerly checkpointing up front charged every
        # small-vocabulary extraction a second full scan job (the round-3
        # headline-regression bill at small doc counts)
        win_df = unknown_vocabulary_df(instances, ontology)
        head = win_df.take(LINK_MAP_DRIVER_MAX + 1)
        if len(head) <= LINK_MAP_DRIVER_MAX:
            link_map = py_link_map([r["text"] for r in head], ontology)
        else:
            from .linking import build_link_map

            win_df = win_df.localCheckpoint(eager=True)
            link_map = rows_to_map(build_link_map(win_df, ontology, spark).collect())

    from ..operators.trainer import HASHED_DIM_FEATURE, hashed_dim

    w = weights_pdf[
        ~weights_pdf.feature.str.startswith(THRESHOLD_PREFIX)
        & (weights_pdf.feature != HASHED_DIM_FEATURE)
    ]
    weights = dict(zip(w.feature, w.weight.astype(float)))
    dim = hashed_dim(weights_pdf)
    if dim:
        weights = HashedWeights(weights, dim)
    spec = ontology_spec(ontology)
    kb, kb_stats = None, None
    if kb_triples is not None:
        from .features import kb_datatype_stats

        if "doc_key" in kb_triples.columns:
            # TrainAsKnowledgeBase fit-time view: leave-one-doc-out masked
            # membership (mirrors the _kb_n/_kb_only join in
            # compute_features) — dict (pred, obj) -> (n_docs, min_doc);
            # KB-bounded collect (caller-supplied prior/gold KB)
            kb_rows = (
                kb_triples.select("doc_key", "pred", "obj").distinct()
                .groupBy("pred", "obj")
                .agg(F.countDistinct("doc_key").alias("n"), F.min("doc_key").alias("only"))
            )
            kb = {(r["pred"], r["obj"]): (r["n"], r["only"]) for r in kb_rows.collect()}
        else:
            kb = set(
                (r["pred"], r["obj"]) for r in kb_triples.select("pred", "obj").distinct().collect()
            )
        kb_stats = kb_datatype_stats(kb_triples)

    pattern_rows = compile_pattern_table(ontology)
    sc = spark.sparkContext
    bc = sc.broadcast(
        {
            "patterns": pattern_rows, "link_map": link_map, "spec": spec,
            "weights": weights, "thresholds": dict(thresholds),
            "min_len": min_ner_length, "kb": kb, "kb_stats": kb_stats,
            "ds_mode": ds_mode,
        }
    )

    carry = list(carry_cols)
    out_cols = ["doc_key", "subj", "pred", "obj", *carry]
    schema = T.StructType(TRIPLE_SCHEMA.fields + [instances.schema[c] for c in carry])

    def run(batches):
        v = bc.value
        compiled = compile_patterns(v["patterns"])
        for pdf in batches:
            recs = []
            carried = [pdf[c] for c in carry]
            for i, (doc_key, content) in enumerate(zip(pdf["doc_key"], pdf["content"])):
                extra = tuple(col.iloc[i] for col in carried)
                for t in extract_document(
                    doc_key, content, compiled, v["link_map"], v["spec"],
                    v["weights"], v["thresholds"], v["min_len"], v["kb"],
                    v["kb_stats"], v["ds_mode"],
                ):
                    recs.append(t + extra)
            yield pd.DataFrame(recs, columns=out_cols)

    return instances.select("doc_key", "content", *carry).mapInPandas(run, schema=schema)
