"""Deterministic synthetic corpus generator (FIXTURES.md F1/F3/F4).

Produces the pipeline input table in exactly the ``BASELINE.json.input_hint``
shape — ``(repo, path, commit, lang, content)`` — plus gold tables built *by
construction* while the text is assembled (every gold mention records its
exact character onset):

    source(repo, path, commit, lang, content)
    gold_nodes(doc_key, ann_id, node_id, parent_node_id, slot_name,
               class_id, individual_id, dt_value, text, onset)
    gold_triples(doc_key, subj, pred, obj)
    source_sha(doc_key, sha256)        # per-row invariant baseline

The reference ships no corpus (its examples live in external repos,
/root/reference/README.md:14-19), so these corpora re-create the *shapes* of
its two example domains: soccer-player slot filling and disease-ontology
dictionary linking. Repo sizes are Zipf-skewed so the partitioning/salting
path is exercised. Seeded → byte-identical across runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .ontology import HONOURS, Ontology, code_ontology, disease_ontology, player_pool, soccer_ontology

_LANGS = ["java", "py", "md", "txt"]
_LANG_PREFIX = {"java": "// ", "py": "# ", "md": "", "txt": ""}

_WRITTEN = {
    1: "one", 2: "two", 3: "three", 4: "four", 5: "five", 6: "six",
    7: "seven", 8: "eight", 9: "nine", 10: "ten", 11: "eleven", 12: "twelve",
}


class _Doc:
    """Incremental document builder that tracks exact char offsets."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.buf: list[str] = []
        self.len = 0

    def line(self, *parts):
        """One sentence per line. Each part is a str, or (text, sink) where
        sink(onset, text) records a gold mention at its final offset."""
        self._append(self.prefix)
        for p in parts:
            if isinstance(p, str):
                self._append(p)
            else:
                text, sink = p
                sink(self.len, text)
                self._append(text)
        self._append("\n")

    def _append(self, s: str):
        self.buf.append(s)
        self.len += len(s)

    def text(self) -> str:
        return "".join(self.buf)


def _repo_weights(n_repos: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n_repos + 1) ** s
    return w / w.sum()


def _commit(repo: str, path: str) -> str:
    return hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()


def honour_skolem(name: str, year: str) -> str:
    """Stable blank-node id for auxiliary Honour instances: derived purely
    from slot content so gold and prediction agree without coordination."""
    return f"honour::{name.lower()}::{year}"


def _gen_soccer_doc(rng: np.random.RandomState, onto: Ontology, doc_key: str, prefix: str):
    nodes, triples = [], []
    doc = _Doc(prefix)
    pool = player_pool()
    teams = onto.individuals[onto.individuals.class_id == "Team"]
    team_ids = teams.individual_id.tolist()
    team_labels = dict(zip(teams.individual_id, teams.label))
    positions = {
        "Goalkeeper": "goalkeeper", "Defender": "defender",
        "Midfielder": "midfielder", "Striker": "striker",
    }

    n_players = int(rng.choice([1, 1, 2, 2, 3]))
    picks = rng.choice(len(pool), size=n_players, replace=False)
    node_seq = [0]

    def new_node():
        node_seq[0] += 1
        return node_seq[0]

    if prefix:
        doc.line("=== auto-generated profile data ===")

    for ann_id, pi in enumerate(picks):
        player_id, player_name = pool[int(pi)]
        root_node = new_node()

        def mention(onset, text, nid=None, parent=None, slot=None, cls=None, ind=None, dt=None):
            nodes.append((doc_key, ann_id, nid, parent, slot, cls, ind, dt, text, onset))

        # root intro + teams
        n_teams = int(rng.choice([1, 1, 1, 2]))
        my_teams = [team_ids[i] for i in rng.choice(len(team_ids), size=n_teams, replace=False)]
        parts = [(player_name, lambda o, t: mention(o, t, nid=root_node, parent=None, slot=None,
                                                    cls="Player", ind=player_id)),
                 " plays for "]
        for j, tid in enumerate(my_teams):
            if j:
                parts.append(" and ")
            tnode = new_node()
            parts.append((team_labels[tid],
                          lambda o, t, tid=tid, tn=tnode: mention(o, t, nid=tn, parent=root_node,
                                                                  slot="team", cls="Team", ind=tid)))
            triples.append((doc_key, player_id, "team", tid))
        parts.append(".")
        doc.line(*parts)

        # position
        if rng.rand() < 0.92:
            pos_cls = str(rng.choice(list(positions)))
            pnode = new_node()
            doc.line(
                "The club lists him as a ",
                (positions[pos_cls], lambda o, t: mention(o, t, nid=pnode, parent=root_node,
                                                          slot="position", cls=pos_cls)),
                ".",
            )
            triples.append((doc_key, player_id, "position", pos_cls))

        # birth year
        if rng.rand() < 0.92:
            year = str(1960 + int(rng.randint(0, 46)))
            bnode = new_node()
            doc.line(
                player_name,  # co-reference mention (not a gold node)
                " was born in ",
                (year, lambda o, t: mention(o, t, nid=bnode, parent=root_node, slot="birthYear",
                                            cls="BirthYear", dt=year)),
                ".",
            )
            triples.append((doc_key, player_id, "birthYear", year))

        # height (unit variants → canonical cm)
        if rng.rand() < 0.9:
            cm = int(rng.randint(165, 200))
            unit = str(rng.choice(["cm", "centimeters", "cm"]))
            surface = f"{cm} {unit}"
            canonical = f"{cm} cm"
            hnode = new_node()
            doc.line(
                "He stands ",
                (surface, lambda o, t: mention(o, t, nid=hnode, parent=root_node, slot="height",
                                               cls="Height", dt=canonical)),
                " tall.",
            )
            triples.append((doc_key, player_id, "height", canonical))

        # honours (auxiliary class with two datatype slots)
        for _ in range(int(rng.choice([0, 0, 1, 1, 2]))):
            hname = str(rng.choice(HONOURS))
            hyear = str(1980 + int(rng.randint(0, 45)))
            skolem = honour_skolem(hname, hyear)
            aux = new_node()
            nodes.append((doc_key, ann_id, aux, root_node, "honours", "Honour", None, None, None, None))
            nnode, ynode = new_node(), new_node()
            doc.line(
                "In ",
                (hyear, lambda o, t: mention(o, t, nid=ynode, parent=aux, slot="honour_year",
                                             cls="HonourYear", dt=hyear)),
                ", he won the ",
                (hname, lambda o, t: mention(o, t, nid=nnode, parent=aux, slot="honour_name",
                                             cls="HonourName", dt=hname.lower())),
                ".",
            )
            triples.append((doc_key, player_id, "honours", skolem))
            triples.append((doc_key, skolem, "honour_name", hname.lower()))
            triples.append((doc_key, skolem, "honour_year", hyear))

        # distractor sentence (team not linked to this player)
        if rng.rand() < 0.5:
            others = [t for t in team_ids if t not in my_teams]
            dt_team = others[int(rng.randint(0, len(others)))]
            doc.line(f"A rumoured transfer involving {team_labels[dt_team]} was never confirmed.")

    return doc.text(), nodes, triples


def _gen_disease_doc(rng: np.random.RandomState, onto: Ontology, doc_key: str, prefix: str):
    nodes, triples = [], []
    doc = _Doc(prefix)
    comps = onto.individuals[onto.individuals.class_id == "Compound"]
    comp_ids = comps.individual_id.tolist()
    comp_labels = dict(zip(comps.individual_id, comps.label))
    node_seq = [0]

    def new_node():
        node_seq[0] += 1
        return node_seq[0]

    if prefix:
        doc.line("=== study notes ===")

    n_treat = int(rng.choice([1, 1, 2]))
    picked = rng.choice(len(comp_ids), size=n_treat, replace=False)
    for ann_id, ci in enumerate(picked):
        cid = comp_ids[int(ci)]
        label = comp_labels[cid]
        subj = f"treatment::{doc_key}::{cid}"
        root_node = new_node()
        nodes.append((doc_key, ann_id, root_node, None, None, "Treatment", None, None, None, None))

        def mention(onset, text, nid, slot, cls, ind=None, dt=None):
            nodes.append((doc_key, ann_id, nid, root_node, slot, cls, ind, dt, text, onset))

        r = rng.rand()
        if r < 0.75:
            surface = label
        elif r < 0.95:
            surface = label[:2] + label[3:]      # dictionary-known misspelling
        else:
            surface = label[:-1] + "um"          # unseen typo → fuzzy linking path
        cnode = new_node()
        dose = f"{int(rng.choice([5, 10, 20, 25, 50, 100, 250]))}"
        dose_unit = str(rng.choice(["mg", "milligrams", "mg"]))
        dur_n = int(rng.randint(1, 13))
        dur_written = rng.rand() < 0.4
        dur_unit = str(rng.choice(["days", "weeks"]))
        dur_surface = f"{_WRITTEN[dur_n] if dur_written else dur_n} {dur_unit}"
        freq_n = int(rng.randint(1, 5))
        freq_written = rng.rand() < 0.4
        freq_surface = f"{_WRITTEN[freq_n] if freq_written else freq_n} times daily"

        dnode, unode, fnode = new_node(), new_node(), new_node()
        doc.line(
            "Patients received treatment with ",
            (surface, lambda o, t: mention(o, t, cnode, "compound", "Compound", ind=cid)),
            " at ",
            (f"{dose} {dose_unit}", lambda o, t: mention(o, t, dnode, "dosage", "Dosage",
                                                         dt=f"{dose} mg")),
            " for ",
            (dur_surface, lambda o, t: mention(o, t, unode, "duration", "Duration",
                                               dt=f"{dur_n} {dur_unit.rstrip('s')}")),
            ", ",
            (freq_surface, lambda o, t: mention(o, t, fnode, "frequency", "Frequency",
                                                dt=f"{freq_n} daily")),
            ".",
        )
        triples.append((doc_key, subj, "compound", cid))
        triples.append((doc_key, subj, "dosage", f"{dose} mg"))
        triples.append((doc_key, subj, "duration", f"{dur_n} {dur_unit.rstrip('s')}"))
        triples.append((doc_key, subj, "frequency", f"{freq_n} daily"))

        if rng.rand() < 0.4:
            other = comp_labels[comp_ids[int(rng.randint(0, len(comp_ids)))]]
            doc.line(f"Earlier trials of {other} were inconclusive.")

    return doc.text(), nodes, triples


def release_skolem(version: str, year: str) -> str:
    """Stable blank-node id for auxiliary Release instances (same scheme as
    honour_skolem: derived purely from slot content). Child values appear
    in SLOT-NAME sort order (release_year < version), matching
    operators/candidates.aux_skolem_cols."""
    return f"release::{year}::{version}"


def _gen_code_doc(rng: np.random.RandomState, onto: Ontology, doc_key: str, prefix: str):
    from .ontology import _PARADIGMS, module_pool

    nodes, triples = [], []
    doc = _Doc(prefix)
    pool = module_pool()
    libs = onto.individuals[onto.individuals.class_id == "Library"]
    lib_ids = libs.individual_id.tolist()
    lib_labels = dict(zip(libs.individual_id, libs.label))
    calls = onto.individuals[onto.individuals.class_id == "ApiCall"]
    call_ids = calls.individual_id.tolist()
    call_labels = dict(zip(calls.individual_id, calls.label))
    paradigm_surface = {c: surfaces[0] for c, surfaces in _PARADIGMS.items()}

    n_modules = int(rng.choice([1, 1, 2, 2, 3]))
    picks = rng.choice(len(pool), size=n_modules, replace=False)
    node_seq = [0]

    def new_node():
        node_seq[0] += 1
        return node_seq[0]

    if prefix:
        doc.line("=== auto-generated module manifest ===")

    for ann_id, mi in enumerate(picks):
        module_id, module_name = pool[int(mi)]
        root_node = new_node()

        def mention(onset, text, nid=None, parent=None, slot=None, cls=None, ind=None, dt=None):
            nodes.append((doc_key, ann_id, nid, parent, slot, cls, ind, dt, text, onset))

        # root intro + imports
        n_imports = int(rng.choice([1, 1, 1, 2]))
        my_libs = [lib_ids[i] for i in rng.choice(len(lib_ids), size=n_imports, replace=False)]
        parts = [(module_name, lambda o, t: mention(o, t, nid=root_node, parent=None, slot=None,
                                                    cls="Module", ind=module_id)),
                 " imports "]
        for j, lid in enumerate(my_libs):
            if j:
                parts.append(" and ")
            lnode = new_node()
            parts.append((lib_labels[lid],
                          lambda o, t, lid=lid, ln=lnode: mention(o, t, nid=ln, parent=root_node,
                                                                  slot="imports", cls="Library", ind=lid)))
            triples.append((doc_key, module_id, "imports", lid))
        parts.append(".")
        doc.line(*parts)

        # paradigm (class-valued slot with siblings)
        if rng.rand() < 0.92:
            par_cls = str(rng.choice(list(paradigm_surface)))
            pnode = new_node()
            doc.line(
                "The codebase follows an ",
                (paradigm_surface[par_cls], lambda o, t: mention(o, t, nid=pnode, parent=root_node,
                                                                 slot="paradigm", cls=par_cls)),
                " throughout.",
            )
            triples.append((doc_key, module_id, "paradigm", par_cls))

        # line count (datatype anchored by the "lines" lookahead)
        if rng.rand() < 0.92:
            loc = str(int(rng.randint(40, 5000)))
            lnode2 = new_node()
            doc.line(
                module_name,  # co-reference mention (not a gold node)
                " spans ",
                (loc, lambda o, t: mention(o, t, nid=lnode2, parent=root_node, slot="loc",
                                           cls="LineCount", dt=loc)),
                " lines.",
            )
            triples.append((doc_key, module_id, "loc", loc))

        # api calls (second individual-valued list slot)
        for _ in range(int(rng.choice([0, 1, 1, 2]))):
            cid = call_ids[int(rng.randint(0, len(call_ids)))]
            if any(t == (doc_key, module_id, "calls", cid) for t in triples):
                continue
            cnode = new_node()
            doc.line(
                "It calls ",
                (call_labels[cid], lambda o, t, cid=cid, cn=cnode: mention(
                    o, t, nid=cn, parent=root_node, slot="calls", cls="ApiCall", ind=cid)),
                " on the hot path.",
            )
            triples.append((doc_key, module_id, "calls", cid))

        # releases (auxiliary class with two datatype slots)
        for _ in range(int(rng.choice([0, 0, 1, 1, 2]))):
            version = f"v{int(rng.randint(0, 9))}.{int(rng.randint(0, 20))}"
            ryear = str(1990 + int(rng.randint(0, 35)))
            skolem = release_skolem(version, ryear)
            aux = new_node()
            nodes.append((doc_key, ann_id, aux, root_node, "releases", "Release", None, None, None, None))
            vnode, ynode = new_node(), new_node()
            doc.line(
                "In ",
                (ryear, lambda o, t: mention(o, t, nid=ynode, parent=aux, slot="release_year",
                                             cls="ReleaseYear", dt=ryear)),
                ", release ",
                (version, lambda o, t: mention(o, t, nid=vnode, parent=aux, slot="version",
                                               cls="Version", dt=version)),
                " shipped.",
            )
            triples.append((doc_key, module_id, "releases", skolem))
            triples.append((doc_key, skolem, "version", version))
            triples.append((doc_key, skolem, "release_year", ryear))

        # distractor sentence (library not imported by this module)
        if rng.rand() < 0.5:
            others = [l for l in lib_ids if l not in my_libs]
            dlib = others[int(rng.randint(0, len(others)))]
            doc.line(f"A deprecation notice involving {lib_labels[dlib]} was later reverted.")

    return doc.text(), nodes, triples


def generate_corpus(domain: str = "soccer", n_docs: int = 200, seed: int = 42) -> dict:
    """Returns dict of pandas frames: source, gold_nodes, gold_triples,
    source_sha, splits. Fully deterministic in (domain, n_docs, seed)."""
    rng = np.random.RandomState(seed)
    makers = {
        "soccer": (soccer_ontology, _gen_soccer_doc),
        "disease": (disease_ontology, _gen_disease_doc),
        "code": (code_ontology, _gen_code_doc),
    }
    onto_fn, gen = makers[domain]
    onto = onto_fn()

    n_repos = 20
    repos = [f"org{i % 5}/proj{i}" for i in range(n_repos)]
    rw = _repo_weights(n_repos)

    src_rows, all_nodes, all_triples, shas, splits = [], [], [], [], []
    per_repo_count: dict[str, int] = {}
    for d in range(n_docs):
        repo = repos[int(rng.choice(n_repos, p=rw))]
        k = per_repo_count.get(repo, 0)
        per_repo_count[repo] = k + 1
        lang = str(rng.choice(_LANGS, p=[0.35, 0.35, 0.15, 0.15]))
        path = f"src/profiles/file{k}.{lang}"
        commit = _commit(repo, path)
        doc_key = f"{repo}/{path}@{commit[:8]}"
        content, nodes, triples = gen(rng, onto, doc_key, _LANG_PREFIX[lang])
        src_rows.append((repo, path, commit, lang, content))
        all_nodes.extend(nodes)
        all_triples.extend(triples)
        shas.append((doc_key, hashlib.sha256(content.encode()).hexdigest()))
        r = rng.rand()
        split = "train" if r < 0.6 else ("dev" if r < 0.75 else "test")
        splits.append((doc_key, split))

    source = pd.DataFrame(src_rows, columns=["repo", "path", "commit", "lang", "content"])
    gold_nodes = pd.DataFrame(
        all_nodes,
        columns=["doc_key", "ann_id", "node_id", "parent_node_id", "slot_name",
                 "class_id", "individual_id", "dt_value", "text", "onset"],
    )
    gold_triples = pd.DataFrame(all_triples, columns=["doc_key", "subj", "pred", "obj"]).drop_duplicates()
    source_sha = pd.DataFrame(shas, columns=["doc_key", "sha256"])
    split_df = pd.DataFrame(splits, columns=["doc_key", "split"])
    return {
        "ontology": onto,
        "source": source,
        "gold_nodes": gold_nodes,
        "gold_triples": gold_triples,
        "source_sha": source_sha,
        "splits": split_df,
    }
