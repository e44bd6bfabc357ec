"""Round-3 additions: BGP matching, N-Triples export, Z-order layout,
code call graph — pinned against pure-Python recomputation (the DuckDB
oracle checks engine parity; this checks the math and the operator
contracts: BGP join ordering/connectivity, N-Triples escaping, Z-order
pruning power, call-graph aggregate resolution)."""

import math
import re
from collections import defaultdict

import pandas as pd
import pytest

from obiemachinelearningframework_spark.operators.bgp import bgp_match
from obiemachinelearningframework_spark.queries import (
    BGP_PATTERNS,
    CALL_SITE_PAT,
    SYMBOL_DEF_PAT,
    WINDOW_DUR_S,
    WINDOW_SLIDE_S,
    ZBITS,
    ZFILES,
    q_code_call_graph,
    q_events_sliding_window,
    q_kg_bgp_optional,
    q_kg_bgp_query,
    q_kg_ntriples,
    q_triples_kg,
    q_zorder_layout,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def triples(spark):
    return [(r.subj, r.pred, r.obj) for r in q_triples_kg(spark, SF_DIR).collect()]


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _py_bgp(triples, patterns):
    """Reference BGP evaluation: naive nested-loop join over bindings."""
    bindings = [{}]
    for pat in patterns:
        out = []
        for t in triples:
            local = {}
            ok = True
            for term, val in zip(pat, t):
                if term.startswith("?"):
                    v = term[1:]
                    if v in local and local[v] != val:
                        ok = False
                        break
                    local[v] = val
                elif term != val:
                    ok = False
                    break
            if not ok:
                continue
            for b in bindings:
                if all(b.get(k, local[k]) == local[k] for k in local):
                    out.append({**b, **local})
        bindings = out
    return {tuple(sorted(b.items())) for b in bindings}


def test_bgp_bindings_match_python(spark, triples):
    t = q_triples_kg(spark, SF_DIR)
    got = {
        tuple(sorted(r.asDict().items()))
        for r in bgp_match(t, BGP_PATTERNS).collect()
    }
    assert got == _py_bgp(triples, BGP_PATTERNS)
    assert got, "anchor pattern matched nothing — synthesis broke"


def test_bgp_registry_aggregate(spark, triples):
    got = {(r.op, r.e): r.n_docs for r in q_kg_bgp_query(spark, SF_DIR).collect()}
    exp = defaultdict(int)
    for b in _py_bgp(triples, BGP_PATTERNS):
        d = dict(b)
        exp[(d["op"], d["e"])] += 1
    assert got == dict(exp)


_ENT = ["a", "b", "c", "d"]
_PRD = ["p", "q"]


def _graphs():
    from hypothesis import strategies as st

    triple = st.tuples(st.sampled_from(_ENT), st.sampled_from(_PRD),
                       st.sampled_from(_ENT))
    return st.sets(triple, min_size=1, max_size=12)


def _bgps():
    from hypothesis import strategies as st

    term = st.sampled_from(["?x", "?y", "?z", "a", "b"])
    ptrm = st.sampled_from(["?x", "?y", "p", "q"])
    pat = st.tuples(term, ptrm, term)
    return st.lists(pat, min_size=1, max_size=3)


def test_bgp_property_matches_python(spark):
    """Property: for ANY tiny graph and ANY 1-3-pattern BGP, the
    compiled join plan agrees with the naive nested-loop evaluator
    (connected BGPs only; disconnected ones must raise)."""
    from hypothesis import HealthCheck, given, settings

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(triples=_graphs(), pats=_bgps())
    def check(triples, pats):
        rows = sorted(triples)
        t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
        # connectivity of the variable-sharing graph decides the contract
        var_sets = [{x[1:] for x in p if x.startswith("?")} for p in pats]
        if not all(var_sets):
            return  # all-constant patterns: existence semantics untested here
        reach = set(var_sets[0])
        grew = True
        while grew:
            grew = False
            for vs in var_sets:
                if vs & reach and not vs <= reach:
                    reach |= vs
                    grew = True
        connected = all(vs & reach for vs in var_sets)
        if not connected:
            with pytest.raises(ValueError, match="disconnected"):
                bgp_match(t, pats)
            return
        got = {tuple(sorted(r.asDict().items()))
               for r in bgp_match(t, pats).collect()}
        assert got == _py_bgp(rows, pats)

    check()


def test_bgp_duplicate_variable(spark):
    rows = [("a", "p", "a"), ("a", "p", "b"), ("b", "q", "b")]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = {tuple(sorted(r.asDict().items()))
           for r in bgp_match(t, [("?x", "p", "?x")]).collect()}
    assert got == {(("x", "a"),)}


def test_bgp_disconnected_rejected(spark):
    t = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    with pytest.raises(ValueError, match="disconnected"):
        bgp_match(t, [("?x", "p", "?y"), ("?u", "p", "?v")])


def test_bgp_optional_and_filter(spark, triples):
    """OPTIONAL keeps unmatched required bindings with null optional
    vars (SPARQL left-join semantics); FILTER prunes bindings."""
    got = {
        r.op: (r.n_docs, r.n_docs_no_entity, r.n_entity_bindings)
        for r in q_kg_bgp_optional(spark, SF_DIR).collect()
    }
    ops = defaultdict(set)
    ents = defaultdict(set)
    for s, p, o in triples:
        if p == "mentions_Operator":
            ops[o].add(s)
        elif p == "mentions_Entity":
            ents[s].add(o)
    exp = {}
    for op, docs in ops.items():
        if op == "merge":  # FILTER
            continue
        no_ent = {d for d in docs if not ents.get(d)}
        n_bind = sum(len(ents.get(d, ())) for d in docs)
        exp[op] = (len(docs), len(no_ent), n_bind)
    assert got == exp
    # the OPTIONAL actually exercises both branches on this corpus
    assert any(v[1] > 0 for v in got.values())
    assert any(v[2] > 0 for v in got.values())
    assert "merge" not in got


def test_bgp_optional_must_share_variable(spark):
    t = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    with pytest.raises(ValueError, match="OPTIONAL"):
        bgp_match(t, [("?x", "p", "?y")], optional=[("?u", "p", "?v")])


def test_sliding_window_matches_python(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    got = {
        (r.w_start, r.event_type): (r.n, r.sum_cents)
        for r in q_events_sliding_window(spark, SF_DIR).collect()
    }
    exp = defaultdict(lambda: [0, 0])
    nwin = WINDOW_DUR_S // WINDOW_SLIDE_S
    for ts, et, val in zip(ev.ts, ev.event_type, ev.value):
        es = int(ts.timestamp())
        cents = int(round(val * 100))
        slot = es // WINDOW_SLIDE_S
        for k in range(nwin):
            ws = (slot - k) * WINDOW_SLIDE_S
            if ws <= es < ws + WINDOW_DUR_S:
                exp[(ws, et)][0] += 1
                exp[(ws, et)][1] += cents
    assert got == {k: tuple(v) for k, v in exp.items()}
    # every event appears in exactly nwin windows
    assert sum(n for n, _ in got.values()) == len(ev) * nwin


def test_ntriples_lines_and_escaping(spark):
    rows = q_kg_ntriples(spark, SF_DIR).collect()
    by_subj = defaultdict(list)
    for r in rows:
        by_subj[r.subj].append(r)
    planted = by_subj["doc_x"]
    assert len(planted) == 1
    assert planted[0].ntriple == (
        '<urn:kg:doc_x> <urn:kg:mentions_System> "sp\\"ar\\\\k" .'
    )
    pat = re.compile(r'^<urn:kg:[^>]+> <urn:kg:[^>]+> "([^"\\]|\\.)*" \.$')
    for r in rows[:200]:
        assert pat.match(r.ntriple), r.ntriple


def _py_zorder(li_pd):
    mino, maxo = int(li_pd.l_orderkey.min()), int(li_pd.l_orderkey.max())
    minp, maxp = int(li_pd.l_partkey.min()), int(li_pd.l_partkey.max())
    grid = 2 ** ZBITS
    out = defaultdict(lambda: [0, math.inf, -math.inf, math.inf, -math.inf])
    for ok, pk in zip(li_pd.l_orderkey, li_pd.l_partkey):
        px = (int(ok) - mino) * grid // (maxo - mino + 1)
        sx = (int(pk) - minp) * grid // (maxp - minp + 1)
        z = 0
        for i in range(ZBITS):
            z += ((px >> i) & 1) << (2 * i)
            z += ((sx >> i) & 1) << (2 * i + 1)
        zf = z * ZFILES // (grid * grid)
        s = out[zf]
        s[0] += 1
        s[1], s[2] = min(s[1], int(ok)), max(s[2], int(ok))
        s[3], s[4] = min(s[3], int(pk)), max(s[4], int(pk))
    return {
        zf: (n, lo_o, hi_o, lo_p, hi_p)
        for zf, (n, lo_o, hi_o, lo_p, hi_p) in out.items()
    }


@pytest.fixture(scope="module")
def li_pd():
    return pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ]


def test_zorder_matches_python(spark, li_pd):
    got = {
        r.zfile: (r.n_rows, r.min_ok, r.max_ok, r.min_pk, r.max_pk)
        for r in q_zorder_layout(spark, SF_DIR).collect()
    }
    assert got == _py_zorder(li_pd)


def test_zorder_prunes_better_than_linear(spark, li_pd):
    """A small 2-D box query touches fewer z-layout files than files
    from a layout sorted by l_orderkey alone (same file count) — the
    reason OPTIMIZE ZORDER exists."""
    envelopes = _py_zorder(li_pd)
    # linear layout: sort by orderkey, split into the same number of files
    df = li_pd.sort_values(["l_orderkey", "l_partkey"]).reset_index(drop=True)
    n_files = len(envelopes)
    linear = []
    per = math.ceil(len(df) / n_files)
    for i in range(n_files):
        chunk = df.iloc[i * per:(i + 1) * per]
        if len(chunk):
            linear.append((chunk.l_orderkey.min(), chunk.l_orderkey.max(),
                           chunk.l_partkey.min(), chunk.l_partkey.max()))
    mino, maxo = li_pd.l_orderkey.min(), li_pd.l_orderkey.max()
    minp, maxp = li_pd.l_partkey.min(), li_pd.l_partkey.max()
    # box = central 1/8 of each dimension
    olo, ohi = mino + (maxo - mino) * 7 // 16, mino + (maxo - mino) * 9 // 16
    plo, phi = minp + (maxp - minp) * 7 // 16, minp + (maxp - minp) * 9 // 16

    def touched(envs):
        return sum(
            1 for lo_o, hi_o, lo_p, hi_p in envs
            if lo_o <= ohi and hi_o >= olo and lo_p <= phi and hi_p >= plo
        )

    z_touched = touched(
        [(lo_o, hi_o, lo_p, hi_p) for _, lo_o, hi_o, lo_p, hi_p
         in envelopes.values()]
    )
    lin_touched = touched(linear)
    assert z_touched < lin_touched, (z_touched, lin_touched)


def test_call_graph_matches_python(spark, docs_pd):
    got = {
        r.symbol: (r.n_call_sites, r.n_callers, r.first_caller,
                   r.n_def_files, r.canonical_def)
        for r in q_code_call_graph(spark, SF_DIR).collect()
    }
    defs = defaultdict(set)
    calls = defaultdict(list)
    for doc_id, text in zip(docs_pd.doc_id, docs_pd.text):
        mod = int(doc_id) % 3
        content = text + " "
        if mod == 0:
            content += f"def util_{int(doc_id) % 20}(): pass"
        elif mod == 2:
            content += f"call util_{int(doc_id) % 25}()"
        for s in re.findall(SYMBOL_DEF_PAT, content):
            defs[s].add(int(doc_id))
        for s in re.findall(CALL_SITE_PAT, content):
            calls[s].append(int(doc_id))
    exp = {}
    for s, sites in calls.items():
        d = defs.get(s, set())
        exp[s] = (len(sites), len(set(sites)), min(sites),
                  len(d), min(d) if d else -1)
    assert got == exp
    # synthesis exercises the unresolved branch (util_20..24 have no def)
    assert any(v[3] == 0 for v in got.values())
    assert any(v[3] > 0 for v in got.values())


def test_collocations_llr_matches_python(spark, docs_pd):
    """Dunning G2 recomputed in pure Python over the same bigrams."""
    from obiemachinelearningframework_spark.queries import (
        COLLOC_MIN_C12,
        q_collocations_llr,
    )

    got = {(r.w1, r.w2): (r.c12, r.llr)
           for r in q_collocations_llr(spark, SF_DIR).collect()}
    c12 = defaultdict(int)
    for text in docs_pd.text:
        toks = [t for t in text.split(" ") if t]
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
    c1, c2 = defaultdict(int), defaultdict(int)
    for (a, b), k in c12.items():
        c1[a] += k
        c2[b] += k
    n = sum(c12.values())
    exp = {}
    for (a, b), k in c12.items():
        if k < COLLOC_MIN_C12:
            continue
        k11, k12b, k21 = k, c1[a] - k, c2[b] - k
        k22 = n - c1[a] - c2[b] + k
        e11 = c1[a] * c2[b] / n
        e12 = c1[a] * (n - c2[b]) / n
        e21 = (n - c1[a]) * c2[b] / n
        e22 = (n - c1[a]) * (n - c2[b]) / n
        g2 = 2 * sum(kk * math.log(kk / ee)
                     for kk, ee in ((k11, e11), (k12b, e12),
                                    (k21, e21), (k22, e22)) if kk > 0)
        exp[(a, b)] = (k, round(g2, 6))
    assert set(got) == set(exp)
    for key in exp:
        assert got[key][0] == exp[key][0]
        assert got[key][1] == pytest.approx(exp[key][1], abs=2e-6)
    # a genuinely associated pair must rank far above independence
    assert max(v[1] for v in got.values()) > 10.0
