"""Basic-graph-pattern (BGP) matching over a triple table — the query
side of KG construction (SPARQL's core evaluation step, re-expressed as
Catalyst joins).

The reference framework materializes filled ontology templates; the
standard way a consumer then *uses* that KG is conjunctive triple
patterns ("?d mentions_System ?s . ?d mentions_Operator ?op"). This
module compiles such a pattern list into a left-deep DataFrame join:

* each pattern becomes one filtered projection of the triple table
  (constants -> pushed-down equality filters, variables -> renamed
  columns), so Catalyst sees plain scans + filters it can prune;
* join order is chosen by *measured* pattern selectivity
  (pattern-count planning, the classic SPARQL heuristic) — ALL pattern
  counts come from ONE conditional-sum aggregation over a single triple
  scan, so planning costs one linear job regardless of how many
  patterns the BGP has;
* every join key is a shared variable, so a star-shaped BGP (all
  patterns sharing ?d) compiles to co-partitioned equi-joins on the
  subject key — the same shuffle the triple sink already bucketed for.
  Patterns with NO shared variable against the accumulated prefix are
  rejected (a cartesian product is never silently planned).

At 10^12-triple scale each pattern scan is predicate-pruned (the triple
table is partitioned by pred via the salted sink), the joins carry only
binding columns (subject/object ids), and nothing corpus-sized reaches
the driver — the planner actions return one scalar each.

Reference behavior recreated (not copied): querying filled templates by
slot paths, `AbstractOBIERunner.java` prediction consumers; the BGP
form itself follows the public SPARQL algebra (Perez et al. 2009).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _is_var(term: str) -> bool:
    return term.startswith("?")


def compile_pattern(triples: DataFrame, pattern) -> DataFrame:
    """One (s, p, o) pattern -> filtered projection with variable columns."""
    cols, cond = [], F.lit(True)
    for term, col in zip(pattern, ("subj", "pred", "obj")):
        if _is_var(term):
            cols.append(F.col(col).alias(term[1:]))
        else:
            cond = cond & (F.col(col) == F.lit(term))
    out = triples.filter(cond).select(*cols)
    # a pattern like (?d, p, ?d) needs the self-equality applied after
    # projection; duplicated variable names collapse to one column
    names = [t[1:] for t in pattern if _is_var(t)]
    if len(set(names)) != len(names):
        seen, keep, eq = {}, [], None
        for i, n in enumerate(names):
            if n in seen:
                eq = (F.col(f"__v{seen[n]}") == F.col(f"__v{i}")) if eq is None \
                    else eq & (F.col(f"__v{seen[n]}") == F.col(f"__v{i}"))
            else:
                seen[n] = i
                keep.append(i)
        tmp = triples.filter(cond).select(
            *[F.col(c).alias(f"__v{i}") for i, (t, c) in
              enumerate((t, c) for t, c in zip(pattern, ("subj", "pred", "obj"))
                        if _is_var(t))]
        )
        out = tmp.filter(eq).select(
            *[F.col(f"__v{i}").alias(names[i]) for i in keep])
    return out


def bgp_match(triples: DataFrame, patterns, distinct: bool = True,
              optional=None, filters=None) -> DataFrame:
    """Evaluate a conjunctive BGP; returns one row per variable binding.

    patterns: iterable of (s, p, o) strings; '?name' marks a variable.
    Join order = ascending measured cardinality with the connectivity
    constraint (next pattern must share >= 1 variable with the prefix).

    optional: patterns LEFT-joined after the required ones (SPARQL
    OPTIONAL) — unmatched bindings keep their required columns with the
    optional variables null; each must share >= 1 bound variable.
    filters: SQL boolean expression strings over the binding columns
    (SPARQL FILTER), applied before the final distinct — written in
    portable SQL they run verbatim on an oracle engine too.
    """
    pats = [tuple(p) for p in patterns]
    if not pats:
        raise ValueError("empty BGP")
    compiled = [(p, compile_pattern(triples, p)) for p in pats]
    # pattern-count planning in ONE pass: every pattern's constant
    # condition becomes a conditional-sum over the same triple scan, so
    # planning costs one linear job total — not one scan per pattern
    # (the difference between P and 1 full-table reads at 10^12 triples)
    conds = []
    for p in pats:
        c = F.lit(True)
        for term, col in zip(p, ("subj", "pred", "obj")):
            if not _is_var(term):
                c = c & (F.col(col) == F.lit(term))
        conds.append(c)
    counts = triples.agg(
        *[F.sum(F.when(c, 1).otherwise(0)).alias(f"c{i}")
          for i, c in enumerate(conds)]
    ).first()
    sized = sorted(
        ((int(counts[f"c{i}"] or 0), i, p, df)
         for i, (p, df) in enumerate(compiled)),
        key=lambda t: (t[0], t[1]),
    )
    remaining = list(sized)
    n0, _, p0, acc = remaining.pop(0)
    bound = {t[1:] for t in p0 if _is_var(t)}
    while remaining:
        pick = None
        for j, (n, i, p, df) in enumerate(remaining):
            if bound & {t[1:] for t in p if _is_var(t)}:
                pick = j
                break
        if pick is None:
            raise ValueError(
                "disconnected BGP: no shared variable with the prefix "
                f"(bound={sorted(bound)})")
        n, _, p, df = remaining.pop(pick)
        keys = sorted(bound & {t[1:] for t in p if _is_var(t)})
        acc = acc.join(df, keys)
        bound |= {t[1:] for t in p if _is_var(t)}
    for p in (optional or []):
        p = tuple(p)
        df = compile_pattern(triples, p)
        keys = sorted(bound & {t[1:] for t in p if _is_var(t)})
        if not keys:
            raise ValueError(
                f"OPTIONAL pattern shares no variable with the required "
                f"BGP (bound={sorted(bound)})")
        acc = acc.join(df, keys, "left")
        bound |= {t[1:] for t in p if _is_var(t)}
    for f in (filters or []):
        acc = acc.filter(F.expr(f))
    return acc.distinct() if distinct else acc
