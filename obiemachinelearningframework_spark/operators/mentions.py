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

import bisect
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
        # provenance: "ner" (dictionary/regex kernel) or "fuzzy" (similarity
        # linking) — the NERTemplate FoundByNER signal
        T.StructField("src", T.StringType()),
    ]
)


def prepare_instances(source_df: DataFrame) -> DataFrame:
    """Source table -> instances: stable doc_key + per-row sha256 invariant
    (BASELINE.json.input_hint: sha256(content) equality source→sink)."""
    return source_df.withColumn(
        "doc_key",
        F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.substring("commit", 1, 8)),
    ).withColumn("sha256", F.sha2(F.col("content"), 256))


UNKNOWN_KIND = "unknown"
_CAP_TOKEN = re.compile(r"\b[A-Z][a-z]{3,}\b")
MAX_SPAN_TOKENS = 8  # reference maxTokenPerAnnotation
                     # (explorer/EntityRecognitionExplorer.java:47)

# the explorer's span stop list is punctuation only
# (EntityRecognitionExplorer.java:70-71)
_SPAN_STOP = frozenset({"%", ".", ",", "&", ":", ";", "<", ">", "=", "?", "!"})


def dictionary_token_set(ontology) -> frozenset:
    """Lowercased tokens of every dictionary surface form — the explorer's
    first/last-token span gate (``AbstractDictionary.java:20,39-40,52-54``:
    the dictionary collects the tokens of each entry name;
    ``containsToken`` tests lowercased membership)."""
    from ..functions.tokenize import _TOKEN

    toks: set[str] = set()
    for sf in ontology.dictionary.surface_form.drop_duplicates():
        for m in _TOKEN.finditer(str(sf).lower()):
            toks.add(m.group(0))
    return frozenset(toks)


def linkable_span_band(ontology) -> tuple | None:
    """Char-length band [0.7*min_surface, max_surface/0.7] outside which NO
    unknown span can pass the fuzzy-linking gate: lev_sim = 1 - d/max(|t|,
    |s|) >= MIN_LEV_SIM forces |t| within a factor of the surface length
    (d >= abs(|t|-|s|)). Pruning enumeration to the band is therefore
    LOSSLESS for linking while capping the distinct-window vocabulary the
    corpus-wide pre-scan must shuffle — without it, a hot dictionary token
    makes the gate-2 window set combinatorial at 100 TB. Band over
    individual-kind surfaces only (build_link_map links individuals)."""
    import math

    from .linking import MIN_LEV_SIM

    d = ontology.dictionary
    surfaces = d[d.kind == "individual"].surface_form.astype(str)
    if not len(surfaces):
        return None
    lens = surfaces.str.len()
    return (
        int(math.ceil(MIN_LEV_SIM * int(lens.min()))),
        int(math.floor(int(lens.max()) / MIN_LEV_SIM)),
    )


def compile_patterns(pattern_rows):
    """Pattern-table rows -> list of (type_id, kind, class_id, is_dt, regex,
    probes). ``probes`` is the guaranteed-literal prefilter from the pattern
    algebra (functions/patterns.py): a scan can only match if one probe is a
    substring of the lowered content; () means always scan."""
    return [
        (r["type_id"], r["kind"], r["class_id"], bool(r["is_datatype"]),
         re.compile(r["pattern"], FLAGS), tuple(r.get("probes", ())))
        for r in pattern_rows
    ]


def match_document(content: str, compiled, min_len: int, want_unknown: bool,
                   dict_tokens: frozenset | None = None,
                   span_band: tuple | None = None):
    """One document through the NER kernel. Returns (mentions, unknowns):
    mentions = [(kind, type_id, class_id, individual_id, is_dt, text, onset,
    offset, sent_idx, dt_value)], unknowns = [(text, onset, offset,
    sent_idx)] (uncovered unknown-span candidates, only if want_unknown).
    Single source of truth for both detect_mentions and the fused
    extraction kernel — their mention sets agree by construction.

    Unknown spans come from TWO gates, unioned:
    * the reference's dictionary-token gate
      (``explorer/EntityRecognitionExplorer.java:135-187``): every token
      window of width max..1 whose FIRST and LAST token each appear
      (lowercased) among the dictionary's surface-form tokens, containing
      no punctuation stop token, not covered by a detected mention —
      this is how lowercase / mixed-case unseen surfaces (gene symbols,
      product names, code identifiers) reach fuzzy linking;
    * the capitalized-run heuristic (runs of [A-Z][a-z]{3,} tokens): a
      surface misspelled in EVERY token has no dictionary token to gate
      on, but capitalization still marks it as a name candidate.
    """
    content = content or ""
    bounds = sentence_bounds(content)
    lowered = content.lower()
    rows, spans = [], []
    for type_id, kind, class_id, is_dt, pat, probes in compiled:
        # guaranteed-literal prefilter (functions/patterns.py): skip the
        # regex scan — the kernel's dominant cost — unless a probe literal
        # occurs; lossless by construction of the pattern algebra
        if probes:
            for p in probes:
                if p in lowered:
                    break
            else:
                continue
        for m in pat.finditer(content):
            text = m.group(0)
            if len(text) < min_len:
                continue
            dt_value = None
            if is_dt:
                dt_value = interpreter.interpret_match(m)
                if dt_value is None:
                    # dictionary-matched string datatype: the lowercased
                    # surface IS the interpreted value
                    dt_value = text.lower()
            rows.append(
                (
                    kind, type_id, class_id,
                    type_id if kind == "individual" else None,
                    is_dt, text, m.start(), m.end(),
                    sent_index_of(bounds, m.start()) if bounds else 0,
                    dt_value, "ner",
                )
            )
            if want_unknown:
                spans.append((m.start(), m.end()))
    unknowns = []
    if want_unknown:
        spans.sort()
        # coverage test "any span (s, e) with s <= on and e >= off" via
        # bisect over starts + prefix-max of ends: O(log n) per window
        # instead of a linear scan (emit runs per token window, the inner
        # loop of the span gates)
        span_starts = [s for s, _ in spans]
        span_maxend = []
        _m = -1
        for _, e in spans:
            _m = e if e > _m else _m
            span_maxend.append(_m)
        seen_spans: set[tuple[int, int]] = set()

        def emit(on: int, off: int):
            if span_band and not (span_band[0] <= off - on <= span_band[1]):
                return  # provably unlinkable length (linkable_span_band)
            if (on, off) in seen_spans:
                return
            k = bisect.bisect_right(span_starts, on)
            if k and span_maxend[k - 1] >= off:
                return  # covered by a detected mention (overlap filter)
            seen_spans.add((on, off))
            unknowns.append(
                (content[on:off], on, off, sent_index_of(bounds, on) if bounds else 0)
            )

        # gate 1 — capitalized runs (tokens adjacent across a single
        # space); every window of <= MAX_SPAN_TOKENS tokens within a run,
        # longest first: a multi-token surface misspelled in EVERY token
        # can still fuzzy-link as one span
        caps = [(t.start(), t.end(), t.group(0)) for t in _CAP_TOKEN.finditer(content)]
        runs, cur = [], []
        for c in caps:
            if cur and not (c[0] == cur[-1][1] + 1 and content[cur[-1][1]] == " "):
                runs.append(cur)
                cur = []
            cur.append(c)
        if cur:
            runs.append(cur)
        for run in runs:
            nrun = len(run)
            for width in range(min(nrun, MAX_SPAN_TOKENS), 0, -1):
                for i in range(nrun - width + 1):
                    emit(run[i][0], run[i + width - 1][1])

        # gate 2 — the reference's dictionary-token gate over ALL token
        # windows (EntityRecognitionExplorer.java:135-187): width==1 spans
        # need len > 1; first (and for width > 1, last) token must appear
        # in the dictionary token set; no punctuation stop token inside
        if dict_tokens:
            from ..functions.tokenize import _TOKEN

            toks = [(m.group(0), m.start(), m.end()) for m in _TOKEN.finditer(content)]
            in_dict = [t[0].lower() in dict_tokens for t in toks]
            n = len(toks)
            # next stop-token index at or after each position: a window
            # from i may extend to j < next_stop[i] only — this plus the
            # dict-start skip makes the sweep O(dict_starts x MAX_SPAN)
            # instead of O(n x MAX_SPAN) (the kernel runs per document on
            # the hot path AND in the corpus-wide vocabulary pre-scan)
            next_stop = [n] * (n + 1)
            for i in range(n - 1, -1, -1):
                next_stop[i] = i if toks[i][0] in _SPAN_STOP else next_stop[i + 1]
            for i in range(n):
                if not in_dict[i] or next_stop[i] == i:
                    continue
                limit = min(i + MAX_SPAN_TOKENS, next_stop[i], n)
                for j in range(limit - 1, i, -1):
                    # width > 1: last token must pass the dict gate too
                    if in_dict[j]:
                        emit(toks[i][1], toks[j][2])
                # width == 1: single tokens need length > 1
                if len(toks[i][0]) > 1:
                    emit(toks[i][1], toks[i][2])
    return rows, unknowns


def detect_mentions(
    instances: DataFrame, ontology, min_ner_length: int = 2, emit_unknown: bool = False
) -> DataFrame:
    """instances(doc_key, content, ...) -> mentions DataFrame.

    One output row per (pattern match x type); duplicates from overlapping
    pattern families (dictionary + auto-generated) collapsed on
    (doc_key, kind, type_id, onset, offset). Ambiguous spans (two types
    matching the same text) are KEPT — disambiguation is the slot-filling
    scorer's job, as in the reference.

    ``emit_unknown=True`` additionally emits one row per capitalized
    alphabetic token (len >= 4) not covered by any detected mention, with
    ``kind='unknown'`` — the candidate surface forms for fuzzy linking
    (``explorer/EntityRecognitionExplorer.java:150-187`` span gate). Doing
    this inside the same kernel pass removes a tokenize-explode plus a
    range anti-join from the plan: at scale those are two extra
    content-sized stages; here the matches are already in hand.

    Note: when ``emit_unknown`` is set the dropDuplicates is left to the
    caller (the pipeline dedups once after merging fuzzy-linked rows) so
    the kernel output stays a pure map stage.
    """
    pattern_rows = compile_pattern_table(ontology)
    spark = instances.sparkSession
    dict_toks = dictionary_token_set(ontology) if emit_unknown else None
    band = linkable_span_band(ontology) if emit_unknown else None
    bc = spark.sparkContext.broadcast((pattern_rows, dict_toks, band))
    min_len = min_ner_length
    want_unknown = emit_unknown

    def run(batches):
        rows_in, dtoks, bnd = bc.value
        compiled = compile_patterns(rows_in)
        cols = MENTION_SCHEMA.fieldNames()
        for pdf in batches:
            recs = []
            for doc_key, content in zip(pdf["doc_key"], pdf["content"]):
                rows, unknowns = match_document(content, compiled, min_len, want_unknown,
                                                dtoks, bnd)
                for r in rows:
                    recs.append((doc_key,) + r)
                for text, on, off, sent in unknowns:
                    recs.append(
                        (doc_key, UNKNOWN_KIND, None, None, None, False, text, on, off, sent, None, None)
                    )
            yield pd.DataFrame(recs, columns=cols)

    mentions = instances.select("doc_key", "content").mapInPandas(run, schema=MENTION_SCHEMA)
    if emit_unknown:
        return mentions
    return mentions.dropDuplicates(["doc_key", "kind", "type_id", "onset", "offset"])
