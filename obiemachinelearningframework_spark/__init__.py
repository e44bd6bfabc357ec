"""PySpark-native ontology-based information extraction (OBIE) engine.

A from-scratch re-creation of the query/data-processing capabilities of
``hterhors/OBIEMachineLearningFramework`` (reference at /root/reference,
read-only) on Apache Spark DataFrames:

    source table (repo, path, commit, lang, content)
      -> tokenize -> mention detection (regex + dictionary NER)
      -> candidate generation (broadcast ontology joins, evidence pruning)
      -> slot filling (batched beam-search over all docs at once)
      -> entity linking + canonicalization (connected components)
      -> (subj, pred, obj) triple materialization, partitioned + salted
      -> tree-PRF1 evaluation (CartesianSearchEvaluator semantics)

Everything is DataFrame-native; Python touches data only through
vectorized pandas/Arrow UDFs. The reference's per-document object-graph
mutation becomes batched, per-document-independent DataFrame iteration,
which is what makes the same semantics run on a 1000-executor cluster.
"""

__version__ = "0.1.0"
