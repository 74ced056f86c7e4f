"""PySpark-native knowledge-graph construction engine.

A brand-new, Spark-first reimplementation of the semantics of
Bayer-Group/cmc-knowledge-graph-text2ttl (reference snapshot at
/root/reference): YAML-configured extraction workflows turn a table of
web pages ``(url, warc_ts, html, text, lang)`` into ``(subj, pred, obj)``
RDF triples, with entity linking, sameAs canonicalization and TTL /
N-Triples output.

Architecture (nothing is ported from the reference's single-process
design; see SURVEY.md):

* ``workflow``  — driver-side YAML workflow compiler + the pure-Python
  per-document interpreter that is broadcast to executors and runs inside
  Arrow-batched ``mapInPandas`` (it also serves as the single-process
  test oracle).
* ``operators`` — the distributed DataFrame operators: text extraction,
  workflow execution, best-workflow top-1 selection, sameAs connected
  components, dedup / similarity / text-analysis ops.
* ``sources``/``sinks`` — pages table readers + synthetic corpus
  generator; canonical N-Triples/TTL writers.
* ``plans``     — the staged, checkpointed, resumable pipeline with
  per-partition lineage.
* ``streaming`` — Structured Streaming ingest variant.
"""

__version__ = "0.1.0"
