"""log_parser_cli_spark — a PySpark-native log parse → enrich → route → aggregate engine.

Brand-new implementation of the query semantics of QingrongY/log-parser-cli
(reference at /root/reference, an LLM-assisted semantic log parser CLI) as an
idiomatic Spark pipeline over pre-tokenized sequence tables:

- template discovery = regex masking + Drain-style prefix-tree clustering
  (replaces the reference's LLM template oracle),
- matching = vectorized signature lookup (broadcast hash join) with a
  reference-parity ordered first-match-wins regex matcher,
- routing = deterministic partitioned fan-out writes keyed by (sink, template),
- aggregation = per-sink template counts + n_tok histograms,
- eval = GA / PA / purity metrics (pairwise grouping accuracy) as DataFrame ops.

Everything is DataFrame/Catalyst-first; Python appears only in one Arrow-batched
mapInPandas parse stage and driver-side template compilation.
"""

__version__ = "0.1.0"
