"""sparkgraft — a PySpark-native analytics engine.

A library of composable DataFrame->DataFrame operators generalizing the
event-instrumentation verification pipeline of the reference
(``/root/reference/event_verify.py``) into single declarative Catalyst
plans, plus LLM-data-pipeline operators (dedup, similarity search, text
analysis) designed for 100 TB scale.

Modules:
  session      SparkSession factory with scale-appropriate defaults
  io           sources/sinks (SURVEY §2.1 S1-S7)
  json_ops     JSON introspection (SURVEY §2.8 F1-F3, P7 fixed)
  relational   generic relational operators (windows, melt, joins, set ops)
  conformance  flagship spec-vs-observed event verification (one lazy plan)
  text         text analysis: lang-id, quality, tokens, fingerprints
  dedup        exact/incremental + near-duplicate detection
               (minhash/simhash/jaccard), decontamination, clustering
  similarity   embedding cosine top-k, near-dup pairs, ANN (LSH / IVF)
  semdedup     semantic dedup (cluster + per-cluster matmul)
  quantize     int8 embedding tier (quantized-then-exact top-k)
  contract     declarative data-contract validation (one-scan rules)
  sampling     deterministic stratified/weighted draws, splits (queries/)
  packing      batch assembly: packing, mixture epochs, epoch shuffle
  multimodal   binary-column plumbing for image/audio payloads (stubbed decode)
  streaming    Structured Streaming variants of the conformance
               aggregations + stream-static / stream-stream joins
  incremental  batch-over-batch aggregate maintenance (monoid states,
               mergeable HLL distinct sketches)
  analytics    behavioral analytics (funnel conversion, cohort retention)
  classify     quality classifier (logistic scoring + distributed GD)
  graph        iterative graph analytics (PageRank, degree stats)
  bpe          BPE tokenizer training + Arrow-batched encoding
"""

__version__ = "0.1.0"
