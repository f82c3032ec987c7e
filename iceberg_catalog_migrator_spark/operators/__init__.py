"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing. Every operator is DataFrame-in/DataFrame-out
library code (no planner extensions) and partition-scalable: no
driver-side collect of data, joins blocked/bucketed before any pairwise
work."""
