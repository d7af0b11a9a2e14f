"""Beyond-reference large-scale training-data operators: deduplication
families, similarity search, text analysis, multimodal plumbing, and
relational engine primitives — each expressed Ray-Data-first with a
DuckDB-checkable contract where SQL can express it."""
