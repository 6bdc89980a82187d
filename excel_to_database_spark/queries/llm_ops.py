"""LLM-data-pipeline query entries (dedup, similarity search, text
analysis, multimodal) over ``documents``/``embeddings`` — populated by
the operators module; registered here so the driver sees them in the
same inventory as the relational queries."""

# Implementations land in excel_to_database_spark/operators/{dedup,
# similarity,text}.py and register below.
