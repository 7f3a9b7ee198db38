"""Operator modules. Importing this package registers every query."""

from neo_olap_spark.operators import (  # noqa: F401
    analytics,
    graph_algos,
    io_sources,
    llm_dedup,
    llm_pipeline,
    llm_similarity,
    llm_text,
    multimodal,
    quality,
    udfs,
    relational,
    scalars,
    streaming,
    subqueries,
    tpch,
    warehouse,
)
