"""aws_medallion_etl_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-Spark re-expression of the query and
data-processing capabilities of the reference medallion ETL system
(``congdinh2008/aws-medallion-etl``, see SURVEY.md): schema-enforced
ingestion with reject quarantine and circuit breakers, window-function
dedup, missing-data strategies, join enrichment, SCD2 dimensions,
grain-checked facts with FK resolution, DQ gates, KPI queries — plus
large-scale training-data operators (fuzzy dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB inputs.

Everything is expressed with the DataFrame / Spark SQL API so Catalyst
and Tungsten choose physical strategies; Python UDFs appear only as
Arrow-batched pandas UDFs in the few operators whose semantics the
built-ins cannot express.
"""

__version__ = "0.1.0"

from aws_medallion_etl_spark.session import get_spark  # noqa: F401
