"""aws_glue_data_lake_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame/SQL/Catalyst) engine with the
query and data-processing capabilities of the reference data-lake project
(Hamza442/AWS-GLUE-DATA-LAKE: CDC full/incremental load into lake tables,
see SURVEY.md), re-expressed Spark-first and extended with the relational
operator surface plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

No AWS services, no Glue/boto3, no Delta/Iceberg jar dependency: the
reference's MERGE is a join-based rewrite (SURVEY.md §2.4), the catalog is
the Spark session catalog, storage is plain Parquet.
"""

from aws_glue_data_lake_spark.session import get_spark
from aws_glue_data_lake_spark.tables import TABLES, load_table, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_table", "load_tables", "register_views"]

__version__ = "0.1.0"
