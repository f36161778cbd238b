"""SQL surface: register the engine's kernels as Spark SQL functions.

Lets SQL-first users call the similarity/normalization operators from
``spark.sql`` directly, e.g.::

    register_sql_functions(spark)
    spark.sql("SELECT er_name_sim(a.name, b.name) AS s FROM ...")

Native-Column kernels stay native (registered via pure-SQL-expression
wrappers would lose codegen, so those are documented as Column
functions); only the pandas-UDF kernels need registration.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from resolve_spark.functions.fields import pair_scorer_udf
from resolve_spark.functions.embedding import cosine_similarity_udf, mock_embedding_udf

SQL_KERNELS = {
    "er_jaro_winkler": "jarowinkler",
    "er_name_sim": "name",
    "er_address_sim": "address",
    "er_email_sim": "email",
    "er_cosine_tf": "cosine",
}


def register_sql_functions(spark: SparkSession, embedding_dim: int = 16) -> None:
    for sql_name, kernel in SQL_KERNELS.items():
        spark.udf.register(sql_name, pair_scorer_udf(kernel))
    spark.udf.register("er_vec_cosine", cosine_similarity_udf)
    spark.udf.register("er_mock_embed", mock_embedding_udf(embedding_dim))
