from migrate_cassandra_to_mysql_spark.sources.parquet import (  # noqa: F401
    TABLES,
    load_all,
    register_temp_views,
    table,
)
