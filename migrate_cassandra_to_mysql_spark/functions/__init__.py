from migrate_cassandra_to_mysql_spark.functions.hashing import (  # noqa: F401
    md5_token_bucket,
    token_ranges,
    xxhash_bucket,
)
from migrate_cassandra_to_mysql_spark.functions.sanitize import (  # noqa: F401
    sanitize_columns,
)
