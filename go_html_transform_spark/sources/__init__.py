from go_html_transform_spark.sources.tables import (  # noqa: F401
    TABLES,
    labels,
    labels_sql,
    load_table,
    sequences,
    sequences_sql,
)
