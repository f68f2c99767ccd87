from go_html_transform_spark.functions.tokenize import (  # noqa: F401
    VOCAB_SIZE,
    tokens_expr,
    tokens_sql,
)
