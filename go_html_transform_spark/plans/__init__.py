from go_html_transform_spark.plans.parser import ParseError, parse_rule  # noqa: F401
from go_html_transform_spark.plans.rules import (  # noqa: F401
    Chain,
    CompiledRule,
    Link,
    SeqPart,
    Sequence,
    compile_chain,
)
from go_html_transform_spark.plans.pipeline import Transform, Transformer  # noqa: F401
