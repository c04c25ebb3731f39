"""The engine's column-function library — one import surface for every
reusable scalar/aggregate expression the operators are built from.

All pure Catalyst expressions (whole-stage codegen, no UDFs): anything
imported from here composes into scans and map stages for free at 100 TB.
Reference scalar surface mapped in SURVEY.md §2.7.
"""

from flume_spark.operators.dedup import (  # noqa: F401
    norm_words_expr,
)
from flume_spark.operators.layout import (  # noqa: F401
    morton_key,
)
from flume_spark.operators.similarity import (  # noqa: F401
    cosine_expr,
    dot_expr,
    norm_expr,
)
from flume_spark.operators.text import (  # noqa: F401
    BPE_ISH_PATTERN,
    bigrams_over,
    quality_col,
    tokens_col,
)
from flume_spark.queue.backoff import (  # noqa: F401
    backoff_ms,
    backoff_ms_col,
)
