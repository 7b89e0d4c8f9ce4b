from medtype_spark.metrics.clustering import (  # noqa: F401
    b_cubed,
    muc,
    pairwise,
    prf_row,
)
from medtype_spark.metrics.matrix import contingency_prf, micro_macro  # noqa: F401
