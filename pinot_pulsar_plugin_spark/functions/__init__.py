from pinot_pulsar_plugin_spark.functions.exact import (  # noqa: F401
    exact_avg,
    exact_sum,
    exact_sum_sql,
    exact_avg_sql,
    fold_dot,
    fold_norm,
)
