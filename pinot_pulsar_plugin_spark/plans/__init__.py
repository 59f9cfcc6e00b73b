from pinot_pulsar_plugin_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    n_shuffles,
    pushed_filters,
)
