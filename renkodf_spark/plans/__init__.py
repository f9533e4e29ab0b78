from renkodf_spark.plans.audit import (  # noqa: F401
    assert_jvm_only,
    exchange_inputs,
    plan_summary,
    shuffle_inputs,
)
