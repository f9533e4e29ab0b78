from renkodf_spark.plans.audit import assert_jvm_only, plan_summary  # noqa: F401
