from recover_spark.quality.expectations import (
    Expectation,
    ExpectationResult,
    persist_run,
    run_suite,
)

__all__ = ["Expectation", "ExpectationResult", "persist_run", "run_suite"]
