from recover_spark.quality.expectations import (
    Expectation,
    ExpectationResult,
    run_suite,
)

__all__ = ["Expectation", "ExpectationResult", "run_suite"]
