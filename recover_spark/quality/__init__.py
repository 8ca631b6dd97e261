from recover_spark.quality.drift import psi_drift
from recover_spark.quality.expectations import (
    Expectation,
    ExpectationResult,
    persist_run,
    run_suite,
)

__all__ = ["psi_drift", "Expectation", "ExpectationResult", "persist_run", "run_suite"]
