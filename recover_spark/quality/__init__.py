from recover_spark.quality.drift import psi_drift, psi_drift_categorical
from recover_spark.quality.expectations import (
    Expectation,
    ExpectationResult,
    persist_run,
    run_suite,
)

__all__ = ["psi_drift", "psi_drift_categorical", "Expectation", "ExpectationResult", "persist_run", "run_suite"]
