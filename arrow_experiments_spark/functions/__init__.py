from arrow_experiments_spark.functions.numeric import (
    davg,
    dsum,
    snap6,
)

__all__ = ["dsum", "davg", "snap6"]
