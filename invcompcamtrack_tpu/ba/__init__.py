from invcompcamtrack_tpu.ba.window import (  # noqa: F401
    BAProblem,
    OdoFactors,
    ba_solve,
    ba_residuals,
    odo_residuals,
)
