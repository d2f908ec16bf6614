from invcompcamtrack_tpu.ba.window import (  # noqa: F401
    BAProblem,
    ba_solve,
    ba_residuals,
)
