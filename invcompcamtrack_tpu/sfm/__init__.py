from invcompcamtrack_tpu.sfm.triangulate import (  # noqa: F401
    triangulate_dlt,
    triangulate_gn,
    triangulate_lm,
    triangulate_depth_only,
)
