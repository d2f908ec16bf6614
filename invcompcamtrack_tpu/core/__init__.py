from invcompcamtrack_tpu.core.lie import se3_exp, se3_log  # noqa: F401
from invcompcamtrack_tpu.core.camera import CameraPyramid  # noqa: F401
