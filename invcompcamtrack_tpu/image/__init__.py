from invcompcamtrack_tpu.image.pyramid import Pyramid, build_pyramid  # noqa: F401
from invcompcamtrack_tpu.image.patch import (  # noqa: F401
    extract_patches,
    extract_patches_grad,
)
