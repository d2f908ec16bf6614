from invcompcamtrack_tpu.ops.patch_pallas import (  # noqa: F401
    pallas_available,
    gather_patches,
    gather_patches_grad,
)
