"""invcompcamtrack_tpu — a TPU-native visual-odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
InvCompCamTrack reference codebase (inverse-compositional Gauss-Newton
camera tracking, NCC optical-flow point tracking, RANSAC pose fitting,
triangulation, sliding-window bundle adjustment), built for TPU:

- batched tensor programs instead of per-point SIMD pointer loops,
- explicit validity masks instead of memset-padding tricks,
- `lax.scan`/`lax.while_loop` instead of data-dependent C loops,
- Pallas kernels for the hot patch-gather/reduction paths,
- `jax.sharding.Mesh` + collectives instead of file+system() process
  boundaries.

Layering (bottom-up): core -> image -> solver/match -> sfm -> ba -> vo,
with `parallel` providing mesh/sharding helpers and `ops` the Pallas
kernels.
"""

__version__ = "0.1.0"

from invcompcamtrack_tpu.config import ICGNParams  # noqa: F401
