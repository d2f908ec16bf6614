"""Optical-flow endpoint-error evaluation.

The reference's magnitude-binned EPE metric over GT flow
(reference: misc_src/func_OF_util.py:18-36; Sintel-style bins
all / <10px / 10-40px / >=40px, results recorded
run_OF_NCC_eval.py:195-211).
"""

from __future__ import annotations

import jax.numpy as jnp


def flow_epe_binned(flow_gt: jnp.ndarray, flow_est: jnp.ndarray,
                    valid: jnp.ndarray | None = None):
    """flow_gt/flow_est: (H, W, 2).  Returns dict with keys
    'all', 's<10', 's10-40', 's>=40' (mean EPE per GT-magnitude bin)."""
    gt_mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    err = jnp.sqrt(jnp.sum((flow_gt - flow_est) ** 2, axis=-1))
    base = jnp.ones_like(gt_mag, bool) if valid is None else valid

    def bin_mean(mask):
        m = (mask & base).astype(err.dtype)
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)

    return {
        "all": bin_mean(jnp.ones_like(gt_mag, bool)),
        "s<10": bin_mean(gt_mag < 10),
        "s10-40": bin_mean((gt_mag >= 10) & (gt_mag < 40)),
        "s>=40": bin_mean(gt_mag >= 40),
    }
