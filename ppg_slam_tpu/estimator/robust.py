"""Robust kernels as IRLS weights (g2o RobustKernelHuber/Cauchy semantics).

g2o scales each residual's information by rho'(chi2); the reference uses
Huber(sqrt(5.991)) for pose optimization, Cauchy(sqrt(5.991)) for mapping
reprojection, Huber(sqrt(7.815)) for colines, Huber(sqrt(16.92)) for the last
inertial link (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax.numpy as jnp

# chi-square thresholds used throughout the reference
CHI2_MONO = 5.991       # 2-DOF 95%
CHI2_COLINE = 7.815     # 3-DOF 95%
CHI2_INERTIAL = 16.92   # 9-DOF-ish, used on last temporal link


def huber_weight(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """rho'(chi2) for Huber with threshold delta (g2o setDelta semantics:
    quadratic for chi2 <= delta^2)."""
    d2 = delta * delta
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= d2, 1.0, delta / jnp.sqrt(safe))


def cauchy_weight(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """rho'(chi2) for Cauchy with scale delta^2."""
    d2 = delta * delta
    return 1.0 / (1.0 + chi2 / d2)


def no_kernel(chi2: jnp.ndarray, delta: float = 0.0) -> jnp.ndarray:
    return jnp.ones_like(chi2)


KERNELS = {"huber": huber_weight, "cauchy": cauchy_weight, "none": no_kernel}

# Runtime kernel selection: BAOptions carries kernels as int32 codes (pytree
# leaves) so every BA flavor — LBA/LIBA/GBA/FIBA, any delta/lambda — shares
# ONE compiled solve program per shape bucket instead of recompiling ~12 s
# per flavor (the robust weight is a 3-way select, negligible at runtime).
K_NONE, K_HUBER, K_CAUCHY = 0, 1, 2
KERNEL_CODES = {"none": K_NONE, "huber": K_HUBER, "cauchy": K_CAUCHY}


def kernel_code(kernel):
    """str -> int32 code; traced/int codes pass through."""
    return KERNEL_CODES[kernel] if isinstance(kernel, str) else kernel


def kernel_weight(code, chi2, delta):
    """rho'(chi2) selected by runtime kernel code."""
    return jnp.where(code == K_NONE, jnp.ones_like(chi2),
                     jnp.where(code == K_HUBER,
                               huber_weight(chi2, delta),
                               cauchy_weight(chi2, delta)))


def kernel_rho(code, chi2, delta):
    """Robust loss value rho(chi2) selected by runtime kernel code (for
    total-cost bookkeeping / LM accept tests)."""
    d2 = jnp.maximum(delta * delta, 1e-12)
    rho_h = jnp.where(chi2 <= d2, chi2,
                      2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d2)
    rho_c = d2 * jnp.log1p(chi2 / d2)
    return jnp.where(code == K_NONE, chi2,
                     jnp.where(code == K_HUBER, rho_h, rho_c))
