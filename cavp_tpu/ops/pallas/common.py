"""Shared f32 scalar math for the Pallas kernels.

Mosaic has no erf/erfc primitive (recorded in docs/performance.md's
lowering lessons), so the kernels spell GELU through this rational erf.
The eval and train fusion kernels deliberately KEEP their own `_gelu` /
`_mm` / `_pick_block` wrappers — the eval kernel rounds back to the IO
dtype at every op (matching XLA's bf16 module path bit-for-bit), while
the train kernel stays in f32 across the recompute chain and pads the
token axis instead of requiring a divisor (zero-cotangent pad rows are
grad-exact). Only the math that must agree between them lives here.
"""

import jax.numpy as jnp

SQRT_2PI_INV = 0.3989422804014327  # 1/sqrt(2*pi)
INV_SQRT2 = 0.7071067811865476     # 1/sqrt(2)


def erf_f32(x):
    """Abramowitz–Stegun 7.1.26 rational erf, |err| <= 1.5e-7.

    Input is assumed f32; both fusion kernels and their tests pin the
    resulting GELU against jax.nn.gelu(approximate=False).
    """
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def phi_f32(x):
    """Standard normal CDF in f32."""
    return 0.5 * (1.0 + erf_f32(x * INV_SQRT2))


__all__ = ["erf_f32", "phi_f32", "SQRT_2PI_INV", "INV_SQRT2"]
