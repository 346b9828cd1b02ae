"""Fast trig in turn units (no argument reduction).

The DDS phase is an exact binary fraction of a turn, so ``sin(2*pi*x)``
never needs the expensive argument-reduction path of a general ``sin``:
fold x to v = x - rint(x) in [-0.5, 0.5] (one rint + sub) and evaluate a
minimax odd polynomial.  Max error 7.8e-7 in f32 — about 0.025 LSB at
16-bit, far inside the 1-LSB contract (the oracle keeps libm sin; tests
cover the difference).

Coefficients: degree-13 odd Chebyshev-weighted LSQ fit of sin(2*pi*v) on
[-0.5, 0.5] (fit script in the repo history; f64 residual 1.7e-9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_C = tuple(np.float32(c) for c in (
    6.2831852587e+00, -4.1341695438e+01, 8.1604970593e+01,
    -7.6700787441e+01, 4.2010936730e+01, -1.4851475811e+01,
    3.1781489795e+00,
))


def sin_turns(x: jax.Array) -> jax.Array:
    """sin(2*pi*x) for x in turns (any magnitude; folded mod 1)."""
    v = x - jnp.rint(x)
    v2 = v * v
    acc = _C[-1]
    for c in _C[-2::-1]:
        acc = acc * v2 + c
    return acc * v


def cos_turns(x: jax.Array) -> jax.Array:
    """cos(2*pi*x) = sin(2*pi*(x + 0.25))."""
    return sin_turns(x + jnp.float32(0.25))
