"""Static monomial exponent tables + jnp evaluation kernels.

The reference builds polynomial feature maps for SSM and Koopman models with
sympy itermonomials + lambdify at runtime (sofacontrol/SSM/ssm.py:158-164,
baselines/koopman/koopman_utils.py:156-176). Here the monomial *orderings*
are generated once as integer exponent tables (pure Python, no sympy) and
evaluated as jittable power-product kernels — removing symbolic code from
the hot path entirely while matching the MATLAB coefficient conventions.

Orderings (verified against sympy in tests/test_ssm.py):
- 'grevlex' with the reversed-variable key used by SSM: ascending total
  degree, then lexicographically descending exponent tuples.
- 'grlex' with the reversed-variable key used by Koopman: the same order for
  the monomial sets involved (ascending degree, descending lex within).
"""

from __future__ import annotations

from functools import lru_cache
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def monomial_exponents(dim: int, order: int, include_constant: bool = False):
    """Exponent tuples of all monomials in `dim` variables with total degree
    1..order (0..order if include_constant), in the reference ordering:
    sorted by (total degree, descending lex on exponents).

    Matches sorted(itermonomials(x1..xd, order),
                   key=monomial_key('grevlex', reversed(vars)))[1:]
    (SSM/ssm.py:158-164). Returns an (n_mono, dim) int numpy array.
    """
    exps = []
    for e in product(range(order + 1), repeat=dim):
        deg = sum(e)
        if deg <= order and (include_constant or deg > 0):
            exps.append(e)
    exps.sort(key=lambda e: (sum(e), tuple(-ei for ei in e)))
    return np.asarray(exps, dtype=np.int32)


def eval_monomials(x, exps):
    """phi(x): evaluate the monomial basis at x (..., dim) -> (..., n_mono).

    Small dims (<= ~20 vars, <= few hundred monomials): one broadcasted
    power-product, fuses into the downstream coefficient matmul.

    Zero exponents are masked out of the power before the product: x**0 has a
    NaN derivative at x = 0 under AD (power rule emits 0 * x**-1), and the
    Jacobian of this basis at the origin is needed by every SSM
    linearization.
    """
    e = jnp.asarray(exps, dtype=x.dtype)
    pw = jnp.where(e > 0, x[..., None, :] ** e, 1.0)
    return jnp.prod(pw, axis=-1)


def make_poly_map(coeff, exps):
    """Return f(x) = coeff @ phi(x) as a pure jittable function."""
    coeff = jnp.asarray(coeff)

    def f(x):
        return coeff @ eval_monomials(x, exps)

    return f
