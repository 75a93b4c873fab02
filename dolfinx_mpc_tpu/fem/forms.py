"""Variational forms: a traced "UFL-lite" replacing UFL + FFCx codegen.

The reference consumes FFCx-compiled element kernels
(`fn(Ae, coeffs, constants, coords, ...)`, invoked at
/root/reference/cpp/assemble_matrix.cpp:504-506).  Here a form's integrand is
an ordinary Python function over per-quadrature-point basis data (`Arg`) and a
context (`Ctx`), traced ONCE by JAX and vectorized over (cells × qps × basis
pairs) — the TPU-native analogue of generated kernels, letting XLA fuse the
whole element-tensor computation into batched MXU contractions.

Example::

    a = BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    L = LinearForm(V, lambda v, c: f(c.x) * v.value)
    L2 = LinearForm(V, lambda v, c: g(c.x) * v.value,
                    integral="exterior_facet", entities=facets)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .functionspace import Function, FunctionSpace

__all__ = [
    "Arg",
    "Ctx",
    "BilinearForm",
    "LinearForm",
    "Form",
    "derivative",
    "grad",
    "div",
    "sym",
    "tr",
    "inner",
    "dot",
    "outer",
    "Identity",
    "conj",
]


class Arg:
    """Basis-function (or coefficient) data at one quadrature point.

    For a scalar space: value is a scalar, gradient has shape (gdim,).
    For a blocked space (bs>1): value has shape (bs,), gradient (bs, gdim).
    """

    def __init__(self, value, gradient):
        self.value = value
        self.gradient = gradient

    # ufl-ish sugar
    @property
    def dx(self):
        return self.gradient


jax.tree_util.register_pytree_node(
    Arg, lambda a: ((a.value, a.gradient), None), lambda _, c: Arg(*c)
)


class Ctx:
    """Per-quadrature-point context: physical coordinate x, facet normal n
    (exterior-facet integrals only), and coefficient Args by name."""

    def __init__(self, x, n=None, w=None):
        self.x = x
        self.n = n
        self.w = {} if w is None else w

    def __getitem__(self, name):
        return self.w[name]


jax.tree_util.register_pytree_node(
    Ctx,
    lambda c: ((c.x, c.n, c.w), None),
    lambda _, ch: Ctx(*ch),
)


# ---- tensor calculus helpers --------------------------------------------


def grad(u):
    return u.gradient if isinstance(u, Arg) else u


def div(u):
    g = grad(u)
    return jnp.trace(g) if g.ndim == 2 else jnp.sum(g)


def sym(A):
    return 0.5 * (A + A.T)


def tr(A):
    return jnp.trace(A)


def conj(a):
    return jnp.conj(a)


def inner(a, b):
    """Frobenius inner product; conjugates the SECOND argument (test side),
    matching UFL's convention so complex assembly gives sesquilinear forms."""
    a = a.value if isinstance(a, Arg) else a
    b = b.value if isinstance(b, Arg) else b
    return jnp.sum(jnp.asarray(a) * jnp.conj(jnp.asarray(b)))


def dot(a, b):
    a = a.value if isinstance(a, Arg) else a
    b = b.value if isinstance(b, Arg) else b
    a, b = jnp.asarray(a), jnp.asarray(b)
    if a.ndim == 0 or b.ndim == 0:
        return a * b
    if a.ndim == 1 and b.ndim == 1:
        return jnp.sum(a * b)
    return a @ b


def outer(a, b):
    a = a.value if isinstance(a, Arg) else a
    b = b.value if isinstance(b, Arg) else b
    return jnp.outer(jnp.asarray(a), jnp.conj(jnp.asarray(b)))


def Identity(n):
    return jnp.eye(n)


# ---- form containers -----------------------------------------------------


@dataclass
class FormTerm:
    integrand: Callable
    integral: str = "cell"  # "cell" | "exterior_facet"
    entities: Optional[np.ndarray] = None  # cells or facet indices; None = all
    coefficients: dict = field(default_factory=dict)  # name -> Function
    constants: dict = field(default_factory=dict)  # name -> scalar/array
    quad_degree: Optional[int] = None


@dataclass
class Form:
    """rank 2 (bilinear) or rank 1 (linear) form as a sum of integral terms."""

    test_space: FunctionSpace
    trial_space: Optional[FunctionSpace]
    terms: list

    @property
    def rank(self) -> int:
        return 2 if self.trial_space is not None else 1

    @property
    def function_spaces(self):
        return (
            [self.test_space, self.trial_space]
            if self.trial_space is not None
            else [self.test_space]
        )

    def __add__(self, other: "Form") -> "Form":
        assert other.test_space is self.test_space
        return Form(self.test_space, self.trial_space, self.terms + other.terms)


def BilinearForm(
    V,
    integrand,
    V_trial=None,
    integral="cell",
    entities=None,
    coefficients=None,
    constants=None,
    quad_degree=None,
) -> Form:
    """a(u, v): integrand(u, v, ctx) -> scalar.  V is the test space; trial
    defaults to the same space (rectangular forms pass V_trial)."""
    term = FormTerm(
        integrand,
        integral,
        None if entities is None else np.asarray(entities),
        coefficients or {},
        constants or {},
        quad_degree,
    )
    return Form(V, V_trial if V_trial is not None else V, [term])


def LinearForm(
    V,
    integrand,
    integral="cell",
    entities=None,
    coefficients=None,
    constants=None,
    quad_degree=None,
) -> Form:
    """L(v): integrand(v, ctx) -> scalar."""
    term = FormTerm(
        integrand,
        integral,
        None if entities is None else np.asarray(entities),
        coefficients or {},
        constants or {},
        quad_degree,
    )
    return Form(V, None, [term])


def derivative(F: Form, u_name: str) -> Form:
    """Gateaux derivative of a residual form w.r.t. the coefficient named
    `u_name`: produces the Jacobian bilinear form via forward-mode AD on the
    coefficient's value/gradient at each quadrature point.  TPU-native
    replacement of `ufl.derivative` used by the reference's NonlinearProblem
    (/root/reference/python/src/dolfinx_mpc/problem.py:231-239).
    """
    assert F.rank == 1
    terms = []
    for t in F.terms:
        if u_name not in t.coefficients:
            continue

        def make(jt):
            def jac_integrand(du, v, ctx):
                # d/deps integrand(v, ctx with w[u] -> w[u] + eps*du)
                def f(uarg):
                    w = dict(ctx.w)
                    w[u_name] = uarg
                    return jt.integrand(v, Ctx(ctx.x, ctx.n, w))

                u0 = ctx.w[u_name]
                _, jvp = jax.jvp(f, (u0,), (du,))
                return jvp

            return jac_integrand

        terms.append(
            FormTerm(
                make(t),
                t.integral,
                t.entities,
                dict(t.coefficients),
                dict(t.constants),
                t.quad_degree,
            )
        )
    V = F.terms[0].coefficients[u_name].function_space
    return Form(F.test_space, V, terms)
