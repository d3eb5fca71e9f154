"""Weak-form expression language: the TPU-native replacement for GiNaC.

The reference lets users state variational forms as C++ lambdas over GiNaC
expressions — ``wf.build([](u,v){ return dot(grad(u),grad(v)); },
[](v){ return f*v; })`` (/root/reference/fea_symbolic.cu:503-506) — then
differentiates symbolically, substitutes the affine map, prints CUDA C, and
NVRTC-compiles it at runtime.  Here the same user-facing algebra builds a
small expression tree that is *numerically traced* under ``jax.jit``:
evaluation binds trial/test functions to batched basis tables and spatial
coordinates to mapped quadrature points, producing one fused XLA element
kernel — jit tracing plays the role of the entire GiNaC -> string template ->
NVRTC pipeline (SURVEY.md §2.2 "Runtime kernel compilation").

Value semantics: every expression evaluates to a jnp array broadcastable over
leading axes [A(trial), B(test), NE, Q] with trailing *value shape* ()
scalar, (d,) vector, or (d, d) tensor.  Contractions (dot/inner/...) act on
the value shape only.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = [
    "Expr", "Constant", "Coefficient", "TrialFunction", "TestFunction",
    "SpatialCoordinate", "FacetNormal", "grad", "dot", "inner", "div",
    "sym", "tr", "Identity", "outer",
]


class Expr:
    """Base expression node. ``rank`` is the tensor rank of the value."""

    rank: int = 0

    # -- algebra -------------------------------------------------------------
    def __add__(self, other):
        return _Binary(jnp.add, self, _wrap(other), "+")

    def __radd__(self, other):
        return _Binary(jnp.add, _wrap(other), self, "+")

    def __sub__(self, other):
        return _Binary(jnp.subtract, self, _wrap(other), "-")

    def __rsub__(self, other):
        return _Binary(jnp.subtract, _wrap(other), self, "-")

    def __mul__(self, other):
        return _Binary(jnp.multiply, self, _wrap(other), "*")

    def __rmul__(self, other):
        return _Binary(jnp.multiply, _wrap(other), self, "*")

    def __truediv__(self, other):
        return _Binary(jnp.divide, self, _wrap(other), "/")

    def __rtruediv__(self, other):
        return _Binary(jnp.divide, _wrap(other), self, "/")

    def __pow__(self, p):
        return _Binary(jnp.power, self, _wrap(p), "**")

    def __neg__(self):
        return _Unary(jnp.negative, self, "-")

    def __getitem__(self, i):
        return _Component(self, i)

    def evaluate(self, ctx):
        raise NotImplementedError


def _wrap(v):
    if isinstance(v, Expr):
        return v
    return Constant(v)


def _bcast_binop(op, a, b, ra, rb):
    """Apply an elementwise op aligning value shapes on the right."""
    if ra == rb:
        return op(a, b), ra
    # scalar (op) tensor: expand the scalar's trailing dims
    if ra == 0:
        return op(a[(...,) + (None,) * rb], b), rb
    if rb == 0:
        return op(a, b[(...,) + (None,) * ra]), ra
    raise ValueError(f"rank mismatch in elementwise op: {ra} vs {rb}")


class _Binary(Expr):
    def __init__(self, op, a, b, sym_):
        self.op, self.a, self.b, self.sym = op, a, b, sym_
        self.rank = max(a.rank, b.rank)
        if a.rank != b.rank and min(a.rank, b.rank) != 0:
            raise ValueError(f"rank mismatch in '{sym_}'")

    def evaluate(self, ctx):
        va = self.a.evaluate(ctx)
        vb = self.b.evaluate(ctx)
        out, _ = _bcast_binop(self.op, va, vb, self.a.rank, self.b.rank)
        return out


class _Unary(Expr):
    def __init__(self, op, a, sym_):
        self.op, self.a, self.sym = op, a, sym_
        self.rank = a.rank

    def evaluate(self, ctx):
        return self.op(self.a.evaluate(ctx))


class _Component(Expr):
    def __init__(self, base, index):
        if base.rank < 1:
            raise ValueError("cannot index a scalar expression")
        self.base, self.index = base, index
        self.rank = base.rank - 1

    def evaluate(self, ctx):
        return self.base.evaluate(ctx)[..., self.index]


class Constant(Expr):
    def __init__(self, value):
        self.value = value
        self.rank = jnp.ndim(value)  # numpy scalars/vectors allowed

    def evaluate(self, ctx):
        return jnp.asarray(self.value, ctx.dtype)


class Coefficient(Expr):
    """A spatial coefficient f(x): callable over physical coordinates.

    ``fn`` maps [..., dim] -> [...] (scalar) or [..., k] (vector, set rank=1).
    """

    def __init__(self, fn: Callable, rank: int = 0):
        self.fn = fn
        self.rank = rank

    def evaluate(self, ctx):
        return self.fn(ctx.xq)


class TrialFunction(Expr):
    """The unknown u. Scalar spaces: rank 0; vector spaces: rank 1."""

    def __init__(self, space):
        self.space = space
        self.rank = 0 if space.num_components == 1 else 1

    def evaluate(self, ctx):
        return ctx.trial_value


class TestFunction(Expr):
    def __init__(self, space):
        self.space = space
        self.rank = 0 if space.num_components == 1 else 1

    def evaluate(self, ctx):
        return ctx.test_value


class _Coord(Expr):
    rank = 1

    def evaluate(self, ctx):
        return ctx.xq


def SpatialCoordinate(space_or_mesh):  # noqa: N802 (UFL-style name)
    """The physical coordinate vector x; index it for components.

    Mirrors the reference's GiNaC symbols x, y that the user builds f from
    (/root/reference/fea_symbolic.cu:497-498): here
    ``x, y = SpatialCoordinate(V)`` unpacks to component expressions.
    """
    return _Coord()


class _Normal(Expr):
    rank = 1

    def evaluate(self, ctx):
        n = getattr(ctx, "normal", None)
        if n is None:
            raise ValueError(
                "FacetNormal is only defined in boundary integrals "
                "(WeakForm.build_boundary / integrate_boundary)")
        return n


def FacetNormal(space_or_mesh):  # noqa: N802 (UFL-style name)
    """The outward unit normal n on the boundary — valid only inside
    boundary forms (Neumann/Robin terms, flux functionals)."""
    return _Normal()


class _Grad(Expr):
    def __init__(self, a):
        if isinstance(a, TrialFunction):
            self.kind = "trial"
        elif isinstance(a, TestFunction):
            self.kind = "test"
        elif hasattr(a, "gradient"):
            # discrete Functions (tpufem.forms.weakform.Function) provide
            # their own gradient evaluation
            self.kind = "custom"
        else:
            raise NotImplementedError(
                "grad() applies to trial/test/discrete functions; spatial "
                "coefficients can supply gradients analytically")
        self.a = a
        self.rank = a.rank + 1

    def evaluate(self, ctx):
        if self.kind == "trial":
            return ctx.trial_grad
        if self.kind == "test":
            return ctx.test_grad
        return self.a.gradient(ctx)


def grad(u) -> Expr:
    """∇u: scalar -> vector [d], vector -> tensor [nc, d] (du_i/dx_j).

    Parity: the reference's ``grad(u, x, y)`` helper
    (/root/reference/fea_symbolic.cu:74-77), whose symbolic chain rule
    (∂r/∂x = (y2-y3)/jac, ..., fea_symbolic.cu:40-71) is realized here by the
    precomputed physical basis gradients in the evaluation context.
    """
    return _Grad(u)


class _Dot(Expr):
    def __init__(self, a, b):
        a, b = _wrap(a), _wrap(b)
        if a.rank < 1 or b.rank < 1:
            raise ValueError("dot() needs rank >= 1 operands")
        self.a, self.b = a, b
        self.rank = a.rank + b.rank - 2

    def evaluate(self, ctx):
        va, vb = self.a.evaluate(ctx), self.b.evaluate(ctx)
        if self.a.rank == 1 and self.b.rank == 1:
            return (va * vb).sum(-1)
        if self.a.rank == 2 and self.b.rank == 1:
            return (va * vb[..., None, :]).sum(-1)
        if self.a.rank == 1 and self.b.rank == 2:
            return (va[..., :, None] * vb).sum(-2)
        if self.a.rank == 2 and self.b.rank == 2:
            return jnp.einsum("...ik,...kj->...ij", va, vb)
        raise NotImplementedError


def dot(a, b) -> Expr:
    """Single-index contraction (parity: /root/reference/fea_symbolic.cu:79-85)."""
    return _Dot(a, b)


class _Inner(Expr):
    rank = 0

    def __init__(self, a, b):
        a, b = _wrap(a), _wrap(b)
        if a.rank != b.rank:
            raise ValueError("inner() needs equal-rank operands")
        self.a, self.b = a, b
        self.naxes = a.rank

    def evaluate(self, ctx):
        va, vb = self.a.evaluate(ctx), self.b.evaluate(ctx)
        if self.naxes == 0:
            return va * vb
        axes = tuple(range(-self.naxes, 0))
        return (va * vb).sum(axes)


def inner(a, b) -> Expr:
    """Full contraction over the value shape (A : B for tensors)."""
    return _Inner(a, b)


class _Div(Expr):
    rank = 0

    def __init__(self, a):
        self.g = grad(a)
        if self.g.rank != 2:
            raise ValueError("div() needs a vector field")

    def evaluate(self, ctx):
        v = self.g.evaluate(ctx)
        return jnp.trace(v, axis1=-2, axis2=-1)


def div(u) -> Expr:
    return _Div(u)


class _Sym(Expr):
    def __init__(self, a):
        if a.rank != 2:
            raise ValueError("sym() needs a rank-2 expression")
        self.a = a
        self.rank = 2

    def evaluate(self, ctx):
        v = self.a.evaluate(ctx)
        return 0.5 * (v + jnp.swapaxes(v, -1, -2))


def sym(t) -> Expr:
    return _Sym(t)


class _Tr(Expr):
    rank = 0

    def __init__(self, a):
        if a.rank != 2:
            raise ValueError("tr() needs a rank-2 expression")
        self.a = a

    def evaluate(self, ctx):
        return jnp.trace(self.a.evaluate(ctx), axis1=-2, axis2=-1)


def tr(t) -> Expr:
    return _Tr(t)


class Identity(Expr):
    rank = 2

    def __init__(self, d: int):
        self.d = d

    def evaluate(self, ctx):
        return jnp.eye(self.d, dtype=ctx.dtype)


class _Outer(Expr):
    rank = 2

    def __init__(self, a, b):
        a, b = _wrap(a), _wrap(b)
        if a.rank != 1 or b.rank != 1:
            raise ValueError("outer() needs vector operands")
        self.a, self.b = a, b

    def evaluate(self, ctx):
        va, vb = self.a.evaluate(ctx), self.b.evaluate(ctx)
        return va[..., :, None] * vb[..., None, :]


def outer(a, b) -> Expr:
    return _Outer(a, b)
