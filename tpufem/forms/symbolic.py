"""Symbolic weak-form engine: GiNaC-pipeline parity via SymPy.

The reference's defining path (/root/reference/fea_symbolic_nvrtc.cpp,
SURVEY.md §3.2) is:

  user lambdas over GiNaC expressions
    -> custom 8-arg functions sfR/sfS with chain-rule derivatives
       (∂r/∂x = (y2-y3)/jac, ∂r/∂y = (x3-x2)/jac, ∂s/∂x = (y3-y1)/jac,
        ∂s/∂y = (x1-x3)/jac; fea_symbolic.cu:40-71)
    -> substitute sfR->r, sfS->s, x->fx(r,s), y->fy(r,s), multiply by jac
       (fea_symbolic.cu:305-311)
    -> print C source, splice into a $integrandIJ$ kernel template
       (fea_symbolic_nvrtc.cpp:339-353)
    -> NVRTC-compile + launch (fea_symbolic_nvrtc.cpp:501-608).

This module reproduces every stage with SymPy so the numerically-traced
frontend (tpufem.forms.weakform) can be verified against the *generated
-expression semantics* (SURVEY.md §2.3 item 2), and implements the same
string-template runtime-codegen step targeting Python/jax.numpy instead of
CUDA C — source substitution, compile (exec + jax.jit), launch.

Note the reference multiplies by the SIGNED jacobian; the production traced
path uses |det J| (SURVEY.md §2.5.4).  ``element_matrices_signed`` keeps the
signed semantics for parity checks; ``element_matrices`` applies |.|.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import sympy as sp

__all__ = ["SymbolicFunctionSpace", "SymbolicWeakForm", "sym_grad", "sym_dot"]


# -- custom shape-function symbols with GiNaC-style chain rules --------------

class sfR(sp.Function):
    """r(x, y; x1..y3) — held unevaluated, with the reference's derivative
    rule (/root/reference/fea_symbolic.cu:40-52)."""

    nargs = 8

    def fdiff(self, argindex=1):
        x, y, x1, x2, x3, y1, y2, y3 = self.args
        jac = (x1 - x3) * (y2 - y3) - (y1 - y3) * (x2 - x3)
        if argindex == 1:      # d/dx
            return (y2 - y3) / jac
        if argindex == 2:      # d/dy
            return (x3 - x2) / jac
        return sp.S.Zero


class sfS(sp.Function):
    """s(x, y; x1..y3) (/root/reference/fea_symbolic.cu:59-71)."""

    nargs = 8

    def fdiff(self, argindex=1):
        x, y, x1, x2, x3, y1, y2, y3 = self.args
        jac = (x1 - x3) * (y2 - y3) - (y1 - y3) * (x2 - x3)
        if argindex == 1:
            return (y3 - y1) / jac
        if argindex == 2:
            return (x1 - x3) / jac
        return sp.S.Zero


def sym_grad(f, x, y):
    """lst grad(ex&, symbol&, symbol&) parity (fea_symbolic.cu:74-77)."""
    return (sp.diff(f, x), sp.diff(f, y))


def sym_dot(l, r):
    """ex dot(lst, lst) parity (fea_symbolic.cu:79-85)."""
    return sum(a * b for a, b in zip(l, r))


class SymbolicFunctionSpace:
    """Parity: FunctionSpace (/root/reference/fea_symbolic.cu:196-260)."""

    def __init__(self):
        self.x, self.y = sp.symbols("x y")
        self.r, self.s = sp.symbols("r s")
        self.x1, self.x2, self.x3 = sp.symbols("x1 x2 x3")
        self.y1, self.y2, self.y3 = sp.symbols("y1 y2 y3")
        self.sfr = sfR(self.x, self.y, self.x1, self.x2, self.x3,
                       self.y1, self.y2, self.y3)
        self.sfs = sfS(self.x, self.y, self.x1, self.x2, self.x3,
                       self.y1, self.y2, self.y3)
        # affine map (fea_symbolic.cu:229-231)
        self.fx = (self.x1 * self.r + self.x2 * self.s
                   + self.x3 * (1 - self.r - self.s))
        self.fy = (self.y1 * self.r + self.y2 * self.s
                   + self.y3 * (1 - self.r - self.s))

    def shape_functions(self):
        """(sfr, sfs, 1 - sfr - sfs) — fea_symbolic.cu:234-239."""
        return (self.sfr, self.sfs, 1 - self.sfr - self.sfs)

    def jacobian(self):
        """Signed jac = fx_r * fy_s - fy_r * fx_s — fea_symbolic.cu:251-259."""
        fx, fy, r, s = self.fx, self.fy, self.r, self.s
        return sp.expand(sp.diff(fx, r) * sp.diff(fy, s)
                         - sp.diff(fy, r) * sp.diff(fx, s))


# -- the Python-kernel template (NVRTC template analogue) --------------------
# Parity with the $integrandIJ$ CUDA template
# (/root/reference/fea_symbolic_nvrtc.cpp:379-478): placeholders are
# substituted with generated source, the string is compiled at runtime, and
# the resulting kernel is jit-launched.  Target language is jax.numpy.
_KERNEL_TEMPLATE = '''\
import jax
import jax.numpy as jnp

def fea_kernel(X, Y, R, S, W):
    """Generated element kernel: X, Y [NE, 3]; R, S, W [Q] -> (Ke, be)."""
    x1, x2, x3 = X[:, 0:1], X[:, 1:2], X[:, 2:3]
    y1, y2, y3 = Y[:, 0:1], Y[:, 1:2], Y[:, 2:3]
    r, s = R[None, :], S[None, :]
    integrands = [
        $INTEGRANDS$
    ]
    rhs = [
        $RHS$
    ]
    Ke = jnp.stack([jnp.einsum("eq,q->e", term, W) for term in integrands],
                   axis=1).reshape(-1, 3, 3)
    be = jnp.stack([jnp.einsum("eq,q->e", term, W) for term in rhs], axis=1)
    return Ke, be
'''


def _pycode(expr, broadcast_syms) -> str:
    """SymPy expression -> jnp source (csrc_float analogue,
    fea_symbolic.cu:308).  Ensures [NE, Q]-broadcast shape even for
    expressions independent of r, s."""
    code = sp.printing.pycode(expr)
    code = code.replace("math.", "jnp.")
    # guarantee broadcasting to [NE, Q]
    return f"({code}) * jnp.ones_like(x1 * r)"


@dataclasses.dataclass
class SymbolicWeakForm:
    """Parity: WeakForm (/root/reference/fea_symbolic.cu:263-351).

    build() performs the exact symbolic pipeline; getCode() returns generated
    source (CUDA-C-flavoured via sympy ccode, or the Python kernel); compile()
    runtime-compiles the Python kernel (the jax analogue of
    nvrtcCompileProgram + cuModuleLoadDataEx, fea_symbolic_nvrtc.cpp:501-554).
    """

    space: Optional[SymbolicFunctionSpace] = None

    def __post_init__(self):
        self.space = self.space or SymbolicFunctionSpace()
        self.lhs = None   # 3x3 nested list of sympy expressions (in x1.., r, s)
        self.rhs = None   # list of 3

    def build(self, lhs_fn: Callable, rhs_fn: Optional[Callable] = None):
        """lhs_fn(u, v) and rhs_fn(v) over symbolic shape functions.

        Follows fea_symbolic.cu:275-317: differentiate (custom chain rule
        fires), substitute sfR->r, sfS->s, then x->fx, y->fy, multiply by
        the signed jac.
        """
        fs = self.space
        sfuncs = fs.shape_functions()
        jac = fs.jacobian()
        subs1 = {fs.sfr: fs.r, fs.sfs: fs.s}
        subs2 = {fs.x: fs.fx, fs.y: fs.fy}

        def pipeline(e):
            return sp.together(e.subs(subs1).subs(subs2) * jac)

        self.lhs = [[pipeline(lhs_fn(sfuncs[j], sfuncs[i]))
                     for i in range(3)] for j in range(3)]
        if rhs_fn is not None:
            self.rhs = [pipeline(rhs_fn(sfuncs[j])) for j in range(3)]
        return self

    # -- code generation -----------------------------------------------------

    def get_c_code(self) -> str:
        """C-source dump of all integrands (csrc_float print parity,
        fea_symbolic.cu:306-315)."""
        lines = []
        for j in range(3):
            for i in range(3):
                lines.append(sp.ccode(self.lhs[j][i]))
            if self.rhs is not None:
                lines.append(sp.ccode(self.rhs[j]))
        return "\n".join(lines)

    def get_code(self) -> str:
        """The runtime-compilable Python kernel source (template substituted
        like ReplaceAll($integrandIJ$), fea_symbolic_nvrtc.cpp:339-353)."""
        integrands = []
        for j in range(3):
            for i in range(3):
                # kernel entry (j*3+i) computes lhs[j][i]; row/col mapping
                # follows the reference (li = idx / 3, lj = idx % 3).
                integrands.append(_pycode(self.lhs[j][i], None))
        rhs_exprs = self.rhs or [sp.S.Zero] * 3
        rhs = [_pycode(e, None) for e in rhs_exprs]
        src = _KERNEL_TEMPLATE.replace(
            "$INTEGRANDS$", ",\n        ".join(integrands))
        src = src.replace("$RHS$", ",\n        ".join(rhs))
        return src

    def compile(self):
        """Runtime-compile the generated source -> jitted element kernel.

        Structural parity with NVRTC: source string -> compile -> module ->
        kernel handle (fea_symbolic_nvrtc.cpp:501-554), realized as
        exec() -> jax.jit.
        Returns fea_kernel(X, Y, R, S, W) -> (Ke [NE,3,3], be [NE,3]),
        where Ke uses the reference's SIGNED-jac semantics.
        """
        import jax

        namespace: dict = {}
        exec(compile(self.get_code(), "<tpufem-generated-kernel>", "exec"),
             namespace)
        return jax.jit(namespace["fea_kernel"])

    # -- direct numeric evaluation (for parity tests) ------------------------

    def _lambdify(self, exprs):
        fs = self.space
        args = (fs.x1, fs.x2, fs.x3, fs.y1, fs.y2, fs.y3, fs.r, fs.s)
        return [sp.lambdify(args, e, modules="numpy") for e in exprs]

    def element_matrices_signed(self, X, Y, rule) -> np.ndarray:
        """Quadrature-reduced local matrices with SIGNED jac — exactly what
        the reference's generated kernel computes
        (/root/reference/fea_symbolic_nvrtc.cpp:415-477)."""
        fns = self._lambdify([self.lhs[j][i] for j in range(3)
                              for i in range(3)])
        r, s = rule.points[:, 0], rule.points[:, 1]
        w = rule.weights
        ne = X.shape[0]
        Ke = np.zeros((ne, 3, 3))
        for idx, fn in enumerate(fns):
            li, lj = divmod(idx, 3)
            vals = fn(X[:, 0:1], X[:, 1:2], X[:, 2:3],
                      Y[:, 0:1], Y[:, 1:2], Y[:, 2:3],
                      r[None, :], s[None, :])
            vals = np.broadcast_to(vals, (ne, len(w)))
            Ke[:, li, lj] = vals @ w
        return Ke

    def element_matrices(self, X, Y, rule) -> np.ndarray:
        """|det J| semantics (the mathematically correct target)."""
        Ke = self.element_matrices_signed(X, Y, rule)
        jac = ((X[:, 0] - X[:, 2]) * (Y[:, 1] - Y[:, 2])
               - (Y[:, 0] - Y[:, 2]) * (X[:, 1] - X[:, 2]))
        return Ke * np.sign(jac)[:, None, None]

    def element_vectors_signed(self, X, Y, rule) -> np.ndarray:
        fns = self._lambdify(self.rhs)
        r, s = rule.points[:, 0], rule.points[:, 1]
        w = rule.weights
        ne = X.shape[0]
        be = np.zeros((ne, 3))
        for j, fn in enumerate(fns):
            vals = fn(X[:, 0:1], X[:, 1:2], X[:, 2:3],
                      Y[:, 0:1], Y[:, 1:2], Y[:, 2:3],
                      r[None, :], s[None, :])
            vals = np.broadcast_to(vals, (ne, len(w)))
            be[:, j] = vals @ w
        return be
