"""API-faithful miniature of the cvxpy surface the bridge consumes.

cvxpy cannot be installed in this environment (no network; see README
"CVXPY bridge" note), so bridge validation uses this stand-in: the SAME
public AST shape real cvxpy exposes — class names (``AddExpression``,
``MulExpression``, ``Pnorm``, ...), ``.args`` child lists, atom attributes
(``p``, ``k``, ``M``, ``axis``, ``key``), ``.value`` numeric evaluation,
``Variable.id``, ``Problem.objective.expr`` / ``.constraints`` /
``.variables()`` — because ``epsilon_tpu.frontend.cvxpy_bridge`` dispatches
on exactly these (``cvxpy_bridge.py:43-171``, mirroring the reference's
``cvxpy_expr.py:141-236``).  Tests importing this module run unchanged
against real cvxpy when it is available (``test_cvxpy_bridge.py`` prefers
the real package).

``.value`` implements each atom's NUMERIC semantics with numpy — entirely
independent of the epsilon_tpu kernels — so it doubles as the oracle for
the constant-atoms protocol (``constant_atoms_test.py:25-43``).
"""

from __future__ import annotations

import numpy as np

__version__ = "0.0-mini"

_next_id = [0]


def _fresh_id():
    _next_id[0] += 1
    return _next_id[0]


def _val(x):
    if isinstance(x, Expression):
        return np.asarray(x.value, dtype=float)
    return np.asarray(x, dtype=float)


def _wrap(x):
    return x if isinstance(x, Expression) else Constant(np.asarray(x, dtype=float))


class Expression:
    args: list

    # numpy must defer `ndarray @ Expression` etc. to our reflected ops
    # (real cvxpy does the same)
    __array_priority__ = 100
    __array_ufunc__ = None

    def __init__(self, *args):
        self.args = [_wrap(a) for a in args]

    # -- numeric semantics (numpy oracle) -----------------------------------
    @property
    def value(self):
        raise NotImplementedError(type(self).__name__)

    @property
    def shape(self):
        return np.shape(self.value)

    # -- operators (cvxpy >= 1.1 semantics: * and @ are matmul) -------------
    def __add__(self, o):
        return AddExpression(self, o)

    def __radd__(self, o):
        return AddExpression(o, self)

    def __sub__(self, o):
        return AddExpression(self, NegExpression(_wrap(o)))

    def __rsub__(self, o):
        return AddExpression(o, NegExpression(self))

    def __neg__(self):
        return NegExpression(self)

    def __mul__(self, o):
        a, b = self, _wrap(o)
        if np.shape(a.value) == () or np.shape(b.value) == ():
            return MulExpression(a, b)
        return MulExpression(a, b)

    def __rmul__(self, o):
        return MulExpression(_wrap(o), self)

    def __matmul__(self, o):
        return MulExpression(self, o)

    def __rmatmul__(self, o):
        return MulExpression(_wrap(o), self)

    def __truediv__(self, o):
        return DivExpression(self, o)

    def __pow__(self, p):
        return power(self, p)

    def __getitem__(self, key):
        return index(self, key)

    def __eq__(self, o):  # noqa: A003 - cvxpy builds constraints this way
        return Equality(self, _wrap(o))

    def __le__(self, o):
        return Inequality(self, _wrap(o))

    def __ge__(self, o):
        return Inequality(_wrap(o), self)

    def __hash__(self):
        return id(self)

    @property
    def T(self):
        return transpose(self)


class Leaf(Expression):
    pass


class Variable(Leaf):
    def __init__(self, shape=(), name=None, value=None):
        super().__init__()
        self.id = _fresh_id()
        self._shape = tuple(shape) if isinstance(shape, (tuple, list)) \
            else (int(shape),)
        self.name = name or f"var{self.id}"
        self.value = value  # instance attr: solvers write back here

    @property
    def shape(self):
        return self._shape

    # Variable.value is plain attribute storage
    value = None


class Parameter(Leaf):
    def __init__(self, shape=(), value=None):
        super().__init__()
        self._shape = tuple(shape) if isinstance(shape, (tuple, list)) \
            else ((int(shape),) if shape else ())
        self.value = value

    @property
    def shape(self):
        return self._shape

    value = None


class Constant(Leaf):
    def __init__(self, value):
        super().__init__()
        self._value = np.asarray(value, dtype=float)

    @property
    def value(self):
        return self._value


# -- arithmetic ---------------------------------------------------------------

class AddExpression(Expression):
    @property
    def value(self):
        return _val(self.args[0]) + _val(self.args[1])


class NegExpression(Expression):
    @property
    def value(self):
        return -_val(self.args[0])


class MulExpression(Expression):
    """cvxpy's `*`/`@`: matmul, with scalar operands promoting to scaling."""
    @property
    def value(self):
        a, b = _val(self.args[0]), _val(self.args[1])
        if a.ndim == 0 or b.ndim == 0:
            return a * b
        return a @ b


class multiply(Expression):  # noqa: N801 - cvxpy lowercase atom
    @property
    def value(self):
        return _val(self.args[0]) * _val(self.args[1])


class DivExpression(Expression):
    @property
    def value(self):
        return _val(self.args[0]) / _val(self.args[1])


# -- shape atoms ----------------------------------------------------------------

class index(Expression):  # noqa: N801
    def __init__(self, arg, key):
        super().__init__(arg)
        self.key = key if isinstance(key, tuple) else (key,)

    @property
    def value(self):
        return _val(self.args[0])[self.key]


class transpose(Expression):  # noqa: N801
    @property
    def value(self):
        return _val(self.args[0]).T


class reshape(Expression):  # noqa: N801
    def __init__(self, arg, shape, order="F"):
        super().__init__(arg)
        self._shape = tuple(shape)
        self.order = order

    @property
    def value(self):
        return _val(self.args[0]).reshape(self._shape, order="F")

    @property
    def shape(self):
        return self._shape


class Sum(Expression):
    def __init__(self, arg, axis=None, keepdims=False):
        super().__init__(arg)
        self.axis = axis

    @property
    def value(self):
        return np.sum(_val(self.args[0]), axis=self.axis)


class trace(Expression):  # noqa: N801
    @property
    def value(self):
        return np.trace(_val(self.args[0]))


class hstack(Expression):  # noqa: N801
    def __init__(self, arglist):
        super().__init__(*arglist)

    @property
    def value(self):
        return np.hstack([np.atleast_2d(_val(a)) for a in self.args])


class vstack(Expression):  # noqa: N801
    def __init__(self, arglist):
        super().__init__(*arglist)

    @property
    def value(self):
        return np.vstack([np.atleast_2d(_val(a)) for a in self.args])


class kron(Expression):  # noqa: N801
    @property
    def value(self):
        return np.kron(_val(self.args[0]), _val(self.args[1]))


class diag_vec(Expression):  # noqa: N801
    @property
    def value(self):
        return np.diag(_val(self.args[0]).ravel())


class diag_mat(Expression):  # noqa: N801
    @property
    def value(self):
        return np.diag(_val(self.args[0]))


class upper_tri(Expression):  # noqa: N801
    @property
    def value(self):
        A = _val(self.args[0])
        return A[np.triu_indices(A.shape[0], k=1)][:, None]


# -- elementwise atoms ----------------------------------------------------------

class abs(Expression):  # noqa: N801, A001
    @property
    def value(self):
        return np.abs(_val(self.args[0]))


class power(Expression):  # noqa: N801
    def __init__(self, arg, p):
        super().__init__(arg)
        self.p = p

    @property
    def value(self):
        return _val(self.args[0]) ** self.p


class sqrt(Expression):  # noqa: N801
    @property
    def value(self):
        return np.sqrt(_val(self.args[0]))


class square(Expression):  # noqa: N801
    @property
    def value(self):
        return _val(self.args[0]) ** 2


class log(Expression):  # noqa: N801
    @property
    def value(self):
        return np.log(_val(self.args[0]))


class log1p(Expression):  # noqa: N801
    @property
    def value(self):
        return np.log1p(_val(self.args[0]))


class exp(Expression):  # noqa: N801
    @property
    def value(self):
        return np.exp(_val(self.args[0]))


class entr(Expression):  # noqa: N801
    @property
    def value(self):
        x = _val(self.args[0])
        return np.where(x > 0, -x * np.log(np.where(x > 0, x, 1.0)), 0.0)


class logistic(Expression):  # noqa: N801
    @property
    def value(self):
        return np.logaddexp(0.0, _val(self.args[0]))


class huber(Expression):  # noqa: N801
    def __init__(self, arg, M=1.0):
        super().__init__(arg)
        self.M = M

    @property
    def value(self):
        x = np.abs(_val(self.args[0]))
        M = float(self.M)
        return np.where(x <= M, x * x, 2 * M * x - M * M)


class kl_div(Expression):  # noqa: N801
    @property
    def value(self):
        x, y = _val(self.args[0]), _val(self.args[1])
        return x * np.log(x / y) - x + y


class maximum(Expression):  # noqa: N801
    def __init__(self, *args):
        super().__init__(*args)

    @property
    def value(self):
        out = _val(self.args[0])
        for a in self.args[1:]:
            out = np.maximum(out, _val(a))
        return out


class minimum(Expression):  # noqa: N801
    def __init__(self, *args):
        super().__init__(*args)

    @property
    def value(self):
        out = _val(self.args[0])
        for a in self.args[1:]:
            out = np.minimum(out, _val(a))
        return out


# -- vector/matrix atoms ---------------------------------------------------------

class max(Expression):  # noqa: N801, A001
    def __init__(self, arg, axis=None):
        super().__init__(arg)
        self.axis = axis

    @property
    def value(self):
        return np.max(_val(self.args[0]), axis=self.axis)


class min(Expression):  # noqa: N801, A001
    def __init__(self, arg, axis=None):
        super().__init__(arg)
        self.axis = axis

    @property
    def value(self):
        return np.min(_val(self.args[0]), axis=self.axis)


class norm1(Expression):  # noqa: N801
    @property
    def value(self):
        return np.sum(np.abs(_val(self.args[0])))


class norm_inf(Expression):  # noqa: N801
    @property
    def value(self):
        return np.max(np.abs(_val(self.args[0])))


class Pnorm(Expression):
    def __init__(self, arg, p=2, axis=None):
        super().__init__(arg)
        self.p = p
        self.axis = axis

    @property
    def value(self):
        x = _val(self.args[0])
        if self.axis is None:
            x = x.ravel()
        return np.linalg.norm(x, ord=self.p, axis=self.axis)


class QuadOverLin(Expression):
    @property
    def value(self):
        x, y = _val(self.args[0]), _val(self.args[1])
        return np.sum(x * x) / float(y)


class log_sum_exp(Expression):  # noqa: N801
    def __init__(self, arg, axis=None):
        super().__init__(arg)
        self.axis = axis

    @property
    def value(self):
        x = _val(self.args[0])
        ax = self.axis if self.axis is not None else None
        if ax is None:
            x = x.ravel()
        m = np.max(x, axis=ax, keepdims=ax is not None)
        return np.squeeze(m) + np.log(np.sum(np.exp(x - m), axis=ax))


class sum_largest(Expression):  # noqa: N801
    def __init__(self, arg, k):
        super().__init__(arg)
        self.k = k

    @property
    def value(self):
        x = np.sort(_val(self.args[0]).ravel())[::-1]
        return np.sum(x[:int(self.k)])


class geo_mean(Expression):  # noqa: N801
    @property
    def value(self):
        x = _val(self.args[0]).ravel()
        return float(np.exp(np.mean(np.log(x))))


class log_det(Expression):  # noqa: N801
    @property
    def value(self):
        return float(np.linalg.slogdet(_val(self.args[0]))[1])


class normNuc(Expression):  # noqa: N801
    @property
    def value(self):
        return float(np.sum(np.linalg.svd(_val(self.args[0]), compute_uv=False)))


class lambda_max(Expression):  # noqa: N801
    @property
    def value(self):
        return float(np.linalg.eigvalsh(_val(self.args[0]))[-1])


class lambda_min(Expression):  # noqa: N801
    @property
    def value(self):
        return float(np.linalg.eigvalsh(_val(self.args[0]))[0])


class sigma_max(Expression):  # noqa: N801
    @property
    def value(self):
        return float(np.linalg.svd(_val(self.args[0]), compute_uv=False)[0])


class matrix_frac(Expression):  # noqa: N801
    @property
    def value(self):
        x, P = _val(self.args[0]), _val(self.args[1])
        return float(x.ravel() @ np.linalg.solve(P, x.ravel()))


class QuadForm(Expression):
    @property
    def value(self):
        x, P = _val(self.args[0]), _val(self.args[1])
        return float(x.ravel() @ P @ x.ravel())


def sum_squares(x):
    return QuadOverLin(x, Constant(1.0))


def norm(x, p=2):
    if p == 1:
        return norm1(x)
    if p in ("inf", np.inf):
        return norm_inf(x)
    return Pnorm(x, p=p)


# -- constraints ---------------------------------------------------------------

class Constraint:
    def __init__(self, *args):
        self.args = [_wrap(a) for a in args]


class Equality(Constraint):
    pass


class Zero(Constraint):
    pass


class Inequality(Constraint):
    pass


class NonPos(Constraint):
    pass


class SOC(Constraint):
    """SOC(t, X): ||X_i|| <= t_i rowwise (cvxpy public ctor)."""


class PSD(Constraint):
    pass


# -- problem -------------------------------------------------------------------

class Minimize:
    def __init__(self, expr):
        self.expr = _wrap(expr)


class Maximize:
    def __init__(self, expr):
        self.expr = _wrap(expr)


class Problem:
    def __init__(self, objective, constraints=None):
        self.objective = objective
        self.constraints = list(constraints or [])
        self._value = None

    @property
    def value(self):
        # read-only, like real cvxpy's Problem.value (a property with no
        # setter backed by Problem._value) — the bridge must not assign it
        return self._value

    def variables(self):
        out = []
        seen = set()

        def walk(e):
            if isinstance(e, Variable) and e.id not in seen:
                seen.add(e.id)
                out.append(e)
            for a in getattr(e, "args", []):
                walk(a)

        walk(self.objective.expr)
        for c in self.constraints:
            for a in c.args:
                walk(a)
        return out


# `import cvxpy.atoms` must resolve when this module is injected as `cvxpy`
import sys as _sys
import types as _types

atoms = _types.ModuleType("cvxpy.atoms")
for _n, _v in list(globals().items()):
    if isinstance(_v, type) and issubclass(_v, Expression):
        setattr(atoms, _n, _v)


def install():
    """Register this module as ``cvxpy`` (plus ``cvxpy.atoms``) so the
    bridge's ``import cvxpy`` resolves here.  No-op if real cvxpy exists."""
    try:
        import cvxpy  # noqa: F401
        return False
    except ImportError:
        pass
    me = _sys.modules[__name__]
    _sys.modules["cvxpy"] = me
    _sys.modules["cvxpy.atoms"] = atoms
    return True
