"""Reference-parity object front-end (reference L6).

The functional core (:mod:`optimization_solvers_tpu.solvers`) is the
TPU-native API; this module recreates the reference crate's user-facing
surface on top of it so code written against the Rust API maps one-to-one:

  * solver classes with the reference constructor signatures and the
    ``minimize(line_search, oracle, max_iter_solver, max_iter_line_search,
    callback)`` template entry point (``ls_solver.rs:66-111``), plus
    ``xk()`` / ``k()`` accessors;
  * :class:`Lbfgsb` mirroring the Fortran-FFI wrapper's builder API
    (``quasi_newton/lbfgsb.rs:88-154``): per-index bound setters, ``set_m``,
    ``set_factr``, ``set_pgtol``, ``max_iteration``;
  * :class:`OptimizationSolver` mirroring the WASM binding
    (``wasm.rs:6-269``): ``solve_gradient_descent`` / ``solve_bfgs`` /
    ``solve_newton`` returning an :class:`OptimizationResult`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from optimization_solvers_tpu.core.oracle import ensure_oracle, make_oracle
from optimization_solvers_tpu.core.types import SolveResult, Status
from optimization_solvers_tpu import linesearch as ls
from optimization_solvers_tpu import solvers as _solvers


class SolverError(Exception):
    """Mirror of the reference error enum (``ls_solver.rs:10-20``)."""


class MaxIterReached(SolverError):
    pass


class OutOfDomain(SolverError):
    pass


class AbnormalTermination(SolverError):
    pass


_STATUS_ERRORS = {
    int(Status.MAX_ITER_REACHED): MaxIterReached,
    int(Status.OUT_OF_DOMAIN): OutOfDomain,
    int(Status.ABNORMAL): AbnormalTermination,
    # Status.STALLED is deliberately absent: the reference's s/y-stall exit
    # returns Ok(()) (bfgs_b.rs:92-104), so the reference-parity API treats
    # it as success; the honest label stays on SolveResult.status.
}


def _raise_on_error(result: SolveResult) -> None:
    code = int(result.status)
    if code in _STATUS_ERRORS:
        raise _STATUS_ERRORS[code]()


@functools.lru_cache(maxsize=128)
def _cached_solve(method, line_search, raw_oracle, has_bounds: bool,
                  max_iter: int, max_iter_ls: int, traced: bool):
    """Jit-compiled ``(x0, bounds) -> SolveResult`` keyed on the static solve
    config, so repeated facade ``minimize`` calls reuse one compiled
    while-loop instead of retracing per call (methods and line searches are
    frozen dataclasses, hence hashable).  Keyed on the RAW user oracle —
    ensure_oracle happens inside, because a fresh Oracle wrapper per call
    would miss the cache every time.  ``traced`` keys the OST_LOG=debug
    state so toggling tracing after a combo is cached takes effect."""
    oracle = ensure_oracle(raw_oracle)

    def run(x0, bounds):
        return _solvers.minimize(
            method, line_search, oracle, x0, bounds=bounds,
            max_iter=max_iter, max_iter_ls=max_iter_ls,
        )

    return jax.jit(run)


@functools.lru_cache(maxsize=128)
def _cached_oracle(objective, with_hessian: bool):
    return make_oracle(objective, with_hessian=with_hessian)


@functools.lru_cache(maxsize=64)
def _cached_lbfgsb(raw_oracle, cfg, scaled: bool, traced: bool):
    """Jit-compiled L-BFGS-B solve keyed on (oracle, config); bounds and
    the preconditioner ride as traced arguments so the same compiled loop
    serves every box.  Mirrors _cached_solve: an eager call re-traces the
    whole while-loop per call, and ``traced`` keys the OST_LOG=debug state
    (make_lbfgsb_step bakes the iteration tracer in at trace time when
    ``cfg.verbose < 1``, so toggling OST_LOG must miss the cache)."""
    from optimization_solvers_tpu.solvers.lbfgsb import (
        lbfgsb_minimize,
        lbfgsb_minimize_scaled,
    )

    oracle = ensure_oracle(raw_oracle)
    if scaled:
        return jax.jit(lambda x0, lo, up, diag: lbfgsb_minimize_scaled(
            oracle, x0, lo, up, diag, cfg))
    return jax.jit(lambda x0, lo, up: lbfgsb_minimize(oracle, x0, lo, up, cfg))


class _TemplateSolver:
    """Shared ``minimize`` plumbing: run the functional core, keep the final
    iterate/iteration count as object state (the reference mutates ``self.x``
    / ``self.k`` in place), raise the reference's error taxonomy."""

    _method = None
    _bounds = None

    def __init__(self, x0):
        self.x = jnp.asarray(x0)
        self.k = 0
        self._result: Optional[SolveResult] = None

    def xk(self):
        return self.x

    def minimize(self, line_search, oracle, max_iter_solver: int = 1000,
                 max_iter_line_search: int = 100, callback=None) -> None:
        result = None
        if callback is None:
            from optimization_solvers_tpu.utils import telemetry

            # only the cache LOOKUP may legitimately raise TypeError
            # (unhashable method config or oracle); a TypeError raised from
            # the user's objective during tracing must propagate, not
            # silently re-trace the whole solve on the eager path first
            try:
                solve = _cached_solve(
                    self._method, line_search, oracle,
                    self._bounds is not None,
                    max_iter_solver, max_iter_line_search,
                    telemetry.debug_enabled(),
                )
            except TypeError:
                solve = None
            if solve is not None:
                result = solve(self.x, self._bounds)
        if result is None:
            result = _solvers.minimize(
                self._method, line_search, ensure_oracle(oracle), self.x,
                bounds=self._bounds, max_iter=max_iter_solver,
                max_iter_ls=max_iter_line_search, callback=callback,
            )
        self._result = result
        self.x = result.x
        self.k = int(result.iterations)
        _raise_on_error(result)

    @property
    def result(self) -> Optional[SolveResult]:
        return self._result


class GradientDescent(_TemplateSolver):
    """``GradientDescent::new(grad_tol, x0)`` (``gradient_descent.rs:16-23``)."""

    def __init__(self, grad_tol: float, x0):
        super().__init__(x0)
        self._method = _solvers.GradientDescent(grad_tol=grad_tol)


class CoordinateDescent(_TemplateSolver):
    def __init__(self, grad_tol: float, x0):
        super().__init__(x0)
        self._method = _solvers.CoordinateDescent(grad_tol=grad_tol)


class PnormDescent(_TemplateSolver):
    def __init__(self, grad_tol: float, x0, inverse_p):
        super().__init__(x0)
        self._method = _solvers.PnormDescent(
            grad_tol=grad_tol, inverse_p=jnp.asarray(inverse_p)
        )


class ProjectedGradientDescent(_TemplateSolver):
    def __init__(self, grad_tol: float, x0, lower_bound, upper_bound):
        super().__init__(x0)
        self._method = _solvers.ProjectedGradientDescent(grad_tol=grad_tol)
        self._bounds = (jnp.asarray(lower_bound), jnp.asarray(upper_bound))


class SpectralProjectedGradient(_TemplateSolver):
    def __init__(self, grad_tol: float, x0, oracle, lower_bound, upper_bound):
        # the reference constructor takes the oracle to seed lambda_0
        # (spg.rs:28-46); the functional core folds that into init()
        super().__init__(x0)
        self._method = _solvers.SpectralProjectedGradient(grad_tol=grad_tol)
        self._bounds = (jnp.asarray(lower_bound), jnp.asarray(upper_bound))


class Newton(_TemplateSolver):
    def __init__(self, tol: float, x0):
        super().__init__(x0)
        self._method = _solvers.Newton(tol=tol)


class ProjectedNewton(_TemplateSolver):
    def __init__(self, grad_tol: float, x0, lower_bound, upper_bound):
        super().__init__(x0)
        self._method = _solvers.ProjectedNewton(grad_tol=grad_tol)
        self._bounds = (jnp.asarray(lower_bound), jnp.asarray(upper_bound))


class SpectralProjectedNewton(_TemplateSolver):
    def __init__(self, grad_tol: float, x0, oracle, lower_bound, upper_bound):
        super().__init__(x0)
        self._method = _solvers.SpectralProjectedNewton(grad_tol=grad_tol)
        self._bounds = (jnp.asarray(lower_bound), jnp.asarray(upper_bound))


def _dense_qn(update: str):
    class _QN(_TemplateSolver):
        def __init__(self, tol: float, x0):
            super().__init__(x0)
            self._method = _solvers.QuasiNewton(tol=tol, update=update)

    return _QN


def _dense_qn_b(update: str):
    class _QNB(_TemplateSolver):
        def __init__(self, tol: float, x0, lower_bound, upper_bound):
            super().__init__(x0)
            self._method = _solvers.QuasiNewtonB(tol=tol, update=update)
            self._bounds = (jnp.asarray(lower_bound), jnp.asarray(upper_bound))

    return _QNB


BFGS = _dense_qn("bfgs")
DFP = _dense_qn("dfp")
Broyden = _dense_qn("broyden")
BFGSB = _dense_qn_b("bfgs")
DFPB = _dense_qn_b("dfp")
BroydenB = _dense_qn_b("broyden")
SR1B = _dense_qn_b("sr1")


class Lbfgsb:
    """Builder-compatible L-BFGS-B front end (``lbfgsb.rs:88-154``), backed
    by the device-resident implementation instead of the Fortran FFI.

    ``minimize(oracle, x0)`` mutates ``x0``'s role the way the reference
    does (the final iterate is ``self.x``) and applies the same stopping
    semantics: with ``max_iteration`` unset it stops when the projected
    gradient satisfies ``||pg||_inf <= 1e-10 * f`` or the factr/pgtol
    tests fire (``lbfgsb.rs:62-84``)."""

    def __init__(self, n: int):
        self.n = n
        self.m = 5
        self.l = np.full(n, -np.inf)
        self.u = np.full(n, np.inf)
        self.factr = 0.0
        self.pgtol = 0.0
        self.max_iter = 0
        self.iprint = -1
        self.x: Optional[jax.Array] = None
        self.precond_diag = None
        self._result: Optional[SolveResult] = None

    # --- builder methods (lbfgsb.rs:113-154) -------------------------------
    def set_lower_bound(self, index: int, value: float) -> None:
        self.l[index] = value

    def set_upper_bound(self, index: int, value: float) -> None:
        self.u[index] = value

    def set_verbosity(self, level: int) -> None:
        self.iprint = level

    def set_factr(self, factr: float) -> None:
        # 1e12 low accuracy, 1e7 moderate, 1e1 extremely high (lbfgsb.rs:136-141)
        self.factr = factr

    def set_pgtol(self, pgtol: float) -> None:
        self.pgtol = pgtol

    def max_iteration(self, max_iter: int) -> None:
        self.max_iter = max_iter

    def set_m(self, m: int) -> None:
        # 3 <= m <= 20 recommended (lbfgsb.rs:150-154)
        self.m = m

    def set_precond_diag(self, diag) -> None:
        """Diagonal preconditioner (implicit B0 = theta*diag(d)); a
        capability beyond the Fortran core — see
        :func:`solvers.lbfgsb_minimize_scaled`."""
        self.precond_diag = np.asarray(diag)

    # -----------------------------------------------------------------------
    def minimize(self, oracle, x0) -> None:
        from optimization_solvers_tpu.solvers.lbfgsb import (
            LbfgsbConfig,
            lbfgsb_minimize,
            lbfgsb_minimize_scaled,
        )

        x0 = jnp.asarray(x0)
        cfg = LbfgsbConfig(
            m=self.m,
            factr=self.factr,
            pgtol=self.pgtol,
            rel_pg_stop=(self.max_iter == 0),
            max_iter=self.max_iter if self.max_iter > 0 else 10_000,
            # iprint >= 1 -> per-iteration tracing events, like the
            # Fortran's iteration printing (lbfgsb.rs:146-148)
            verbose=self.iprint,
        )
        lo = jnp.asarray(self.l, x0.dtype)
        up = jnp.asarray(self.u, x0.dtype)
        scaled = self.precond_diag is not None
        from optimization_solvers_tpu.utils import telemetry

        try:
            solve = _cached_lbfgsb(oracle, cfg, scaled,
                                   telemetry.debug_enabled())
        except TypeError:   # unhashable oracle: eager fallback
            solve = None
        if solve is not None:
            result = (solve(x0, lo, up, jnp.asarray(self.precond_diag,
                                                    x0.dtype))
                      if scaled else solve(x0, lo, up))
        elif scaled:
            result = lbfgsb_minimize_scaled(
                ensure_oracle(oracle), x0, lo, up,
                jnp.asarray(self.precond_diag, x0.dtype), cfg,
            )
        else:
            result = lbfgsb_minimize(ensure_oracle(oracle), x0, lo, up, cfg)
        self._result = result
        self.x = result.x
        if self.max_iter > 0:
            # a user-set budget raises on exhaustion (lbfgsb.rs:73-75);
            # with no budget set the internal 10k cap returns the best
            # iterate instead (the reference would simply keep iterating)
            _raise_on_error(result)
        elif int(result.status) not in (int(Status.CONVERGED),
                                        int(Status.MAX_ITER_REACHED)):
            _raise_on_error(result)

    @property
    def result(self) -> Optional[SolveResult]:
        return self._result


@dataclasses.dataclass
class OptimizationResult:
    """Mirror of the WASM ``OptimizationResult`` (``wasm.rs:7-14``)."""

    x: list
    f_value: float
    gradient_norm: float
    iterations: int
    success: bool
    error_message: Optional[str] = None


class OptimizationSolver:
    """Mirror of the WASM front end (``wasm.rs:16-269``): ergonomic one-call
    solves from plain Python lists + a scalar objective (gradients/Hessians
    come from autodiff instead of the JS callback protocol)."""

    def __init__(self, tolerance: float = 1e-6, max_iterations: int = 1000):
        self.tolerance = tolerance
        self.max_iterations = max_iterations

    def _run(self, method, search, objective, with_hessian,
             x0) -> OptimizationResult:
        from optimization_solvers_tpu.utils import telemetry

        try:
            # float cast in BOTH x64 modes: integer inputs would reach
            # autodiff as int32 on x64-off runtimes and fail confusingly
            x0_arr = jnp.asarray(
                x0, jnp.float64 if jax.config.jax_enable_x64
                else jnp.float32)
            # narrow try: only the cache lookups may raise TypeError
            # (unhashable objective); a TypeError from the user's objective
            # during tracing must not be swallowed into a duplicate eager run
            try:
                oracle = _cached_oracle(objective, with_hessian)
                solve = _cached_solve(method, search, oracle, False,
                                      self.max_iterations, 100,
                                      telemetry.debug_enabled())
            except TypeError:
                solve = None
            if solve is not None:
                result = solve(x0_arr, None)
            else:
                # unhashable objective: uncached path, same semantics
                result = _solvers.minimize(
                    method, search,
                    make_oracle(objective, with_hessian=with_hessian),
                    x0_arr, max_iter=self.max_iterations, max_iter_ls=100)
            # STALLED counts as success here: the reference's s/y-stall
            # exit returns Ok(()) (bfgs.rs:64-76), and this layer mirrors
            # the reference surface (SolveResult.status keeps the honest
            # label for callers who want it)
            ok = int(result.status) in (int(Status.CONVERGED),
                                        int(Status.STALLED))
            import numpy as _np

            return OptimizationResult(
                x=_np.asarray(result.x).tolist(),   # one bulk readback
                f_value=float(result.f),
                gradient_norm=float(jnp.linalg.norm(result.g)),
                iterations=int(result.iterations),
                success=ok,
                error_message=None if ok else Status(int(result.status)).name,
            )
        except Exception as exc:  # mirror wasm error_message plumbing
            return OptimizationResult(
                x=list(x0), f_value=float("nan"), gradient_norm=float("nan"),
                iterations=0, success=False, error_message=str(exc),
            )

    def solve_gradient_descent(self, x0: Sequence[float],
                               objective: Callable) -> OptimizationResult:
        # wasm.rs:73-131: GD + BackTracking(1e-4, 0.5)
        return self._run(
            _solvers.GradientDescent(grad_tol=self.tolerance),
            ls.BackTracking(c1=1e-4, beta=0.5),
            objective, False, x0,
        )

    def solve_bfgs(self, x0: Sequence[float],
                   objective: Callable) -> OptimizationResult:
        # wasm.rs:133-187: BFGS + MoreThuente
        return self._run(
            _solvers.BFGS(tol=self.tolerance), ls.MoreThuente(),
            objective, False, x0,
        )

    def solve_newton(self, x0: Sequence[float],
                     objective: Callable) -> OptimizationResult:
        # wasm.rs:189-268: Newton with Hessian oracle
        return self._run(
            _solvers.Newton(tol=self.tolerance),
            ls.BackTracking(c1=1e-4, beta=0.5),
            objective, True, x0,
        )
