"""Fast-diagonalization additive-Schwarz preconditioner."""

import jax.numpy as jnp
import numpy as np

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops.exchange import make_exchange
from spectralelementmethod_tpu.solver.fdm import (
    gll_fdm_eig, make_fdm_preconditioner)


def test_gll_fdm_eig_diagonalizes():
    from spectralelementmethod_tpu.basis.lagrange import LagrangeGaussLobatto

    b = LagrangeGaussLobatto(6)
    lam, S = gll_fdm_eig(b.nodes, b.quad_wts, b.D1)
    w = np.asarray(b.quad_wts)
    K = b.D1.T @ np.diag(w) @ b.D1
    np.testing.assert_allclose(S.T @ np.diag(w) @ S, np.eye(7), atol=1e-12)
    np.testing.assert_allclose(S.T @ K @ S, np.diag(lam), atol=1e-10)
    assert lam[0] == min(lam) and abs(lam[0]) < 1e-12  # constant mode


def test_fdm_preconditioner_is_spd():
    p = 4
    disc = Discretization(rectangle_mesh(4, 4, p), gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float64)
    prob.set_dirichlet("ebc", 0.0)
    ex = make_exchange(disc)
    free = jnp.asarray((~prob._dirichlet_mask)[ex.gather_hier])
    M = make_fdm_preconditioner(ex, prob._G, disc.basis, free,
                                dtype=np.float64)
    rng = np.random.RandomState(0)
    # symmetric w.r.t. the weighted (global) inner product on consistent
    # L-vectors, and positive on the free set
    for _ in range(3):
        u = ex.dss(jnp.asarray(rng.standard_normal((ex.E, ex.n_loc))))
        v = ex.dss(jnp.asarray(rng.standard_normal((ex.E, ex.n_loc))))
        u = jnp.where(free, u, 0.0)
        v = jnp.where(free, v, 0.0)
        lhs = float(ex.dot(M(u), v))
        rhs = float(ex.dot(u, M(v)))
        assert abs(lhs - rhs) < 1e-8 * max(abs(lhs), 1.0)
        assert float(ex.dot(M(u), u)) > 0.0


def test_fdm_accelerates_poisson():
    p = 6
    disc = Discretization(rectangle_mesh(8, 8, p), gll_basis_2d(p))

    def run(precond):
        prob = Poisson(disc, dtype=np.float64)
        prob.set_dirichlet("ebc", 0.0)
        return prob.solve_local(tol=1e-10, host_loop=True, precond=precond)

    s_j = run("jacobi")
    s_f = run("fdm")
    assert int(s_f.cg.iterations) < 0.7 * int(s_j.cg.iterations)
    np.testing.assert_allclose(s_f.u, s_j.u, atol=1e-8)


def test_fdm_ne_layout_matches_en():
    """Transposed-storage FDM == (E, n) FDM: same effect, same counts."""
    p = 6
    disc = Discretization(rectangle_mesh(8, 8, p), gll_basis_2d(p))

    def run(layout):
        prob = Poisson(disc, dtype=np.float64)
        prob.set_dirichlet("ebc", 0.0)
        return prob.solve_local(tol=1e-10, host_loop=True, precond="fdm",
                                vector_layout=layout)

    s_en = run("en")
    s_ne = run("ne")
    np.testing.assert_allclose(s_ne.u, s_en.u, atol=1e-9)
    assert abs(int(s_ne.cg.iterations) - int(s_en.cg.iterations)) <= 2

    # and the operator application itself agrees on random residuals
    prob = Poisson(disc, dtype=np.float64)
    prob.set_dirichlet("ebc", 0.0)
    ex = make_exchange(disc)
    free_en = jnp.asarray((~prob._dirichlet_mask)[ex.gather_hier])
    free_ne = jnp.asarray(np.ascontiguousarray(np.asarray(free_en).T))
    M_en = make_fdm_preconditioner(ex, prob._G, disc.basis, free_en,
                                   dtype=np.float64)
    M_ne = make_fdm_preconditioner(ex, prob._G, disc.basis, free_ne,
                                   dtype=np.float64, vector_layout="ne")
    rng = np.random.RandomState(1)
    r = np.asarray(ex.dss(jnp.asarray(
        rng.standard_normal((ex.E, ex.n_loc)))))
    z_en = np.asarray(M_en(jnp.asarray(r)))
    z_ne = np.asarray(M_ne(jnp.asarray(np.ascontiguousarray(r.T))))
    np.testing.assert_allclose(z_ne.T, z_en, atol=1e-12)
