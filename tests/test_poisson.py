"""Poisson end-to-end tests.

Three oracle layers (SURVEY.md §4 strategy + BASELINE.md correctness bar):

1. matrix-free operator == independently assembled global sparse matrix
   (assembled with the reference's einsum recipe,
   ``examples/poisson.py:168-193``), to 1e-12;
2. CG solution == scipy direct solve of the assembled system, to 1e-10
   (the "matches reference to 1e-10" north star: the assembled+spsolve path
   IS the reference algorithm);
3. manufactured solutions with spectral (p) convergence.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import annulus_mesh, rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson


def assemble_reference_matrix(disc, coefficient=None):
    """Assemble the global stiffness matrix the reference way.

    Per element, build the dense rank-4 operator Lse with the exact einsum
    chain of ``examples/poisson.py:168-193`` (gradh contributions from invJ
    and the 1D differentiation matrices), then scatter into a scipy COO
    matrix (``sem/discrete.py:478-500`` semantics).
    """
    basis = disc.basis
    D = basis.get_D1_matrices()
    n = disc.n_loc
    rows, cols, vals = [], [], []
    for e in range(disc.E):
        invJ = disc.invJ[e]          # (2, 2, p1, p1): invJ[a, i]
        JxW = disc.detJxW[e]
        if coefficient is not None:
            JxW = JxW * coefficient[e]
        gradh_xi0 = np.einsum("imn,mp->imnp", invJ[0], D[0])
        gradh_xi1 = np.einsum("imn,nq->imnq", invJ[1], D[1])

        shape = basis.coeff_shape
        Lse = np.zeros(shape * 2)
        p, q, r = np.ogrid[[slice(N) for N in (shape[0],) * 3]]
        Lse[p, q, r, q] += np.einsum(
            "mn,imnp,imnr->pnr", JxW, gradh_xi0, gradh_xi0)
        Lse += np.einsum("mn,imnp,imns->pnms", JxW, gradh_xi0, gradh_xi1)
        Lse += np.einsum("mn,imnq,imnr->mqrn", JxW, gradh_xi1, gradh_xi0)
        p, q, r = np.ogrid[[slice(N) for N in
                            (shape[0], shape[1], shape[1])]]
        Lse[p, q, p, r] += np.einsum(
            "mn,imnq,imns->mqs", JxW, gradh_xi1, gradh_xi1)

        K = Lse.reshape(n, n)
        gidx = disc.gather_nodes[e]
        rr, cc = np.meshgrid(gidx, gidx, indexing="ij")
        rows.append(rr.ravel())
        cols.append(cc.ravel())
        vals.append(K.ravel())
    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(disc.n_nodes, disc.n_nodes),
    )
    return A.tocsr()


def reference_direct_solve(problem):
    """Solve the Poisson problem by assembled-matrix spsolve (the reference
    algorithm, modulo static condensation which is algebraically identical)."""
    disc = problem.disc
    A = assemble_reference_matrix(disc)
    b = np.asarray(problem._b) + problem._neumann
    mask = problem._dirichlet_mask
    u = np.where(mask, problem._dirichlet_vals, 0.0)
    free = ~mask
    b_eff = b[free] - A[free][:, mask] @ u[mask]
    u[free] = spla.spsolve(A[free][:, free].tocsc(), b_eff)
    return u


def make_problem(nx=4, ny=3, p=5, **kw):
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    return Poisson(disc, **kw)


class TestOperatorEquivalence:
    def test_matrix_free_matches_assembled(self):
        prob = make_problem(3, 2, 4)
        A = assemble_reference_matrix(prob.disc)
        rng = np.random.RandomState(0)
        for _ in range(3):
            u = rng.randn(prob.disc.n_nodes)
            v_mf = np.asarray(prob.apply_operator(u))
            v_as = A @ u
            np.testing.assert_allclose(v_mf, v_as, atol=1e-11)

    def test_diagonal_matches_assembled(self):
        prob = make_problem(2, 2, 5)
        A = assemble_reference_matrix(prob.disc)
        d_mf = np.asarray(prob.operator_diagonal())
        np.testing.assert_allclose(d_mf, A.diagonal(), atol=1e-11)

    def test_operator_symmetry(self):
        prob = make_problem(3, 3, 3)
        rng = np.random.RandomState(1)
        u, v = rng.randn(2, prob.disc.n_nodes)
        lhs = np.dot(np.asarray(prob.apply_operator(u)), v)
        rhs = np.dot(u, np.asarray(prob.apply_operator(v)))
        assert abs(lhs - rhs) < 1e-9

    def test_nullspace_is_constants(self):
        prob = make_problem(3, 2, 4)
        v = np.asarray(prob.apply_operator(np.ones(prob.disc.n_nodes)))
        np.testing.assert_allclose(v, 0.0, atol=1e-11)


class TestReferenceParity:
    def test_cg_matches_direct_solve_1e10(self):
        """BASELINE north star: CG solution matches the reference algorithm
        (assembled matrix + sparse direct solve) to 1e-10."""
        prob = make_problem(4, 4, 5)
        # the reference example's BCs (examples/poisson.py:137-143):
        # u = 0.2((x+1)+(y+1)) on "ebc", homogeneous Neumann on "nbc"
        prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
        sol = prob.solve(tol=1e-14)  # fused lax.while_loop device path
        assert bool(sol.cg.converged)
        u_ref = reference_direct_solve(prob)
        assert np.max(np.abs(sol.u - u_ref)) < 1e-10

    def test_with_neumann_data(self):
        """Manufactured: u = x^2 + y^2 on [-1,1]^2, f = -4,
        n.grad u = 2 x.n on nbc (north+east), exact Dirichlet on ebc."""
        prob = make_problem(3, 3, 4, forcing=-4.0)
        exact = lambda x, y: x**2 + y**2  # noqa: E731
        prob.set_dirichlet("ebc", exact)
        # NBC faces: north (n.grad u = 2y = 2), east (2x = 2)
        prob.set_neumann("nbc", 2.0)
        sol = prob.solve(tol=1e-14, host_loop=True)
        err = prob.l2_error(sol.u, exact)
        assert err < 1e-10


class TestManufacturedSolutions:
    def test_polynomial_exact(self):
        """u = x^3 y + y^2 is in the p=4 space: solved to solver tolerance."""
        exact = lambda x, y: x**3 * y + y**2  # noqa: E731
        f = lambda x, y: -(6 * x * y + 2)  # -lap u  # noqa: E731
        mesh = rectangle_mesh(3, 3, 4, boundary_names={
            "west": "d", "east": "d", "south": "d", "north": "d"})
        disc = Discretization(mesh, gll_basis_2d(4))
        prob = Poisson(disc, forcing=f)
        prob.set_dirichlet("d", exact)
        sol = prob.solve(tol=1e-14, host_loop=True)
        assert prob.l2_error(sol.u, exact) < 1e-11

    def test_p_convergence(self):
        """sin(pi x) sin(pi y): error drops spectrally with p."""
        exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)  # noqa
        f = lambda x, y: 2 * np.pi**2 * exact(x, y)  # noqa: E731
        errs = []
        for p in (2, 4, 6, 8):
            mesh = rectangle_mesh(2, 2, p, boundary_names={
                "west": "d", "east": "d", "south": "d", "north": "d"})
            disc = Discretization(mesh, gll_basis_2d(p))
            prob = Poisson(disc, forcing=f)
            prob.set_dirichlet("d", 0.0)
            sol = prob.solve(tol=1e-14, host_loop=True)
            errs.append(prob.l2_error(sol.u, exact))
        errs = np.array(errs)
        assert np.all(errs[1:] < errs[:-1] * 0.1)  # > 10x drop per step
        assert errs[-1] < 1e-7

    def test_variable_coefficient(self):
        """-div(c grad u) with c = 1 + x^2 y^2, manufactured f.

        u = sin(x) cos(y); f = -div(c grad u) computed symbolically:
        f = 2 c sin x cos y - (dc/dx cos x cos y - dc/dy sin x sin y)
        """
        c = lambda x, y: 1 + x**2 * y**2  # noqa: E731
        u_ex = lambda x, y: np.sin(x) * np.cos(y)  # noqa: E731

        def f(x, y):
            dcdx = 2 * x * y**2
            dcdy = 2 * x**2 * y
            return (2 * c(x, y) * np.sin(x) * np.cos(y)
                    - dcdx * np.cos(x) * np.cos(y)
                    + dcdy * np.sin(x) * np.sin(y))

        mesh = rectangle_mesh(3, 3, 8, boundary_names={
            "west": "d", "east": "d", "south": "d", "north": "d"})
        disc = Discretization(mesh, gll_basis_2d(8))
        prob = Poisson(disc, forcing=f, coefficient=c)
        prob.set_dirichlet("d", u_ex)
        sol = prob.solve(tol=1e-14, host_loop=True)
        assert prob.l2_error(sol.u, u_ex) < 1e-8


class TestCurvedMesh:
    def test_annulus_laplace(self):
        """Laplace on the half annulus: u = log(r)/log(R) is exact
        (axisymmetric harmonic in 2D), Dirichlet 0 at r=1, 1 at r=R;
        homogeneous Neumann on the symmetry axis."""
        R = 10.0
        mesh = annulus_mesh(order=8, n_theta=6, n_r=8, r_outer=R,
                            progression=1.3)
        disc = Discretization(mesh, gll_basis_2d(8))
        prob = Poisson(disc, forcing=0.0)
        prob.set_dirichlet("sphere", 0.0)
        prob.set_dirichlet("shell", 1.0)
        # symaxis: natural (no-flux) BC — log(r) has no normal gradient there
        sol = prob.solve(tol=1e-14, host_loop=True)
        exact = lambda x, y: np.log(np.sqrt(x**2 + y**2)) / np.log(R)  # noqa
        err = prob.l2_error(sol.u, exact)
        assert err < 1e-7


def test_cg_block_param_matches_default():
    """Single-dispatch CG (block >= max_iter) == default ladder == host."""
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.solver.cg import (
        cg, cg_host, jacobi_preconditioner)

    disc = Discretization(rectangle_mesh(4, 4, 4), gll_basis_2d(4))
    prob = Poisson(disc)
    prob.set_dirichlet("ebc", 0.0)
    ex = make_exchange(disc)
    Gf = prob._G.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    free = jnp.asarray((~prob._dirichlet_mask)[ex.gather_hier])
    A = sumfac.make_local_laplacian_operator(ex, Gf, Dhat, free)
    diagL = jnp.asarray(ex.local_from_global(
        np.asarray(prob.operator_diagonal())))
    M = jacobi_preconditioner(diagL, free)
    b = jnp.asarray(ex.local_from_global(np.asarray(prob._b)))
    r = jnp.where(free, b, 0.0)

    kw = dict(M=M, tol=1e-11, max_iter=500, dot=ex.dot)
    r1 = cg(A, r, **kw)
    r2 = cg(A, r, block=500, **kw)
    r3 = cg_host(A, r, **kw)
    assert int(r1.iterations) == int(r2.iterations) == int(r3.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r3.x),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r3.x),
                               atol=1e-10)


class TestCertifiedSolve:
    """solve_local(certify=True): f32 models return f64-certified
    solutions (round-5: an f32 recurrence cannot certify tight
    tolerances — mixed-precision refinement with f64 anchors)."""

    def test_2d_certified_matches_f64_reference(self):
        import jax

        mesh = rectangle_mesh(8, 7, 6)
        disc = Discretization(mesh, gll_basis_2d(6))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", lambda x, y: 0.2 * (x + y))
        sol = prob.solve_local(tol=1e-6, precond="pmg", certify=True)
        assert bool(sol.cg.converged)
        assert not sol.cg.stalled
        assert sol.u.dtype == np.float32   # model dtype; cert is f64
        assert len(sol.cg.cycle_resnorms) >= 1
        # the certified claim holds against an independent f64 solve
        ref = Poisson(disc, dtype=np.float64)
        ref.set_dirichlet("ebc", lambda x, y: 0.2 * (x + y))
        sref = ref.solve_local(tol=1e-11)
        scale = np.abs(sref.u).max()
        assert (np.abs(np.asarray(sol.u, np.float64) - sref.u).max()
                / scale < 1e-4)

    def test_3d_certified(self):
        from spectralelementmethod_tpu.basis import gll_basis_3d
        from spectralelementmethod_tpu.mesh import box_mesh

        mesh = box_mesh(3, 3, 3, 4)
        disc = Discretization(mesh, gll_basis_3d(4))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", lambda x, y, z: 0.1 * (x + y + z))
        sol = prob.solve_local(tol=1e-6, precond="pmg", certify=True)
        assert bool(sol.cg.converged)
        # repeat solve rides the BC-keyed f64 vector cache bit-exactly
        sol2 = prob.solve_local(tol=1e-6, precond="pmg", certify=True)
        assert np.array_equal(np.asarray(sol.u), np.asarray(sol2.u))

    def test_f64_model_certify_noop(self):
        mesh = rectangle_mesh(4, 4, 4)
        disc = Discretization(mesh, gll_basis_2d(4))
        prob = Poisson(disc, dtype=np.float64)
        prob.set_dirichlet("ebc", 0.0)
        sol = prob.solve_local(tol=1e-10, certify=True)
        assert bool(sol.cg.converged)
