"""Config-5 end-to-end rehearsal: import -> partition -> shard -> solve.

BASELINE.json configs[4] is "1M-element imported Gmsh mesh sharded over
v5e-8 with ICI halo exchange".  Rounds 1-2 proved the import and the
sharding separately; this file composes them in ONE pipeline — write a
mesh with ``save_msh``, re-import it with ``load_msh``, reorder elements
with a host partitioner, shard the element axis over the 8-device
virtual mesh (plain ring and hybrid 2-pseudo-slice), solve, and match
the identical single-device solve to 1e-10 (f64) — the composition is
where ordering, padding, and boundary bookkeeping interact.

Partitioner/comm pairing (a real composition constraint surfaced by this
pipeline): the explicit ppermute halo (``comm='shardmap'``) requires the
roll-class exchange — uniform neighbor offsets smaller than the
per-shard block — so it composes with the **panel** order (built to
preserve uniform offsets, :func:`..parallel.partition.panel_order`) and
with the natural structured order; **Morton/RCM** orders scramble the
offsets and compose with the sharding-propagation comm path instead
(generic gather/scatter DSS, XLA chooses the collectives).
``__graft_entry__.dryrun_multichip`` runs the panel pipeline at ~100k
elements (tier 5).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.mesh.gmsh import load_msh, save_msh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops import sumfac
from spectralelementmethod_tpu.parallel import partition as pt
from spectralelementmethod_tpu.parallel import sharding as sh
from spectralelementmethod_tpu.solver.cg import cg
from spectralelementmethod_tpu.utils.hoist import hoist_closure


NDEV = 8


def _u_exact(x, y):
    return np.sin(np.pi * x) * np.cos(0.5 * np.pi * y)


def _forcing(x, y):
    return 1.25 * np.pi**2 * _u_exact(x, y)


def _pipeline_problem(tmp_path, partitioner, nx=24, ny=24, p=3,
                      binary=True, panel=8):
    """save_msh -> load_msh -> partition -> Poisson problem (f64)."""
    mesh0 = rectangle_mesh(nx, ny, p, boundary_names={
        "west": "ebc", "east": "ebc", "south": "ebc", "north": "ebc"})
    path = os.path.join(str(tmp_path), "pipe.msh")
    save_msh(mesh0, path, binary=binary)
    mesh = load_msh(path)

    if partitioner == "morton":
        perm = pt.morton_order(mesh.centroids)
    elif partitioner == "panel":
        # loaded meshes keep the structured i*ny+j cell order
        perm = pt.panel_order(n_fast=ny, n_slow=nx, panel=panel)
    elif partitioner == "rcm":
        perm = pt.rcm_order(mesh)
    else:
        raise ValueError(partitioner)
    mesh = pt.reorder_elements(mesh, perm)

    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, forcing=_forcing, dtype=np.float64)
    prob.set_dirichlet("ebc", _u_exact)
    return prob


def _solve_sharded_vs_single(prob, jmesh, its=200, comm="shardmap"):
    """Fixed-iteration sharded vs identical single-device CG (f64)."""
    transposed = comm == "shardmap"
    A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(
        prob, jmesh, comm=comm)
    w = ex._weights_as(np.float64, transposed=transposed)
    res = cg(A, r, M=M, tol=1e-12, max_iter=its, dot_weight=w, block=its)
    back = ex.global_from_local_T if transposed else ex.global_from_local
    u_sh = back(np.asarray(u_dL + res.x))

    # identical math, one device
    disc = prob.disc
    Gf = np.zeros((ex.E, 3, disc.n_loc))
    Gf[:disc.E] = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    free = (~prob._dirichlet_mask)[ex.gather_hier]
    free[disc.E:] = False
    if transposed:
        free = np.ascontiguousarray(free.T)
    A1 = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, jnp.asarray(free),
        vector_layout="ne" if transposed else "en", backend="xla")
    res1 = cg(A1, r, M=M, tol=1e-12, max_iter=its, dot_weight=w,
              block=its)
    u_1 = back(np.asarray(u_dL + res1.x))
    return u_sh, u_1, A, r


@pytest.mark.skipif(len(jax.devices()) < NDEV,
                    reason=f"needs {NDEV} virtual devices")
class TestConfig5Pipeline:
    def test_panel_shardmap_pipeline(self, tmp_path):
        """Panel order + explicit ppermute halo: the production pairing
        (panel keeps offsets uniform; the far classes — cross-panel edge
        offset panel*n_slow-panel+1 = 89 and its vertex diagonals +-8 —
        must stay below the per-shard block, 97 < 1536/8 = 192 here,
        exactly as at 1M scale)."""
        prob = _pipeline_problem(tmp_path, "panel", nx=12, ny=128,
                                 panel=8)
        jmesh = sh.device_mesh(NDEV)
        u_sh, u_1, A, r = _solve_sharded_vs_single(prob, jmesh)
        scale = np.abs(u_1).max()
        assert np.abs(u_sh - u_1).max() / scale < 1e-10
        err = prob.l2_error(u_sh, _u_exact)
        assert err < 5e-5  # p=3 discretization error
        # communication pattern: ppermute halo, no all-gather
        A_pure, A_c = hoist_closure(A, r)
        hlo = jax.jit(lambda u, *c: A_pure(u, *c)).lower(
            r, *A_c).compile().as_text()
        assert "collective-permute" in hlo
        assert "all-gather" not in hlo

    def test_morton_propagation_pipeline(self, tmp_path):
        """Morton order scrambles roll offsets -> generic DSS exchange
        under XLA sharding propagation."""
        prob = _pipeline_problem(tmp_path, "morton")
        jmesh = sh.device_mesh(NDEV)
        u_sh, u_1, _, _ = _solve_sharded_vs_single(prob, jmesh,
                                                   comm="propagation")
        scale = np.abs(u_1).max()
        assert np.abs(u_sh - u_1).max() / scale < 1e-10
        assert prob.l2_error(u_sh, _u_exact) < 5e-5

    def test_shardmap_rejects_scrambled_order(self, tmp_path):
        """The composition constraint is enforced, not silent: the
        ppermute halo refuses a Morton-ordered exchange."""
        prob = _pipeline_problem(tmp_path, "morton", nx=8, ny=8)
        jmesh = sh.device_mesh(NDEV)
        with pytest.raises(ValueError, match="roll"):
            sh.sharded_local_poisson_problem(prob, jmesh, comm="shardmap")

    def test_hybrid_two_slice_mesh(self, tmp_path):
        """Same panel pipeline over the ICI x DCN hybrid mesh
        (2 pseudo-slices, slice-major order)."""
        prob = _pipeline_problem(tmp_path, "panel", nx=12, ny=128,
                                 panel=8)
        jmesh = sh.hybrid_device_mesh(n_slices=2)
        assert len(set(jmesh.shard_slice_ids)) == 2
        u_sh, u_1, _, _ = _solve_sharded_vs_single(prob, jmesh)
        scale = np.abs(u_1).max()
        assert np.abs(u_sh - u_1).max() / scale < 1e-10

    def test_ascii_roundtrip_pipeline(self, tmp_path):
        """The ASCII writer/reader composes with the same pipeline
        (RCM partitioner, propagation comm)."""
        prob = _pipeline_problem(tmp_path, "rcm", nx=8, ny=8,
                                 binary=False)
        jmesh = sh.device_mesh(NDEV)
        u_sh, u_1, _, _ = _solve_sharded_vs_single(prob, jmesh, its=120,
                                                   comm="propagation")
        scale = np.abs(u_1).max()
        assert np.abs(u_sh - u_1).max() / scale < 1e-10

    def test_panel_pipeline_pmg_converged_solve(self, tmp_path):
        """Config-5 solves with a REAL preconditioner (VERDICT round-3
        item 2): the sharded pmg V-cycle under the ppermute halo,
        converged to 1e-10 — the solve role of the reference's direct
        method (sem/discrete.py:502-528) at sharded scale.  Panel
        element order breaks the exact tensor-grid coarse inference, so
        the Chebyshev coarse sweep engages (documented fallback)."""
        prob = _pipeline_problem(tmp_path, "panel", nx=12, ny=128,
                                 panel=8)
        jmesh = sh.device_mesh(NDEV)
        A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(
            prob, jmesh, comm="shardmap", precond="pmg")
        w = ex._weights_as(np.float64, transposed=True)
        res = cg(A, r, M=M, tol=1e-10, max_iter=400, dot_weight=w,
                 block=25)
        assert bool(res.converged)
        u = ex.global_from_local_T(np.asarray(u_dL + res.x))
        assert prob.l2_error(u, _u_exact) < 5e-5
        # a real preconditioner: far fewer iterations than Jacobi needs
        # at this h (hundreds)
        assert int(res.iterations) < 150, int(res.iterations)
