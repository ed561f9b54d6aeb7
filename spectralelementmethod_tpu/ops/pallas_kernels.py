"""Pallas TPU kernels for the hot element-apply path.

The TPU-native answer to the reference's native-code component (its only C
file, ``sem/bary_interp.c``, is an unbuilt barycentric-interpolation
prototype): here the per-element operator application itself is a fused
on-chip kernel.

The element-batched weak Laplacian (``..ops.sumfac.make_local_laplacian_
operator``) is two large MXU matmuls with elementwise geometric-factor
weighting in between:

    grads = u  @ Dhat^T        # (E, n) @ (n, 2n)
    flux  = G . grads          # pointwise, 3 factor fields
    out   = flux @ Dhat        # (E, 2n) @ (2n, n)

Under plain XLA the (E, 2n) intermediates round-trip through HBM between
the two dots (XLA does not fuse across a dot boundary), roughly doubling
the HBM traffic of an apply that is bandwidth-bound at practical sizes
(p=8: 32 f32 FLOP/byte fused vs the ~60 FLOP/byte machine balance of a
v5e).  This kernel tiles the element axis, keeps ``grads``/``flux`` in
VMEM, and streams only u, G and the result through HBM.

Row-wise independence makes partial final blocks safe: each output row
depends only on its own input rows, so padded lanes/rows never leak into
stored results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _laplacian_block_kernel(u_ref, g0_ref, g1_ref, g2_ref, dhat_ref,
                            out_ref):
    """One element tile: fused grad -> G-weighting -> grad^T in VMEM."""
    n = out_ref.shape[1]
    u = u_ref[:]
    dhat = dhat_ref[:]
    # (TE, n) @ (2n, n)^T -> (TE, 2n); contract the shared n axis.
    grads = jax.lax.dot_general(
        u, dhat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ur, us = grads[:, :n], grads[:, n:]
    fr = g0_ref[:] * ur + g1_ref[:] * us
    fs = g1_ref[:] * ur + g2_ref[:] * us
    flux = jnp.concatenate([fr, fs], axis=1)            # (TE, 2n)
    out_ref[:] = jnp.dot(
        flux, dhat, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_e", "interpret")
)
def fused_laplacian_local(uL, g0, g1, g2, dhat, *, block_e: int = 512,
                          interpret: bool = False):
    """Fused local weak-Laplacian apply on L-vectors.

    Parameters
    ----------
    uL : (E, n) element-local field (any consistent node order, as long as
        ``dhat`` columns/rows use the same order).
    g0, g1, g2 : (E, n) geometric factor fields [G00, G01, G11].
    dhat : (2n, n) stacked derivative matrix
        (:func:`..ops.sumfac.make_stacked_derivative`, column-permuted to
        the L-vector's node order).
    block_e : element-tile size (rows per kernel instance).
    interpret : run in the Pallas interpreter (CPU testing).

    Returns the **local** result (E, n); DSS exchange is applied by the
    caller (it is cross-element and stays in XLA).
    """
    E, n = uL.shape
    te = max(8, min(block_e, E))
    grid = (pl.cdiv(E, te),)

    row_spec = pl.BlockSpec((te, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dhat_spec = pl.BlockSpec((2 * n, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    flops = 2 * E * n * (2 * n) * 2 + 6 * E * n
    nbytes = uL.dtype.itemsize
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=E * n * nbytes * 5 + dhat.size * dhat.dtype.itemsize,
        transcendentals=0,
    )

    return pl.pallas_call(
        _laplacian_block_kernel,
        out_shape=jax.ShapeDtypeStruct((E, n), uL.dtype),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, row_spec, dhat_spec],
        out_specs=row_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(uL, g0, g1, g2, dhat)


def _vector_laplacian_block_kernel(u_ref, g0_ref, g1_ref, g2_ref, dhat_ref,
                                   out_ref):
    """Like :func:`_laplacian_block_kernel` for k stacked components.

    u_ref/out_ref: (TE, k*n) with components side by side; the geometric
    factors are shared across components.
    """
    n = g0_ref.shape[1]
    k = out_ref.shape[1] // n
    dhat = dhat_ref[:]
    outs = []
    for c in range(k):
        u = u_ref[:, c * n:(c + 1) * n]
        grads = jax.lax.dot_general(
            u, dhat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ur, us = grads[:, :n], grads[:, n:]
        fr = g0_ref[:] * ur + g1_ref[:] * us
        fs = g1_ref[:] * ur + g2_ref[:] * us
        flux = jnp.concatenate([fr, fs], axis=1)
        outs.append(jnp.dot(flux, dhat, preferred_element_type=jnp.float32))
    out_ref[:] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_e", "interpret"))
def fused_vector_laplacian_local(uL, g0, g1, g2, dhat, *,
                                 block_e: int = 256,
                                 interpret: bool = False):
    """Fused apply for multi-component fields.

    ``uL``: (E, k*n) with k components concatenated along the last axis
    (one Laplacian per component, shared geometric factors).
    """
    E, kn = uL.shape
    n = g0.shape[1]
    te = max(8, min(block_e, E))
    grid = (pl.cdiv(E, te),)

    u_spec = pl.BlockSpec((te, kn), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((te, n), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    dhat_spec = pl.BlockSpec((2 * n, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _vector_laplacian_block_kernel,
        out_shape=jax.ShapeDtypeStruct((E, kn), uL.dtype),
        grid=grid,
        in_specs=[u_spec, g_spec, g_spec, g_spec, dhat_spec],
        out_specs=u_spec,
        interpret=interpret,
    )(uL, g0, g1, g2, dhat)


def supported() -> bool:
    """True when the default JAX backend compiles Pallas TPU kernels."""
    return jax.default_backend() == "tpu"
