"""Kronecker-structured sparse arrays.

Parity: reference ``sem/sp_array.py`` (``KroneckerArray``) — N-D sparse
tensors stored as a sum of "diagonals": dense sub-arrays plus axis maps
with repeated indices encoding Kronecker deltas.  The reference uses this
to hold the rank-6 advection operator of the squirmer without
materializing it (``examples/squirmer-axisymmetric.py:230-250``).

In the TPU build this structure is *not* on any hot path — the squirmer's
advection is matrix-free (autodiff JVPs of einsum chains make the explicit
sparse operator unnecessary; ``models/squirmer.py``).  It is provided for
API completeness and for users porting reference code.
"""

from __future__ import annotations

import numpy as np


class KroneckerArray:
    """Sparse N-D array as a sum of Kronecker-delta-mapped dense diagonals.

    ``KroneckerArray(shape, subarr0, kdmap0, subarr1, kdmap1, ...)``

    Each diagonal is a dense sub-array plus an ``axes_map`` listing, for
    every axis of the KroneckerArray, which axis of the sub-array it reads;
    repeating a sub-array axis encodes a Kronecker delta between the
    corresponding KroneckerArray axes.
    """

    def __init__(self, shape, *args, dtype=np.float64):
        self.dtype = dtype
        self.shape = tuple(shape)
        self.data: list[np.ndarray] = []
        self.kdmap: list[list[int]] = []
        for subarr, axes_map in zip(args[::2], args[1::2]):
            self.add_diag(subarr, axes_map)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def add_diag(self, subarr, axes_map) -> None:
        """Add a diagonal (parity: ``sem/sp_array.py:51-71``)."""
        subarr = np.asarray(subarr, dtype=self.dtype)
        axes_map = list(axes_map)
        assert len(axes_map) == self.ndim
        assert sorted(set(axes_map)) == list(range(subarr.ndim))
        for i in range(self.ndim):
            assert self.shape[i] == subarr.shape[axes_map[i]]
        self.data.append(subarr)
        self.kdmap.append(axes_map)

    def dot_dense(self, array, axes) -> "KroneckerArray":
        """Contract with a dense array along the given KroneckerArray axes.

        Parity: ``sem/sp_array.py:73-102``.  Returns a new KroneckerArray
        over the remaining axes.
        """
        array = np.asarray(array)
        assert array.ndim == len(axes)
        shape_out = tuple(self.shape[i] for i in range(self.ndim)
                          if i not in axes)
        out = KroneckerArray(shape_out, dtype=self.dtype)

        for data, kdmap in zip(self.data, self.kdmap):
            data_axes = list(range(data.ndim))
            mapped_axes = [kdmap[ax] for ax in axes]
            kdmap_out = [kdmap[ax] for ax in range(self.ndim)
                         if ax not in axes]
            axes_out = sorted(set(kdmap_out))
            renumber = {ax: i for i, ax in enumerate(axes_out)}
            kdmap_out = [renumber[ax] for ax in kdmap_out]
            data_out = np.einsum(data, data_axes, array, mapped_axes,
                                 axes_out)
            out.add_diag(data_out, kdmap_out)
        return out

    def to_array(self) -> np.ndarray:
        """Densify (parity: ``sem/sp_array.py:104-113``)."""
        out = np.zeros(self.shape, dtype=self.dtype)
        for data, kdmap in zip(self.data, self.kdmap):
            ix_ogrid = np.ogrid[tuple(slice(N) for N in data.shape)]
            dense_ix = tuple(ix_ogrid[i] for i in kdmap)
            out[dense_ix] += data
        return out
