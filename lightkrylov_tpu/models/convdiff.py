"""Nonsymmetric convection-diffusion operator (GMRES benchmark config).

BASELINE.json config 2: GMRES(k) with restarts on a nonsymmetric
convection-diffusion operator, single + double precision.

Discretization: ``-eps Delta u + (cx, cy) . grad u`` on the unit square,
homogeneous Dirichlet BCs, 5-point diffusion + centered first-order
convection.  State layout identical to :class:`Poisson2D` (``(ny, nx)``
interior grid).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..linops import LinearOperator

__all__ = ["ConvectionDiffusion2D"]


class ConvectionDiffusion2D(LinearOperator):
    """``A u = -eps Delta u + cx u_x + cy u_y`` (nonsymmetric)."""

    _children = ()
    _static = ("nx", "ny", "eps", "cx", "cy", "dtype_")

    def __init__(self, nx: int, ny: int | None = None, eps: float = 1e-2,
                 cx: float = 1.0, cy: float = 0.5, dtype=jnp.float64):
        self.nx = nx
        self.ny = ny if ny is not None else nx
        self.eps = float(eps)
        self.cx = float(cx)
        self.cy = float(cy)
        self.dtype_ = np.dtype(dtype)

    @property
    def hx(self):
        return 1.0 / (self.nx + 1)

    @property
    def hy(self):
        return 1.0 / (self.ny + 1)

    def template(self):
        return jnp.zeros((self.ny, self.nx), self.dtype_)

    def _shifts(self, u):
        un = jnp.pad(u, ((0, 0), (1, 1)))
        left, right = un[:, :-2], un[:, 2:]
        um = jnp.pad(u, ((1, 1), (0, 0)))
        down, up = um[:-2, :], um[2:, :]
        return left, right, down, up

    def matvec(self, u):
        left, right, down, up = self._shifts(u)
        ihx2, ihy2 = 1.0 / self.hx**2, 1.0 / self.hy**2
        diff = (2.0 * (ihx2 + ihy2)) * u - ihx2 * (left + right) - ihy2 * (down + up)
        conv = self.cx * (right - left) / (2.0 * self.hx) \
            + self.cy * (up - down) / (2.0 * self.hy)
        return self.eps * diff + conv

    def rmatvec(self, u):
        # adjoint: diffusion symmetric, convection changes sign
        left, right, down, up = self._shifts(u)
        ihx2, ihy2 = 1.0 / self.hx**2, 1.0 / self.hy**2
        diff = (2.0 * (ihx2 + ihy2)) * u - ihx2 * (left + right) - ihy2 * (down + up)
        conv = self.cx * (right - left) / (2.0 * self.hx) \
            + self.cy * (up - down) / (2.0 * self.hy)
        return self.eps * diff - conv

    def dense(self):
        nx, ny = self.nx, self.ny
        n = nx * ny
        A = np.zeros((n, n))
        ihx2, ihy2 = 1.0 / self.hx**2, 1.0 / self.hy**2

        def idx(j, i):
            return j * nx + i

        for j in range(ny):
            for i in range(nx):
                k = idx(j, i)
                A[k, k] = self.eps * 2.0 * (ihx2 + ihy2)
                if i > 0:
                    A[k, idx(j, i - 1)] = -self.eps * ihx2 - self.cx / (2 * self.hx)
                if i < nx - 1:
                    A[k, idx(j, i + 1)] = -self.eps * ihx2 + self.cx / (2 * self.hx)
                if j > 0:
                    A[k, idx(j - 1, i)] = -self.eps * ihy2 - self.cy / (2 * self.hy)
                if j < ny - 1:
                    A[k, idx(j + 1, i)] = -self.eps * ihy2 + self.cy / (2 * self.hy)
        return A
