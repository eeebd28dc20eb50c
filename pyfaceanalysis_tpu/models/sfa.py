"""SFA / GSFA / PCA solvers.

The reference delegates all feature learning to cuicuilco's GSFA/iGSFA nodes
(imported at FaceDetectUpdated.py:24-46; behavior characterized in SURVEY.md
section 2.3). Here the math is re-derived TPU-first:

Graph-based SFA minimizes, over projections w with unit graph-weighted
variance, the weighted sum of squared output differences along graph edges:

    minimize   w^T A w   s.t.   w^T B w = 1,  decorrelated
    A = sum_{(i,j) in E} gamma_ij (x_i - x_j)(x_i - x_j)^T   (edge scatter)
    B = node-weighted covariance of x

solved as a symmetric generalized eigenproblem (smallest eigenvalues first).
Both A and B are plain second-moment accumulations = batched GEMMs (MXU
work); the (D, D) eigensolves are tiny and run batched over receptive
fields. Training graphs with closed-form edge scatter (no edge enumeration):

- ``serial``:    samples sorted into G label groups; edges between all pairs
                 of consecutive groups (the GSFA "serial" graph).
- ``clustered``: edges between all pairs within a label class (classification
                 graph; within-class scatter in closed form).
- ``temporal``:  consecutive samples in presentation order (classic SFA).

All fit functions accept inputs shaped (N, F, D) -- F independent receptive
fields trained in one batched solve -- or (N, D), which is treated as F=1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LinearNode(NamedTuple):
    """A trained affine projection per receptive field: y = (x - mean) @ W.

    ``mean``: (F, D), ``W``: (F, D, O). The pytree form lets a whole network
    live inside one jit.
    """

    mean: jax.Array
    W: jax.Array

    @property
    def out_dim(self) -> int:
        return self.W.shape[-1]

    def __call__(self, x: jax.Array, compute_dtype=None) -> jax.Array:
        """(B, F, D) -> (B, F, O) (or (B, D) -> (B, O) when F == 1).

        ``compute_dtype=jnp.bfloat16`` feeds the MXU its fast path: the
        centered input and W are cast for the einsum only; accumulation
        stays f32 (preferred_element_type)."""
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, :]
        xc = x - self.mean[None]
        W = self.W
        if compute_dtype is not None:
            xc = xc.astype(compute_dtype)
            W = W.astype(compute_dtype)
            if jax.default_backend() != "tpu":
                # CPU lacks the BF16xBF16=F32 dot thunk; upcasting after
                # the rounding keeps identical numerics for tests.
                xc = xc.astype(jnp.float32)
                W = W.astype(jnp.float32)
        y = jnp.einsum("bfd,fdo->bfo", xc, W,
                       preferred_element_type=jnp.float32)
        return y[:, 0, :] if squeeze else y


def _ensure_3d(x) -> Tuple[np.ndarray, bool]:
    x = np.asarray(x, np.float64)
    if x.ndim == 2:
        return x[:, None, :], True
    return x, False


def temporal_edge_scatter(x: np.ndarray) -> np.ndarray:
    """A from consecutive-sample differences: (N, F, D) -> (F, D, D)."""
    dx = x[1:] - x[:-1]
    return np.einsum("nfd,nfe->fde", dx, dx) / max(len(dx), 1)


def serial_edge_scatter(x: np.ndarray, labels: np.ndarray,
                        num_groups: int = 50) -> np.ndarray:
    """Serial-graph edge scatter: all pairs between consecutive label groups.

    Uses per-group moments only:
      sum_{i in g, j in g+1} (xi-xj)(xi-xj)^T
        = n_{g+1} M_g + n_g M_{g+1} - s_g s_{g+1}^T - s_{g+1} s_g^T
    with s_g = sum of x, M_g = sum of x x^T over group g.
    """
    N, F, D = x.shape
    order = np.argsort(labels, kind="stable")
    xs = x[order]
    bounds = np.linspace(0, N, num_groups + 1).astype(int)
    A = np.zeros((F, D, D))
    total_edges = 0.0
    s_prev = M_prev = n_prev = None
    for g in range(num_groups):
        xg = xs[bounds[g]:bounds[g + 1]]
        n = len(xg)
        if n == 0:
            continue
        s = xg.sum(axis=0)                                 # (F, D)
        M = np.einsum("nfd,nfe->fde", xg, xg)              # (F, D, D)
        if s_prev is not None:
            A += (n * M_prev + n_prev * M
                  - np.einsum("fd,fe->fde", s_prev, s)
                  - np.einsum("fd,fe->fde", s, s_prev))
            total_edges += n * n_prev
        s_prev, M_prev, n_prev = s, M, n
    return A / max(total_edges, 1.0)


def clustered_edge_scatter(x: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Clustered-graph edge scatter: all intra-class pairs, in closed form.

    sum_{i,j in c} (xi-xj)(xi-xj)^T = 2 (n_c M_c - s_c s_c^T).
    Each class is weighted by 1/n_c (cuicuilco-style class balancing).
    """
    N, F, D = x.shape
    A = np.zeros((F, D, D))
    total = 0.0
    for c in np.unique(labels):
        xc = x[labels == c]
        n = len(xc)
        if n < 2:
            continue
        s = xc.sum(axis=0)
        M = np.einsum("nfd,nfe->fde", xc, xc)
        A += 2.0 * (n * M - np.einsum("fd,fe->fde", s, s)) / n
        total += float(n - 1)
    return A / max(total, 1.0)


def covariance(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Mean (F, D) and covariance (F, D, D) over the sample axis."""
    mean = x.mean(axis=0)
    xc = x - mean
    cov = np.einsum("nfd,nfe->fde", xc, xc) / max(len(x) - 1, 1)
    return mean, cov


def solve_gsfa(A: np.ndarray, B: np.ndarray, out_dim: int,
               reg: float = 1e-7) -> np.ndarray:
    """Solves A w = lambda B w for the ``out_dim`` smallest eigenvalues.

    Whitening route (no scipy): B = U S U^T, Wh = U S^-1/2, then eigh of
    Wh^T A Wh; returns (F, D, out_dim) projections. Directions whose B
    eigenvalue is below ``reg * max`` are dropped from the whitened space
    (rank deficiency from constant features / duplicated pixels).
    """
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    F, D, _ = B.shape
    W = np.zeros((F, D, out_dim))
    evals_B, evecs_B = np.linalg.eigh(B)
    for f in range(F):
        ev, Uf = evals_B[f], evecs_B[f]
        keep = ev > max(ev.max(), 0.0) * reg + 1e-30
        Uf = Uf[:, keep]
        wh = Uf / np.sqrt(ev[keep])
        M = wh.T @ A[f] @ wh
        M = (M + M.T) * 0.5
        _, V = np.linalg.eigh(M)
        k = min(out_dim, V.shape[1])
        W[f, :, :k] = wh @ V[:, :k]
    return W


def sfa_fit(x, out_dim: int, graph: str = "temporal",
            labels: Optional[np.ndarray] = None, num_groups: int = 50,
            reg: float = 1e-7, dtype=jnp.float32) -> LinearNode:
    """Fits (G)SFA on (N, F, D) or (N, D) data.

    graph: "temporal" (consecutive samples), "serial" (label-ordered groups)
    or "clustered" (intra-class edges). ``labels`` is required for the latter
    two.
    """
    x3, squeezed = _ensure_3d(x)
    mean, B = covariance(x3)
    xc = x3 - mean
    if graph == "temporal":
        A = temporal_edge_scatter(xc)
    elif graph == "serial":
        A = serial_edge_scatter(xc, np.asarray(labels), num_groups)
    elif graph == "clustered":
        A = clustered_edge_scatter(xc, np.asarray(labels))
    else:
        raise ValueError(f"unknown graph {graph!r}")
    W = solve_gsfa(A, B, out_dim, reg=reg)
    return LinearNode(jnp.asarray(mean, dtype), jnp.asarray(W, dtype))


def pca_fit(x, out_dim: int, dtype=jnp.float32) -> LinearNode:
    """Fits PCA on (N, F, D) or (N, D) data (principal components first)."""
    x3, _ = _ensure_3d(x)
    mean, cov = covariance(x3)
    evals, evecs = np.linalg.eigh(cov)               # ascending
    W = evecs[..., ::-1][..., :out_dim]              # (F, D, out_dim)
    return LinearNode(jnp.asarray(mean, dtype), jnp.asarray(W, dtype))


def igsfa_fit(x, slow_dim: int, out_dim: int, graph: str = "temporal",
              labels: Optional[np.ndarray] = None, num_groups: int = 50,
              reg: float = 1e-7, dtype=jnp.float32) -> LinearNode:
    """Information-preserving GSFA: ``slow_dim`` slow features + a PCA of the
    residual, concatenated to ``out_dim`` total outputs.

    Mirrors the role of cuicuilco's iGSFANode (SURVEY.md 2.3): the slow part
    drives the regression targets while the PCA part preserves signal energy
    for downstream layers. Both parts are affine, so the result folds into a
    single LinearNode: residual PCA directions are computed on the data with
    the slow-reconstruction removed, and the combined projection is
    [W_slow | P_resid] applied to centered x.
    """
    x3, _ = _ensure_3d(x)
    N, F, D = x3.shape
    slow = sfa_fit(x3, slow_dim, graph=graph, labels=labels,
                   num_groups=num_groups, reg=reg)
    mean = np.asarray(slow.mean)
    Ws = np.asarray(slow.W)                           # (F, D, slow_dim)
    xc = x3 - mean
    y = np.einsum("nfd,fds->nfs", xc, Ws)             # slow outputs
    # Least-squares reconstruction of x from y, removed before residual PCA.
    W_out = np.zeros((F, D, out_dim))
    pca_dim = out_dim - slow_dim
    for f in range(F):
        coef, *_ = np.linalg.lstsq(y[:, f, :], xc[:, f, :], rcond=None)
        resid = xc[:, f, :] - y[:, f, :] @ coef
        cov = resid.T @ resid / max(N - 1, 1)
        evals, evecs = np.linalg.eigh(cov)
        P = evecs[:, ::-1][:, :pca_dim]               # (D, pca_dim)
        # x @ P after removing reconstruction: (x - y coef) P = x (P - Ws coef P)
        W_out[f, :, :slow_dim] = Ws[f]
        W_out[f, :, slow_dim:slow_dim + P.shape[1]] = P - Ws[f] @ (coef @ P)
    return LinearNode(jnp.asarray(mean, dtype), jnp.asarray(W_out, dtype))
