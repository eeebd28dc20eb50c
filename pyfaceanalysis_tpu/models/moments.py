"""On-device graph-moment accumulation for GSFA training.

The training cost of a GSFA layer is dominated by second-moment
accumulation: (N, F, D) data -> (F, D, D) covariance + edge scatter. These
are pure batched GEMMs, so they belong on the MXU; only the tiny (F, D, D)
results cross the host boundary (for the float64 generalized eigensolve).
This replaces the host-numpy accumulation path, which shipped hundreds of MB
per layer through the host<->device link.

Closed forms (no edge enumeration):

- temporal:  A = mean over consecutive diffs of dx dx^T
- serial:    groups g of equal size m in label order; edges between all
             pairs of consecutive groups:
                 sum_g [ m (M_g + M_{g+1}) - s_g s_{g+1}^T - s_{g+1} s_g^T ]
             where sum_g m (M_g + M_{g+1}) = m (2 M_tot - M_first - M_last).
- clustered: A = sum_c 2 (n_c M_c - s_c s_c^T) / n_c via one-hot weighted
             einsums.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def mean_cov(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(N, F, D) -> (mean (F, D), cov (F, D, D))."""
    n = x.shape[0]
    mean = x.mean(axis=0)
    xc = x - mean
    cov = jnp.einsum("nfd,nfe->fde", xc, xc,
                     preferred_element_type=jnp.float32) / (n - 1)
    return mean, cov


@jax.jit
def temporal_scatter(xc: jax.Array) -> jax.Array:
    dx = xc[1:] - xc[:-1]
    return jnp.einsum("nfd,nfe->fde", dx, dx,
                      preferred_element_type=jnp.float32) / max(
                          dx.shape[0], 1)


@partial(jax.jit, static_argnames=("num_groups",))
def serial_scatter(xc_sorted: jax.Array, num_groups: int) -> jax.Array:
    """xc_sorted: (N, F, D) centered data ALREADY sorted by label; N is
    truncated to a multiple of num_groups by the caller."""
    N, F, D = xc_sorted.shape
    m = N // num_groups
    xg = xc_sorted[: m * num_groups].reshape(num_groups, m, F, D)
    s = xg.sum(axis=1)                                     # (G, F, D)
    M_tot = jnp.einsum("gmfd,gmfe->fde", xg, xg,
                       preferred_element_type=jnp.float32)
    M_first = jnp.einsum("mfd,mfe->fde", xg[0], xg[0],
                         preferred_element_type=jnp.float32)
    M_last = jnp.einsum("mfd,mfe->fde", xg[-1], xg[-1],
                        preferred_element_type=jnp.float32)
    cross = jnp.einsum("gfd,gfe->fde", s[:-1], s[1:],
                       preferred_element_type=jnp.float32)
    A = (m * (2.0 * M_tot - M_first - M_last)
         - cross - jnp.swapaxes(cross, -1, -2))
    edges = m * m * (num_groups - 1)
    return A / edges


@partial(jax.jit, static_argnames=("num_classes",))
def clustered_scatter(xc: jax.Array, onehot: jax.Array,
                      num_classes: int) -> jax.Array:
    """xc: (N, F, D) centered; onehot: (N, C) class indicators."""
    counts = onehot.sum(axis=0)                            # (C,)
    w = onehot / jnp.maximum(counts, 1.0)[None, :]         # weight 1/n_c
    s = jnp.einsum("nc,nfd->cfd", w, xc,
                   preferred_element_type=jnp.float32)     # s_c / n_c
    M = jnp.einsum("nc,nfd,nfe->cfde", w, xc, xc,
                   preferred_element_type=jnp.float32)     # M_c / n_c
    # 2 (n_c M_c - s_c s_c^T)/n_c = 2 (M_c/n_c * n_c ... ) -- rescale:
    A = 2.0 * jnp.einsum("c,cfde->fde", counts, M) \
        - 2.0 * jnp.einsum("c,cfd,cfe->fde", counts, s, s)
    total = jnp.maximum((counts - 1.0).sum(), 1.0)
    return A / total


def gsfa_moments(x_dev: jax.Array, graph: str, labels=None,
                 num_groups: int = 50, label_weights=None):
    """Device moments (mean (F,D), B (F,D,D), A (F,D,D)) -- all stay on
    device; labels (tiny, host) drive the graph structure.

    ``serial`` accepts (N,) labels or an (N, K) label matrix: the edge
    scatter is then the average of the K per-label serial graphs (the
    multi-label training the reference's "RTransXYPAngScale All" networks
    used -- one feature space serving several regression targets). A plain
    temporal graph would instead latch onto per-segment identity (constant
    within a rendered walk = infinitely slow), which is why pose nets MUST
    be trained with label graphs.
    """
    mean, B = mean_cov(x_dev)
    xc = x_dev - mean
    if graph == "temporal":
        A = temporal_scatter(xc)
    elif graph == "serial":
        lab = np.asarray(labels)
        if lab.ndim == 1:
            lab = lab[:, None]
        w = (np.ones(lab.shape[1]) if label_weights is None
             else np.asarray(label_weights, np.float64))
        A = None
        for k in range(lab.shape[1]):
            order = np.argsort(lab[:, k], kind="stable")
            Ak = w[k] * serial_scatter(
                jnp.take(xc, jnp.asarray(order), axis=0), num_groups)
            A = Ak if A is None else A + Ak
        A = A / w.sum()
    elif graph == "clustered":
        lab = np.asarray(labels)
        classes, dense = np.unique(lab, return_inverse=True)
        onehot = jnp.asarray(np.eye(len(classes), dtype=np.float32)[dense])
        A = clustered_scatter(xc, onehot, len(classes))
    else:
        raise ValueError(f"unknown graph {graph!r}")
    return mean, B, A


@partial(jax.jit, static_argnames=("out_dim",))
def solve_gsfa_device(A: jax.Array, B: jax.Array, out_dim: int,
                      reg: float = 1e-4) -> jax.Array:
    """Batched on-device generalized eigensolve: smallest ``out_dim``
    eigenvectors of A w = lambda B w per field. float32 with relative
    Tikhonov regularization of B; only the (F, D, out_dim) result ever
    crosses the host boundary (device->host bandwidth is the scarce
    resource on tunneled TPU setups)."""
    D = B.shape[-1]
    eye = jnp.eye(D, dtype=B.dtype)
    trB = jnp.trace(B, axis1=-2, axis2=-1)[:, None, None] / D
    Breg = B + (reg * trB + 1e-12) * eye
    evals, evecs = jnp.linalg.eigh(Breg)
    # Rank control with static shapes: near-zero-variance directions are
    # zeroed in the whitener AND penalized in M (a zero row would otherwise
    # read as eigenvalue 0 = "perfectly slow" and hijack the solution).
    # The cut must sit well above float32 eigh noise (~1e-6 relative), and
    # high enough that whitening gains stay bounded (directions below 1e-3
    # of the top variance would get >30x amplification and generalize
    # poorly through the downstream nonlinear expansions).
    bad = evals <= 1e-3 * evals.max(axis=-1, keepdims=True)
    inv_sqrt = jnp.where(bad, 0.0,
                         1.0 / jnp.sqrt(jnp.maximum(evals, 1e-12)))
    wh = evecs * inv_sqrt[:, None, :]
    M = jnp.einsum("fde,fdg,fgh->feh", wh, A, wh,
                   preferred_element_type=jnp.float32)
    M = (M + jnp.swapaxes(M, -1, -2)) * 0.5
    penalty = jnp.where(bad, 1e6, 0.0)
    M = M + jax.vmap(jnp.diag)(penalty)
    _, V = jnp.linalg.eigh(M)
    return jnp.einsum("fde,feo->fdo", wh, V[..., :out_dim],
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("out_dim",))
def solve_pca_device(B: jax.Array, out_dim: int) -> jax.Array:
    """Principal ``out_dim`` eigenvectors per field, on device."""
    _, evecs = jnp.linalg.eigh(B)
    return evecs[..., ::-1][..., :out_dim]


@partial(jax.jit, static_argnames=("slow_dim", "out_dim"))
def solve_igsfa_device(A: jax.Array, B: jax.Array, slow_dim: int,
                       out_dim: int, reg: float = 1e-5) -> jax.Array:
    """Information-preserving GSFA (cuicuilco iGSFANode equivalent,
    SURVEY.md 2.3): ``slow_dim`` GSFA directions plus a whitened PCA of the
    slow-reconstruction residual, folded into ONE (F, D, out_dim) affine
    map.

    Everything derives from the already-accumulated second moments (A, B):
    with W the slow projection and xc centered inputs, the least-squares
    reconstruction coefficient is ``coef = (W^T B W)^-1 W^T B`` and the
    residual covariance is ``B - G^T S^-1 G`` (G = W^T B) -- no second data
    pass. The PCA part is whitened so every output has ~unit variance like
    the GSFA part (downstream expansions assume bounded inputs; see
    LayerSpec.clip)."""
    W = solve_gsfa_device(A, B, slow_dim)                  # (F, D, s)
    G = jnp.einsum("fds,fde->fse", W, B,
                   preferred_element_type=jnp.float32)     # W^T B (F, s, D)
    S = jnp.einsum("fse,fet->fst", G, W,
                   preferred_element_type=jnp.float32)     # W^T B W
    s_dim = S.shape[-1]
    trS = jnp.trace(S, axis1=-2, axis2=-1)[:, None, None] / s_dim
    coef = jnp.linalg.solve(S + (reg * trS + 1e-12) * jnp.eye(s_dim), G)
    resid_cov = B - jnp.einsum("fsd,fse->fde", coef, G)
    resid_cov = (resid_cov + jnp.swapaxes(resid_cov, -1, -2)) * 0.5
    evals, evecs = jnp.linalg.eigh(resid_cov)
    pca_dim = out_dim - slow_dim
    P = evecs[..., ::-1][..., :pca_dim]                    # (F, D, p)
    lam = evals[..., ::-1][..., :pca_dim]
    top = evals[..., -1][:, None]
    scale = jnp.where(lam <= 1e-3 * top, 0.0,
                      1.0 / jnp.sqrt(jnp.maximum(lam, 1e-12)))
    # Residual projection in input coordinates: (xc - xc W coef) P
    # = xc (P - W (coef P)); whitened per direction.
    WcP = jnp.einsum("fds,fsp->fdp", W, jnp.einsum("fsd,fdp->fsp", coef, P))
    W_pca = (P - WcP) * scale[:, None, :]
    return jnp.concatenate([W, W_pca], axis=-1)
