"""Monocular initialization: parallel 8-pt F + H RANSAC + model selection.

TPU re-design of /root/reference/sensors/src/TwoViewReconstruction.cpp (an
ORB-SLAM3 port): instead of 200 sequential RANSAC iterations, all hypotheses
are estimated and scored with one vmap (200 batched 9-column DLT SVDs + a
(200, P) scoring pass), and all 12 motion hypotheses (4 from E, 8 from the
Faugeras H decomposition) are triangulated/checked in one batched CheckRT.
Thresholds and acceptance rules mirror the reference exactly:
  * CheckHomography: symmetric transfer, th = 5.991 (:322-379)
  * CheckFundamental: epipolar, th = 3.841, score th 5.991 (:381-459)
  * model selection: RH = SH/(SH+SF) > 0.50 -> H (:94-109)
  * ReconstructF: nsimilar == 1, maxGood >= max(0.9N, 50), parallax > 1 deg
  * ReconstructH: secondBest < 0.75 best, best > max(50, 0.9N), parallax >= 1
  * CheckRT: 4x4 DLT triangulation, reproj th 4 sigma^2, cheirality with
    cosParallax < 0.99998 guard, parallax = 50th smallest (:780-899)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_PARALLAX_DEG = 1.0
MIN_TRIANGULATED = 50
SIGMA2 = 1.0  # mSigma = 1.0
COS_PARALLAX_GUARD = 0.99998
RANSAC_ITERS = 200


class TwoViewResult(NamedTuple):
    ok: jax.Array            # () bool
    R21: jax.Array           # (3, 3)
    t21: jax.Array           # (3,)
    points3d: jax.Array      # (P, 3) in camera-1 frame (index = match slot)
    triangulated: jax.Array  # (P,) bool


def _normalize(pts, valid):
    """ORB-SLAM Normalize: mean + mean absolute deviation scaling."""
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], pts, 0.0), 0) / n
    d = jnp.where(valid[:, None], jnp.abs(pts - mean), 0.0)
    mdev = jnp.sum(d, 0) / n
    s = 1.0 / jnp.maximum(mdev, 1e-9)
    pn = (pts - mean) * s
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]], pts.dtype)
    return pn, T


def _compute_h(p1, p2):
    """8-point homography DLT (ComputeH21, :217-258)."""
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], 1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], 1)
    A = jnp.concatenate([r1, r2], 0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[-1].reshape(3, 3)


def _compute_f(p1, p2):
    """8-point fundamental + rank-2 projection (ComputeF21, :260-297)."""
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], 1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    Fp = vt[-1].reshape(3, 3)
    u, w, vt2 = jnp.linalg.svd(Fp)
    w = w.at[2].set(0.0)
    return (u * w[None, :]) @ vt2


def _check_h(H21, H12, p1, p2, valid, sigma2):
    """(score, inliers) — CheckHomography (:300-379)."""

    def transfer(H, a, b):
        w = H[2, 0] * a[:, 0] + H[2, 1] * a[:, 1] + H[2, 2]
        winv = 1.0 / w
        x = (H[0, 0] * a[:, 0] + H[0, 1] * a[:, 1] + H[0, 2]) * winv
        y = (H[1, 0] * a[:, 0] + H[1, 1] * a[:, 1] + H[1, 2]) * winv
        return ((b[:, 0] - x) ** 2 + (b[:, 1] - y) ** 2) / sigma2

    th = 5.991
    chi1 = transfer(H12, p2, p1)
    chi2 = transfer(H21, p1, p2)
    ok = (chi1 <= th) & (chi2 <= th) & valid
    score = jnp.sum(jnp.where((chi1 <= th) & valid, th - chi1, 0.0)
                    + jnp.where((chi2 <= th) & valid, th - chi2, 0.0))
    return score, ok


def _check_f(F21, p1, p2, valid, sigma2):
    """(score, inliers) — CheckFundamental (:381-459)."""
    th = 3.841
    th_score = 5.991

    a2 = F21[0, 0] * p1[:, 0] + F21[0, 1] * p1[:, 1] + F21[0, 2]
    b2 = F21[1, 0] * p1[:, 0] + F21[1, 1] * p1[:, 1] + F21[1, 2]
    c2 = F21[2, 0] * p1[:, 0] + F21[2, 1] * p1[:, 1] + F21[2, 2]
    num2 = a2 * p2[:, 0] + b2 * p2[:, 1] + c2
    chi1 = num2 * num2 / (a2 * a2 + b2 * b2) / sigma2

    a1 = F21[0, 0] * p2[:, 0] + F21[1, 0] * p2[:, 1] + F21[2, 0]
    b1 = F21[0, 1] * p2[:, 0] + F21[1, 1] * p2[:, 1] + F21[2, 1]
    c1 = F21[0, 2] * p2[:, 0] + F21[1, 2] * p2[:, 1] + F21[2, 2]
    num1 = a1 * p1[:, 0] + b1 * p1[:, 1] + c1
    chi2 = num1 * num1 / (a1 * a1 + b1 * b1) / sigma2

    ok = (chi1 <= th) & (chi2 <= th) & valid
    score = jnp.sum(jnp.where((chi1 <= th) & valid, th_score - chi1, 0.0)
                    + jnp.where((chi2 <= th) & valid, th_score - chi2, 0.0))
    return score, ok


def _triangulate(P1, P2, x1, x2):
    """DLT: SVD of the 4x4 system (CheckRT, :819-825)."""
    A = jnp.stack([
        x1[0] * P1[2] - P1[0],
        x1[1] * P1[2] - P1[1],
        x2[0] * P2[2] - P2[0],
        x2[1] * P2[2] - P2[1],
    ])
    _, _, vt = jnp.linalg.svd(A)
    X = vt[-1]
    return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)


def _check_rt(R, t, p1, p2, inliers, K, th2):
    """Vectorized CheckRT (:776-899). Returns (nGood, parallax_deg, X, good)."""
    P1 = jnp.concatenate([K, jnp.zeros((3, 1), K.dtype)], 1)
    P2 = K @ jnp.concatenate([R, t[:, None]], 1)
    O2 = -R.T @ t

    X = jax.vmap(lambda a, b: _triangulate(P1, P2, a, b))(p1, p2)
    finite = jnp.all(jnp.isfinite(X), axis=1)

    n1 = X
    d1 = jnp.linalg.norm(n1, axis=1)
    n2 = X - O2
    d2 = jnp.linalg.norm(n2, axis=1)
    cos_par = jnp.sum(n1 * n2, axis=1) / jnp.maximum(d1 * d2, 1e-12)

    Xc2 = X @ R.T + t
    depth_ok = ~(((X[:, 2] <= 0) | (Xc2[:, 2] <= 0))
                 & (cos_par < COS_PARALLAX_GUARD))

    def reproj_err(Xc, p):
        invz = 1.0 / Xc[:, 2]
        ex = K[0, 0] * Xc[:, 0] * invz + K[0, 2] - p[:, 0]
        ey = K[1, 1] * Xc[:, 1] * invz + K[1, 2] - p[:, 1]
        return ex * ex + ey * ey

    e1 = reproj_err(X, p1)
    e2 = reproj_err(Xc2, p2)
    good = inliers & finite & depth_ok & (e1 <= th2) & (e2 <= th2)
    n_good = jnp.sum(good)

    # parallax = acos of the (min(50, n-1))-th smallest cosParallax
    cp = jnp.where(good, cos_par, 2.0)  # invalid -> sorted last
    cp_sorted = jnp.sort(cp)
    idx = jnp.minimum(50, jnp.maximum(n_good - 1, 0))
    cp_sel = jnp.clip(cp_sorted[idx], -1.0, 1.0)
    parallax = jnp.where(n_good > 0,
                         jnp.degrees(jnp.arccos(cp_sel)), 0.0)
    tri = good & (cos_par < COS_PARALLAX_GUARD)
    return n_good, parallax, X, tri


def _decompose_e(E):
    """DecomposeE (:901-...): E = U diag(1,1,0) V^T -> R1, R2, t."""
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.linalg.norm(t)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  E.dtype)
    R1 = u @ W @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = u @ W.T @ vt
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    return R1, R2, t


def _decompose_h(H, K):
    """Faugeras decomposition -> 8 (R, t, valid) hypotheses (:570-680)."""
    A = jnp.linalg.inv(K) @ H @ K
    u, w, vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(u) * jnp.linalg.det(vt)
    d1, d2, d3 = w[0], w[1], w[2]
    ok = (d1 / d2 >= 1.00001) & (d2 / d3 >= 1.00001)

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    x1 = jnp.array([aux1, aux1, -aux1, -aux1])
    x3 = jnp.array([aux3, -aux3, aux3, -aux3])

    Rs, ts = [], []
    # case d' = d2
    aux_st = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 + d3) * d2)
    ct = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    st = jnp.array([aux_st, -aux_st, -aux_st, aux_st])
    for i in range(4):
        Rp = jnp.array([[ct, 0.0, -st[i]], [0.0, 1.0, 0.0], [st[i], 0.0, ct]])
        Rs.append(s * u @ Rp @ vt)
        tp = jnp.array([x1[i], 0.0, -x3[i]]) * (d1 - d3)
        tv = u @ tp
        ts.append(tv / jnp.maximum(jnp.linalg.norm(tv), 1e-12))
    # case d' = -d2
    aux_sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 - d3) * d2)
    cp = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2)
    sp = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])
    for i in range(4):
        Rp = jnp.array([[cp, 0.0, sp[i]], [0.0, -1.0, 0.0],
                        [sp[i], 0.0, -cp]])
        Rs.append(s * u @ Rp @ vt)
        tp = jnp.array([x1[i], 0.0, x3[i]]) * (d1 + d3)
        tv = u @ tp
        ts.append(tv / jnp.maximum(jnp.linalg.norm(tv), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts), ok


@functools.partial(jax.jit, static_argnames=())
def two_view_reconstruct(pts1: jax.Array, pts2: jax.Array, valid: jax.Array,
                         sets: jax.Array, K: jax.Array) -> TwoViewResult:
    """pts1/pts2: (P, 2) matched (undistorted) pixels; valid: (P,); sets:
    (iters, 8) RANSAC sample indices into the padded arrays; K: (3, 3)."""
    dtype = pts1.dtype
    p1n, T1 = _normalize(pts1, valid)
    p2n, T2 = _normalize(pts2, valid)
    T2inv = jnp.linalg.inv(T2)
    T2t = T2.T

    def per_set(idx):
        a = p1n[idx]
        b = p2n[idx]
        Hn = _compute_h(a, b)
        Fn = _compute_f(a, b)
        H21 = T2inv @ Hn @ T1
        F21 = T2t @ Fn @ T1
        sh, okh = _check_h(H21, jnp.linalg.inv(H21), pts1, pts2, valid, SIGMA2)
        sf, okf = _check_f(F21, pts1, pts2, valid, SIGMA2)
        return H21, sh, okh, F21, sf, okf

    H_all, SH, okH, F_all, SF, okF = jax.vmap(per_set)(sets)
    ih = jnp.argmax(SH)
    if_ = jnp.argmax(SF)
    H = H_all[ih]
    inH = okH[ih]
    sh = SH[ih]
    F = F_all[if_]
    inF = okF[if_]
    sf = SF[if_]

    use_h = sh / jnp.maximum(sh + sf, 1e-12) > 0.50

    th2 = 4.0 * SIGMA2

    # F branch: 4 hypotheses
    E = K.T @ F @ K
    R1e, R2e, te = _decompose_e(E)
    RF = jnp.stack([R1e, R2e, R1e, R2e])
    tF = jnp.stack([te, te, -te, -te])
    nF, parF, XF, triF = jax.vmap(
        lambda R, t: _check_rt(R, t, pts1, pts2, inF, K, th2))(RF, tF)
    NF = jnp.sum(inF)
    maxF = jnp.max(nF)
    bestF = jnp.argmax(nF)
    n_min = jnp.maximum((0.9 * NF).astype(jnp.int32), MIN_TRIANGULATED)
    nsim = jnp.sum(nF > 0.7 * maxF)
    okF_branch = (maxF >= n_min) & (nsim == 1) & (parF[bestF] > MIN_PARALLAX_DEG)

    # H branch: 8 hypotheses
    RH8, tH8, h_dec_ok = _decompose_h(H, K)
    nH, parH, XH, triH = jax.vmap(
        lambda R, t: _check_rt(R, t, pts1, pts2, inH, K, th2))(RH8, tH8)
    NH = jnp.sum(inH)
    bestH = jnp.argmax(nH)
    best_good = nH[bestH]
    second = jnp.max(jnp.where(jnp.arange(8) == bestH, -1, nH))
    okH_branch = (h_dec_ok & (second < 0.75 * best_good)
                  & (parH[bestH] >= MIN_PARALLAX_DEG)
                  & (best_good > MIN_TRIANGULATED)
                  & (best_good > 0.9 * NH))

    ok = jnp.where(use_h, okH_branch, okF_branch)
    R = jnp.where(use_h, RH8[bestH], RF[bestF])
    t = jnp.where(use_h, tH8[bestH], tF[bestF])
    X = jnp.where(use_h, XH[bestH], XF[bestF])
    tri = jnp.where(use_h, triH[bestH], triF[bestF])
    return TwoViewResult(ok=ok, R21=R, t21=t, points3d=X,
                         triangulated=tri & ok)


def make_ransac_sets(n_valid_idx: np.ndarray, iters: int = RANSAC_ITERS,
                     seed: int = 0) -> np.ndarray:
    """Host helper: (iters, 8) sample index sets over the valid match slots
    (without replacement per iteration, seeded like the reference's srand(0)
    determinism hook, System.cpp:119)."""
    rng = np.random.RandomState(seed)
    n = len(n_valid_idx)
    sets = np.zeros((iters, 8), np.int32)
    for it in range(iters):
        sets[it] = n_valid_idx[rng.choice(n, 8, replace=(n < 8))]
    return sets
