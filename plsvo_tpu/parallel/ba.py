"""Bundle adjustment over points AND line segments, with Schur complement —
single-chip and sharded across a device mesh.

The reference ships only a dead g2o point-BA (src/bundle_adjustment.cpp,
never built: CMakeLists.txt:4,88-104; call sites guarded off,
frame_handler_mono.cpp:38-40 — SURVEY §2 C16). This module makes BA real,
adds line-segment endpoints as first-class landmarks (no g2o line edges
existed), and scales it across devices (SURVEY §7.1 M9):

- residuals: unit-plane reprojection of each landmark in each observing
  keyframe, Huber-weighted (loba_robust_huber_width analogue)
- landmark-marginalized Schur: per-landmark 3x3 inverses + pairwise
  pose-pair contributions scattered into the reduced camera system S
  (the intent of #define SCHUR_TRICK 1, bundle_adjustment.cpp:37,406-419)
- S is (6K,6K) with K keyframes — tiny; solved replicated
- distributed: landmarks are sharded across the mesh axis; each shard
  assembles its partial S and b, one psum reduces them over ICI, the solve
  is replicated, and back-substitution stays local to each shard
  (SURVEY §5.8)

Observations use fixed per-landmark slots (O wide) — the same SoA layout as
the map state. Line endpoints are landmark rows whose OBSERVATION model is
the reference's point-to-infinite-line distance (pose_optimizer.cpp:132-167):
the residual of an endpoint in an observing keyframe is the signed distance
of its unit-plane projection to the OBSERVED 2D line l = ŝ x ê (normalized
over its first two coefficients), with the chain-rule Jacobian
(l1,l2)·J_endpoint. This matches the motion-only pose optimizer's objective
(C13), so localBA and pose opt optimize the SAME line geometry — and the
along-line direction carries zero gradient, so endpoints never slide or
stretch the segment (the r3 independent-endpoint model pulled endpoints
toward possibly-misdetected observed endpoints). Rows with a zero
`obs_line` (points, or degenerate segments) keep the 2-D reprojection
residual.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from plsvo_tpu import lie


class BAProblem(NamedTuple):
    """Fixed-shape BA problem.

    K keyframes, L landmarks (points and/or line endpoints), O obs slots."""

    kf_R: jnp.ndarray  # (K,3,3) T_f_w
    kf_t: jnp.ndarray  # (K,3)
    kf_fixed: jnp.ndarray  # (K,) bool — gauge-fixed poses (e.g. first KF)
    lm_pos: jnp.ndarray  # (L,3)
    lm_valid: jnp.ndarray  # (L,)
    obs_kf: jnp.ndarray  # (L,O) int32 keyframe index (-1 = empty)
    obs_f: jnp.ndarray  # (L,O,3) observed unit bearings
    obs_valid: jnp.ndarray  # (L,O)
    # observed 2D line coefficients on the unit plane, normalized over the
    # first two components (reference: LineFeat::line, feature.cpp:103-107)
    # — nonzero ONLY for line-endpoint rows, where the residual becomes the
    # point-to-infinite-line distance (pose_optimizer.cpp:132-167). None =
    # pure point problem (backward compatible).
    obs_line: jnp.ndarray = None  # (L,O,3) or None
    # unit 3-D segment direction for line-endpoint rows (zeros for points):
    # the along-segment axis is frozen in the landmark update (see
    # _assemble_shard_direct) so noisy observed lines cannot make endpoints
    # slide/collapse along the segment.
    lm_dir: jnp.ndarray = None  # (L,3) or None


class BAStats(NamedTuple):
    chi2: jnp.ndarray
    n_obs: jnp.ndarray


def _residuals_jacobians(prob: BAProblem, huber: float):
    """Per-observation residuals e (L,O,2), pose jacobians Jc (L,O,2,6),
    landmark jacobians Jp (L,O,2,3), robust weights w (L,O)."""
    kf = jnp.maximum(prob.obs_kf, 0)
    R = prob.kf_R[kf]  # (L,O,3,3)
    t = prob.kf_t[kf]
    xyz = jnp.einsum("loij,lj->loi", R, prob.lm_pos) + t
    z = jnp.where(jnp.abs(xyz[..., 2]) < 1e-8, 1e-8, xyz[..., 2])
    proj = xyz[..., :2] / z[..., None]
    obs = prob.obs_f[..., :2] / jnp.where(
        jnp.abs(prob.obs_f[..., 2:3]) < 1e-8, 1e-8, prob.obs_f[..., 2:3])
    e = obs - proj  # (L,O,2)

    x, y = xyz[..., 0], xyz[..., 1]
    zi = 1.0 / z
    zi2 = zi * zi
    o = jnp.zeros_like(x)
    # d e / d twist (left-compose convention): = jacobian_xyz2uv(xyz)
    row0 = jnp.stack([-zi, o, x * zi2, x * y * zi2, -(1 + x * x * zi2), y * zi], -1)
    row1 = jnp.stack([o, -zi, y * zi2, 1 + y * y * zi2, -x * y * zi2, -x * zi], -1)
    Jc = jnp.stack([row0, row1], -2)  # (L,O,2,6)
    # d e / d pos_w = -dproj/dxyz @ R
    dpx = jnp.stack([zi, o, -x * zi2], -1)
    dpy = jnp.stack([o, zi, -y * zi2], -1)
    dproj = jnp.stack([dpx, dpy], -2)  # (L,O,2,3)
    Jp = -jnp.einsum("loik,lokj->loij", dproj, R)

    if prob.obs_line is not None:
        # line-endpoint rows: residual = signed distance of the projected
        # endpoint to the observed infinite line (reference
        # pose_optimizer.cpp:132-167), Jacobian = (l1,l2) chained through
        # the endpoint Jacobians. Packed as a 2-residual with a zero second
        # row so all downstream assembly is shared with the point model.
        # The along-line direction carries zero gradient: endpoints cannot
        # slide along the segment, so BA preserves segment extent.
        l12 = prob.obs_line[..., :2]  # (L,O,2)
        is_line = jnp.linalg.norm(l12, axis=-1) > 0.5  # normalized or zero
        # e_line = -(l . [proj,1]); sign matches e = obs - proj convention
        # (row0/row1 are already -dproj/d(.)), irrelevant to GN
        e_line = -(jnp.einsum("loi,loi->lo", l12, proj)
                   + prob.obs_line[..., 2])
        Jc_line = jnp.einsum("loi,loik->lok", l12, Jc)  # (L,O,6)
        Jp_line = jnp.einsum("loi,loik->lok", l12, Jp)  # (L,O,3)
        zero = jnp.zeros_like(e_line)
        e = jnp.where(is_line[..., None],
                      jnp.stack([e_line, zero], -1), e)
        m = is_line[..., None, None]
        Jc = jnp.where(m, jnp.stack([Jc_line, jnp.zeros_like(Jc_line)], -2),
                       Jc)
        Jp = jnp.where(m, jnp.stack([Jp_line, jnp.zeros_like(Jp_line)], -2),
                       Jp)

    valid = prob.obs_valid & (prob.obs_kf >= 0) & prob.lm_valid[:, None] & (xyz[..., 2] > 1e-6)
    en = jnp.linalg.norm(e, axis=-1)
    w_huber = jnp.where(en <= huber, 1.0, huber / jnp.maximum(en, 1e-12))
    w = jnp.where(valid, w_huber, 0.0)
    chi2 = jnp.sum(w * en * en)
    return e, Jc, Jp, w, chi2, jnp.sum(valid)


def _assemble_shard(prob: BAProblem, huber: float, lm_damp: float,
                    chunk: int = 16384):
    """Assemble this shard's contribution to the reduced camera system,
    scanning over landmark slabs of `chunk` rows when the shard is larger:
    the Schur pair tensor (L,O,O,6,6) materializes ~10 KB PER LANDMARK and
    blows past compile/HBM limits at ~100k rows (observed: the 128-KF/100k
    problem failed to compile unchunked); per-slab it is bounded at
    ~160 MB while S/b accumulate across slabs.

    Returns (S_partial (6K,6K), b_partial (6K,), Hpp_inv (L,3,3),
    b_p (L,3), W (L,O,6,3), chi2, n_obs)."""
    L = prob.lm_pos.shape[0]
    if L <= chunk:
        return _assemble_shard_direct(prob, huber, lm_damp)
    pad = (-L) % chunk
    n = (L + pad) // chunk

    def pad_rows(a, fill=0):
        if pad == 0:
            return a
        widths = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    slabs = dict(
        lm_pos=pad_rows(prob.lm_pos),
        lm_valid=pad_rows(prob.lm_valid, False),
        obs_kf=pad_rows(prob.obs_kf, -1),
        obs_f=pad_rows(prob.obs_f),
        obs_valid=pad_rows(prob.obs_valid, False))
    if prob.obs_line is not None:
        slabs["obs_line"] = pad_rows(prob.obs_line)
    if prob.lm_dir is not None:
        slabs["lm_dir"] = pad_rows(prob.lm_dir)
    slabs = {k: v.reshape((n, chunk) + v.shape[1:]) for k, v in slabs.items()}

    def body(carry, sl):
        S_acc, b_acc, chi2_acc, n_acc = carry
        p_sl = prob._replace(**{k: sl[k] for k in slabs})
        S, b, Hpp_inv, b_p, W, chi2, n_obs = _assemble_shard_direct(
            p_sl, huber, lm_damp)
        return ((S_acc + S, b_acc + b, chi2_acc + chi2, n_acc + n_obs),
                (Hpp_inv, b_p, W))

    K = prob.kf_R.shape[0]
    init = (jnp.zeros((6 * K, 6 * K)), jnp.zeros(6 * K),
            jnp.zeros(()), jnp.zeros((), jnp.int32))
    (S, b, chi2, n_obs), (Hpp_inv, b_p, W) = jax.lax.scan(body, init, slabs)
    flat = lambda a: a.reshape((n * chunk,) + a.shape[2:])[:L]
    return S, b, flat(Hpp_inv), flat(b_p), flat(W), chi2, n_obs


def _assemble_shard_direct(prob: BAProblem, huber: float, lm_damp: float):
    K = prob.kf_R.shape[0]
    e, Jc, Jp, w, chi2, n_obs = _residuals_jacobians(prob, huber)

    # per-landmark blocks. LINE-ENDPOINT rows need two extra stabilizers
    # (POINT rows get neither — a point's depth eigenvalue is only
    # ~(baseline/z)^2 of its trace, and even 1e-3-relative damping
    # measurably stalls point-depth convergence):
    # 1. an along-segment STIFFNESS (kappa*tr * t t^T): with exact
    #    observations the along-line direction carries zero gradient, but
    #    NOISY observed planes intersect at a least-squares POINT, and GN
    #    then slides both endpoints toward it — measured median 0.27
    #    along-line drift (segments collapsing to ~0 length) on the
    #    synthetic problem. Freezing the axis keeps updates perpendicular
    #    to the segment, bounding extent drift at second order.
    # 2. trace-relative damping: Hpp restricted to the perpendicular plane
    #    is still built from near-parallel plane normals; the absolute
    #    1e-8 damp alone amplifies f32 noise ~1e8 in the weak direction.
    Hpp = jnp.einsum("loik,loim,lo->lkm", Jp, Jp, w)  # (L,3,3)
    if prob.obs_line is not None:
        row_is_line = jnp.any(
            jnp.linalg.norm(prob.obs_line[..., :2], axis=-1) > 0.5, axis=1)
        tr = Hpp[..., 0, 0] + Hpp[..., 1, 1] + Hpp[..., 2, 2]
        damp = lm_damp + jnp.where(row_is_line, 1e-4, 0.0) * tr / 3.0
        Hpp = Hpp + damp[..., None, None] * jnp.eye(3)
        if prob.lm_dir is not None:
            stiff = jnp.where(row_is_line, 10.0, 0.0) * tr
            Hpp = Hpp + stiff[..., None, None] * jnp.einsum(
                "li,lj->lij", prob.lm_dir, prob.lm_dir)
    else:
        Hpp = Hpp + lm_damp * jnp.eye(3)
    from plsvo_tpu.batlin import inv3x3
    Hpp_inv = inv3x3(Hpp)
    b_p = -jnp.einsum("loik,loi,lo->lk", Jp, e, w)  # (L,3)

    # pose blocks per obs
    Hcc_blk = jnp.einsum("loik,loim,lo->lokm", Jc, Jc, w)  # (L,O,6,6)
    b_c_blk = -jnp.einsum("loik,loi,lo->lok", Jc, e, w)  # (L,O,6)
    W = jnp.einsum("loik,loim,lo->lokm", Jc, Jp, w)  # (L,O,6,3)

    L, O = prob.obs_kf.shape
    kf = jnp.maximum(prob.obs_kf, 0)
    obs_on = (prob.obs_valid & (prob.obs_kf >= 0) & prob.lm_valid[:, None])

    # scatter pose diagonal blocks and gradient
    S = jnp.zeros((K, K, 6, 6))
    b_c = jnp.zeros((K, 6))
    S = S.at[kf, kf].add(jnp.where(obs_on[..., None, None], Hcc_blk, 0.0))
    b_c = b_c.at[kf].add(jnp.where(obs_on[..., None], b_c_blk, 0.0))

    # Schur: subtract W Hpp^-1 W^T for every pose pair sharing a landmark,
    # and W Hpp^-1 b_p from the gradient
    WHinv = jnp.einsum("lokm,lmn->lokn", W, Hpp_inv)  # (L,O,6,3)
    pair = jnp.einsum("loin,lpjn->lopij", WHinv, W)  # (L,O,O,6,6)
    pair_on = obs_on[:, :, None] & obs_on[:, None, :]
    S = S.at[kf[:, :, None].repeat(O, 2), kf[:, None, :].repeat(O, 1)].add(
        jnp.where(pair_on[..., None, None], -pair, 0.0))
    grad_fix = jnp.einsum("loin,ln->loi", WHinv, b_p)  # (L,O,6)
    b_c = b_c.at[kf].add(jnp.where(obs_on[..., None], -grad_fix, 0.0))

    S_flat = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    return S_flat, b_c.reshape(6 * K), Hpp_inv, b_p, W, chi2, n_obs


def _precond_solve(S, b, damping, kf_fixed=None):
    """Damped, Jacobi-preconditioned solve of the reduced camera system.

    Levenberg-style MULTIPLICATIVE damping (damping * diag(S), scale
    invariant) plus symmetric Jacobi preconditioning D S D with
    D = diag(S)^-1/2: at map scale (hundreds of pose DoF, 1e5+ f32-summed
    observations) the raw normal equations are ill-conditioned enough
    that a plain f32 solve takes wild steps — measured 0.5 m pose jumps
    on a 96-KF/50k-landmark problem that the preconditioned solve
    handles (tests/test_ba_scale.py).

    kf_fixed pins gauge-fixed poses INSIDE the solve (rows/cols zeroed,
    unit diagonal): solving them as free leaves the system gauge-deficient
    (observed: 6 near-zero eigenvalues and a 2.0-norm f32 pose step on a
    line-only problem), and the returned nonzero dc for fixed poses leaked
    into landmark back-substitution while the pose update itself was
    zeroed — an inconsistent step."""
    if kf_fixed is not None:
        free = jnp.repeat(~kf_fixed, 6).astype(S.dtype)
        S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        b = b * free
    d = jnp.diagonal(S)
    S = S + damping * jnp.diag(jnp.maximum(d, 1e-12))
    d2 = jnp.diagonal(S)
    Dinv = jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
    Sp = S * Dinv[:, None] * Dinv[None, :]
    y = jnp.linalg.solve(Sp, b * Dinv)
    return y * Dinv


def _apply_updates(prob: BAProblem, dc: jnp.ndarray, Hpp_inv, b_p, W):
    """Back-substitute landmark updates and apply pose updates."""
    K = prob.kf_R.shape[0]
    kf = jnp.maximum(prob.obs_kf, 0)
    obs_on = (prob.obs_valid & (prob.obs_kf >= 0) & prob.lm_valid[:, None])
    dc_blocks = dc.reshape(K, 6)
    # dx_p = Hpp^-1 (b_p - sum_o W_o^T dc_{k(o)})
    Wt_dc = jnp.einsum("loij,loi->loj", W, jnp.where(
        obs_on[..., None], dc_blocks[kf], 0.0))  # (L,O,3)
    dx = jnp.einsum("lij,lj->li", Hpp_inv, b_p - jnp.sum(Wt_dc, axis=1))
    lm_new = jnp.where(prob.lm_valid[:, None], prob.lm_pos + dx, prob.lm_pos)

    # pose update: T <- exp(dc) * T, gauge-fixed poses frozen
    upd = jnp.where(prob.kf_fixed[:, None], 0.0, dc_blocks)
    dR, dt = lie.se3_exp(upd)
    R_new, t_new = lie.compose(dR, dt, prob.kf_R, prob.kf_t)
    return prob._replace(kf_R=R_new, kf_t=t_new, lm_pos=lm_new)


def _pose_prior_terms(p: BAProblem, prob0: BAProblem, pose_prior: float):
    """Quadratic prior anchoring free poses to their INPUT (tracked)
    estimates: cost (pose_prior/2)|log(T T_input^-1)|^2 per free KF.

    Why: on weakly-constrained windows (planar scene + short baselines +
    one gauge KF — the monocular near-flat manifold) GN can reduce chi2 by
    sliding poses+landmarks centimeters along directions the observations
    barely see (measured: a 3 cm pose move cutting chi2 84x while
    WORSENING trajectory ATE 3x). The prior contributes ~nothing where the
    data has curvature and pins the flat directions to the tracked poses,
    which carry the history's information. Returns (S_add diag scalar,
    b_add (6K,))."""
    xi = jax.vmap(lambda R, t, R0, t0: lie.se3_log(
        *lie.compose(R, t, *lie.inverse(R0, t0))))(
        p.kf_R, p.kf_t, prob0.kf_R, prob0.kf_t)  # (K,6) deviation twists
    xi = jnp.where(p.kf_fixed[:, None], 0.0, xi)
    return pose_prior, -pose_prior * xi.reshape(-1)


@partial(jax.jit, static_argnames=("n_iter", "pose_prior", "accept_gate"))
def bundle_adjust(
    prob: BAProblem,
    *,
    n_iter: int = 10,
    huber: float = 1.0 / 250.0,  # unit-plane Huber width ~1px at f=250
    damping: float = 1e-4,
    lm_damp: float = 1e-8,
    pose_prior: float = 0.0,
    accept_gate: bool = True,
):
    """Single-device GN-with-damping BA. Returns (problem, stats).

    accept_gate=False drops the chi2 rollback check, HALVING the per-
    iteration assembly count (the dominant cost of the per-keyframe
    windowed localBA on the VO hot path): with the pose prior + damped
    landmark blocks the steps are conservative, and the e2e golden-ATE
    tests bound the behavior. The final chi2/n_obs stats still require one
    closing assembly."""
    K = prob.kf_R.shape[0]

    def body(carry, _):
        p, chi2_prev = carry
        S, b, Hpp_inv, b_p, W, chi2, n_obs = _assemble_shard(p, huber, lm_damp)
        if pose_prior > 0.0:
            s_add, b_add = _pose_prior_terms(p, prob, pose_prior)
            S = S + s_add * jnp.eye(6 * K)
            b = b + b_add
        dc = _precond_solve(S, b, damping, p.kf_fixed)
        p_new = _apply_updates(p, dc, Hpp_inv, b_p, W)
        if not accept_gate:
            return (p_new, chi2), chi2
        # keep the update only if chi2 did not blow up
        _, _, _, _, _, chi2_new, _ = _assemble_shard(p_new, huber, lm_damp)
        accept = chi2_new <= chi2 * 1.001
        p_out = jax.tree.map(
            lambda a, b_: jnp.where(accept, a, b_),
            p_new, p)
        return (p_out, jnp.where(accept, chi2_new, chi2)), chi2

    (p_fin, chi2_fin), _ = jax.lax.scan(
        body, (prob, jnp.asarray(jnp.inf)), None, length=n_iter)
    _, _, _, _, _, chi2, n_obs = _assemble_shard(p_fin, huber, lm_damp)
    return p_fin, BAStats(chi2=chi2, n_obs=n_obs)


def bundle_adjust_sharded(
    prob: BAProblem,
    mesh: Mesh,
    axis: str = "ba",
    *,
    n_iter: int = 10,
    huber: float = 1.0 / 250.0,
    damping: float = 1e-4,
    lm_damp: float = 1e-8,
    pose_prior: float = 0.0,
    comm_identity: bool = False,
):
    """Distributed BA: landmark rows (and their obs) sharded over `axis`;
    poses replicated. Each device assembles its partial reduced system,
    one psum produces the global S and b, the (small) solve is replicated,
    back-substitution is local (SURVEY §5.8, BASELINE.json config 5).

    L must be divisible by the axis size.

    comm_identity=True replaces every psum with a local `x * n_dev`
    (NUMERICALLY WRONG — timing instrumentation only): the wall-clock
    difference vs the real collective isolates communication cost from
    compute, so the multi-chip dryrun can report a compute/comm split
    (VERDICT r4 next #3)."""
    K = prob.kf_R.shape[0]
    n_dev = mesh.shape[axis]
    assert prob.lm_pos.shape[0] % n_dev == 0, "pad landmarks to a multiple of mesh size"

    lm_spec = P(axis)
    specs = BAProblem(
        kf_R=P(), kf_t=P(), kf_fixed=P(),
        lm_pos=lm_spec, lm_valid=lm_spec,
        obs_kf=lm_spec, obs_f=lm_spec, obs_valid=lm_spec,
        obs_line=lm_spec if prob.obs_line is not None else None,
        lm_dir=lm_spec if prob.lm_dir is not None else None)

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(specs,), out_specs=(specs, P()),
        # comm_identity removes the psums, so the replicated carry never
        # becomes device-varying — skip the varying-manifest check for the
        # timing-only variant
        check_vma=not comm_identity,
    )
    def run(p_local: BAProblem):
        p0 = p_local
        psum = ((lambda x: x * n_dev) if comm_identity
                else (lambda x: jax.lax.psum(x, axis)))

        def body(carry, _):
            p, chi2_prev = carry
            S, b, Hpp_inv, b_p, W, chi2, n_obs = _assemble_shard(p, huber, lm_damp)
            S = psum(S)
            b = psum(b)
            chi2 = psum(chi2)
            if pose_prior > 0.0:
                s_add, b_add = _pose_prior_terms(p, p0, pose_prior)
                S = S + s_add * jnp.eye(6 * K)
                b = b + b_add
            dc = _precond_solve(S, b, damping, p.kf_fixed)
            p_new = _apply_updates(p, dc, Hpp_inv, b_p, W)
            _, _, _, _, _, c2n, _ = _assemble_shard(p_new, huber, lm_damp)
            c2n = psum(c2n)
            accept = c2n <= chi2 * 1.001
            p_out = jax.tree.map(
                lambda a, b_: jnp.where(accept, a, b_), p_new, p)
            return (p_out, jnp.where(accept, c2n, chi2)), chi2

        (p_fin, _), _ = jax.lax.scan(
            body, (p_local, jnp.asarray(jnp.inf)), None, length=n_iter)
        _, _, _, _, _, chi2, n_obs = _assemble_shard(p_fin, huber, lm_damp)
        stats = BAStats(chi2=psum(chi2), n_obs=psum(n_obs))
        return p_fin, stats

    return jax.jit(run)(prob)


def _obs_line_coeffs(sf, ef):
    """Observed unit-plane line coefficients from per-observation endpoint
    bearings: l = ŝ x ê normalized over (l1,l2) (reference: LineFeat::line,
    feature.cpp:103-107). Zeros when degenerate (zero-length observation) —
    those rows fall back to the endpoint-reprojection residual."""
    import numpy as np

    zs = np.where(np.abs(sf[..., 2:3]) < 1e-10, 1e-10, sf[..., 2:3])
    ze = np.where(np.abs(ef[..., 2:3]) < 1e-10, 1e-10, ef[..., 2:3])
    sp = np.concatenate([sf[..., :2] / zs, np.ones_like(zs)], -1)
    ep = np.concatenate([ef[..., :2] / ze, np.ones_like(ze)], -1)
    line = np.cross(sp, ep)
    n = np.linalg.norm(line[..., :2], axis=-1, keepdims=True)
    return np.where(n > 1e-8, line / np.maximum(n, 1e-12),
                    0.0).astype(np.float32)


def problem_from_map(map_state, cfg) -> BAProblem:
    """Build a BAProblem from the live MapState: point landmarks plus line
    endpoints (each endpoint is a landmark row with the point-to-line
    observation model via obs_line)."""
    import numpy as np

    m = map_state
    P_rows = np.where(m.pt_status >= 2)[0]
    L_rows = np.where(m.ln_status >= 2)[0]
    O = cfg.caps.max_obs_per_landmark

    pos = [m.pt_pos[P_rows]]
    obs_kf = [m.pt_obs_kf[P_rows]]
    obs_f = [m.pt_obs_f[P_rows]]
    obs_line = [np.zeros((len(P_rows), O, 3), np.float32)]
    # line endpoints become landmark rows sharing the observed line coeffs
    ln_l = _obs_line_coeffs(m.ln_obs_sf[L_rows], m.ln_obs_ef[L_rows])
    pos += [m.ln_spos[L_rows], m.ln_epos[L_rows]]
    obs_kf += [m.ln_obs_kf[L_rows], m.ln_obs_kf[L_rows]]
    obs_f += [m.ln_obs_sf[L_rows], m.ln_obs_ef[L_rows]]
    obs_line += [ln_l, ln_l]
    seg_d = (m.ln_epos[L_rows] - m.ln_spos[L_rows]).astype(np.float32)
    seg_d /= np.maximum(np.linalg.norm(seg_d, axis=-1, keepdims=True), 1e-12)
    lm_dir = [np.zeros((len(P_rows), 3), np.float32), seg_d, seg_d]

    pos = np.concatenate(pos, 0) if len(P_rows) + len(L_rows) else np.zeros((0, 3))
    obs_kf = np.concatenate(obs_kf, 0) if len(pos) else np.zeros((0, O), np.int32)
    obs_f = np.concatenate(obs_f, 0) if len(pos) else np.zeros((0, O, 3))
    obs_line = (np.concatenate(obs_line, 0) if len(pos)
                else np.zeros((0, O, 3), np.float32))
    lm_dir = (np.concatenate(lm_dir, 0) if len(pos)
              else np.zeros((0, 3), np.float32))
    n = len(pos)
    occ = m.kf_occupied
    # gauge: fix the oldest occupied keyframe
    fixed = np.zeros(len(occ), bool)
    occ_idx = np.where(occ)[0]
    if len(occ_idx):
        fixed[occ_idx[np.argmin(m.kf_frame_id[occ_idx])]] = True
    ov = (obs_kf >= 0) & occ[np.maximum(obs_kf, 0)]
    meta = {"n_points": len(P_rows), "n_lines": len(L_rows),
            "pt_rows": P_rows, "ln_rows": L_rows}
    return BAProblem(
        kf_R=jnp.asarray(m.kf_R), kf_t=jnp.asarray(m.kf_t),
        kf_fixed=jnp.asarray(fixed),
        lm_pos=jnp.asarray(pos, jnp.float32),
        lm_valid=jnp.ones(n, bool),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_f=jnp.asarray(obs_f, jnp.float32),
        obs_valid=jnp.asarray(ov),
        obs_line=jnp.asarray(obs_line, jnp.float32),
        lm_dir=jnp.asarray(lm_dir, jnp.float32)), meta


def problem_blob(prob: BAProblem):
    """Pack a (host-built) BAProblem into ONE flat f32 upload + static
    shape spec for bundle_adjust_blob: the 10-leaf pytree otherwise costs
    ~10 separate host->device transfers (~0.8 ms launch latency each over
    the remote tunnel) per keyframe on the localBA hot path. Integer
    leaves ride as f32 (all < 2^24); bools as 0/1."""
    import numpy as np

    leaves = [prob.kf_R, prob.kf_t, prob.kf_fixed, prob.lm_pos,
              prob.lm_valid, prob.obs_kf, prob.obs_f, prob.obs_valid]
    has_line = prob.obs_line is not None
    if has_line:
        leaves += [prob.obs_line, prob.lm_dir]
    blob = np.concatenate([np.asarray(a, np.float32).ravel()
                           for a in leaves])
    K = np.asarray(prob.kf_R).shape[0]
    L, O = np.asarray(prob.obs_kf).shape
    return blob, (K, L, O, has_line)


def _problem_from_blob(blob, spec) -> BAProblem:
    """Unpack (inside jit) the problem_blob layout."""
    K, L, O, has_line = spec
    sizes = [K * 9, K * 3, K, L * 3, L, L * O, L * O * 3, L * O]
    shapes = [(K, 3, 3), (K, 3), (K,), (L, 3), (L,), (L, O), (L, O, 3),
              (L, O)]
    if has_line:
        sizes += [L * O * 3, L * 3]
        shapes += [(L, O, 3), (L, 3)]
    parts = []
    off = 0
    for n, shp in zip(sizes, shapes):
        parts.append(jax.lax.dynamic_slice_in_dim(blob, off, n).reshape(shp))
        off += n
    (kf_R, kf_t, kf_fixed, lm_pos, lm_valid, obs_kf, obs_f,
     obs_valid) = parts[:8]
    obs_line = parts[8] if has_line else None
    lm_dir = parts[9] if has_line else None
    return BAProblem(
        kf_R=kf_R, kf_t=kf_t, kf_fixed=kf_fixed > 0.5,
        lm_pos=lm_pos, lm_valid=lm_valid > 0.5,
        obs_kf=obs_kf.astype(jnp.int32), obs_f=obs_f,
        obs_valid=obs_valid > 0.5, obs_line=obs_line, lm_dir=lm_dir)


@partial(jax.jit, static_argnames=("spec", "n_iter", "pose_prior",
                                  "accept_gate"))
def bundle_adjust_blob(blob, *, spec, n_iter: int = 10,
                       huber: float = 1.0 / 250.0, damping: float = 1e-4,
                       lm_damp: float = 1e-8, pose_prior: float = 0.0,
                       accept_gate: bool = True):
    """bundle_adjust with the problem delivered as ONE packed upload."""
    prob = _problem_from_blob(blob, spec)
    return bundle_adjust(prob, n_iter=n_iter, huber=huber, damping=damping,
                         lm_damp=lm_damp, pose_prior=pose_prior,
                         accept_gate=accept_gate)


@partial(jax.jit, static_argnames=(
    "spec", "n_iter", "pose_prior", "accept_gate"))
def bundle_adjust_blob_batched(blobs, *, spec, n_iter: int = 10,
                               huber: float = 1.0 / 250.0,
                               damping: float = 1e-4, lm_damp: float = 1e-8,
                               pose_prior: float = 0.0,
                               accept_gate: bool = True):
    """R same-spec windowed-BA problems solved by ONE vmapped program
    (batched multi-sequence keyframe path, VERDICT r4 next #1: the per-vo
    localBA dispatches serialized ~R x 4 ms of device time per drain
    window). Returns stacked (kf_R, kf_t, lm_pos)."""
    def one(blob):
        prob = _problem_from_blob(blob, spec)
        out, _ = bundle_adjust(prob, n_iter=n_iter, huber=huber,
                               damping=damping, lm_damp=lm_damp,
                               pose_prior=pose_prior,
                               accept_gate=accept_gate)
        return out.kf_R, out.kf_t, out.lm_pos

    return jax.vmap(one)(blobs)


def problem_from_window(map_state, cfg, core_slots, pad_bucket: int = 256):
    """Windowed localBA problem (reference intent:
    src/bundle_adjustment.cpp:124-255 `ba::localBA` — core keyframes free,
    covisible neighbors contribute observations but stay FIXED, landmarks
    restricted to those observed by a core keyframe).

    Unlike problem_from_map this does NOT repack the whole map: only the
    window's landmark rows are gathered, and the row count is padded to a
    multiple of `pad_bucket` so the per-keyframe calls reuse ONE compiled
    BA program per bucket (the keyframe table is already fixed-capacity).
    Returns (problem, meta) with the same meta contract as problem_from_map
    plus snapshots for the guarded deferred write-back."""
    import numpy as np

    m = map_state
    core = np.zeros(len(m.kf_occupied), bool)
    core[np.asarray(core_slots, int)] = True
    core &= m.kf_occupied

    def window_rows(status, obs_kf):
        alive = status >= 2
        seen = core[np.maximum(obs_kf, 0)] & (obs_kf >= 0)
        return np.where(alive & seen.any(axis=1))[0]

    P_rows = window_rows(m.pt_status, m.pt_obs_kf)
    L_rows = window_rows(m.ln_status, m.ln_obs_kf)
    # compact observation COLUMNS to the most-recent live slots: the host
    # table is sized for the whole keyframe ring (max_obs_per_landmark >=
    # max_kfs) but per-KF localBA cost scales with the column count, and a
    # landmark rarely holds more than ~8 live observations — keep the 8
    # newest (by write stamp); the dropped tail is the OLDEST constraints,
    # the same ones the reference's ring overwrote
    O = min(cfg.caps.max_obs_per_landmark, 8)

    def compact(kf_rows, stamp_rows, f_list):
        key = np.where(kf_rows >= 0, -stamp_rows, np.iinfo(np.int64).max)
        order = np.argsort(key, axis=1)[:, :O]
        kf_c = np.take_along_axis(kf_rows, order, 1)
        return kf_c, [np.take_along_axis(f, order[..., None], 1)
                      for f in f_list]

    pt_kf_c, (pt_f_c,) = compact(m.pt_obs_kf[P_rows],
                                 m.pt_obs_stamp[P_rows],
                                 [m.pt_obs_f[P_rows]])
    ln_kf_c, (ln_sf_c, ln_ef_c) = compact(
        m.ln_obs_kf[L_rows], m.ln_obs_stamp[L_rows],
        [m.ln_obs_sf[L_rows], m.ln_obs_ef[L_rows]])
    ln_l_c = _obs_line_coeffs(ln_sf_c, ln_ef_c)
    pos = [m.pt_pos[P_rows], m.ln_spos[L_rows], m.ln_epos[L_rows]]
    obs_kf = [pt_kf_c, ln_kf_c, ln_kf_c]
    obs_f = [pt_f_c, ln_sf_c, ln_ef_c]
    obs_line = [np.zeros((len(P_rows), O, 3), np.float32), ln_l_c, ln_l_c]
    seg_d = (m.ln_epos[L_rows] - m.ln_spos[L_rows]).astype(np.float32)
    seg_d /= np.maximum(np.linalg.norm(seg_d, axis=-1, keepdims=True), 1e-12)
    lm_dir = np.concatenate(
        [np.zeros((len(P_rows), 3), np.float32), seg_d, seg_d], 0)
    pos = np.concatenate(pos, 0).astype(np.float32)
    obs_kf = np.concatenate(obs_kf, 0).astype(np.int32)
    obs_f = np.concatenate(obs_f, 0).astype(np.float32)
    obs_line = np.concatenate(obs_line, 0).astype(np.float32)
    n = len(pos)
    n_pad = (-n) % pad_bucket if n else pad_bucket
    pos = np.concatenate([pos, np.zeros((n_pad, 3), np.float32)])
    obs_kf = np.concatenate([obs_kf, np.full((n_pad, O), -1, np.int32)])
    obs_f = np.concatenate([obs_f, np.zeros((n_pad, O, 3), np.float32)])
    obs_line = np.concatenate([obs_line,
                               np.zeros((n_pad, O, 3), np.float32)])
    lm_dir = np.concatenate([lm_dir, np.zeros((n_pad, 3), np.float32)])
    valid = np.zeros(n + n_pad, bool)
    valid[:n] = True

    occ = m.kf_occupied
    fixed = occ & ~core  # covisible neighbors frozen
    if not fixed.any():
        # whole map is core: gauge-fix the oldest keyframe
        occ_idx = np.where(occ)[0]
        if len(occ_idx):
            fixed[occ_idx[np.argmin(m.kf_frame_id[occ_idx])]] = True
    fixed |= ~occ  # empty slots never move
    ov = (obs_kf >= 0) & occ[np.maximum(obs_kf, 0)]
    meta = {
        "n_points": len(P_rows), "n_lines": len(L_rows),
        "pt_rows": P_rows, "ln_rows": L_rows,
        "kf_free": np.where(occ & ~fixed)[0],
        "kf_frame_id": m.kf_frame_id.copy(),
        "pt_anchor": m.pt_anchor_kf[P_rows].copy(),
        "ln_anchor": m.ln_anchor_kf[L_rows].copy(),
    }
    # HOST (numpy) leaves: the localBA dispatcher packs them into ONE
    # upload (problem_blob); jit call sites auto-convert per leaf
    return BAProblem(
        kf_R=m.kf_R.copy(), kf_t=m.kf_t.copy(),
        kf_fixed=fixed,
        lm_pos=pos, lm_valid=valid,
        obs_kf=obs_kf, obs_f=obs_f,
        obs_valid=ov & valid[:, None],
        obs_line=obs_line,
        lm_dir=lm_dir), meta


def write_back_window(map_state, kf_R, kf_t, lm_pos, meta):
    """Guarded write-back for (possibly deferred) windowed localBA results:
    by completion time keyframes may have been evicted/replaced and
    landmark rows deleted/reallocated — only rows that still denote the
    same entity (matching kf_frame_id / alive status + unchanged anchor)
    are written. Inputs are host arrays (fetched)."""
    import numpy as np

    m = map_state
    kf_R, kf_t, lm_pos = (np.asarray(a) for a in (kf_R, kf_t, lm_pos))
    ok_kf = [k for k in meta["kf_free"]
             if m.kf_occupied[k] and m.kf_frame_id[k] == meta["kf_frame_id"][k]]
    if ok_kf:
        m.kf_R[ok_kf] = kf_R[ok_kf]
        m.kf_t[ok_kf] = kf_t[ok_kf]
    npts, nln = meta["n_points"], meta["n_lines"]
    pr = meta["pt_rows"]
    ok_pt = (m.pt_status[pr] >= 2) & (m.pt_anchor_kf[pr] == meta["pt_anchor"])
    if ok_pt.any():
        m.pt_pos[pr[ok_pt]] = lm_pos[:npts][ok_pt]
    lr = meta["ln_rows"]
    ok_ln = (m.ln_status[lr] >= 2) & (m.ln_anchor_kf[lr] == meta["ln_anchor"])
    if ok_ln.any():
        m.ln_spos[lr[ok_ln]] = lm_pos[npts:npts + nln][ok_ln]
        m.ln_epos[lr[ok_ln]] = lm_pos[npts + nln:npts + 2 * nln][ok_ln]
    if hasattr(m, "invalidate"):
        m.invalidate()
    if hasattr(m, "mark_mt_dirty"):  # carry path: refined rows ride the
        if ok_pt.any():              # next delta blob (kf poses always do)
            m.mark_mt_dirty("pt", pr[ok_pt])
        if ok_ln.any():
            m.mark_mt_dirty("ln", lr[ok_ln])
    return len(ok_kf), int(ok_pt.sum()) + int(ok_ln.sum())


def write_back_to_map(map_state, prob: BAProblem, meta):
    """Scatter optimized poses/landmarks back into the MapState."""
    import numpy as np

    m = map_state
    m.kf_R[...] = np.asarray(prob.kf_R)
    m.kf_t[...] = np.asarray(prob.kf_t)
    np_pos = np.asarray(prob.lm_pos)
    npts = meta["n_points"]
    nln = meta["n_lines"]
    m.pt_pos[meta["pt_rows"]] = np_pos[:npts]
    m.ln_spos[meta["ln_rows"]] = np_pos[npts: npts + nln]
    m.ln_epos[meta["ln_rows"]] = np_pos[npts + nln: npts + 2 * nln]
    if hasattr(m, "invalidate"):
        m.invalidate()
    if hasattr(m, "mark_mt_dirty"):
        m.mark_mt_dirty("pt", meta["pt_rows"])
        m.mark_mt_dirty("ln", meta["ln_rows"])
