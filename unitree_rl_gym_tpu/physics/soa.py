"""Env-SoA (structure-of-arrays) articulated dynamics + contact solve.

The vmapped per-env formulation in :mod:`physics.dynamics` /
:mod:`physics.contact` is semantically clean but maps poorly onto TPU: each
substep lowers to hundreds of tiny ``[N, 3, 3]`` / ``[N, 18, 18]`` ops whose
intermediates all round-trip HBM — measured ~18 ms per 4096-env substep on
v5e, >95% of training time.

This module restates the exact same math (same recursions as
``dynamics.fk/bias_forces/mass_matrix`` and ``contact.contact_solve``; the
numeric contract is the reference's PhysX-replacement semantics,
legged_robot.py:627-671) in **scalar SoA form**: every physical scalar is a
jnp array over the env batch, vectors/matrices are Python tuples of those
arrays, and all small recursions (FK, RNEA, CRBA, Cholesky) unroll at trace
time. Consequences:

* the env batch is the innermost (lane) axis of every op — full VPU
  utilization, no [3,3]/[18,18] trailing dims to tile;
* model constants stay Python floats, so multiplies by structural 0 / ±1
  (sparse joint axes, triangular fill, tree sparsity of H) are folded away
  at trace time by the ``_mac``/``_mul`` helpers below — the emitted op
  count tracks the true FLOP count of the sparse problem;
* one implementation serves two backends: plain XLA over the full batch
  (shape ``S=(N,)``) and the fused Pallas kernel in
  :mod:`physics.pallas_step` (shape ``S=(8, bE//8)`` VMEM tiles).

The contact-impulse solve is reformulated without the explicit point
Jacobian: per PGS iteration, point velocities come from a forward velocity
propagation (``A v``) and accumulated impulses return to joint space through
the adjoint backward force propagation (``A^T dp``) followed by one
Cholesky solve — algebraically identical to contact.py's
``An @ Hinv``-matrix formulation (A = G P factorizes through body
velocities), but with O(nv) live state instead of the [ncp,3,nv] response
matrices.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unitree_rl_gym_tpu.physics import dynamics as dyn

# ---------------------------------------------------------------------------
# scalar algebra with trace-time constant folding
# ---------------------------------------------------------------------------

Scalar = Any  # float (trace-time constant) | jnp.ndarray (env batch)


def _is_const(x) -> bool:
    return isinstance(x, (int, float, np.floating))


def _add(a, b):
    if _is_const(a) and a == 0.0:
        return b
    if _is_const(b) and b == 0.0:
        return a
    if _is_const(a) and _is_const(b):
        return float(a) + float(b)
    return a + b


def _sub(a, b):
    if _is_const(b) and b == 0.0:
        return a
    if _is_const(a) and _is_const(b):
        return float(a) - float(b)
    if _is_const(a) and a == 0.0:
        return -b
    return a - b


def _mul(a, b):
    if _is_const(a):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if a == -1.0:
            return _neg(b)
    if _is_const(b):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
        if b == -1.0:
            return _neg(a)
    if _is_const(a) and _is_const(b):
        return float(a) * float(b)
    return a * b


def _neg(a):
    if _is_const(a):
        return -float(a)
    return -a


def _mac(acc, a, b):
    """acc + a*b with structural-zero folding."""
    return _add(acc, _mul(a, b))


def _dot(xs: Sequence, ys: Sequence):
    acc = 0.0
    for x, y in zip(xs, ys):
        acc = _mac(acc, x, y)
    return acc


# vec3 = (x, y, z); mat33 = ((..),(..),(..)) rows; svec = (vec3 ang, vec3 lin)


def v3_add(a, b):
    return tuple(_add(x, y) for x, y in zip(a, b))


def v3_sub(a, b):
    return tuple(_sub(x, y) for x, y in zip(a, b))


def v3_scale(a, s):
    return tuple(_mul(x, s) for x in a)


def v3_cross(a, b):
    return (
        _sub(_mul(a[1], b[2]), _mul(a[2], b[1])),
        _sub(_mul(a[2], b[0]), _mul(a[0], b[2])),
        _sub(_mul(a[0], b[1]), _mul(a[1], b[0])),
    )


def m33_vec(M, v):
    return tuple(_dot(row, v) for row in M)


def m33_T(M):
    return tuple(tuple(M[j][i] for j in range(3)) for i in range(3))


def m33_Tvec(M, v):
    return tuple(_dot((M[0][i], M[1][i], M[2][i]), v) for i in range(3))


def m33_mul(A, B):
    Bt = m33_T(B)
    return tuple(tuple(_dot(A[i], Bt[j]) for j in range(3)) for i in range(3))


def sv_add(a, b):
    return (v3_add(a[0], b[0]), v3_add(a[1], b[1]))


# ---------------------------------------------------------------------------
# static model
# ---------------------------------------------------------------------------


def _f3(a) -> Tuple[float, float, float]:
    return (float(a[0]), float(a[1]), float(a[2]))


def _fm33(M):
    return tuple(tuple(float(M[i][j]) for j in range(3)) for i in range(3))


@dataclasses.dataclass(frozen=True)
class SoAModel:
    """Trace-time constants extracted from :class:`dynamics.DynModel`.

    All numeric fields are Python floats / tuples so the algebra helpers can
    fold structural zeros. Contact points are permuted to be sorted by
    dynamic body so body<->point traffic is static slicing.
    """

    nb: int
    nj: int
    nv: int
    ncp: int
    nrb: int
    parent: Tuple[int, ...]
    axis: Tuple[Tuple[float, float, float], ...]
    Etree: Tuple
    rtree: Tuple
    # spatial inertia blocks (I about origin, m*skew(c), mass) per body
    I_blk: Tuple          # [(Ic 3x3, Hc 3x3, mass float), ...]
    armature: float
    dof_damping: Tuple[float, ...]
    dof_friction: Tuple[float, ...]
    dof_vel_limit: Tuple[float, ...]
    dof_lower: Tuple[float, ...]
    dof_upper: Tuple[float, ...]
    gravity: Tuple[float, float, float]
    base_mass: float
    # contact points (sorted by cp_dyn)
    cp_slice: Tuple[Tuple[int, int], ...]   # per dyn body [start, end)
    cp_pos: np.ndarray                      # [ncp, 3] body-frame offsets
    cp_radius: np.ndarray                   # [ncp]
    cp_rb: Tuple[Tuple[int, ...], ...]      # per report body: point indices
    cp_perm: np.ndarray                     # original -> sorted permutation
    # report bodies
    rb_dyn: Tuple[int, ...]
    rb_rot: Tuple
    rb_pos: Tuple
    # cholesky elimination order (joints first, base last: no cross-chain
    # fill-in for star-of-chains trees like quadrupeds/humanoids)
    chol_order: Tuple[int, ...]


def build_soa_model(model: dyn.DynModel) -> SoAModel:
    nb, nj, nv = model.nb, model.nj, model.nv
    I_sp = np.asarray(model.I_sp)
    I_blk = tuple(
        (_fm33(I_sp[i, :3, :3]), _fm33(I_sp[i, :3, 3:]), float(I_sp[i, 5, 5]))
        for i in range(nb)
    )
    cp_dyn = np.asarray(model.cp_dyn)
    perm = np.argsort(cp_dyn, kind="stable")
    cp_dyn_s = cp_dyn[perm]
    cp_body_s = np.asarray(model.cp_body)[perm]
    ncp = cp_dyn.shape[0]
    starts = np.searchsorted(cp_dyn_s, np.arange(nb))
    ends = np.searchsorted(cp_dyn_s, np.arange(nb) + 1)
    nrb = int(np.asarray(model.rb_rot).shape[0])
    cp_rb = tuple(
        tuple(int(i) for i in np.nonzero(cp_body_s == r)[0]) for r in range(nrb)
    )
    return SoAModel(
        nb=nb, nj=nj, nv=nv, ncp=ncp, nrb=nrb,
        parent=tuple(model.parent),
        axis=tuple(_f3(a) for a in np.asarray(model.joint_axis)),
        Etree=tuple(_fm33(E) for E in np.asarray(model.Etree)),
        rtree=tuple(_f3(r) for r in np.asarray(model.rtree)),
        I_blk=I_blk,
        armature=float(model.armature),
        dof_damping=tuple(float(d) for d in np.asarray(model.dof_damping)),
        dof_friction=tuple(float(f) for f in np.asarray(model.dof_friction)),
        dof_vel_limit=tuple(
            float(v) for v in np.asarray(model.dof_vel_limit)
        ),
        dof_lower=tuple(float(v) for v in np.asarray(model.dof_lower)),
        dof_upper=tuple(float(v) for v in np.asarray(model.dof_upper)),
        gravity=_f3(np.asarray(model.gravity)),
        base_mass=float(model.base_mass),
        cp_slice=tuple(
            (int(s), int(e)) for s, e in zip(starts, ends)
        ),
        cp_pos=np.asarray(model.cp_pos)[perm].astype(np.float32),
        cp_radius=np.asarray(model.cp_radius)[perm].astype(np.float32),
        cp_rb=cp_rb,
        cp_perm=perm,
        rb_dyn=tuple(int(i) for i in np.asarray(model.rb_dyn_idx)),
        rb_rot=tuple(_fm33(R) for R in np.asarray(model.rb_rot)),
        rb_pos=tuple(_f3(p) for p in np.asarray(model.rb_pos)),
        chol_order=tuple(range(6, nv)) + tuple(range(6)),
    )


# ---------------------------------------------------------------------------
# quaternion / joint rotation (scalar SoA)
# ---------------------------------------------------------------------------


def quat_to_rotmat_s(q):
    """xyzw quaternion (4 scalars) -> 3x3 rotation (body->world)."""
    x, y, z, w = q
    x2, y2, z2 = _add(x, x), _add(y, y), _add(z, z)
    xx, yy, zz = _mul(x, x2), _mul(y, y2), _mul(z, z2)
    xy, xz, yz = _mul(x, y2), _mul(x, z2), _mul(y, z2)
    wx, wy, wz = _mul(w, x2), _mul(w, y2), _mul(w, z2)
    return (
        (_sub(1.0, _add(yy, zz)), _sub(xy, wz), _add(xz, wy)),
        (_add(xy, wz), _sub(1.0, _add(xx, zz)), _sub(yz, wx)),
        (_sub(xz, wy), _add(yz, wx), _sub(1.0, _add(xx, yy))),
    )


def joint_rot_T(axis, q):
    """rot_axis semantics (spatial.py:136-148): R(axis, q)^T, Rodrigues with
    a constant unit axis — entries are affine in (cos q, sin q)."""
    c, s = jnp.cos(q), jnp.sin(q)
    ax, ay, az = axis
    one_c = _sub(1.0, c)
    # R = c*I + s*skew(a) + (1-c) a a^T ; return R^T
    R = [[0.0] * 3 for _ in range(3)]
    a = (ax, ay, az)
    sk = ((0.0, -az, ay), (az, 0.0, -ax), (-ay, ax, 0.0))
    for i in range(3):
        for j in range(3):
            t = _mul(_mul(a[i], a[j]), one_c)
            if i == j:
                t = _add(t, c)
            t = _mac(t, sk[i][j], s)
            R[i][j] = t
    return tuple(tuple(R[j][i] for j in range(3)) for i in range(3))


def quat_integrate_s(q, omega_w, dt):
    """q' = normalize(q + 0.5*dt*[w,0] ⊗ q) (math.quat_integrate)."""
    ox, oy, oz = omega_w
    x, y, z, w = q
    h = 0.5 * dt
    # quat_mul((ox,oy,oz,0), (x,y,z,w))
    dx = _mul(h, _add(_mul(ox, w), _sub(_mul(oy, z), _mul(oz, y))))
    dy = _mul(h, _add(_mul(oy, w), _sub(_mul(oz, x), _mul(ox, z))))
    dz = _mul(h, _add(_mul(oz, w), _sub(_mul(ox, y), _mul(oy, x))))
    dw = _mul(h, _neg(_add(_add(_mul(ox, x), _mul(oy, y)), _mul(oz, z))))
    x, y, z, w = _add(x, dx), _add(y, dy), _add(z, dz), _add(w, dw)
    n2 = _add(_add(_mul(x, x), _mul(y, y)), _add(_mul(z, z), _mul(w, w)))
    inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-18))
    return (_mul(x, inv), _mul(y, inv), _mul(z, inv), _mul(w, inv))


# ---------------------------------------------------------------------------
# spatial ops on ((ang vec3), (lin vec3)) pairs
# ---------------------------------------------------------------------------


def xform_motion_s(E, r, v):
    w, vl = v
    wB = m33_vec(E, w)
    vB = m33_vec(E, v3_sub(vl, v3_cross(r, w)))
    return (wB, vB)


def xform_force_inv_s(E, r, f):
    n, fl = f
    fA = m33_Tvec(E, fl)
    nA = v3_add(m33_Tvec(E, n), v3_cross(r, fA))
    return (nA, fA)


def cross_motion_s(v, m):
    w, vl = v
    mw, ml = m
    return (v3_cross(w, mw), v3_add(v3_cross(vl, mw), v3_cross(w, ml)))


def cross_force_s(v, f):
    w, vl = v
    n, fl = f
    return (v3_add(v3_cross(w, n), v3_cross(vl, fl)), v3_cross(w, fl))


def apply_inertia(blk, v, scale=1.0):
    """[n; f] = I_sp @ [w; vl] for I_sp = [[Ic, Hc],[Hc^T, m*1]],
    optionally scaled (base-mass DR, dynamics._scaled_inertias)."""
    Ic, Hc, m = blk
    w, vl = v
    n = v3_add(m33_vec(Ic, w), m33_vec(Hc, vl))
    f = v3_add(m33_Tvec(Hc, w), v3_scale(vl, m))
    if not (_is_const(scale) and scale == 1.0):
        n = v3_scale(n, scale)
        f = v3_scale(f, scale)
    return (n, f)


# ---------------------------------------------------------------------------
# FK / RNEA / CRBA (unrolled recursions)
# ---------------------------------------------------------------------------


def fk_s(m: SoAModel, bp, bq, q, v):
    """Returns (R_w [nb mat33], p_w [nb vec3], E_up [nj mat33], v_b [nb sv])."""
    E_up = []
    for j in range(m.nj):
        Ej = joint_rot_T(m.axis[j], q[j])
        E_up.append(m33_mul(Ej, m.Etree[j]))
    R0 = quat_to_rotmat_s(bq)
    R_w: List = [R0]
    p_w: List = [bp]
    v_b: List = [((v[0], v[1], v[2]), (v[3], v[4], v[5]))]
    for i in range(1, m.nb):
        par, j = m.parent[i], i - 1
        R_w.append(m33_mul(R_w[par], m33_T(E_up[j])))
        p_w.append(v3_add(p_w[par], m33_vec(R_w[par], m.rtree[j])))
        vi = xform_motion_s(E_up[j], m.rtree[j], v_b[par])
        qd = v[6 + j]
        S_qd = (v3_scale(m.axis[j], qd), (0.0, 0.0, 0.0))
        v_b.append(sv_add(vi, S_qd))
    return R_w, p_w, E_up, v_b


def velocity_prop_s(m: SoAModel, E_up, v):
    v_b: List = [((v[0], v[1], v[2]), (v[3], v[4], v[5]))]
    for i in range(1, m.nb):
        j = i - 1
        vi = xform_motion_s(E_up[j], m.rtree[j], v_b[m.parent[i]])
        S_qd = (v3_scale(m.axis[j], v[6 + j]), (0.0, 0.0, 0.0))
        v_b.append(sv_add(vi, S_qd))
    return v_b


def force_backward_s(m: SoAModel, E_up, f_b):
    """Adjoint of velocity_prop_s: per-body spatial forces (body coords) ->
    generalized force [nv] (the backward half of dynamics.bias_forces)."""
    f = list(f_b)
    tau = [0.0] * m.nj
    for i in range(m.nb - 1, 0, -1):
        j = i - 1
        tau[j] = _dot(m.axis[j], f[i][0])
        f[m.parent[i]] = sv_add(
            f[m.parent[i]], xform_force_inv_s(E_up[j], m.rtree[j], f[i])
        )
    n0, f0 = f[0]
    return list(n0) + list(f0) + tau


def bias_s(m: SoAModel, R_w, E_up, v_b, v, mass_scale):
    """RNEA with qdd=0, f_ext=0 (dynamics.bias_forces)."""
    g = m.gravity
    g_body = m33_Tvec(R_w[0], g)
    a: List = [((0.0, 0.0, 0.0), tuple(_neg(x) for x in g_body))]
    for i in range(1, m.nb):
        j = i - 1
        ai = xform_motion_s(E_up[j], m.rtree[j], a[m.parent[i]])
        S_qd = (v3_scale(m.axis[j], v[6 + j]), (0.0, 0.0, 0.0))
        a.append(sv_add(ai, cross_motion_s(v_b[i], S_qd)))
    f_b = []
    for i in range(m.nb):
        scale = mass_scale if i == 0 else 1.0
        fi = apply_inertia(m.I_blk[i], a[i], scale)
        fi = sv_add(fi, cross_force_s(v_b[i], apply_inertia(m.I_blk[i], v_b[i], scale)))
        f_b.append(fi)
    return force_backward_s(m, E_up, f_b)


def _inertia_to_parent(E, r, blk):
    """(Ic, Hc, Mc) block transform X^T I X for X=(E,r) (spatial.py:129-133).
    Blocks here are full 3x3s (Mc dense after accumulation)."""
    Ic, Hc, Mc = blk
    sk = ((0.0, _neg(r[2]), r[1]), (r[2], 0.0, _neg(r[0])), (_neg(r[1]), r[0], 0.0))
    F = tuple(
        tuple(_neg(_dot(E[i], (sk[0][j], sk[1][j], sk[2][j]))) for j in range(3))
        for i in range(3)
    )  # F = -E @ skew(r)
    # I X = [[Ic E + Hc F, Hc E], [Hc^T E + Mc F, Mc E]]
    IcE = m33_mul(Ic, E)
    HcF = m33_mul(Hc, F)
    HcE = m33_mul(Hc, E)
    HcTE = m33_mul(m33_T(Hc), E)
    McF = m33_mul(Mc, F)
    McE = m33_mul(Mc, E)
    A = tuple(tuple(_add(IcE[i][j], HcF[i][j]) for j in range(3)) for i in range(3))
    C = tuple(tuple(_add(HcTE[i][j], McF[i][j]) for j in range(3)) for i in range(3))
    # X^T (I X): top = E^T A + F^T C ; coupling = E^T HcE + F^T McE ; mass = E^T McE
    def mTa_add(P, Q, M1, M2):
        # P^T M1 + Q^T M2
        return tuple(
            tuple(
                _add(
                    _dot((P[0][i], P[1][i], P[2][i]), (M1[0][j], M1[1][j], M1[2][j])),
                    _dot((Q[0][i], Q[1][i], Q[2][i]), (M2[0][j], M2[1][j], M2[2][j])),
                )
                for j in range(3)
            )
            for i in range(3)
        )
    Ip = mTa_add(E, F, A, C)
    Hp = mTa_add(E, F, HcE, McE)
    Mp = tuple(
        tuple(
            _dot((E[0][i], E[1][i], E[2][i]), (McE[0][j], McE[1][j], McE[2][j]))
            for j in range(3)
        )
        for i in range(3)
    )
    return (Ip, Hp, Mp)


def _blk_full(blk, scale=1.0):
    """Constant (Ic, Hc, m) -> dense-block (Ic, Hc, Mc) with opt. scaling."""
    Ic, Hc, mass = blk
    Mc = ((mass, 0.0, 0.0), (0.0, mass, 0.0), (0.0, 0.0, mass))
    if _is_const(scale) and scale == 1.0:
        return (Ic, Hc, Mc)
    sc = lambda M: tuple(tuple(_mul(M[i][j], scale) for j in range(3)) for i in range(3))
    return (sc(Ic), sc(Hc), sc(Mc))


def crba_s(m: SoAModel, E_up, mass_scale) -> Dict[Tuple[int, int], Scalar]:
    """Joint-space inertia as a sparse dict {(i,j): scalar}, i >= j
    (dynamics.mass_matrix)."""
    Ic = [
        _blk_full(m.I_blk[i], mass_scale if i == 0 else 1.0) for i in range(m.nb)
    ]
    for i in range(m.nb - 1, 0, -1):
        j = i - 1
        t = _inertia_to_parent(E_up[j], m.rtree[j], Ic[i])
        p = m.parent[i]
        Ic[p] = tuple(
            tuple(
                tuple(_add(Ic[p][b][r][c], t[b][r][c]) for c in range(3))
                for r in range(3)
            )
            for b in range(3)
        )
    H: Dict[Tuple[int, int], Scalar] = {}
    # base 6x6 block: [[Ic0, Hc0],[Hc0^T, Mc0]]
    I0, H0, M0 = Ic[0]
    for r in range(3):
        for c in range(3):
            if r >= c:
                H[(r, c)] = I0[r][c]
                H[(3 + r, 3 + c)] = M0[r][c]
            H[(3 + r, c)] = H0[c][r]  # (Hc^T)[r][c]
    for i in range(1, m.nb):
        j = i - 1
        # F = Ic[i] @ S, S = [axis; 0]
        Icb, Hcb, _ = Ic[i]
        Fn = m33_vec(Icb, m.axis[j])
        Ff = m33_vec(tuple(tuple(Hcb[r][c] for r in range(3)) for c in range(3)), m.axis[j])  # Hc^T axis
        H[(6 + j, 6 + j)] = _add(_dot(m.axis[j], Fn), m.armature)
        F = (Fn, Ff)
        k = i
        while m.parent[k] != -1:
            F = xform_force_inv_s(E_up[k - 1], m.rtree[k - 1], F)
            k = m.parent[k]
            if k == 0:
                for r in range(3):
                    H[(6 + j, r)] = F[0][r]
                    H[(6 + j, 3 + r)] = F[1][r]
            else:
                jj = k - 1
                H[(6 + j, 6 + jj)] = _dot(m.axis[jj], F[0])
    return H


# ---------------------------------------------------------------------------
# sparse Cholesky (dict-based, explicit elimination order)
# ---------------------------------------------------------------------------


def chol_factor_s(H: Dict[Tuple[int, int], Scalar], order: Sequence[int]):
    """L D^{1/2} factor of the permuted H; returns (L dict keyed on permuted
    positions, rinv list of 1/sqrt(diag)). Structural zeros never emitted —
    for star-of-chains trees the joint block stays block-diagonal and only
    the trailing base rows fill in."""
    n = len(order)
    pos = {v: i for i, v in enumerate(order)}

    def h(i, j):  # permuted lookup, H stored lower
        a, b = order[i], order[j]
        if a < b:
            a, b = b, a
        return H.get((a, b), 0.0)

    L: Dict[Tuple[int, int], Scalar] = {}
    rinv: List[Scalar] = [0.0] * n
    for j in range(n):
        for i in range(j, n):
            s = h(i, j)
            for k in range(j):
                lik = L.get((i, k))
                ljk = L.get((j, k))
                if lik is not None and ljk is not None:
                    s = _sub(s, _mul(lik, ljk))
            if i == j:
                rinv[j] = jax.lax.rsqrt(jnp.maximum(s, 1e-12))
                L[(j, j)] = _mul(s, rinv[j])
            else:
                if _is_const(s) and s == 0.0:
                    continue
                L[(i, j)] = _mul(s, rinv[j])
    return L, rinv, pos


def chol_solve_s(L, rinv, pos, order, b: Sequence[Scalar]):
    """Solve H x = b given the factor from chol_factor_s. b in natural
    indexing; returns x in natural indexing."""
    n = len(order)
    y: List[Scalar] = [0.0] * n
    for i in range(n):
        s = b[order[i]]
        for k in range(i):
            lik = L.get((i, k))
            if lik is not None and not (_is_const(y[k]) and y[k] == 0.0):
                s = _sub(s, _mul(lik, y[k]))
        y[i] = _mul(s, rinv[i])
    x: List[Scalar] = [0.0] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            lki = L.get((k, i))
            if lki is not None and not (_is_const(x[k]) and x[k] == 0.0):
                s = _sub(s, _mul(lki, x[k]))
        x[i] = _mul(s, rinv[i])
    out = [0.0] * n
    for i in range(n):
        out[order[i]] = x[i]
    return out


# ---------------------------------------------------------------------------
# contact (point dim vectorized; env dims = trailing shape S)
# ---------------------------------------------------------------------------


def _pc(arr: np.ndarray, S_ndim: int):
    """Per-point constant [ncp]/[ncp,k] -> broadcastable against (ncp,)+S."""
    return jnp.asarray(arr, jnp.float32).reshape(arr.shape[:1] + (1,) * S_ndim)


def _gather(m: SoAModel, vals: Sequence[Scalar]):
    """Per-dyn-body scalars -> per-point array (ncp,)+S via static slices
    (points sorted by body)."""
    pieces = []
    shape = None
    for v in vals:
        if not _is_const(v):
            shape = v.shape
            break
    assert shape is not None
    for b in range(m.nb):
        s, e = m.cp_slice[b]
        if e == s:
            continue
        v = vals[b]
        if _is_const(v):
            v = jnp.full(shape, float(v), jnp.float32)
        pieces.append(jnp.broadcast_to(v[None], (e - s,) + shape))
    return jnp.concatenate(pieces, axis=0)


def _scatter_sum(m: SoAModel, parr):
    """Per-point array (ncp,)+S -> per-dyn-body list of scalars (sum)."""
    out = []
    for b in range(m.nb):
        s, e = m.cp_slice[b]
        if e == s:
            out.append(0.0)
        else:
            out.append(jnp.sum(parr[s:e], axis=0))
    return out


def point_world_positions_s(m: SoAModel, R_w, p_w, rc_c=None):
    """World contact-point kinematics from body FK: returns
    (r_w, x_w) — 3-lists of ((ncp,)+S) world lever arms and point
    positions. Shared by the contact solve and the external terrain
    height sampler (backend.sample_point_heights) so both evaluate the
    heightfield at identical coordinates."""
    if rc_c is None:
        S_ndim = p_w[0][0].ndim          # number of trailing batch dims
        rc_c = [_pc(m.cp_pos[:, k], S_ndim) for k in range(3)]
    r_w = []   # 3 x (ncp,)+S world lever arms  r_w = R_b @ rc per point
    for i in range(3):
        per_body = []
        for b in range(m.nb):
            s, e = m.cp_slice[b]
            if e == s:
                continue
            piece = 0.0
            for k in range(3):
                piece = piece + rc_c[k][s:e] * R_w[b][i][k][None]
            per_body.append(piece)
        r_w.append(jnp.concatenate(per_body, axis=0))
    pg = [_gather(m, [p_w[b][i] for b in range(m.nb)]) for i in range(3)]
    x_w = [pg[i] + r_w[i] for i in range(3)]
    return r_w, x_w


def contact_solve_s(
    m: SoAModel,
    params,
    E_up,
    R_w,
    p_w,
    v_b,
    chol,               # (L, rinv, pos) factor of H
    v: List[Scalar],    # [nv] free velocity
    m_eff_n: np.ndarray,
    m_eff_t: np.ndarray,
    friction_env: Scalar,
    dt: float,
    ground_fn=None,
    pconsts=None,
    gh_frozen=None,
    cstiff=None,
):
    """PGS impulse solve (contact.contact_solve semantics). Returns
    (v_new [nv scalars], pn (ncp,)+S, pt ((ncp,)+S x2)).

    ``gh_frozen``: pre-sampled per-point ground heights ((ncp,)+S), used
    instead of calling ``ground_fn`` — the Pallas terrain path samples the
    heightfield once per control step outside the kernel (backend.py) and
    passes the result in (heights are frozen across the decimation loop;
    see physics/pallas_step.py)."""
    L, rinv, pos = chol
    S_ndim = None
    for x in v:
        if not _is_const(x):
            S_ndim = x.ndim
            shape = x.shape
            break
    mu = _mul(0.5, _add(params.terrain_friction, friction_env))

    # frozen contact geometry: world point positions from the substep-start
    # FK. Rotations are applied at body level and only the world-frame lever
    # arm r_w = x_w - p_b is retained per point (v_pt = v_w + w_w x r_w is
    # the body-frame formulation rotated into world, fewer live point
    # arrays for the Pallas kernel's VMEM budget).
    # per-point constants: broadcastable (ncp, 1...) host constants by
    # default; the Pallas backend passes them pre-broadcast as kernel inputs
    # (pallas kernels cannot capture array constants).
    if pconsts is None:
        rc_c = [_pc(m.cp_pos[:, k], S_ndim) for k in range(3)]
        radius_c = _pc(m.cp_radius, S_ndim)
        men = _pc(m_eff_n, S_ndim)
        met = _pc(m_eff_t, S_ndim)
    else:
        rc_c = pconsts["rc"]
        radius_c = pconsts["radius"]
        men = pconsts["men"]
        met = pconsts["met"]

    r_w, x_w = point_world_positions_s(m, R_w, p_w, rc_c)
    if gh_frozen is not None:
        gh = gh_frozen
    elif ground_fn is not None:
        gh = ground_fn(jnp.stack([x_w[0], x_w[1]], axis=-1))
    else:
        gh = 0.0
    phi = radius_c + gh - x_w[2]
    active = phi > 0.0
    activef = active.astype(jnp.float32)
    v_bias = jnp.minimum(
        params.baumgarte * jnp.maximum(phi, 0.0) / dt,
        params.max_depenetration_velocity,
    )
    if cstiff is not None:
        # per-env contact-stiffness DR scale (broadcast over the point axis)
        v_bias = v_bias * cstiff[None]

    # block-Jacobi scaling: 1 / #active points on the same dyn body
    n_active = _scatter_sum(m, activef)
    jacobi = 1.0 / jnp.maximum(_gather(m, n_active), 1.0)

    kn = params.relaxation * jacobi * men
    kt = params.relaxation * jacobi * met
    mu_b = mu if _is_const(mu) else mu[None]

    def point_vels(v_b_list):
        """Body spatial velocities -> world point velocities (3 arrays):
        v_pt = R_b(vl + w x rc) = v_w + w_w x r_w (rotate at body level)."""
        w_w, l_w = [], []
        for b in range(m.nb):
            wb, lb = v_b_list[b]
            w_w.append(m33_vec(R_w[b], wb))
            l_w.append(m33_vec(R_w[b], lb))
        wg = [_gather(m, [w_w[b][i] for b in range(m.nb)]) for i in range(3)]
        lg = [_gather(m, [l_w[b][i] for b in range(m.nb)]) for i in range(3)]
        return [
            lg[0] + wg[1] * r_w[2] - wg[2] * r_w[1],
            lg[1] + wg[2] * r_w[0] - wg[0] * r_w[2],
            lg[2] + wg[0] * r_w[1] - wg[1] * r_w[0],
        ]

    def gen_force(dp):
        """World point impulses (3 arrays) -> generalized impulse [nv]."""
        # torque about body origin (world): r_w x dp
        n_w = [
            r_w[1] * dp[2] - r_w[2] * dp[1],
            r_w[2] * dp[0] - r_w[0] * dp[2],
            r_w[0] * dp[1] - r_w[1] * dp[0],
        ]
        nb_sum = [_scatter_sum(m, n_w[i]) for i in range(3)]   # [3][nb]
        fb_sum = [_scatter_sum(m, dp[i]) for i in range(3)]
        f_b = []
        for b in range(m.nb):
            nw = (nb_sum[0][b], nb_sum[1][b], nb_sum[2][b])
            fw = (fb_sum[0][b], fb_sum[1][b], fb_sum[2][b])
            f_b.append((m33_Tvec(R_w[b], nw), m33_Tvec(R_w[b], fw)))
        return force_backward_s(m, E_up, f_b)

    nv = m.nv
    zero_p = jnp.zeros((m.ncp,) + shape, jnp.float32)

    def iteration(_i, carry):
        vv, pn, ptx, pty = carry
        vv = list(vv)
        vb = velocity_prop_s(m, E_up, vv)
        vp = point_vels(vb)
        vn = vp[2]
        dpn = kn * (v_bias - vn)
        pn_new = jnp.where(active, jnp.maximum(pn + dpn, 0.0), 0.0)
        dpn = pn_new - pn
        dptx = jnp.where(active, -kt * vp[0], 0.0)
        dpty = jnp.where(active, -kt * vp[1], 0.0)
        ptx_n, pty_n = ptx + dptx, pty + dpty
        pt_norm = jnp.sqrt(ptx_n * ptx_n + pty_n * pty_n)
        cone = mu_b * pn_new
        scale = jnp.where(pt_norm > cone, cone / (pt_norm + 1e-9), 1.0)
        ptx_n, pty_n = ptx_n * scale, pty_n * scale
        dptx, dpty = ptx_n - ptx, pty_n - pty
        f_gen = gen_force([dptx, dpty, dpn])
        dv = chol_solve_s(L, rinv, pos, m.chol_order, f_gen)
        vv = tuple(_add(vv[k], dv[k]) for k in range(nv))
        return (vv, pn_new, ptx_n, pty_n)

    carry = (
        tuple(jnp.broadcast_to(jnp.asarray(x, jnp.float32), shape)
              if _is_const(x) else x for x in v),
        zero_p, zero_p, zero_p,
    )
    # fori_loop (not scan): this loop also runs inside the Pallas kernel,
    # where only fori-shaped control flow lowers.
    vv, pn, ptx, pty = jax.lax.fori_loop(
        0, params.iterations, iteration, carry
    )
    return list(vv), pn, (ptx, pty)


# ---------------------------------------------------------------------------
# full control step (decimated) — shared by XLA and Pallas backends
# ---------------------------------------------------------------------------


def substep_s(m, params, pd_kp, pd_kd, pd_lim, clip_torque, sim_dt,
              bp, bq, q, v, target, friction_env, mass_scale,
              m_eff_n, m_eff_t, ground_fn=None, pconsts=None,
              gh_frozen=None, cstiff=None):
    """One physics substep (engine.control_step inner body). All args/returns
    are scalar lists / tuples; shapes ride along implicitly."""
    R_w, p_w, E_up, v_b = fk_s(m, bp, bq, q, v)

    tau = [
        _sub(_mul(pd_kp[j], _sub(target[j], q[j])), _mul(pd_kd[j], v[6 + j]))
        for j in range(m.nj)
    ]
    if clip_torque:
        tau = [jnp.clip(tau[j], -pd_lim[j], pd_lim[j]) for j in range(m.nj)]

    bias = bias_s(m, R_w, E_up, v_b, v, mass_scale)
    H = crba_s(m, E_up, mass_scale)
    chol = chol_factor_s(H, m.chol_order)
    rhs = []
    for k in range(m.nv):
        if k < 6:
            rhs.append(_neg(bias[k]))
        else:
            j = k - 6
            passive = _sub(
                _mul(-m.dof_damping[j], v[6 + j]),
                _mul(m.dof_friction[j], jnp.tanh(v[6 + j] / 0.1))
                if m.dof_friction[j] != 0.0 else 0.0,
            )
            rhs.append(_sub(_add(tau[j], passive), bias[k]))
    qdd = chol_solve_s(chol[0], chol[1], chol[2], m.chol_order, rhs)
    v_free = [_add(v[k], _mul(sim_dt, qdd[k])) for k in range(m.nv)]

    v_new, pn, pt = contact_solve_s(
        m, params, E_up, R_w, p_w, v_b, chol, v_free,
        m_eff_n, m_eff_t, friction_env, sim_dt, ground_fn=ground_fn,
        pconsts=pconsts, gh_frozen=gh_frozen, cstiff=cstiff,
    )

    # PhysX-parity joint velocity clamp (engine.control_step has the same):
    # bounds the energy the explicit contact solve can pump into qd.
    for j in range(m.nj):
        lim = m.dof_vel_limit[j]
        if np.isfinite(lim):
            v_new[6 + j] = jnp.clip(v_new[6 + j], -lim, lim)
    # PhysX rigid-body velocity caps on the base (ContactParams doc):
    # prevents fp32 overflow -> NaN in diverging contact states.
    for k in range(3):
        v_new[k] = jnp.clip(
            v_new[k], -params.max_angular_velocity,
            params.max_angular_velocity,
        )
        v_new[3 + k] = jnp.clip(
            v_new[3 + k], -params.max_linear_velocity,
            params.max_linear_velocity,
        )

    # integrate (dynamics.integrate): semi-implicit, old-quat frames
    R0 = R_w[0]
    om_w = m33_vec(R0, (v_new[0], v_new[1], v_new[2]))
    vel_w = m33_vec(R0, (v_new[3], v_new[4], v_new[5]))
    bp = tuple(_add(bp[i], _mul(sim_dt, vel_w[i])) for i in range(3))
    bq = quat_integrate_s(bq, om_w, sim_dt)
    q = [_add(q[j], _mul(sim_dt, v_new[6 + j])) for j in range(m.nj)]

    # hard joint limits (PhysX constraint ≈ projection; engine.control_step
    # has the same): clamp q, zero qd into the limit
    for j in range(m.nj):
        lo, up = m.dof_lower[j], m.dof_upper[j]
        if not (np.isfinite(lo) or np.isfinite(up)):
            continue
        qd = v_new[6 + j]
        qd = jnp.where(q[j] < lo, jnp.maximum(qd, 0.0), qd)
        qd = jnp.where(q[j] > up, jnp.minimum(qd, 0.0), qd)
        v_new[6 + j] = qd
        q[j] = jnp.clip(q[j], lo, up)
    return bp, bq, q, v_new, tau, pn, pt


def rb_states_s(m: SoAModel, R_w, p_w, v_b):
    """World pos/vel of report bodies (engine.rb_states).

    ``rb_rot`` (report-frame orientation) is intentionally unused: only
    world positions/velocities/net contact forces of report bodies are
    ever reported, never orientations, and ``rb_pos`` is the report
    origin expressed in the DYN frame (models/urdf.py:119) — so
    p = p_b + R_b @ rb_pos and v = R_b (vl + w x rb_pos) are exact for
    arbitrary rb_rot (rotated fixed-collapsed links included)."""
    pos, vel = [], []
    for r in range(m.nrb):
        b = m.rb_dyn[r]
        # offset: p = p_b + R_b rb_pos ; v = R_b (vl + w x rb_pos)
        rp = m.rb_pos[r]
        w, vl = v_b[b]
        p = v3_add(p_w[b], m33_vec(R_w[b], rp))
        vloc = v3_add(vl, v3_cross(w, rp))
        vw = m33_vec(R_w[b], vloc)
        pos.append(p)
        vel.append(vw)
    return pos, vel


def cf_rb_s(m: SoAModel, pn, pt, dt, shape):
    """Per-report-body world contact force [nrb][3] from final impulses."""
    fx, fy, fz = pt[0] / dt, pt[1] / dt, pn / dt
    out = []
    zeros = jnp.zeros(shape, jnp.float32)
    for r in range(m.nrb):
        idx = m.cp_rb[r]
        if not idx:
            out.append((zeros, zeros, zeros))
        else:
            out.append((
                sum(fx[i] for i in idx),
                sum(fy[i] for i in idx),
                sum(fz[i] for i in idx),
            ))
    return out
