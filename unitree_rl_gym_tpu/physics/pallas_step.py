"""Fused Pallas TPU kernel for the decimated physics control step.

One ``pallas_call`` executes the entire ``decimation x (PD -> FK -> CRBA ->
RNEA -> Cholesky -> PGS contact -> integrate)`` pipeline for a block of
environments with every intermediate resident in VMEM. This is the hot 95%
of training time (the vmapped XLA formulation round-trips HBM between each
of its ~hundreds of small ops; measured ~18 ms per 4096-env substep on v5e
vs the HBM floor of <1 ms).

Layout: the env batch is the vector axis. Host arrays ``[N, k]`` are
transposed/reshaped to ``(k, 8, N//8)`` so that inside the kernel each
physical scalar is one ``(8, BE//8)`` VMEM tile (fp32 native tile at
BE=1024) and all the scalar SoA algebra of :mod:`physics.soa` lowers to
full-width VPU ops. Contact-point quantities are ``(ncp, 8, BE//8)``.

Grid: 1-D over env blocks; blocks are independent (env-parallel).
Terrain: the heightfield never enters the kernel. Per-point ground heights
arrive as a dense ``gh`` operand (ncp, 8, BE//8), frozen across the
decimation loop (points move O(v*dt*decimation) ~ 2 cm between control
steps, inside the soft-contact regime the Baumgarte stabilization
absorbs). The env computes ``gh`` via the lag-1 carry: the kernel outputs
end-of-step point xy (``aux["p_xy"]``), and the env looks heights up in
per-env resident heightfield windows with a tent-weight einsum
(envs/base_env.py step; TerrainGrid.height_in_window) — no in-scan
heightfield gather and no extra XLA FK anywhere (doc/profile_r3.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unitree_rl_gym_tpu.physics import dynamics as dyn
from unitree_rl_gym_tpu.physics import engine as eng
from unitree_rl_gym_tpu.physics import soa


BLOCK_ENVS = 1024   # env block: (8, 128) fp32 tiles are the minimum legal block


def _vmem_rows(m, terrain: bool = False) -> int:
    """Rough count of live (8, 128) scalar tiles in the kernel: state
    in/out + targets, contact-solver carries/intermediates (~4 rows per
    point) + the optional terrain gh input (1 row per point), per-body
    outputs. Terrain adds the 2 point-xy output rows per point (the lag-1
    height-sampling carry, see control_step_pallas ``gh``). The x3
    live-intermediate factor in _fits_vmem is calibrated against G1 @
    BE=1024 (17.35 MB scoped vmem measured when the 6*ncp point constants
    were also broadcast tiles)."""
    return (
        5 * m.ncp + 9 * m.nrb + 4 * m.nj + 2 * m.nv + 32
        + (2 * m.ncp if terrain else 0)
    )


def _fits_vmem(m, terrain: bool = False) -> bool:
    return 3 * _vmem_rows(m, terrain) * BLOCK_ENVS * 4 <= 15 * 1024 * 1024


def supports(N: int, m, terrain: bool = False) -> bool:
    """Whether the fused kernel can run this batch/model (backend.py's
    auto dispatch falls back to the XLA SoA program otherwise)."""
    return N % BLOCK_ENVS == 0 and _fits_vmem(m, terrain)


def _pick_block(N: int, m, terrain: bool = False) -> int:
    if not supports(N, m, terrain):
        raise ValueError(
            f"pallas physics backend needs N % {BLOCK_ENVS} == 0 and a model "
            f"that fits VMEM (N={N}, est rows={_vmem_rows(m, terrain)})"
        )
    return BLOCK_ENVS


def _to_tiles(a, N):
    """[N, k] (or [N]) -> (k, 8, N//8) fp32."""
    if a.ndim == 1:
        a = a[:, None]
    k = a.shape[1]
    return jnp.transpose(a.astype(jnp.float32)).reshape(k, 8, N // 8)


def _from_tiles(t, N):
    """(k, 8, N//8) -> [N, k] (squeezed if k == 1)."""
    k = t.shape[0]
    out = jnp.transpose(t.reshape(k, N))
    return out


def _kernel(m, params, kp, kd, lim, clip_torque, sim_dt, decimation,
            has_gh, has_cs, *refs):
    (bp_ref, bq_ref, q_ref, v_ref, tgt_ref, fric_ref, mass_ref,
     pc_ref) = refs[:8]
    k = 8
    gh_ref = refs[k] if has_gh else None
    k += int(has_gh)
    cs_ref = refs[k] if has_cs else None
    k += int(has_cs)
    out_refs = refs[k:]
    (obp, obq, oq, ov, otau, ocf, orbp, orbv) = out_refs[:8]
    opxy = out_refs[8] if has_gh else None
    nj, nv, ncp, nrb = m.nj, m.nv, m.ncp, m.nrb
    S = bp_ref.shape[1:]

    bp = tuple(bp_ref[i] for i in range(3))
    bq = tuple(bq_ref[i] for i in range(4))
    q = tuple(q_ref[j] for j in range(nj))
    v = tuple(v_ref[k] for k in range(nv))
    target = tuple(tgt_ref[j] for j in range(nj))
    fric = fric_ref[0]
    mass = mass_ref[0]
    # point constants, pre-broadcast host-side (see control_step_pallas):
    # rows [0:3ncp) cp offsets xyz, [3ncp:4ncp) radius, then m_eff n/t
    pconsts = {
        "rc": [pc_ref[k * ncp:(k + 1) * ncp] for k in range(3)],
        "radius": pc_ref[3 * ncp:4 * ncp],
        "men": pc_ref[4 * ncp:5 * ncp],
        "met": pc_ref[5 * ncp:6 * ncp],
    }

    zero = jnp.zeros(S, jnp.float32)
    zero_p = jnp.zeros((ncp,) + S, jnp.float32)
    # terrain: per-point ground heights computed once per control step
    # outside the kernel (the env's lag-1 p_xy carry); frozen across the
    # decimation loop (points move O(v*dt*decimation) ~ cm between samples)
    gh = gh_ref[...] if has_gh else None
    # per-env contact-stiffness DR scale (DomainRandCfg)
    cs = cs_ref[0] if has_cs else None

    def body(_, carry):
        bp, bq, q, v, _tau, _pn, _ptx, _pty = carry
        bp2, bq2, q2, v2, tau, pn, pt = soa.substep_s(
            m, params, kp, kd, lim, clip_torque, sim_dt,
            bp, bq, list(q), list(v), list(target), fric, mass,
            None, None, ground_fn=None, pconsts=pconsts, gh_frozen=gh,
            cstiff=cs,
        )
        return (
            tuple(bp2), tuple(bq2), tuple(q2), tuple(v2), tuple(tau),
            pn, pt[0], pt[1],
        )

    carry0 = (bp, bq, q, v, (zero,) * nj, zero_p, zero_p, zero_p)
    bp, bq, q, v, tau, pn, ptx, pty = jax.lax.fori_loop(
        0, decimation, body, carry0
    )

    # post-loop refresh (engine.control_step tail): world kinematics of the
    # settled state + per-report-body contact forces from the last impulses.
    R_w, p_w, E_up, v_b = soa.fk_s(m, bp, bq, list(q), list(v))
    rb_pos, rb_vel = soa.rb_states_s(m, R_w, p_w, v_b)
    cf = soa.cf_rb_s(m, pn, (ptx, pty), sim_dt, S)
    if has_gh:
        # terrain lag-1 carry: end-of-step world point xy, so the NEXT
        # control step's heights can be gathered in XLA without re-running
        # FK (end-of-step-k positions == start-of-step-k+1 positions, i.e.
        # the sample is exactly as fresh as backend.sample_point_heights
        # was, minus its full XLA FK).
        _, x_w = soa.point_world_positions_s(
            m, R_w, p_w, rc_c=pconsts["rc"]
        )
        opxy[0:ncp] = x_w[0]
        opxy[ncp:2 * ncp] = x_w[1]

    for i in range(3):
        obp[i] = bp[i]
    for i in range(4):
        obq[i] = bq[i]
    for j in range(nj):
        oq[j] = q[j]
        otau[j] = tau[j]
    for k in range(nv):
        ov[k] = v[k]
    for r in range(nrb):
        for i in range(3):
            ocf[3 * r + i] = cf[r][i]
            orbp[3 * r + i] = rb_pos[r][i]
            orbv[3 * r + i] = rb_vel[r][i]


def control_step_pallas(model, cparams, pd, sim_dt, decimation, state,
                        target, friction, mass_scale, m_eff_n, m_eff_t,
                        interpret=False, gh=None, cstiff=None):
    """Pallas-backed drop-in for engine.control_step over the whole batch.

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (CPU-testable; also via env UTRL_PALLAS_INTERPRET=1).

    ``gh``: [ncp, N] per-contact-point ground heights (terrain), valid at
    step-start point positions and frozen across the decimation loop —
    the TPU-friendly heightfield formulation: the bilinear HBM gather
    happens in XLA outside the kernel, the kernel sees a dense operand.
    ROW layout (points lead, envs trail): a [ncp, N] array reshapes to
    the kernel's (ncp, 8, N//8) tiles for FREE, where the r4 [N, ncp]
    contract paid a full transpose per control step in each direction
    (for G1's 176 points that was ~280 MB/iter of pure layout traffic,
    doc/profile_r5.md). The caller obtains step-start heights either
    from the previous step's ``aux["p_xy"]`` output ([2*ncp, N] rows: x
    rows then y rows — the lag-free carry, envs/base_env.py) or from
    backend.sample_point_heights (one-off XLA FK)."""
    from unitree_rl_gym_tpu.physics import backend as pb
    m = pb.soa_model_for(model)

    import os

    interpret = interpret or os.environ.get("UTRL_PALLAS_INTERPRET") == "1"
    N = state.joint_q.shape[0]
    has_gh = gh is not None
    has_cs = cstiff is not None
    # interpret mode (CPU tests) has no (8,128) tile constraint — run the
    # whole batch as one block so small test batches work.
    BE = N if (interpret and N % 8 == 0) else _pick_block(N, m, has_gh)
    nj, nv, ncp, nrb = m.nj, m.nv, m.ncp, m.nrb

    kp = [float(x) for x in pd.kp]
    kd = [float(x) for x in pd.kd]
    lim = [float(x) for x in pd.torque_limit]
    men = np.asarray(m_eff_n)[m.cp_perm]
    met = np.asarray(m_eff_t)[m.cp_perm]

    lanes = BE // 8
    # point constants as (6*ncp, 1, 1): Pallas kernels can't capture array
    # constants, but a full-array block with unit tile dims is legal and
    # broadcasts against the (8, lanes) env tiles inside the kernel — vs a
    # pre-broadcast (6*ncp, 8, lanes) input this keeps G1's 176-point model
    # ~4 MB under the 16 MB scoped-VMEM limit.
    pc_rows = np.concatenate(
        [m.cp_pos[:, 0], m.cp_pos[:, 1], m.cp_pos[:, 2],
         m.cp_radius, men, met]
    ).astype(np.float32)                                  # [6*ncp]
    pc = jnp.asarray(pc_rows[:, None, None])

    inputs = [
        _to_tiles(state.base_pos, N),
        _to_tiles(state.base_quat, N),
        _to_tiles(state.joint_q, N),
        _to_tiles(state.v, N),
        _to_tiles(target, N),
        _to_tiles(friction, N),
        _to_tiles(mass_scale, N),
        pc,
    ]
    if has_gh:
        # [ncp, N] rows -> (ncp, 8, N//8) tiles: a pure reshape, no copy
        inputs.append(gh.astype(jnp.float32).reshape(ncp, 8, N // 8))
    if has_cs:
        inputs.append(_to_tiles(cstiff, N))      # (1, 8, N//8)

    def spec(k):
        return pl.BlockSpec(
            (k, 8, lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    in_specs = [spec(a.shape[0]) for a in inputs[:7]] + [
        pl.BlockSpec(
            (6 * ncp, 1, 1), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ] + ([spec(ncp)] if has_gh else []) + ([spec(1)] if has_cs else [])
    out_dims = [3, 4, nj, nv, nj, nrb * 3, nrb * 3, nrb * 3]
    if has_gh:
        out_dims.append(2 * ncp)                 # end-of-step point xy
    out_shape = [
        jax.ShapeDtypeStruct((k, 8, N // 8), jnp.float32) for k in out_dims
    ]
    out_specs = [spec(k) for k in out_dims]

    kern = partial(
        _kernel, m, cparams, kp, kd, lim, pd.clip_torque, sim_dt,
        decimation, has_gh, has_cs,
    )
    flops_per_env = 60_000 * decimation
    outs = pl.pallas_call(
        kern,
        grid=(N // BE,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_env * N,
            bytes_accessed=sum(int(np.prod(a.shape)) * 4 for a in inputs) * 2,
            transcendentals=200 * decimation * N,
        ),
        interpret=interpret,
    )(*inputs)

    bp, bq, q, v, tau, cf, rbp, rbv = outs[:8]
    new_state = eng.PhysicsState(
        base_pos=_from_tiles(bp, N),
        base_quat=_from_tiles(bq, N),
        joint_q=_from_tiles(q, N),
        v=_from_tiles(v, N),
    )
    aux = {
        "torques": _from_tiles(tau, N),
        "cf_rb": _from_tiles(cf, N).reshape(N, nrb, 3),
        "rb_pos_w": _from_tiles(rbp, N).reshape(N, nrb, 3),
        "rb_vel_w": _from_tiles(rbv, N).reshape(N, nrb, 3),
    }
    if has_gh:
        # (2*ncp, 8, N//8) tiles -> [2*ncp, N] rows: reshape only, the
        # transpose to [N, ncp, 2] is gone (see control_step_pallas doc)
        aux["p_xy"] = outs[8].reshape(2 * ncp, N)
    return new_state, aux


def control_step_pallas_sharded(model, cparams, pd, sim_dt, decimation,
                                state, target, friction, mass_scale,
                                m_eff_n, m_eff_t, mesh, interpret=False,
                                gh=None, cstiff=None):
    """The fused kernel under ``jax.shard_map`` over the ("env",) mesh: one
    kernel instance per chip on its local env block (parallel/mesh.py). All
    batched operands ride PartitionSpec("env") (including the optional
    terrain heights ``gh`` [N, ncp], sampled globally in XLA); there is no
    cross-chip traffic inside the step (envs are independent), so this
    composes with pjit'd training exactly like the XLA SoA path but at
    kernel speed."""
    from jax.sharding import PartitionSpec as P

    es = P("env")
    # optional per-env operands (terrain heights, contact-stiffness DR)
    # ride env shardings; absent ones stay out of the signature so
    # existing programs/caches are untouched. gh is ROW layout [ncp, N]
    # (points replicated, envs sharded on axis 1)
    opt = {}
    opt_specs = {}
    if gh is not None:
        opt["gh"] = gh
        opt_specs["gh"] = P(None, "env")
    if cstiff is not None:
        opt["cstiff"] = cstiff
        opt_specs["cstiff"] = es

    def local_step(state, target, friction, mass_scale, opt):
        return control_step_pallas(
            model, cparams, pd, sim_dt, decimation, state, target,
            friction, mass_scale, m_eff_n, m_eff_t, interpret=interpret,
            **opt,
        )

    # aux outputs: p_xy is [2*ncp, N] rows (env axis 1); everything else
    # leads with the env axis
    out_aux_spec = {k: es for k in
                    ("torques", "cf_rb", "rb_pos_w", "rb_vel_w")}
    if gh is not None:
        out_aux_spec["p_xy"] = P(None, "env")
    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(es, es, es, es, opt_specs),
        out_specs=(es, out_aux_spec),
        check_vma=False,
    )
    return fn(state, target, friction, mass_scale, opt)
