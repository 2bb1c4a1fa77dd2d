"""Deploy layer: sim2sim harness (MuJoCo oracle), real-robot controller
state machine on the mock transport, rotation/remote/CRC helpers."""

import os

import numpy as np
import pytest

from unitree_rl_gym_tpu import UNITREE_RL_GYM_TPU_ROOT_DIR

REF_PRETRAIN = "/root/reference/deploy/pre_train"


def _cfg_path(name):
    return os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR,
        "unitree_rl_gym_tpu/deploy/deploy_mujoco/configs", name,
    )


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_PRETRAIN, "g1/motion.pt")),
    reason="reference pretrained policy not available",
)
def test_sim2sim_g1_golden_policy_walks():
    """The upstream pretrained G1 policy must walk in our MuJoCo harness —
    validates the obs assembly / PD loop against the reference deploy
    contract (SURVEY.md §3.4)."""
    from unitree_rl_gym_tpu.deploy.deploy_mujoco.deploy_mujoco import (
        load_config, run,
    )

    cfg = load_config(_cfg_path("g1.yaml"))
    cfg["policy_path"] = os.path.join(REF_PRETRAIN, "g1/motion.pt")
    stats = run(cfg, headless=True, max_steps=2500)  # 5 s sim
    assert not stats["fell"], stats
    assert stats["distance_x"] > 1.0, stats          # 0.5 m/s command
    assert stats["mean_height"] > 0.6, stats


def test_sim2sim_g1_own_trained_policy_walks():
    """Our own TPU-trained G1 policy (checked in under resources/pre_train,
    trained by scripts/train.py --task=g1 for the reference's 10k
    iterations and exported by scripts/play.py) must walk in MuJoCo — the
    end-to-end Train -> Export -> Sim2Sim acceptance of SURVEY.md §4."""
    from unitree_rl_gym_tpu.deploy.deploy_mujoco.deploy_mujoco import (
        load_config, run,
    )

    cfg = load_config(_cfg_path("g1.yaml"))
    cfg["policy_path"] = os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR,
        "resources/pre_train/g1/policy_lstm_1.pt",
    )
    stats = run(cfg, headless=True, max_steps=2500)  # 5 s sim
    assert not stats["fell"], stats
    assert stats["distance_x"] > 1.0, stats          # 0.5 m/s command
    assert stats["mean_height"] > 0.6, stats


def test_sim2sim_h1_own_trained_policy_walks():
    """Our own TPU-trained H1 policy (scripts/train.py --task=h1, 10k
    iterations, exported by scripts/play.py) must walk in MuJoCo — the
    end-to-end Train -> Export -> Sim2Sim acceptance of SURVEY.md §4."""
    from unitree_rl_gym_tpu.deploy.deploy_mujoco.deploy_mujoco import (
        load_config, run,
    )

    cfg = load_config(_cfg_path("h1.yaml"))
    cfg["policy_path"] = os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR,
        "resources/pre_train/h1/policy_lstm_1.pt",
    )
    stats = run(cfg, headless=True, max_steps=2500)  # 5 s sim
    assert not stats["fell"], stats
    assert stats["distance_x"] > 1.0, stats          # 0.5 m/s command
    assert stats["mean_height"] > 0.9, stats


def test_sim2sim_h1_2_own_trained_policy_walks():
    """Our own TPU-trained H1_2 policy (scripts/train.py --task=h1_2, 10k
    iterations at 400 Hz sim / decimation 8, exported by scripts/play.py)
    must walk in MuJoCo."""
    from unitree_rl_gym_tpu.deploy.deploy_mujoco.deploy_mujoco import (
        load_config, run,
    )

    cfg = load_config(_cfg_path("h1_2.yaml"))
    cfg["policy_path"] = os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR,
        "resources/pre_train/h1_2/policy_lstm_1.pt",
    )
    stats = run(cfg, headless=True, max_steps=2500)  # 5 s sim
    assert not stats["fell"], stats
    assert stats["distance_x"] > 1.0, stats          # 0.5 m/s command
    assert stats["mean_height"] > 0.9, stats


def test_mujoco_scenes_load():
    import mujoco

    for robot, nu in [("g1_description", 12), ("h1", 10), ("h1_2", 12)]:
        m = mujoco.MjModel.from_xml_path(
            os.path.join(
                UNITREE_RL_GYM_TPU_ROOT_DIR,
                f"resources/robots/{robot}/scene.xml",
            )
        )
        assert m.nu == nu


def test_rotation_helper_against_scipy():
    from scipy.spatial.transform import Rotation as R

    from unitree_rl_gym_tpu.deploy.deploy_real.common.rotation_helper import (
        get_gravity_orientation, transform_imu_data,
    )

    rng = np.random.RandomState(0)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)          # wxyz
        got = get_gravity_orientation(q)
        rot = R.from_quat([q[1], q[2], q[3], q[0]])   # xyzw
        want = rot.inv().apply([0, 0, -1])
        np.testing.assert_allclose(got, -(-want), atol=1e-6)

        yaw = rng.uniform(-1, 1)
        yaw_omega = rng.uniform(-1, 1)
        omega = rng.randn(1, 3)
        q2, w2 = transform_imu_data(yaw, yaw_omega, q, omega)
        # scipy-based reference computation
        Rz = R.from_euler("z", yaw).as_matrix()
        R_torso = R.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        R_pelvis = R_torso @ Rz.T
        want_q = R.from_matrix(R_pelvis).as_quat()[[3, 0, 1, 2]]
        sign = np.sign(np.dot(q2, want_q))
        np.testing.assert_allclose(q2, want_q * sign, atol=1e-6)
        want_w = Rz @ omega[0] - np.array([0, 0, yaw_omega])
        np.testing.assert_allclose(w2, want_w, atol=1e-6)


def test_remote_controller_roundtrip():
    from unitree_rl_gym_tpu.deploy.deploy_real.common.remote_controller import (
        KeyMap, RemoteController,
    )

    rc = RemoteController()
    data = RemoteController.pack(
        buttons=(1 << KeyMap.A) | (1 << KeyMap.start),
        lx=0.25, rx=-0.5, ry=0.125, ly=0.75,
    )
    rc.set(data)
    assert rc.button[KeyMap.A] == 1
    assert rc.button[KeyMap.start] == 1
    assert rc.button[KeyMap.select] == 0
    assert abs(rc.lx - 0.25) < 1e-6
    assert abs(rc.ly - 0.75) < 1e-6


def test_crc_stability():
    from unitree_rl_gym_tpu.deploy.deploy_real.common.crc import (
        crc32_bytes, crc32_words,
    )

    assert crc32_words([0]) == crc32_words([0])
    assert crc32_words([1]) != crc32_words([2])
    assert crc32_bytes(b"\x01\x02\x03\x04") == crc32_words([0x04030201])


def _mock_controller(policy=None):
    from unitree_rl_gym_tpu.deploy.deploy_real.config import Config
    from unitree_rl_gym_tpu.deploy.deploy_real.deploy_real import Controller
    from unitree_rl_gym_tpu.deploy.deploy_real.transport import MockTransport

    cfg = Config(os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR,
        "unitree_rl_gym_tpu/deploy/deploy_real/configs/g1.yaml",
    ))
    transport = MockTransport("hg")
    policy = policy or (lambda obs: np.zeros(cfg.num_actions))
    ctrl = Controller(cfg, transport, policy=policy, sleep=lambda dt: None)
    return ctrl, transport, cfg


def test_controller_state_machine_on_mock_transport():
    from unitree_rl_gym_tpu.deploy.deploy_real.common.remote_controller import (
        KeyMap,
    )

    ctrl, transport, cfg = _mock_controller()

    # zero-torque until "start" pressed (scripted after 3 ticks)
    ticks = {"n": 0}
    orig_sleep = ctrl.sleep

    def sleep_and_press(dt):
        ticks["n"] += 1
        if ticks["n"] >= 3:
            transport.set_buttons(1 << KeyMap.start)

    ctrl.sleep = sleep_and_press
    ctrl.zero_torque_state()
    assert ticks["n"] >= 3
    zero_cmd = transport.sent[0]
    assert all(m.kp == 0 and m.kd == 0 for m in zero_cmd.motor_cmd)

    # move to default: 2 s of lerped position targets
    ctrl.sleep = lambda dt: None
    n_before = len(transport.sent)
    ctrl.move_to_default_pos()
    assert len(transport.sent) - n_before == int(2.0 / cfg.control_dt)
    last = transport.sent[-1]
    leg0 = cfg.leg_joint2motor_idx[0]
    assert abs(last.motor_cmd[leg0].q - cfg.default_angles[0]) < 0.05
    assert last.motor_cmd[leg0].kp == cfg.kps[0]

    # run tick: builds 47-dim obs, sends PD targets, stamps CRC
    transport.set_buttons(0)
    ctrl.run()
    cmd = transport.sent[-1]
    assert cmd.crc != 0
    assert abs(cmd.motor_cmd[leg0].q - cfg.default_angles[0]) < 1e-6
    # arm/waist holding targets applied
    aw0 = cfg.arm_waist_joint2motor_idx[0]
    assert cmd.motor_cmd[aw0].kp == cfg.arm_waist_kps[0]

    # damping exit
    ctrl.damp()
    assert all(m.kd == 8 for m in transport.sent[-1].motor_cmd)


def test_controller_obs_layout_matches_training():
    """Remote stick command must land in obs[6:9] scaled by cmd_scale*max_cmd
    (deploy_real.py:171-196)."""
    captured = {}

    def spy_policy(obs):
        captured["obs"] = obs.copy()
        return np.zeros(12)

    ctrl, transport, cfg = _mock_controller(policy=spy_policy)
    transport.set_buttons(0, ly=0.5, lx=0.2, rx=-0.4)
    ctrl.run()
    obs = captured["obs"]
    assert obs.shape == (47,)
    np.testing.assert_allclose(
        obs[6:9],
        np.array([0.5, -0.2, 0.4]) * cfg.cmd_scale * cfg.max_cmd,
        atol=1e-6,
    )
    # gravity (upright) ~ [0,0,-1]
    np.testing.assert_allclose(obs[3:6], [0, 0, -1], atol=1e-6)


def test_obs_layout_single_source():
    """deploy/obs_layout.py is the single obs-table source: segment offsets
    are the reference layout (deploy_mujoco.py:94-117) and the checked-in
    C++ header is exactly what the generator emits."""
    from unitree_rl_gym_tpu.deploy import obs_layout

    seg = obs_layout.layout_for(47, 12)
    assert (seg.ang_vel, seg.gravity, seg.command) == (0, 3, 6)
    assert (seg.dof_pos, seg.dof_vel, seg.last_action) == (9, 21, 33)
    assert seg.with_phase and seg.phase == 45 and seg.num_obs == 47
    # H1: 10 actions, 41 obs
    seg_h1 = obs_layout.layout_for(41, 10)
    assert seg_h1.num_obs == 41 and seg_h1.phase == 39
    # go2's 48-dim training obs is NOT this layout
    with pytest.raises(ValueError):
        obs_layout.layout_for(48, 12)

    gen = os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR,
        "unitree_rl_gym_tpu", "deploy", "cpp", "obs_layout.gen.h",
    )
    with open(gen) as f:
        assert f.read() == obs_layout.emit_cpp_header()


def test_build_obs_fills_every_slot():
    from unitree_rl_gym_tpu.deploy import obs_layout

    seg = obs_layout.layout_for(47, 12)
    out = np.full(47, np.nan, dtype=np.float32)
    obs_layout.build_obs(
        seg, out,
        ang_vel=[1, 2, 3], gravity=[0, 0, -1], command=[4, 5, 6],
        dof_pos=np.arange(12), dof_vel=np.arange(12) * 2,
        last_action=np.arange(12) * 3, phase_t=0.2,
    )
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[:3], [1, 2, 3])
    np.testing.assert_allclose(out[9:21], np.arange(12))
    np.testing.assert_allclose(out[33:45], np.arange(12) * 3)
    # phase_t=0.2 of a 0.8 s period -> quarter phase: sin=1, cos=0
    np.testing.assert_allclose(out[45:47], [1.0, 0.0], atol=1e-6)


def test_controller_go_dialect_h1_on_mock_transport():
    """H1 uses the `go` DDS dialect (deploy_real.py:39-64): init command
    carries PosStopF sentinels + weak-motor mode bits, obs is the 41-dim
    H1 layout, and the run tick drives the 10 leg motors."""
    from unitree_rl_gym_tpu.deploy.deploy_real.config import Config
    from unitree_rl_gym_tpu.deploy.deploy_real.deploy_real import Controller
    from unitree_rl_gym_tpu.deploy.deploy_real.transport import MockTransport
    from unitree_rl_gym_tpu.deploy.deploy_real.common.remote_controller import (
        KeyMap,
    )

    cfg = Config(os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR,
        "unitree_rl_gym_tpu/deploy/deploy_real/configs/h1.yaml",
    ))
    assert cfg.msg_type == "go" and cfg.num_actions == 10
    transport = MockTransport("go")
    captured = {}

    def spy_policy(obs):
        captured["obs"] = obs.copy()
        return np.zeros(cfg.num_actions)

    ctrl = Controller(cfg, transport, policy=spy_policy,
                      sleep=lambda dt: None)

    # go-dialect init command: PosStopF sentinel on q, weak motors mode 1,
    # strong motors mode 0x0A (command_helper.py:46-55)
    init = ctrl.low_cmd
    assert abs(init.motor_cmd[0].q - 2.146e9) < 1e3
    assert init.motor_cmd[cfg.weak_motor[0]].mode == 1
    strong = next(
        i for i in range(20) if i not in cfg.weak_motor
    )
    assert init.motor_cmd[strong].mode == 0x0A

    ticks = {"n": 0}

    def sleep_and_press(dt):
        ticks["n"] += 1
        if ticks["n"] >= 2:
            transport.set_buttons(1 << KeyMap.start)

    ctrl.sleep = sleep_and_press
    ctrl.zero_torque_state()
    ctrl.sleep = lambda dt: None
    ctrl.move_to_default_pos()

    transport.set_buttons(0)
    ctrl.run()
    assert captured["obs"].shape == (41,)
    cmd = transport.sent[-1]
    assert cmd.crc != 0
    for i, motor_idx in enumerate(cfg.leg_joint2motor_idx):
        assert cmd.motor_cmd[motor_idx].kp == cfg.kps[i]
    ctrl.damp()
    assert all(m.kd == 8 for m in transport.sent[-1].motor_cmd)


def test_numpy_policy_batched_matches_single():
    """Regression: NumpyPolicy once evaluated only row 0 of a batched obs
    and broadcast that action to every env (which silently made batched
    in-env evals degenerate — every robot ran env 0's action)."""
    from unitree_rl_gym_tpu.export.numpy_policy import NumpyPolicy

    rng = np.random.RandomState(3)

    # MLP artifact (go2): batched call == row-by-row calls.
    mlp = NumpyPolicy(
        os.path.join(UNITREE_RL_GYM_TPU_ROOT_DIR,
                     "resources", "pre_train", "go2")
    )
    obs = rng.randn(5, mlp.meta["num_obs"]).astype(np.float32)
    batched = mlp(obs)
    singles = np.stack([mlp(obs[i]) for i in range(5)])
    assert batched.shape == (5, mlp.meta["num_actions"])
    np.testing.assert_allclose(batched, singles, atol=1e-4)
    assert not np.allclose(batched[0], batched[1])

    # LSTM artifact (g1): batched stateful rollout == per-stream stateful
    # rollouts (hidden state must be carried per batch row).
    lstm = NumpyPolicy(
        os.path.join(UNITREE_RL_GYM_TPU_ROOT_DIR,
                     "resources", "pre_train", "g1")
    )
    T, B = 4, 3
    seq = rng.randn(T, B, lstm.meta["num_obs"]).astype(np.float32)
    lstm.reset_memory()
    batched_tr = np.stack([lstm(seq[t]) for t in range(T)])
    single_tr = np.empty_like(batched_tr)
    for b in range(B):
        lstm.reset_memory()
        for t in range(T):
            single_tr[t, b] = lstm(seq[t, b])
    np.testing.assert_allclose(batched_tr, single_tr, atol=1e-4)
