#include "controller.h"

#include <chrono>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>

#include "crc32.h"
#include "obs_layout.gen.h"

namespace utrl {

namespace {

void default_sleep(double s) {
  std::this_thread::sleep_for(std::chrono::duration<double>(s));
}

std::string strip(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r");
  return s.substr(a, b - a + 1);
}

}  // namespace

// --- minimal YAML-subset config loader -------------------------------------

Config Config::load(const std::string& yaml_path) {
  std::ifstream f(yaml_path);
  if (!f) throw std::runtime_error("config not found: " + yaml_path);
  // Parse "key: value" and "key: [v, v, ...]" possibly spanning lines
  // until the closing bracket. Comments (#) stripped.
  std::string line, pending_key, pending_val;
  bool in_list = false;
  std::vector<std::pair<std::string, std::string>> kv;
  while (std::getline(f, line)) {
    size_t hash = line.find('#');
    if (hash != std::string::npos) line = line.substr(0, hash);
    line = strip(line);
    if (line.empty()) continue;
    if (in_list) {
      pending_val += " " + line;
      if (line.find(']') != std::string::npos) {
        kv.emplace_back(pending_key, pending_val);
        in_list = false;
      }
      continue;
    }
    size_t colon = line.find(':');
    if (colon == std::string::npos) continue;
    std::string key = strip(line.substr(0, colon));
    std::string val = strip(line.substr(colon + 1));
    if (!val.empty() && val[0] == '[' && val.find(']') == std::string::npos) {
      pending_key = key;
      pending_val = val;
      in_list = true;
      continue;
    }
    kv.emplace_back(key, val);
  }

  auto get = [&](const std::string& key) -> const std::string* {
    for (auto& p : kv)
      if (p.first == key) return &p.second;
    return nullptr;
  };
  auto req = [&](const std::string& key) -> const std::string& {
    const std::string* v = get(key);
    if (!v) throw std::runtime_error("config missing key: " + key);
    return *v;
  };
  auto floats = [&](const std::string& s) {
    std::vector<float> out;
    std::string t = s;
    for (char& c : t)
      if (c == '[' || c == ']' || c == ',') c = ' ';
    std::istringstream is(t);
    float v;
    while (is >> v) out.push_back(v);
    return out;
  };
  auto ints = [&](const std::string& s) {
    std::vector<int> out;
    for (float v : floats(s)) out.push_back(static_cast<int>(v));
    return out;
  };
  auto unquote = [](std::string s) {
    if (s.size() >= 2 && (s.front() == '"' || s.front() == '\''))
      s = s.substr(1, s.size() - 2);
    return s;
  };

  Config c;
  c.control_dt = std::stod(req("control_dt"));
  c.policy_path = unquote(req("policy_path"));
  c.leg_joint2motor_idx = ints(req("leg_joint2motor_idx"));
  c.kps = floats(req("kps"));
  c.kds = floats(req("kds"));
  c.default_angles = floats(req("default_angles"));
  c.arm_waist_joint2motor_idx = ints(req("arm_waist_joint2motor_idx"));
  c.arm_waist_kps = floats(req("arm_waist_kps"));
  c.arm_waist_kds = floats(req("arm_waist_kds"));
  c.arm_waist_target = floats(req("arm_waist_target"));
  c.ang_vel_scale = std::stof(req("ang_vel_scale"));
  c.dof_pos_scale = std::stof(req("dof_pos_scale"));
  c.dof_vel_scale = std::stof(req("dof_vel_scale"));
  c.action_scale = std::stof(req("action_scale"));
  auto cs = floats(req("cmd_scale"));
  auto mc = floats(req("max_cmd"));
  for (int i = 0; i < 3; ++i) {
    c.cmd_scale[i] = cs[i];
    c.max_cmd[i] = mc[i];
  }
  c.num_actions = std::stoi(req("num_actions"));
  c.num_obs = std::stoi(req("num_obs"));
  return c;
}

// --- controller -------------------------------------------------------------

Controller::Controller(const Config& cfg, Transport& transport,
                       std::function<void(double)> sleep_fn)
    : cfg_(cfg),
      transport_(transport),
      sleep_(sleep_fn ? std::move(sleep_fn) : default_sleep),
      policy_(cfg.policy_path),
      action_(cfg.num_actions, 0.f),
      obs_(cfg.num_obs, 0.f),
      target_dof_pos_(cfg.default_angles) {
  if (policy_.num_obs() != cfg_.num_obs ||
      policy_.num_actions() != cfg_.num_actions)
    throw std::runtime_error("policy/config dimension mismatch");
}

Controller::~Controller() { stop_writer(); }

void Controller::stamp_and_send(LowCmdMsg& cmd) {
  // CRC over the motor payload, like the SDK stamps LowCmd
  // (cpp reference: utilities.cpp crc32 over the message words)
  cmd.crc = crc32_bytes(
      reinterpret_cast<const uint8_t*>(cmd.motor_cmd.data()),
      sizeof(cmd.motor_cmd));
  if (writer_running_.load()) {
    writer_mailbox_.SetData(cmd);  // writer thread does the send
  } else {
    transport_.send(cmd);
  }
}

void Controller::hold_arm_waist(LowCmdMsg& cmd) {
  for (size_t i = 0; i < cfg_.arm_waist_joint2motor_idx.size(); ++i) {
    auto& mc = cmd.motor_cmd[cfg_.arm_waist_joint2motor_idx[i]];
    mc.q = cfg_.arm_waist_target[i];
    mc.qd = 0;
    mc.kp = cfg_.arm_waist_kps[i];
    mc.kd = cfg_.arm_waist_kds[i];
    mc.tau = 0;
  }
}

void Controller::zero_torque_state() {
  while (!remote().pressed(kStart)) {
    LowCmdMsg cmd;  // all-zero gains = zero torque
    stamp_and_send(cmd);
    sleep_(cfg_.control_dt);
  }
}

void Controller::move_to_default_pos() {
  const int num_step = static_cast<int>(2.0 / cfg_.control_dt);
  std::vector<int> dof_idx = cfg_.leg_joint2motor_idx;
  dof_idx.insert(dof_idx.end(), cfg_.arm_waist_joint2motor_idx.begin(),
                 cfg_.arm_waist_joint2motor_idx.end());
  std::vector<float> kps = cfg_.kps, kds = cfg_.kds,
                     target = cfg_.default_angles;
  kps.insert(kps.end(), cfg_.arm_waist_kps.begin(), cfg_.arm_waist_kps.end());
  kds.insert(kds.end(), cfg_.arm_waist_kds.begin(), cfg_.arm_waist_kds.end());
  target.insert(target.end(), cfg_.arm_waist_target.begin(),
                cfg_.arm_waist_target.end());

  LowStateMsg s = transport_.state();
  std::vector<float> init(dof_idx.size());
  for (size_t j = 0; j < dof_idx.size(); ++j)
    init[j] = s.motor_state[dof_idx[j]].q;

  for (int i = 0; i < num_step; ++i) {
    const float alpha = static_cast<float>(i) / num_step;
    LowCmdMsg cmd;
    for (size_t j = 0; j < dof_idx.size(); ++j) {
      auto& mc = cmd.motor_cmd[dof_idx[j]];
      mc.q = init[j] * (1 - alpha) + target[j] * alpha;
      mc.kp = kps[j];
      mc.kd = kds[j];
    }
    stamp_and_send(cmd);
    sleep_(cfg_.control_dt);
  }
}

void Controller::default_pos_state() {
  while (!remote().pressed(kA)) {
    LowCmdMsg cmd;
    for (size_t i = 0; i < cfg_.leg_joint2motor_idx.size(); ++i) {
      auto& mc = cmd.motor_cmd[cfg_.leg_joint2motor_idx[i]];
      mc.q = cfg_.default_angles[i];
      mc.kp = cfg_.kps[i];
      mc.kd = cfg_.kds[i];
    }
    hold_arm_waist(cmd);
    stamp_and_send(cmd);
    sleep_(cfg_.control_dt);
  }
}

bool Controller::run_once() {
  ++counter_;
  LowStateMsg s = transport_.state();
  Remote rc = Remote::parse(s.wireless_remote);
  const int na = cfg_.num_actions;

  auto grav = gravity_orientation(s.imu_state.quaternion);
  // Safety kill: base flipped (gravity z-component positive in body frame)
  // — mirrors the reference's obs(5) > 0 check (Controller.cpp:149-152).
  if (grav[2] > 0.f) {
    damp();
    return false;
  }

  cmd_[0] = rc.ly;
  cmd_[1] = -rc.lx;
  cmd_[2] = -rc.rx;

  // Observation assembly via the shared layout table (obs_layout.gen.h,
  // generated from deploy/obs_layout.py — the same source the Python
  // deploy paths and the exporter's policy_meta.json use).
  const ObsLayout lay{na, /*with_phase=*/true};
  const double t = counter_ * cfg_.control_dt;
  const double phase =
      std::fmod(t, static_cast<double>(ObsLayout::kPhasePeriodS)) /
      ObsLayout::kPhasePeriodS;

  for (int i = 0; i < 3; ++i) {
    obs_[lay.ang_vel() + i] = s.imu_state.gyroscope[i] * cfg_.ang_vel_scale;
    obs_[lay.gravity() + i] = grav[i];
    obs_[lay.command() + i] = cmd_[i] * cfg_.cmd_scale[i] * cfg_.max_cmd[i];
  }
  for (int i = 0; i < na; ++i) {
    const auto& ms = s.motor_state[cfg_.leg_joint2motor_idx[i]];
    obs_[lay.dof_pos() + i] =
        (ms.q - cfg_.default_angles[i]) * cfg_.dof_pos_scale;
    obs_[lay.dof_vel() + i] = ms.dq * cfg_.dof_vel_scale;
    obs_[lay.last_action() + i] = action_[i];
  }
  obs_[lay.phase()] = static_cast<float>(std::sin(2 * M_PI * phase));
  obs_[lay.phase() + 1] = static_cast<float>(std::cos(2 * M_PI * phase));

  action_ = policy_(obs_);
  for (int i = 0; i < na; ++i)
    target_dof_pos_[i] =
        cfg_.default_angles[i] + action_[i] * cfg_.action_scale;

  LowCmdMsg cmd;
  for (int i = 0; i < na; ++i) {
    auto& mc = cmd.motor_cmd[cfg_.leg_joint2motor_idx[i]];
    mc.q = target_dof_pos_[i];
    mc.kp = cfg_.kps[i];
    mc.kd = cfg_.kds[i];
  }
  hold_arm_waist(cmd);
  stamp_and_send(cmd);
  sleep_(cfg_.control_dt);
  return true;
}

void Controller::damp() {
  LowCmdMsg cmd;
  for (auto& mc : cmd.motor_cmd) {
    mc.kd = 8.f;
  }
  stamp_and_send(cmd);
}

void Controller::start_writer(double period_s) {
  if (writer_running_.exchange(true)) return;
  writer_thread_ = std::thread([this, period_s] {
    // High-rate recurrent LowCmd writer (reference Controller.cpp:237-250):
    // re-sends the latest command from the mailbox so the motor bus never
    // starves even if the 50 Hz control loop hiccups.
    while (writer_running_.load()) {
      auto cmd = writer_mailbox_.GetData();
      if (cmd) transport_.send(*cmd);
      default_sleep(period_s);
    }
  });
}

void Controller::stop_writer() {
  if (writer_running_.exchange(false) && writer_thread_.joinable())
    writer_thread_.join();
}

}  // namespace utrl
