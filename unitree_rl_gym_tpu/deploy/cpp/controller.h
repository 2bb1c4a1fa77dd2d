// G1-class real-robot controller — native C++ twin of the Python deploy
// (SURVEY.md §2.1 row 24). Same phases as the reference cpp_g1 controller:
// zero-torque (wait start) -> 2 s lerp to default -> hold (wait A) ->
// 50 Hz policy loop -> damping; decoupled high-rate LowCmd writer thread
// fed through a DataBuffer mailbox; safety kill when the base flips
// (projected-gravity z turns positive — Controller.cpp:149-152 semantics).
#pragma once
#include <array>
#include <atomic>
#include <cmath>
#include <functional>
#include <memory>
#include <string>
#include <thread>
#include <vector>

#include "data_buffer.h"
#include "messages.h"
#include "policy.h"

namespace utrl {

struct Config {
  double control_dt = 0.02;
  std::string policy_path;
  std::vector<int> leg_joint2motor_idx;
  std::vector<float> kps, kds, default_angles;
  std::vector<int> arm_waist_joint2motor_idx;
  std::vector<float> arm_waist_kps, arm_waist_kds, arm_waist_target;
  float ang_vel_scale = 0.25f, dof_pos_scale = 1.0f, dof_vel_scale = 0.05f;
  float action_scale = 0.25f;
  std::array<float, 3> cmd_scale{2.f, 2.f, 0.25f};
  std::array<float, 3> max_cmd{0.8f, 0.5f, 1.57f};
  int num_actions = 12, num_obs = 47;

  // Minimal YAML-subset loader for the deploy configs (scalars + flat
  // lists); throws on missing required keys.
  static Config load(const std::string& yaml_path);
};

// Transport boundary: real DDS behind unitree_sdk2 when available; the
// loopback implementation drives tests and sim-in-the-loop validation.
class Transport {
 public:
  virtual ~Transport() = default;
  virtual LowStateMsg state() = 0;
  virtual void send(const LowCmdMsg& cmd) = 0;
};

class LoopbackTransport : public Transport {
 public:
  LowStateMsg state() override { return *state_buf_.GetData(); }
  void send(const LowCmdMsg& cmd) override {
    sent_buf_.SetData(cmd);
    ++sent_count_;
  }
  void set_state(const LowStateMsg& s) { state_buf_.SetData(s); }
  std::shared_ptr<const LowCmdMsg> last_sent() const {
    return sent_buf_.GetData();
  }
  int sent_count() const { return sent_count_.load(); }

  LoopbackTransport() { state_buf_.SetData(LowStateMsg{}); }

 private:
  DataBuffer<LowStateMsg> state_buf_;
  DataBuffer<LowCmdMsg> sent_buf_;
  std::atomic<int> sent_count_{0};
};

class Controller {
 public:
  // sleep_fn injectable so tests run at full speed.
  Controller(const Config& cfg, Transport& transport,
             std::function<void(double)> sleep_fn = nullptr);
  ~Controller();

  // state-machine phases
  void zero_torque_state();
  void move_to_default_pos();
  void default_pos_state();
  // One 50 Hz control tick. Returns false when the safety kill fired.
  bool run_once();
  void damp();

  // Start/stop the decoupled 500 Hz command writer thread.
  void start_writer(double period_s = 0.002);
  void stop_writer();

  const std::vector<float>& last_obs() const { return obs_; }
  const std::vector<float>& last_action() const { return action_; }

 private:
  void stamp_and_send(LowCmdMsg& cmd);
  void hold_arm_waist(LowCmdMsg& cmd);
  Remote remote() { return Remote::parse(transport_.state().wireless_remote); }

  Config cfg_;
  Transport& transport_;
  std::function<void(double)> sleep_;
  Policy policy_;
  std::vector<float> action_, obs_, target_dof_pos_;
  std::array<float, 3> cmd_{0.f, 0.f, 0.f};
  long counter_ = 0;

  DataBuffer<LowCmdMsg> writer_mailbox_;
  std::thread writer_thread_;
  std::atomic<bool> writer_running_{false};
};

// Projected gravity from a wxyz quaternion (rotation_helper.py:5-17).
inline std::array<float, 3> gravity_orientation(
    const std::array<float, 4>& q) {
  const float qw = q[0], qx = q[1], qy = q[2], qz = q[3];
  return {2.f * (-qz * qx + qw * qy), -2.f * (qz * qy + qw * qx),
          1.f - 2.f * (qw * qw + qz * qz)};
}

}  // namespace utrl
