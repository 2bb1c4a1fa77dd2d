// Wire-level message mirrors for the low-level command/state protocol.
// Field surface matches what the controller reads/writes on the
// unitree_sdk2 hg-dialect IDL types; the DDS transport translates between
// these and the real IDL structs, the loopback transport uses them as-is.
#pragma once
#include <array>
#include <cstdint>

namespace utrl {

constexpr int kNumMotors = 35;

struct MotorCmd {
  uint8_t mode = 0;
  float q = 0.f, qd = 0.f, kp = 0.f, kd = 0.f, tau = 0.f;
};

struct MotorState {
  float q = 0.f, dq = 0.f;
};

struct ImuState {
  std::array<float, 4> quaternion{1.f, 0.f, 0.f, 0.f};  // wxyz
  std::array<float, 3> gyroscope{0.f, 0.f, 0.f};
};

struct LowCmdMsg {
  std::array<MotorCmd, kNumMotors> motor_cmd;
  uint8_t mode_machine = 0;
  uint8_t mode_pr = 0;
  uint32_t crc = 0;
};

struct LowStateMsg {
  std::array<MotorState, kNumMotors> motor_state;
  ImuState imu_state;
  uint32_t tick = 0;
  std::array<uint8_t, 40> wireless_remote{};
  uint8_t mode_machine = 0;
};

// Remote-control bitfield/axis layout (deploy_real/common/remote_controller.py)
struct Remote {
  uint16_t buttons = 0;
  float lx = 0.f, rx = 0.f, ry = 0.f, ly = 0.f;

  static Remote parse(const std::array<uint8_t, 40>& d) {
    Remote r;
    auto rd_f = [&](int off) {
      float v;
      __builtin_memcpy(&v, d.data() + off, 4);
      return v;
    };
    __builtin_memcpy(&r.buttons, d.data() + 2, 2);
    r.lx = rd_f(4);
    r.rx = rd_f(8);
    r.ry = rd_f(12);
    r.ly = rd_f(20);
    return r;
  }
  bool pressed(int key) const { return (buttons >> key) & 1; }
};

enum Key {
  kR1 = 0, kL1, kStart, kSelect, kR2, kL2, kF1, kF2,
  kA, kB, kX, kY, kUp, kRight, kDown, kLeft,
};

}  // namespace utrl
