// DDS transport over unitree_sdk2 (hg dialect), compiled only when CMake
// finds the SDK (UNITREE_SDK2_FOUND); otherwise the stub returns null and
// deploy_real_cpp reports the missing transport.
#include <memory>

#include "controller.h"

#ifdef HAVE_UNITREE_SDK2
#include <unitree/robot/channel/channel_publisher.hpp>
#include <unitree/robot/channel/channel_subscriber.hpp>
#include <unitree/idl/hg/LowCmd_.hpp>
#include <unitree/idl/hg/LowState_.hpp>

namespace utrl {

class DdsTransport : public Transport {
 public:
  DdsTransport(const Config& cfg, const char* net_if) {
    unitree::robot::ChannelFactory::Instance()->Init(0, net_if);
    pub_.reset(new unitree::robot::ChannelPublisher<
               unitree_hg::msg::dds_::LowCmd_>("rt/lowcmd"));
    pub_->InitChannel();
    sub_.reset(new unitree::robot::ChannelSubscriber<
               unitree_hg::msg::dds_::LowState_>("rt/lowstate"));
    sub_->InitChannel(
        [this](const void* msg) {
          const auto* s =
              static_cast<const unitree_hg::msg::dds_::LowState_*>(msg);
          LowStateMsg out;
          out.tick = s->tick();
          out.mode_machine = s->mode_machine();
          for (int i = 0; i < kNumMotors; ++i) {
            out.motor_state[i].q = s->motor_state()[i].q();
            out.motor_state[i].dq = s->motor_state()[i].dq();
          }
          for (int i = 0; i < 4; ++i)
            out.imu_state.quaternion[i] = s->imu_state().quaternion()[i];
          for (int i = 0; i < 3; ++i)
            out.imu_state.gyroscope[i] = s->imu_state().gyroscope()[i];
          for (int i = 0; i < 40; ++i)
            out.wireless_remote[i] = s->wireless_remote()[i];
          state_.SetData(out);
        },
        10);
  }

  LowStateMsg state() override {
    auto p = state_.GetData();
    return p ? *p : LowStateMsg{};
  }

  void send(const LowCmdMsg& cmd) override {
    unitree_hg::msg::dds_::LowCmd_ out;
    out.mode_machine() = cmd.mode_machine;
    out.mode_pr() = cmd.mode_pr;
    for (int i = 0; i < kNumMotors; ++i) {
      auto& mc = out.motor_cmd()[i];
      mc.mode() = cmd.motor_cmd[i].mode;
      mc.q() = cmd.motor_cmd[i].q;
      mc.dq() = cmd.motor_cmd[i].qd;
      mc.kp() = cmd.motor_cmd[i].kp;
      mc.kd() = cmd.motor_cmd[i].kd;
      mc.tau() = cmd.motor_cmd[i].tau;
    }
    out.crc() = cmd.crc;
    pub_->Write(out);
  }

 private:
  std::unique_ptr<unitree::robot::ChannelPublisher<
      unitree_hg::msg::dds_::LowCmd_>> pub_;
  std::unique_ptr<unitree::robot::ChannelSubscriber<
      unitree_hg::msg::dds_::LowState_>> sub_;
  DataBuffer<LowStateMsg> state_;
};

std::unique_ptr<Transport> make_dds_transport(const Config& cfg,
                                              const char* net_if) {
  return std::make_unique<DdsTransport>(cfg, net_if);
}

}  // namespace utrl

#else  // !HAVE_UNITREE_SDK2

namespace utrl {
std::unique_ptr<Transport> make_dds_transport(const Config&, const char*) {
  return nullptr;
}
}  // namespace utrl

#endif
