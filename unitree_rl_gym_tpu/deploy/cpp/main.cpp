// Real-robot deploy entry point (native).
//   deploy_real_cpp <net_if> <config.yaml>
// Requires the unitree_sdk2 DDS transport (compiled in when the SDK is
// found by CMake); without it this binary reports the missing transport —
// the loopback path is exercised by deploy_tests instead.
#include <csignal>
#include <cstdio>
#include <memory>

#include "controller.h"

namespace utrl {
// Provided by dds_transport.cpp when UNITREE_SDK2 is available.
std::unique_ptr<Transport> make_dds_transport(const Config& cfg,
                                              const char* net_if);
}

static volatile std::sig_atomic_t g_stop = 0;
static void on_sigint(int) { g_stop = 1; }

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <net_if> <config.yaml>\n", argv[0]);
    return 2;
  }
  utrl::Config cfg = utrl::Config::load(argv[2]);
  auto transport = utrl::make_dds_transport(cfg, argv[1]);
  if (!transport) {
    std::fprintf(stderr,
                 "built without unitree_sdk2 — no DDS transport available\n");
    return 1;
  }
  std::signal(SIGINT, on_sigint);
  utrl::Controller ctrl(cfg, *transport);
  ctrl.zero_torque_state();
  ctrl.move_to_default_pos();
  ctrl.default_pos_state();
  ctrl.start_writer();
  while (!g_stop) {
    if (!ctrl.run_once()) break;  // safety kill
    utrl::Remote rc = utrl::Remote::parse(
        transport->state().wireless_remote);
    if (rc.pressed(utrl::kSelect)) break;
  }
  ctrl.stop_writer();
  ctrl.damp();
  std::printf("Exit\n");
  return 0;
}
