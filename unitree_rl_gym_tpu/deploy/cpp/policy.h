// Self-contained policy inference for the robot edge: loads the flat
// binary export (policy.bin, written by export/export.py:export_cpp_bin)
// and evaluates the actor — MLP, optionally behind a stacked LSTM.
//
// Design departure from the reference C++ deploy (which links LibTorch to
// run TorchScript, cpp_g1/Controller.cpp:34): the networks here are a
// [512,256,128]-class MLP or LSTM-64 + [32] head — a few thousand FLOPs —
// so a dependency-free ~100-line evaluator replaces a 1 GB runtime while
// staying numerically parity-tested against the JAX actor.
#pragma once
#include <cstdint>
#include <string>
#include <vector>

namespace utrl {

struct LinearLayer {
  int in = 0, out = 0;
  std::vector<float> w;  // [in * out], row-major (in, out)
  std::vector<float> b;  // [out]
};

struct LSTMLayer {
  int in = 0, hidden = 0;
  // gate order i, f, g, o; kernels row-major (in|hidden, 4*hidden)
  std::vector<float> w_ih;  // [in * 4h]
  std::vector<float> w_hh;  // [h * 4h]
  std::vector<float> bias;  // [4h]
};

class Policy {
 public:
  // Throws std::runtime_error on malformed files.
  explicit Policy(const std::string& path);

  int num_obs() const { return num_obs_; }
  int num_actions() const { return num_actions_; }
  bool recurrent() const { return recurrent_; }

  // Single-stream inference; carries LSTM state internally like the
  // exported TorchScript module (helpers.py:163-182).
  std::vector<float> operator()(const std::vector<float>& obs);
  void reset_memory();

 private:
  std::vector<float> mlp(const std::vector<float>& x) const;
  std::vector<float> lstm_step(const std::vector<float>& x);

  bool recurrent_ = false;
  int num_obs_ = 0, num_actions_ = 0;
  std::vector<LinearLayer> actor_;
  std::vector<LSTMLayer> lstm_;
  std::vector<std::vector<float>> h_, c_;
};

}  // namespace utrl
