#include "policy.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <stdexcept>

namespace utrl {

namespace {

constexpr uint32_t kMagic = 0x4C525455;  // "UTRL" little-endian

float elu(float x) { return x > 0.f ? x : std::expm1(x); }
float sigmoid(float x) { return 1.f / (1.f + std::exp(-x)); }

struct Reader {
  FILE* f;
  explicit Reader(const std::string& path) {
    f = std::fopen(path.c_str(), "rb");
    if (!f) throw std::runtime_error("policy.bin not found: " + path);
  }
  ~Reader() {
    if (f) std::fclose(f);
  }
  uint32_t u32() {
    uint32_t v;
    if (std::fread(&v, 4, 1, f) != 1)
      throw std::runtime_error("policy.bin truncated");
    return v;
  }
  void floats(std::vector<float>& out, size_t n) {
    out.resize(n);
    if (n && std::fread(out.data(), 4, n, f) != n)
      throw std::runtime_error("policy.bin truncated");
  }
};

}  // namespace

Policy::Policy(const std::string& path) {
  Reader r(path);
  if (r.u32() != kMagic) throw std::runtime_error("bad magic in policy.bin");
  uint32_t version = r.u32();
  if (version != 1) throw std::runtime_error("unsupported policy.bin version");
  recurrent_ = r.u32() != 0;
  num_obs_ = static_cast<int>(r.u32());
  num_actions_ = static_cast<int>(r.u32());
  uint32_t rnn_hidden = r.u32();
  uint32_t rnn_layers = r.u32();
  uint32_t n_mlp = r.u32();
  (void)r.u32();  // activation enum; only elu (0) emitted today

  for (uint32_t l = 0; l < rnn_layers && recurrent_; ++l) {
    LSTMLayer layer;
    layer.in = static_cast<int>(r.u32());
    layer.hidden = static_cast<int>(r.u32());
    r.floats(layer.w_ih, static_cast<size_t>(layer.in) * 4 * layer.hidden);
    r.floats(layer.w_hh, static_cast<size_t>(layer.hidden) * 4 * layer.hidden);
    r.floats(layer.bias, static_cast<size_t>(4) * layer.hidden);
    lstm_.push_back(std::move(layer));
  }
  (void)rnn_hidden;
  for (uint32_t l = 0; l < n_mlp; ++l) {
    LinearLayer layer;
    layer.in = static_cast<int>(r.u32());
    layer.out = static_cast<int>(r.u32());
    r.floats(layer.w, static_cast<size_t>(layer.in) * layer.out);
    r.floats(layer.b, layer.out);
    actor_.push_back(std::move(layer));
  }
  reset_memory();
}

void Policy::reset_memory() {
  h_.clear();
  c_.clear();
  for (const auto& l : lstm_) {
    h_.emplace_back(l.hidden, 0.f);
    c_.emplace_back(l.hidden, 0.f);
  }
}

std::vector<float> Policy::mlp(const std::vector<float>& x0) const {
  std::vector<float> x = x0;
  for (size_t li = 0; li < actor_.size(); ++li) {
    const auto& l = actor_[li];
    std::vector<float> y(l.out, 0.f);
    for (int i = 0; i < l.in; ++i) {
      const float xi = x[i];
      const float* row = &l.w[static_cast<size_t>(i) * l.out];
      for (int o = 0; o < l.out; ++o) y[o] += xi * row[o];
    }
    for (int o = 0; o < l.out; ++o) {
      y[o] += l.b[o];
      if (li + 1 < actor_.size()) y[o] = elu(y[o]);
    }
    x = std::move(y);
  }
  return x;
}

std::vector<float> Policy::lstm_step(const std::vector<float>& x0) {
  std::vector<float> x = x0;
  for (size_t li = 0; li < lstm_.size(); ++li) {
    const auto& l = lstm_[li];
    const int H = l.hidden;
    std::vector<float> gates(l.bias);  // [4H] = i|f|g|o
    for (int i = 0; i < l.in; ++i) {
      const float xi = x[i];
      const float* row = &l.w_ih[static_cast<size_t>(i) * 4 * H];
      for (int g = 0; g < 4 * H; ++g) gates[g] += xi * row[g];
    }
    for (int j = 0; j < H; ++j) {
      const float hj = h_[li][j];
      const float* row = &l.w_hh[static_cast<size_t>(j) * 4 * H];
      for (int g = 0; g < 4 * H; ++g) gates[g] += hj * row[g];
    }
    for (int j = 0; j < H; ++j) {
      const float ig = sigmoid(gates[j]);
      const float fg = sigmoid(gates[H + j]);
      const float gg = std::tanh(gates[2 * H + j]);
      const float og = sigmoid(gates[3 * H + j]);
      c_[li][j] = fg * c_[li][j] + ig * gg;
      h_[li][j] = og * std::tanh(c_[li][j]);
    }
    x = h_[li];
  }
  return x;
}

std::vector<float> Policy::operator()(const std::vector<float>& obs) {
  if (static_cast<int>(obs.size()) != num_obs_)
    throw std::runtime_error("obs size mismatch");
  if (recurrent_) return mlp(lstm_step(obs));
  return mlp(obs);
}

}  // namespace utrl
