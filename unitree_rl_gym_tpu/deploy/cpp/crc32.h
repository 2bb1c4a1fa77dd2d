// CRC32 for Unitree low-level command stamping.
// Word-wise MSB-first CRC, polynomial 0x04C11DB7, init 0xFFFFFFFF —
// the same algorithm the Python side implements in
// deploy_real/common/crc.py (parity-tested against it).
#pragma once
#include <cstdint>
#include <cstddef>

namespace utrl {

inline uint32_t crc32_words(const uint32_t* data, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
  constexpr uint32_t poly = 0x04C11DB7u;
  for (size_t i = 0; i < n; ++i) {
    uint32_t w = data[i];
    for (int bit = 31; bit >= 0; --bit) {
      uint32_t top = (crc >> 31) & 1u;
      crc <<= 1;
      if (top ^ ((w >> bit) & 1u)) crc ^= poly;
    }
  }
  return crc;
}

// Byte buffer, zero-padded to a word multiple, little-endian word packing.
inline uint32_t crc32_bytes(const uint8_t* data, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
  constexpr uint32_t poly = 0x04C11DB7u;
  size_t nwords = (n + 3) / 4;
  for (size_t i = 0; i < nwords; ++i) {
    uint32_t w = 0;
    for (size_t b = 0; b < 4; ++b) {
      size_t idx = i * 4 + b;
      if (idx < n) w |= static_cast<uint32_t>(data[idx]) << (8 * b);
    }
    for (int bit = 31; bit >= 0; --bit) {
      uint32_t top = (crc >> 31) & 1u;
      crc <<= 1;
      if (top ^ ((w >> bit) & 1u)) crc ^= poly;
    }
  }
  return crc;
}

}  // namespace utrl
