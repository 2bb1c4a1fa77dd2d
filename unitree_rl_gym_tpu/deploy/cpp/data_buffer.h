// Lock-free-ish shared-state primitives for the 3-thread controller
// (DDS callback / control loop / high-rate command writer), mirroring the
// concurrency architecture of the reference C++ deploy (SURVEY.md §5.2):
// a spin lock on std::atomic_flag plus a shared_ptr mailbox.
//
// Fresh implementation: the mailbox clones on read (GetData returns a
// snapshot), writers swap the pointer under the spin lock, so readers
// never block writers for long and torn reads are impossible.
#pragma once
#include <atomic>
#include <memory>

namespace utrl {

class SpinLock {
 public:
  void lock() noexcept {
    while (flag_.test_and_set(std::memory_order_acquire)) {
      // spin; on a Jetson-class target this is cheaper than a futex for
      // the ~microsecond critical sections below
    }
  }
  void unlock() noexcept { flag_.clear(std::memory_order_release); }

 private:
  std::atomic_flag flag_ = ATOMIC_FLAG_INIT;
};

class SpinGuard {
 public:
  explicit SpinGuard(SpinLock& l) : l_(l) { l_.lock(); }
  ~SpinGuard() { l_.unlock(); }
  SpinGuard(const SpinGuard&) = delete;
  SpinGuard& operator=(const SpinGuard&) = delete;

 private:
  SpinLock& l_;
};

// Single-producer/multi-consumer mailbox holding the latest value of T.
template <typename T>
class DataBuffer {
 public:
  void SetData(const T& value) {
    auto p = std::make_shared<T>(value);
    SpinGuard g(lock_);
    data_ = std::move(p);
  }

  // Snapshot of the latest value (nullptr if never set).
  std::shared_ptr<const T> GetData() const {
    SpinGuard g(lock_);
    return data_;
  }

  void Clear() {
    SpinGuard g(lock_);
    data_.reset();
  }

 private:
  mutable SpinLock lock_;
  std::shared_ptr<const T> data_;
};

}  // namespace utrl
