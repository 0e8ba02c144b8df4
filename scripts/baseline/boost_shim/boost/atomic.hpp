// Minimal std-backed stand-in for boost/atomic.hpp, written for the
// baseline harness (scripts/baseline/README.md).  Only the surface the
// reference counting core touches.
#pragma once
#include <atomic>
namespace boost {
using std::atomic;
using memory_order = std::memory_order;
constexpr auto memory_order_relaxed = std::memory_order_relaxed;
constexpr auto memory_order_acquire = std::memory_order_acquire;
constexpr auto memory_order_release = std::memory_order_release;
constexpr auto memory_order_acq_rel = std::memory_order_acq_rel;
constexpr auto memory_order_seq_cst = std::memory_order_seq_cst;
}  // namespace boost
