#pragma once
// std-backed stand-in: deque of owned pointers with reference access.
#include <deque>
#include <memory>
namespace boost {
template <typename T>
class ptr_deque {
public:
    using auto_type = std::unique_ptr<T>;
    bool empty() const { return q_.empty(); }
    size_t size() const { return q_.size(); }
    void push_back(T* p) { q_.emplace_back(p); }
    void push_front(T* p) { q_.emplace_front(p); }
    T& front() { return *q_.front(); }
    T& back() { return *q_.back(); }
    auto_type pop_front() {
        auto p = std::move(q_.front());
        q_.pop_front();
        return p;
    }
    void clear() { q_.clear(); }
    T& operator[](size_t i) { return *q_[i]; }
    const T& operator[](size_t i) const { return *q_[i]; }

private:
    std::deque<std::unique_ptr<T>> q_;
};
}  // namespace boost
