// Minimal std-backed stand-in for boost::dynamic_bitset (the subset
// the reference's graph code touches).
#pragma once
#include <cstdint>
#include <cstddef>
#include <vector>

namespace boost {

template <typename Block = unsigned long>
class dynamic_bitset {
public:
    class reference {
    public:
        reference(std::vector<bool>& v, size_t i) : v_(v), i_(i) {}
        reference& operator=(bool b) { v_[i_] = b; return *this; }
        operator bool() const { return v_[i_]; }

    private:
        std::vector<bool>& v_;
        size_t i_;
    };

    dynamic_bitset() = default;
    explicit dynamic_bitset(size_t n, bool v = false) : bits_(n, v) {}
    size_t size() const { return bits_.size(); }
    void resize(size_t n, bool v = false) { bits_.resize(n, v); }
    void clear() { bits_.clear(); }
    bool operator[](size_t i) const { return bits_[i]; }
    reference operator[](size_t i) { return reference(bits_, i); }
    bool test(size_t i) const { return bits_[i]; }
    void set(size_t i, bool v = true) { bits_[i] = v; }
    size_t count() const {
        size_t c = 0;
        for (bool b : bits_) c += b;
        return c;
    }
    bool any() const {
        for (bool b : bits_) if (b) return true;
        return false;
    }
    bool none() const { return !any(); }

private:
    std::vector<bool> bits_;
};

}  // namespace boost
