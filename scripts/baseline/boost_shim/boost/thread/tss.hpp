#pragma once
namespace boost {
template <typename T>
class thread_specific_ptr {
public:
    T* get() const { return p_; }
    T* operator->() const { return p_; }
    T& operator*() const { return *p_; }
    void reset(T* p = nullptr) { delete p_; p_ = p; }
    ~thread_specific_ptr() { reset(); }

private:
    static thread_local T* p_;
};
template <typename T>
thread_local T* thread_specific_ptr<T>::p_ = nullptr;
}  // namespace boost
