// std-backed shim for boost/timer.hpp (deprecated boost::timer)
#ifndef GOSS_SHIM_TIMER_HPP
#define GOSS_SHIM_TIMER_HPP
#include <chrono>
namespace boost {
class timer {
public:
    timer() : start_(clock_t::now()) {}
    void restart() { start_ = clock_t::now(); }
    double elapsed() const {
        return std::chrono::duration<double>(clock_t::now() - start_).count();
    }
private:
    using clock_t = std::chrono::steady_clock;
    clock_t::time_point start_;
};
}
#endif
