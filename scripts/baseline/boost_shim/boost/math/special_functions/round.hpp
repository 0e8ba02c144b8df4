#ifndef GOSS_SHIM_MATH_ROUND_HPP
#define GOSS_SHIM_MATH_ROUND_HPP
#include <cmath>
namespace boost { namespace math {
template <class T> T round(T v) { return std::round(v); }
}}
#endif
