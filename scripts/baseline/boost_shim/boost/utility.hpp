#ifndef GOSS_SHIM_UTILITY_HPP
#define GOSS_SHIM_UTILITY_HPP
#include <boost/noncopyable.hpp>
#include <utility>
#endif
