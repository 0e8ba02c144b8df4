#ifndef GOSS_SHIM_TUPLE_IO_HPP
#define GOSS_SHIM_TUPLE_IO_HPP
#include <boost/tuple/tuple.hpp>
#endif
