// std-backed shim for boost/exception_ptr.hpp
#ifndef GOSS_SHIM_EXCEPTION_PTR_HPP
#define GOSS_SHIM_EXCEPTION_PTR_HPP
#include <exception>
#include <functional>
namespace boost {
using std::exception_ptr;
using std::current_exception;
using std::rethrow_exception;
}
#endif
