#ifndef GOSS_SHIM_LAMBDA_BIND_HPP
#define GOSS_SHIM_LAMBDA_BIND_HPP
#include <functional>
#endif
