#pragma once
#include <algorithm>
#include <cstdint>
#include <cassert>
#define BOOST_ASSERT(expr) assert(expr)
#define BOOST_ASSERT_MSG(expr, msg) assert((expr) && (msg))
