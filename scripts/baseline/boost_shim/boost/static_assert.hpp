#pragma once
#include <cassert>
#include <boost/type_traits.hpp>
#ifndef BOOST_ASSERT
#define BOOST_ASSERT(expr) assert(expr)
#define BOOST_ASSERT_MSG(expr, msg) assert((expr) && (msg))
#endif
#define BOOST_STATIC_ASSERT(...) static_assert((__VA_ARGS__), #__VA_ARGS__)
#define BOOST_STATIC_ASSERT_MSG(expr, msg) static_assert(expr, msg)
