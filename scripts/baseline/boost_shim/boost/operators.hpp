// Minimal CRTP operator-generator stand-in for boost/operators.hpp.
// Mirrors Boost's chained-base protocol: a second template argument is
// either a real operand type or the next link of the base chain;
// genuine Boost detects the difference with is_chained_base, here a
// marker base class plays that role.
#pragma once
#include <type_traits>

namespace boost {

namespace detail {
struct op_marker {};
struct empty_base : op_marker {};

// chained-base detection that never evaluates is_base_of on the
// (possibly incomplete) derived type itself: U == T is always the
// operand form (x op x), not a chained base.
template <class T, class U>
struct is_chained : std::is_base_of<op_marker, U> {};
template <class T>
struct is_chained<T, T> : std::false_type {};
}  // namespace detail

#define GOSS_SHIM_BINOP(NAME, OP)                                          \
    template <class T, class U = T, class B = detail::empty_base,          \
              bool = detail::is_chained<T, U>::value>                      \
    struct NAME;                                                           \
    template <class T, class U, class B> /* U is an operand type */        \
    struct NAME<T, U, B, false> : B {                                      \
        friend T operator OP(T a, const U& b) { a OP##= b; return a; }     \
    };                                                                     \
    template <class T, class U, class B> /* U is the chained base */       \
    struct NAME<T, U, B, true> : U {                                       \
        friend T operator OP(T a, const T& b) { a OP##= b; return a; }     \
    };

GOSS_SHIM_BINOP(addable, +)
GOSS_SHIM_BINOP(subtractable, -)
GOSS_SHIM_BINOP(andable, &)
GOSS_SHIM_BINOP(orable, |)
GOSS_SHIM_BINOP(xorable, ^)
GOSS_SHIM_BINOP(left_shiftable, <<)
GOSS_SHIM_BINOP(right_shiftable, >>)
#undef GOSS_SHIM_BINOP

template <class T, class U = T, class B = detail::empty_base,
          bool = detail::is_chained<T, U>::value>
struct equality_comparable;
template <class T, class U, class B>
struct equality_comparable<T, U, B, false> : B {
    friend bool operator!=(const T& a, const U& b) { return !(a == b); }
    friend bool operator==(const U& a, const T& b) { return b == a; }
    friend bool operator!=(const U& a, const T& b) { return !(b == a); }
};
template <class T, class U, class B>
struct equality_comparable<T, U, B, true> : U {
    friend bool operator!=(const T& a, const T& b) { return !(a == b); }
};
template <class T, class B>  // one-type operand form (U == T)
struct equality_comparable<T, T, B, false> : B {
    friend bool operator!=(const T& a, const T& b) { return !(a == b); }
};

template <class T, class U = T, class B = detail::empty_base,
          bool = detail::is_chained<T, U>::value>
struct less_than_comparable;
template <class T, class U, class B>
struct less_than_comparable<T, U, B, false> : B {
    friend bool operator>(const T& a, const U& b) { return b < a; }
    friend bool operator<=(const T& a, const U& b) { return !(b < a); }
    friend bool operator>=(const T& a, const U& b) { return !(a < b); }
};
template <class T, class U, class B>
struct less_than_comparable<T, U, B, true> : U {
    friend bool operator>(const T& a, const T& b) { return b < a; }
    friend bool operator<=(const T& a, const T& b) { return !(b < a); }
    friend bool operator>=(const T& a, const T& b) { return !(a < b); }
};
template <class T, class B>  // one-type operand form (U == T)
struct less_than_comparable<T, T, B, false> : B {
    friend bool operator>(const T& a, const T& b) { return b < a; }
    friend bool operator<=(const T& a, const T& b) { return !(b < a); }
    friend bool operator>=(const T& a, const T& b) { return !(a < b); }
};

template <class T, class B = detail::empty_base>
struct incrementable : B {
    friend T operator++(T& a, int) { T t(a); ++a; return t; }
};

template <class T, class B = detail::empty_base>
struct decrementable : B {
    friend T operator--(T& a, int) { T t(a); --a; return t; }
};

}  // namespace boost
