#pragma once
#include <type_traits>
namespace boost {
template <typename T>
struct call_traits {
    using value_type = T;
    using reference = T&;
    using const_reference = const T&;
    using param_type = typename std::conditional<
        std::is_arithmetic<T>::value || std::is_pointer<T>::value, T,
        const T&>::type;
};
}  // namespace boost
