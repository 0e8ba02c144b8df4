// std-backed shim for boost/tuple (member get<N>() preserved)
#ifndef GOSS_SHIM_TUPLE_HPP
#define GOSS_SHIM_TUPLE_HPP
#include <tuple>
#include <utility>
namespace boost {
template <class... Ts>
class tuple : public std::tuple<Ts...> {
public:
    using base = std::tuple<Ts...>;
    using base::base;
    tuple() = default;
    tuple(const base& t) : base(t) {}
    template <int N>
    typename std::tuple_element<N, base>::type& get() {
        return std::get<N>(static_cast<base&>(*this));
    }
    template <int N>
    const typename std::tuple_element<N, base>::type& get() const {
        return std::get<N>(static_cast<const base&>(*this));
    }
};
template <class... Ts>
tuple<typename std::decay<Ts>::type...> make_tuple(Ts&&... vs) {
    return tuple<typename std::decay<Ts>::type...>(std::forward<Ts>(vs)...);
}
template <std::size_t N, class... Ts>
auto& get(tuple<Ts...>& t) { return std::get<N>(static_cast<std::tuple<Ts...>&>(t)); }
template <std::size_t N, class... Ts>
const auto& get(const tuple<Ts...>& t) { return std::get<N>(static_cast<const std::tuple<Ts...>&>(t)); }
using std::tie;
}
#endif
