// std-backed shim for boost/function_output_iterator.hpp.  The wrapped
// functor (std::bind result) is copy-constructible but NOT assignable;
// the iterator must still be assignable for std::copy/merge, so the
// functor lives in an optional re-emplaced on assignment.
#ifndef GOSS_SHIM_FUNCTION_OUTPUT_ITERATOR_HPP
#define GOSS_SHIM_FUNCTION_OUTPUT_ITERATOR_HPP
#include <iterator>
#include <optional>
namespace boost {
template <class F>
class function_output_iterator {
public:
    using iterator_category = std::output_iterator_tag;
    using value_type = void;
    using difference_type = std::ptrdiff_t;
    using pointer = void;
    using reference = void;
    explicit function_output_iterator(const F& f) : f_(f) {}
    function_output_iterator(const function_output_iterator& o) : f_(o.f_) {}
    function_output_iterator& operator=(const function_output_iterator& o) {
        f_.emplace(*o.f_);
        return *this;
    }
    struct proxy {
        F& f;
        template <class T>
        proxy& operator=(const T& v) { f(v); return *this; }
    };
    proxy operator*() { return proxy{*f_}; }
    function_output_iterator& operator++() { return *this; }
    function_output_iterator& operator++(int) { return *this; }
private:
    std::optional<F> f_;
};
template <class F>
function_output_iterator<F> make_function_output_iterator(const F& f) {
    return function_output_iterator<F>(f);
}
}
#endif
