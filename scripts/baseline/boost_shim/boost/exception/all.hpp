// Minimal boost.exception stand-in: error_info tags attach to a
// type-erased map inside boost::exception; operator<< and
// get_error_info mirror the real API closely enough for the counting
// core to compile and report errors.
#pragma once
#include <exception>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <typeindex>

namespace boost {

class exception {
public:
    virtual ~exception() = default;
    mutable std::map<std::type_index, std::shared_ptr<void>> infos_;
};

template <class Tag, class T>
class error_info {
public:
    using value_type = T;
    explicit error_info(const T& v) : value_(v) {}
    const T& value() const { return value_; }

private:
    T value_;
};

template <class E, class Tag, class T>
const E& operator<<(const E& e, const error_info<Tag, T>& info) {
    e.infos_[std::type_index(typeid(error_info<Tag, T>))] =
        std::make_shared<T>(info.value());
    return e;
}

template <class ErrorInfo, class E>
const typename ErrorInfo::value_type* get_error_info(const E& e) {
    auto it = e.infos_.find(std::type_index(typeid(ErrorInfo)));
    if (it == e.infos_.end()) return nullptr;
    return static_cast<const typename ErrorInfo::value_type*>(it->second.get());
}

inline std::string diagnostic_information(const std::exception& e) {
    return e.what();
}

template <class E>
[[noreturn]] void throw_exception(const E& e) { throw e; }

}  // namespace boost

#define BOOST_THROW_EXCEPTION(x) throw (x)

namespace boost {
struct tag_errinfo_file_name;
using errinfo_file_name = error_info<tag_errinfo_file_name, std::string>;
struct tag_errinfo_errno;
using errinfo_errno = error_info<tag_errinfo_errno, int>;
}  // namespace boost
