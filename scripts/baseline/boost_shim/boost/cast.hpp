#pragma once
namespace boost {
template <typename To, typename From>
To numeric_cast(const From& f) { return static_cast<To>(f); }
template <typename To, typename From>
To polymorphic_downcast(From* f) { return static_cast<To>(f); }
}
