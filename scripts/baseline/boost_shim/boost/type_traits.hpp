#ifndef GOSS_SHIM_TYPE_TRAITS_HPP
#define GOSS_SHIM_TYPE_TRAITS_HPP
#include <type_traits>
namespace boost {
using std::is_base_of;
using std::is_same;
using std::remove_reference;
using std::remove_const;
}
#endif
