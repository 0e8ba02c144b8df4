#pragma once
#include <map>
#include <string>
namespace boost { namespace program_options {
// minimal stand-in: GossCmdContext only holds a const reference
class variables_map : public std::map<std::string, int> {};
} }
