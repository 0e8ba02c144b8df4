#pragma once
#include <boost/cast.hpp>
