// Harness shim: maps the small boost.thread surface used by the reference
// (util/IndexThreadReduce.h:25-121, FullSystem.h mutex members) onto the
// C++ standard library, so the ROS-free reference units compile without
// boost. Only what those headers actually use is provided.
#pragma once
#include <condition_variable>
#include <functional>
#include <mutex>
#include <thread>

namespace boost {

using mutex = std::mutex;
using condition_variable = std::condition_variable;
using thread = std::thread;

template <typename T> using unique_lock = std::unique_lock<T>;
template <typename Sig> using function = std::function<Sig>;

template <typename... Args>
auto bind(Args&&... args)
    -> decltype(std::bind(std::forward<Args>(args)...)) {
  return std::bind(std::forward<Args>(args)...);
}

}  // namespace boost

// the reference uses unqualified _1.._4 (boost/bind.hpp exports them
// globally); mirror that with the std placeholders
using std::placeholders::_1;
using std::placeholders::_2;
using std::placeholders::_3;
using std::placeholders::_4;
