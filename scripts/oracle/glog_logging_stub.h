// Minimal glog API stub for the pbrt-v3-IILE oracle build (ext/glog is
// an empty submodule in the reference checkout).  Implements just the
// macro surface pbrt uses; FATAL aborts, CHECKs are real.
#pragma once
#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

namespace google {
inline void InitGoogleLogging(const char*) {}
inline void ShutdownGoogleLogging() {}
inline void InstallFailureSignalHandler() {}
}  // namespace google

inline int FLAGS_stderrthreshold = 2;
inline int FLAGS_minloglevel = 0;
inline int FLAGS_v = 0;
inline bool FLAGS_logtostderr = false;
inline std::string FLAGS_log_dir;

namespace glogstub {
class Msg {
 public:
  Msg(bool fatal, bool enabled) : fatal_(fatal), enabled_(enabled) {}
  ~Msg() {
    if ((enabled_ || fatal_) && ss_.tellp() > 0)
      std::cerr << ss_.str() << std::endl;
    if (fatal_) std::abort();
  }
  template <typename T>
  Msg& operator<<(const T& v) {
    if (enabled_ || fatal_) ss_ << v;
    return *this;
  }
  Msg& operator<<(std::ostream& (*)(std::ostream&)) { return *this; }

 private:
  std::ostringstream ss_;
  bool fatal_, enabled_;
};
struct Voidify {
  void operator&(Msg&) {}
};
struct NullStream {
  template <typename T>
  NullStream& operator<<(const T&) { return *this; }
  NullStream& operator<<(std::ostream& (*)(std::ostream&)) { return *this; }
};
template <typename T>
T* CheckNotNull(T* p, const char* msg) {
  if (p == nullptr) {
    std::cerr << msg << std::endl;
    std::abort();
  }
  return p;
}
}  // namespace glogstub

#define GLOG_MSG_INFO ::glogstub::Msg(false, FLAGS_minloglevel <= 0 && FLAGS_stderrthreshold <= 0)
#define GLOG_MSG_WARNING ::glogstub::Msg(false, FLAGS_minloglevel <= 1 && FLAGS_stderrthreshold <= 1)
#define GLOG_MSG_ERROR ::glogstub::Msg(false, FLAGS_minloglevel <= 2)
#define GLOG_MSG_FATAL ::glogstub::Msg(true, true)
#define LOG(severity) GLOG_MSG_##severity
#define VLOG(n) ::glogstub::Msg(false, (n) <= FLAGS_v)
#define LOG_IF(severity, cond) \
  (!(cond)) ? (void)0 : ::glogstub::Voidify() & (GLOG_MSG_##severity << "")

#define CHECK(c) \
  (c) ? (void)0 : ::glogstub::Voidify() & \
      (::glogstub::Msg(true, true) << "Check failed: " #c " ")
#define CHECK_EQ(a, b) CHECK((a) == (b))
#define CHECK_NE(a, b) CHECK((a) != (b))
#define CHECK_LT(a, b) CHECK((a) < (b))
#define CHECK_LE(a, b) CHECK((a) <= (b))
#define CHECK_GT(a, b) CHECK((a) > (b))
#define CHECK_GE(a, b) CHECK((a) >= (b))
#define CHECK_NEAR(a, b, eps) CHECK(std::abs((a) - (b)) <= (eps))
#define CHECK_NOTNULL(p) \
  ::glogstub::CheckNotNull((p), "Check failed: " #p " != nullptr")

#define DCHECK(c) ::glogstub::NullStream()
#define DCHECK_EQ(a, b) ::glogstub::NullStream()
#define DCHECK_NE(a, b) ::glogstub::NullStream()
#define DCHECK_LT(a, b) ::glogstub::NullStream()
#define DCHECK_LE(a, b) ::glogstub::NullStream()
#define DCHECK_GT(a, b) ::glogstub::NullStream()
#define DCHECK_GE(a, b) ::glogstub::NullStream()
