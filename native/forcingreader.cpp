// Memory-mapped time-series forcing reader with asynchronous prefetch.
//
// The input side of the native runtime (complement of trajsink.cpp): large
// per-column atmospheric forcing series (wind, temperature, humidity,
// precipitation ...) live on disk and are consumed by the device loop in
// fixed windows of timesteps.  A background thread stages the next window
// while the device integrates the current one, so forcing IO rides under
// compute instead of serializing with it.  (The reference has no data
// loader at all — its forcing is a hard-coded Julia closure,
// experiments/SoilModel/surface_fluxes.jl:61-87.)
//
// File format (little-endian), produced by runtime/forcing.py:
//   u64 magic 0x31304352464A484C ("LHJFRC01" as bytes)
//   u32 dtype_code (0=f32 1=f64); u32 n_fields;
//   u64 n_times; u64 n_cols;
//   per field: u32 name_len; char name[];
//   f64 times[n_times];
//   data[t][field][col]   (t-major, field-minor blocks of n_cols)
//
// C API (ctypes-friendly): forcing_open / forcing_info / forcing_field_name
// / forcing_get_times / forcing_prefetch / forcing_read /
// forcing_prefetch_hits / forcing_close.  Single-consumer.

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0x31304352464A484Cull;  // "LHJFRC01"

class ForcingReader {
 public:
  explicit ForcingReader(const char* path) {
    fd_ = ::open(path, O_RDONLY);
    if (fd_ < 0) return;
    struct stat st;
    if (fstat(fd_, &st) != 0) return;
    size_ = static_cast<size_t>(st.st_size);
    map_ = static_cast<const uint8_t*>(
        mmap(nullptr, size_, PROT_READ, MAP_PRIVATE, fd_, 0));
    if (map_ == MAP_FAILED) {
      map_ = nullptr;
      return;
    }
    const uint8_t* p = map_;
    uint64_t magic;
    if (size_ < sizeof(magic)) return;
    std::memcpy(&magic, p, 8);
    p += 8;
    if (magic != kMagic) return;
    std::memcpy(&dtype_code_, p, 4);
    p += 4;
    uint32_t n_fields;
    std::memcpy(&n_fields, p, 4);
    p += 4;
    std::memcpy(&n_times_, p, 8);
    p += 8;
    std::memcpy(&n_cols_, p, 8);
    p += 8;
    for (uint32_t i = 0; i < n_fields; ++i) {
      uint32_t len;
      std::memcpy(&len, p, 4);
      p += 4;
      names_.emplace_back(reinterpret_cast<const char*>(p), len);
      p += len;
    }
    times_ = reinterpret_cast<const double*>(p);
    p += n_times_ * sizeof(double);
    data_ = p;
    itemsize_ = dtype_code_ == 1 ? 8 : 4;
    const size_t need = static_cast<size_t>(data_ - map_) +
                        n_times_ * names_.size() * n_cols_ * itemsize_;
    ok_ = need <= size_;
    if (ok_) worker_ = std::thread([this] { Run(); });
  }

  ~ForcingReader() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      stop_ = true;
      task_ready_.notify_all();
    }
    if (worker_.joinable()) worker_.join();
    if (map_) munmap(const_cast<uint8_t*>(map_), size_);
    if (fd_ >= 0) ::close(fd_);
  }

  bool ok() const { return ok_; }
  uint32_t dtype_code() const { return dtype_code_; }
  uint64_t n_times() const { return n_times_; }
  uint64_t n_cols() const { return n_cols_; }
  const std::vector<std::string>& names() const { return names_; }
  const double* times() const { return times_; }
  uint64_t prefetch_hits() const { return hits_; }

  size_t window_bytes(uint64_t nt) const {
    return static_cast<size_t>(nt) * names_.size() * n_cols_ * itemsize_;
  }

  // Ask the worker to stage [t0, t0+nt); returns immediately.
  bool Prefetch(uint64_t t0, uint64_t nt) {
    if (!ok_ || t0 + nt > n_times_) return false;
    std::unique_lock<std::mutex> lock(mu_);
    task_t0_ = t0;
    task_nt_ = nt;
    task_pending_ = true;
    task_ready_.notify_one();
    return true;
  }

  // Blocking copy of [t0, t0+nt) into out.  Serves from the staged buffer
  // when it matches (waiting for an in-flight prefetch of that window),
  // otherwise copies straight from the map.
  bool Read(uint64_t t0, uint64_t nt, void* out) {
    if (!ok_ || t0 + nt > n_times_) return false;
    {
      std::unique_lock<std::mutex> lock(mu_);
      // wait for an in-flight or pending prefetch to settle
      staged_done_.wait(lock, [this] { return !task_pending_ && !staging_; });
      if (staged_valid_ && staged_t0_ == t0 && staged_nt_ == nt) {
        std::memcpy(out, staged_.data(), window_bytes(nt));
        ++hits_;
        return true;
      }
    }
    std::memcpy(out, data_ + t0 * row_bytes(), window_bytes(nt));
    return true;
  }

 private:
  size_t row_bytes() const { return names_.size() * n_cols_ * itemsize_; }

  void Run() {
    for (;;) {
      uint64_t t0, nt;
      {
        std::unique_lock<std::mutex> lock(mu_);
        task_ready_.wait(lock, [this] { return task_pending_ || stop_; });
        if (stop_) return;
        t0 = task_t0_;
        nt = task_nt_;
        task_pending_ = false;
        staging_ = true;
      }
      std::vector<uint8_t> buf(window_bytes(nt));
      std::memcpy(buf.data(), data_ + t0 * row_bytes(), buf.size());
      {
        std::unique_lock<std::mutex> lock(mu_);
        staged_ = std::move(buf);
        staged_t0_ = t0;
        staged_nt_ = nt;
        staged_valid_ = true;
        staging_ = false;
        staged_done_.notify_all();
      }
    }
  }

  int fd_ = -1;
  size_t size_ = 0;
  const uint8_t* map_ = nullptr;
  const uint8_t* data_ = nullptr;
  const double* times_ = nullptr;
  uint32_t dtype_code_ = 0;
  size_t itemsize_ = 4;
  uint64_t n_times_ = 0, n_cols_ = 0;
  std::vector<std::string> names_;
  bool ok_ = false;

  std::mutex mu_;
  std::condition_variable task_ready_, staged_done_;
  std::thread worker_;
  bool stop_ = false;
  bool task_pending_ = false, staging_ = false;
  uint64_t task_t0_ = 0, task_nt_ = 0;
  std::vector<uint8_t> staged_;
  uint64_t staged_t0_ = 0, staged_nt_ = 0;
  bool staged_valid_ = false;
  uint64_t hits_ = 0;
};

}  // namespace

extern "C" {

void* forcing_open(const char* path) {
  auto* r = new ForcingReader(path);
  if (!r->ok()) {
    delete r;
    return nullptr;
  }
  return r;
}

int forcing_info(void* h, uint32_t* dtype_code, uint32_t* n_fields,
                 uint64_t* n_times, uint64_t* n_cols) {
  if (!h) return -1;
  auto* r = static_cast<ForcingReader*>(h);
  *dtype_code = r->dtype_code();
  *n_fields = static_cast<uint32_t>(r->names().size());
  *n_times = r->n_times();
  *n_cols = r->n_cols();
  return 0;
}

int forcing_field_name(void* h, uint32_t i, char* out, uint32_t cap) {
  if (!h) return -1;
  auto* r = static_cast<ForcingReader*>(h);
  if (i >= r->names().size()) return -2;
  const auto& name = r->names()[i];
  if (name.size() + 1 > cap) return -3;
  std::memcpy(out, name.c_str(), name.size() + 1);
  return 0;
}

int forcing_get_times(void* h, double* out) {
  if (!h) return -1;
  auto* r = static_cast<ForcingReader*>(h);
  std::memcpy(out, r->times(), r->n_times() * sizeof(double));
  return 0;
}

int forcing_prefetch(void* h, uint64_t t0, uint64_t nt) {
  if (!h) return -1;
  return static_cast<ForcingReader*>(h)->Prefetch(t0, nt) ? 0 : -2;
}

int forcing_read(void* h, uint64_t t0, uint64_t nt, void* out) {
  if (!h) return -1;
  return static_cast<ForcingReader*>(h)->Read(t0, nt, out) ? 0 : -2;
}

uint64_t forcing_prefetch_hits(void* h) {
  return h ? static_cast<ForcingReader*>(h)->prefetch_hits() : 0;
}

void forcing_close(void* h) {
  delete static_cast<ForcingReader*>(h);
}

}  // extern "C"
