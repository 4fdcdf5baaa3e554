// Asynchronous trajectory sink.
//
// The runtime-side complement to the JAX compute path: saved states are
// handed off to a background writer thread through a bounded queue, so the
// host never blocks the device loop on disk IO while streaming `saveat`
// snapshots or checkpoints (the reference keeps its whole trajectory in
// memory — experiments/SoilModel/surface_fluxes.jl:125 — which cannot work
// at 1e7 columns).
//
// File format (little-endian), one file per sink:
//   u64 magic 0x4C484A54534E4B31 ("LHJTSNK1")
//   records:
//     u64 step; f64 t; u32 n_arrays;
//     per array: u32 name_len; char name[]; u32 dtype_code; u32 ndim;
//                u64 shape[ndim]; u64 nbytes; u8 data[nbytes];
// dtype codes: 0=f32 1=f64 2=i32 3=i64
//
// C API (ctypes-friendly): trajsink_open / trajsink_append / trajsink_flush
// / trajsink_close.  Thread-safe for a single producer.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0x4C484A54534E4B31ull;

struct ArrayBlob {
  std::string name;
  uint32_t dtype_code;
  std::vector<uint64_t> shape;
  std::vector<uint8_t> data;
};

struct Record {
  uint64_t step;
  double t;
  std::vector<ArrayBlob> arrays;
};

class TrajSink {
 public:
  TrajSink(const char* path, size_t max_pending, bool append)
      : max_pending_(max_pending == 0 ? 16 : max_pending) {
    file_ = std::fopen(path, append ? "ab" : "wb");
    if (!file_) {
      ok_ = false;
      return;
    }
    // "ab" positions at end-of-file; write the magic only for a fresh file
    if (std::ftell(file_) == 0) {
      std::fwrite(&kMagic, sizeof(kMagic), 1, file_);
    }
    writer_ = std::thread([this] { this->Run(); });
  }

  ~TrajSink() { Close(); }

  bool ok() const { return ok_; }

  bool Append(Record&& rec) {
    if (!ok_) return false;
    std::unique_lock<std::mutex> lock(mu_);
    not_full_.wait(lock, [this] {
      return queue_.size() < max_pending_ || stop_;
    });
    if (stop_) return false;
    queue_.emplace_back(std::move(rec));
    not_empty_.notify_one();
    return true;
  }

  void Flush() {
    std::unique_lock<std::mutex> lock(mu_);
    drained_.wait(lock, [this] { return queue_.empty() && !writing_; });
    std::fflush(file_);
  }

  void Close() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      if (stop_) return;
      stop_ = true;
      not_empty_.notify_all();
      not_full_.notify_all();
    }
    if (writer_.joinable()) writer_.join();
    if (file_) {
      std::fclose(file_);
      file_ = nullptr;
    }
  }

  uint64_t records_written() const { return records_written_; }

 private:
  void Run() {
    for (;;) {
      Record rec;
      {
        std::unique_lock<std::mutex> lock(mu_);
        not_empty_.wait(lock, [this] { return !queue_.empty() || stop_; });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        rec = std::move(queue_.front());
        queue_.pop_front();
        writing_ = true;
        not_full_.notify_one();
      }
      Write(rec);
      {
        std::unique_lock<std::mutex> lock(mu_);
        writing_ = false;
        ++records_written_;
        if (queue_.empty()) drained_.notify_all();
      }
    }
  }

  void Write(const Record& rec) {
    std::fwrite(&rec.step, sizeof(rec.step), 1, file_);
    std::fwrite(&rec.t, sizeof(rec.t), 1, file_);
    uint32_t n = static_cast<uint32_t>(rec.arrays.size());
    std::fwrite(&n, sizeof(n), 1, file_);
    for (const auto& a : rec.arrays) {
      uint32_t name_len = static_cast<uint32_t>(a.name.size());
      std::fwrite(&name_len, sizeof(name_len), 1, file_);
      std::fwrite(a.name.data(), 1, name_len, file_);
      std::fwrite(&a.dtype_code, sizeof(a.dtype_code), 1, file_);
      uint32_t ndim = static_cast<uint32_t>(a.shape.size());
      std::fwrite(&ndim, sizeof(ndim), 1, file_);
      std::fwrite(a.shape.data(), sizeof(uint64_t), ndim, file_);
      uint64_t nbytes = a.data.size();
      std::fwrite(&nbytes, sizeof(nbytes), 1, file_);
      std::fwrite(a.data.data(), 1, nbytes, file_);
    }
  }

  std::FILE* file_ = nullptr;
  bool ok_ = true;
  size_t max_pending_;
  std::deque<Record> queue_;
  std::mutex mu_;
  std::condition_variable not_empty_, not_full_, drained_;
  std::thread writer_;
  bool stop_ = false;
  bool writing_ = false;
  uint64_t records_written_ = 0;
};

}  // namespace

extern "C" {

void* trajsink_open(const char* path, uint64_t max_pending, int append) {
  auto* sink = new TrajSink(path, static_cast<size_t>(max_pending), append != 0);
  if (!sink->ok()) {
    delete sink;
    return nullptr;
  }
  return sink;
}

// arrays are passed as parallel C arrays of length n_arrays; shapes is the
// concatenation of each array's dims (ndims[i] entries each).
int trajsink_append(void* handle, uint64_t step, double t, uint32_t n_arrays,
                    const char** names, const uint32_t* dtype_codes,
                    const uint32_t* ndims, const uint64_t* shapes,
                    const void** buffers, const uint64_t* nbytes) {
  if (!handle) return -1;
  Record rec;
  rec.step = step;
  rec.t = t;
  size_t shape_off = 0;
  for (uint32_t i = 0; i < n_arrays; ++i) {
    ArrayBlob blob;
    blob.name = names[i];
    blob.dtype_code = dtype_codes[i];
    blob.shape.assign(shapes + shape_off, shapes + shape_off + ndims[i]);
    shape_off += ndims[i];
    const auto* src = static_cast<const uint8_t*>(buffers[i]);
    blob.data.assign(src, src + nbytes[i]);
    rec.arrays.emplace_back(std::move(blob));
  }
  return static_cast<TrajSink*>(handle)->Append(std::move(rec)) ? 0 : -2;
}

void trajsink_flush(void* handle) {
  if (handle) static_cast<TrajSink*>(handle)->Flush();
}

uint64_t trajsink_records_written(void* handle) {
  return handle ? static_cast<TrajSink*>(handle)->records_written() : 0;
}

void trajsink_close(void* handle) {
  if (handle) {
    auto* sink = static_cast<TrajSink*>(handle);
    sink->Close();
    delete sink;
  }
}

}  // extern "C"
