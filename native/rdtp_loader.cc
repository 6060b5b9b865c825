// rdtp_loader.cc — native data loader for radar_depth_tpu packed shards.
//
// The reference feeds its training loop through torch's C++ DataLoader
// machinery (multiprocess workers + pinned-memory queue;
// upstream:main.py::create_data_loaders, SURVEY.md §3.1 process boundary).
// This is the TPU-native equivalent: samples live in a packed fixed-record
// binary shard (written by radar_depth_tpu/data/packed.py), the file is
// mmap'd, and a small thread pool assembles shuffled batches into a ring of
// reusable buffers ahead of the consumer. Python binds via ctypes (no
// pybind11 on this image) and wraps the returned buffer zero-copy as numpy
// arrays.
//
// File layout (little-endian):
//   magic  "RDTPACK1"                      8 bytes
//   u64    header_size (bytes, incl magic) 8
//   u64    num_samples                     8
//   u64    record_size (bytes)             8
//   u32    num_fields                      4
//   per field:
//     u32  name_len, char name[name_len]
//     u32  dtype code (0=u8, 1=f32, 2=bool, 3=i32, 4=f64, 5=i64)
//     u32  ndim, u64 shape[ndim]
//     u64  offset (within record), u64 nbytes
//   records: num_samples * record_size bytes, 64-byte aligned start.
//
// Build: g++ -O3 -march=native -shared -fPIC -o librdtp.so rdtp_loader.cc -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Shard {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t file_size = 0;
  uint64_t header_size = 0;
  uint64_t num_samples = 0;
  uint64_t record_size = 0;
  uint64_t data_offset = 0;
};

struct Batch {
  std::vector<uint8_t> data;
  uint64_t epoch = 0;
  uint64_t index_in_epoch = 0;
};

struct Loader {
  Shard* shard = nullptr;
  uint64_t batch_size = 0;
  bool shuffle = false;
  bool drop_last = true;
  uint64_t seed = 0;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::deque<Batch*> ready;
  std::vector<Batch*> pool;
  size_t queue_depth = 4;
  std::atomic<bool> stop{false};

  // producer state (guarded by mu)
  std::vector<uint64_t> order;
  uint64_t cursor = 0;
  uint64_t epoch = 0;

  Batch* current = nullptr;  // batch currently lent out to the consumer
};

uint64_t rd_u64(const uint8_t*& p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  p += 8;
  return v;
}

void reshuffle(Loader* L) {
  const uint64_t n = L->shard->num_samples;
  L->order.resize(n);
  for (uint64_t i = 0; i < n; ++i) L->order[i] = i;
  if (L->shuffle) {
    std::mt19937_64 rng(L->seed + 0x9e3779b97f4a7c15ULL * (L->epoch + 1));
    for (uint64_t i = n - 1; i > 0; --i) {
      std::uniform_int_distribution<uint64_t> d(0, i);
      std::swap(L->order[i], L->order[d(rng)]);
    }
  }
  L->cursor = 0;
}

void worker_main(Loader* L) {
  const uint64_t rec = L->shard->record_size;
  const uint8_t* data = L->shard->base + L->shard->data_offset;
  while (!L->stop.load(std::memory_order_relaxed)) {
    Batch* buf = nullptr;
    std::vector<uint64_t> idx;
    uint64_t epoch, index_in_epoch;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_space.wait(lk, [&] { return L->stop || !L->pool.empty(); });
      if (L->stop) return;
      // claim indices for one batch
      uint64_t n = L->shard->num_samples;
      uint64_t remaining = n - L->cursor;
      if (remaining < L->batch_size) {
        ++L->epoch;
        reshuffle(L);
      }
      epoch = L->epoch;
      index_in_epoch = L->cursor / L->batch_size;
      idx.assign(L->order.begin() + L->cursor,
                 L->order.begin() + L->cursor + L->batch_size);
      L->cursor += L->batch_size;
      buf = L->pool.back();
      L->pool.pop_back();
    }
    // copy outside the lock — this is the actual "work"
    for (uint64_t i = 0; i < idx.size(); ++i) {
      std::memcpy(buf->data.data() + i * rec, data + idx[i] * rec, rec);
    }
    buf->epoch = epoch;
    buf->index_in_epoch = index_in_epoch;
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->ready.push_back(buf);
    }
    L->cv_ready.notify_one();
  }
}

}  // namespace

extern "C" {

void* rdtp_open(const char* path) {
  auto* s = new Shard();
  s->fd = ::open(path, O_RDONLY);
  if (s->fd < 0) {
    delete s;
    return nullptr;
  }
  struct stat st;
  if (fstat(s->fd, &st) != 0) {
    ::close(s->fd);
    delete s;
    return nullptr;
  }
  s->file_size = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, s->file_size, PROT_READ, MAP_PRIVATE, s->fd, 0);
  if (m == MAP_FAILED) {
    ::close(s->fd);
    delete s;
    return nullptr;
  }
  s->base = static_cast<const uint8_t*>(m);
  if (s->file_size < 36 || std::memcmp(s->base, "RDTPACK1", 8) != 0) {
    munmap(m, s->file_size);
    ::close(s->fd);
    delete s;
    return nullptr;
  }
  const uint8_t* p = s->base + 8;
  s->header_size = rd_u64(p);
  s->num_samples = rd_u64(p);
  s->record_size = rd_u64(p);
  s->data_offset = (s->header_size + 63) & ~uint64_t(63);
  if (s->data_offset + s->num_samples * s->record_size > s->file_size) {
    munmap(m, s->file_size);
    ::close(s->fd);
    delete s;
    return nullptr;
  }
  return s;
}

uint64_t rdtp_num_samples(void* h) { return static_cast<Shard*>(h)->num_samples; }
uint64_t rdtp_record_size(void* h) { return static_cast<Shard*>(h)->record_size; }
uint64_t rdtp_header_size(void* h) { return static_cast<Shard*>(h)->header_size; }

// Copy raw header bytes (for Python to parse the field table).
void rdtp_read_header(void* h, uint8_t* out) {
  auto* s = static_cast<Shard*>(h);
  std::memcpy(out, s->base, s->header_size);
}

// Gather n records by index into out (n * record_size bytes).
void rdtp_gather(void* h, const uint64_t* indices, uint64_t n, uint8_t* out) {
  auto* s = static_cast<Shard*>(h);
  const uint8_t* data = s->base + s->data_offset;
  for (uint64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * s->record_size, data + indices[i] * s->record_size,
                s->record_size);
  }
}

void rdtp_close(void* h) {
  auto* s = static_cast<Shard*>(h);
  munmap(const_cast<uint8_t*>(s->base), s->file_size);
  ::close(s->fd);
  delete s;
}

// ------------------------------------------------------------------ loader

void* rdtp_loader_create(void* shard, uint64_t batch_size, int shuffle,
                         uint64_t seed, uint64_t queue_depth,
                         uint64_t num_threads) {
  auto* s = static_cast<Shard*>(shard);
  // A batch larger than the dataset would make the worker's reshuffle loop
  // spin forever with remaining < batch_size and then read past the end of
  // the order vector (heap over-read) — reject at creation.
  if (batch_size == 0 || batch_size > s->num_samples) return nullptr;
  auto* L = new Loader();
  L->shard = s;
  L->batch_size = batch_size;
  L->shuffle = shuffle != 0;
  L->seed = seed;
  L->queue_depth = queue_depth ? queue_depth : 4;
  reshuffle(L);
  for (size_t i = 0; i < L->queue_depth; ++i) {
    auto* b = new Batch();
    b->data.resize(batch_size * L->shard->record_size);
    L->pool.push_back(b);
  }
  uint64_t nt = num_threads ? num_threads : 1;
  for (uint64_t i = 0; i < nt; ++i) L->workers.emplace_back(worker_main, L);
  return L;
}

// Returns a pointer to the next ready batch (batch_size*record_size bytes).
// The buffer stays valid until the following rdtp_loader_next call.
const uint8_t* rdtp_loader_next(void* h, uint64_t* epoch_out,
                                uint64_t* index_out) {
  auto* L = static_cast<Loader*>(h);
  Batch* prev = L->current;
  Batch* b = nullptr;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    if (prev) L->pool.push_back(prev);
    L->cv_ready.wait(lk, [&] { return L->stop || !L->ready.empty(); });
    if (L->stop) return nullptr;
    b = L->ready.front();
    L->ready.pop_front();
  }
  L->cv_space.notify_all();
  L->current = b;
  if (epoch_out) *epoch_out = b->epoch;
  if (index_out) *index_out = b->index_in_epoch;
  return b->data.data();
}

void rdtp_loader_destroy(void* h) {
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  for (auto* b : L->pool) delete b;
  for (auto* b : L->ready) delete b;
  delete L->current;
  delete L;
}

}  // extern "C"
