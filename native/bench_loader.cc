// bench_loader.cc — claim-order prefetch-pipeline microbenchmark
// (VERDICT r3 #5: bound the loader's thread-scaling honestly).
//
// The pod-rate claim (NOTES.md r3: 2.62 ms/img x ~5 cores feeds a v5e-8)
// is single-core arithmetic; the shared ready-deque + one mutex/condvar
// pair is the suspected serializer at 8-16 workers. This bench measures
// the pipeline itself, separated from augmentation work:
//
//   * TINY records (augment off): every batch is a ~zero-work handoff, so
//     batches/s directly prices the full claim-order path per batch
//     (claim indices + buffer under the lock, ready push, consumer
//     find_expected + condvar wakeup). This is the Amdahl serial term.
//   * FULL-RES-sized records (augment off): adds the real 2x memcpy
//     (gather + consumer-visible buffer) — the memory-bandwidth floor.
//
// Run for threads {1,2,4,8,16}; on a 1-core host the thread axis cannot
// show parallel SPEEDUP (everything timeshares one core) but it does
// expose pathological contention: if the per-batch handoff cost GROWS
// with thread count (thundering-herd wakeups, lock convoy), that growth
// is the thing that would cap scaling on a many-core host. The scaling
// bound to record in NOTES.md is  cap = work_per_batch / handoff_per_batch.
//
// Build+run: make -C native bench_loader && ./native/bench_loader

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <string>

#include "rdtp_loader.cc"

using Clock = std::chrono::steady_clock;

static std::string write_shard(uint64_t num_samples, uint64_t record_size) {
  std::string path = "/tmp/rdtp_bench_shard_" +
                     std::to_string(record_size) + ".bin";
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) { perror("fopen"); exit(1); }
  const uint64_t header_size = 36;
  uint8_t head[64] = {0};
  std::memcpy(head, "RDTPACK1", 8);
  std::memcpy(head + 8, &header_size, 8);
  std::memcpy(head + 16, &num_samples, 8);
  std::memcpy(head + 24, &record_size, 8);
  fwrite(head, 1, 64, f);  // data_offset = align64(36) = 64
  std::vector<uint8_t> rec(record_size);
  std::mt19937_64 rng(7);
  for (auto& b : rec) b = static_cast<uint8_t>(rng());
  for (uint64_t i = 0; i < num_samples; ++i) fwrite(rec.data(), 1,
                                                    record_size, f);
  fclose(f);
  return path;
}

struct Row { uint64_t threads; double batches_per_s, us_per_batch; };

static Row run_one(void* set, uint64_t batch, uint64_t threads,
                   uint64_t iters) {
  void* L = rdtp_loader_create(set, batch, /*shuffle=*/1, /*seed=*/42,
                               /*queue_depth=*/2 * threads + 2, threads);
  if (!L) { fprintf(stderr, "loader_create failed\n"); exit(1); }
  // warmup: fill the pipeline
  for (int i = 0; i < 32; ++i) rdtp_loader_next(L, nullptr, nullptr);
  auto t0 = Clock::now();
  volatile uint8_t sink = 0;
  for (uint64_t i = 0; i < iters; ++i) {
    const uint8_t* b = rdtp_loader_next(L, nullptr, nullptr);
    sink ^= b[0];
  }
  double s = std::chrono::duration<double>(Clock::now() - t0).count();
  rdtp_loader_destroy(L);
  (void)sink;
  return {threads, iters / s, 1e6 * s / iters};
}

int main(int argc, char** argv) {
  const uint64_t batch = argc > 1 ? strtoull(argv[1], nullptr, 10) : 32;
  const uint64_t tiny_iters = argc > 2 ? strtoull(argv[2], nullptr, 10)
                                       : 20000;
  const uint64_t threads_list[] = {1, 2, 4, 8, 16};

  // --- tiny records: prices the claim-order handoff itself ---
  {
    const uint64_t rec = 64, n = 4096;
    std::string p = write_shard(n, rec);
    void* set = rdtp_open(p.c_str());
    printf("# tiny records (%lu B): per-batch pipeline handoff cost\n",
           (unsigned long)rec);
    printf("%-8s %14s %14s\n", "threads", "batches/s", "us/batch");
    for (uint64_t t : threads_list) {
      Row r = run_one(set, batch, t, tiny_iters);
      printf("%-8lu %14.0f %14.2f\n", (unsigned long)r.threads,
             r.batches_per_s, r.us_per_batch);
    }
    rdtp_close(set);
    remove(p.c_str());
  }

  // --- full-res-sized records: adds the real gather memcpy ---
  {
    // ~ the real 450x800 record: rgb u8 + lidar f32 + points + tfs ≈ 2.6 MB
    const uint64_t rec = 2'600'000, n = 256;
    std::string p = write_shard(n, rec);
    void* set = rdtp_open(p.c_str());
    const uint64_t iters = 400;
    printf("\n# full-res-sized records (%.1f MB): memcpy-bound floor\n",
           rec / 1e6);
    printf("%-8s %14s %14s %12s\n", "threads", "batches/s", "us/batch",
           "img/s");
    for (uint64_t t : threads_list) {
      Row r = run_one(set, batch, t, iters);
      printf("%-8lu %14.1f %14.1f %12.0f\n", (unsigned long)r.threads,
             r.batches_per_s, r.us_per_batch, r.batches_per_s * batch);
    }
    rdtp_close(set);
    remove(p.c_str());
  }
  return 0;
}
