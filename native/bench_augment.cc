// bench_augment.cc — microbenchmark for the worker-side augmentation hot path
// (rdtp_loader.cc::augment_record). Fabricates one full-res record in memory
// (no file IO) and reports per-phase ms/image, so loader-throughput work
// (VERDICT r2 next #1) optimizes the real bottleneck instead of guessing.
//
// Build+run: make -C native bench && ./native/bench_augment [H W iters]

#include <chrono>
#include <cstdio>
#include <cstdlib>

#define RDTP_BENCH_PHASES 1
#include "rdtp_loader.cc"

using Clock = std::chrono::steady_clock;

static double ms_since(Clock::time_point t0) {
  return std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
}

int main(int argc, char** argv) {
  const int H = argc > 1 ? atoi(argv[1]) : 450;
  const int W = argc > 2 ? atoi(argv[2]) : 800;
  const int iters = argc > 3 ? atoi(argv[3]) : 20;
  const uint64_t lidar_points = 40960, sweeps = 5;

  AugSpec a{};
  uint64_t off = 0;
  a.image_off = off; off += uint64_t(H) * W * 3;
  off = (off + 7) & ~7ull;
  a.lidar_depth_off = off; off += uint64_t(H) * W * 4;
  a.lidar_points_off = off; off += lidar_points * 3 * 4;
  a.radar_tf_off = off; off += sweeps * 16 * 4;
  a.intrinsics_off = off; off += 9 * 4;
  a.height = H; a.width = W;
  a.lidar_points = lidar_points; a.num_sweeps = sweeps;
  a.scale_min = 1.0f; a.scale_max = 1.5f;
  a.rot_deg = 5.0f; a.hflip_prob = 0.5f; a.jitter = 0.1f;
  a.seed = 42;

  const uint64_t rec_size = (off + 63) & ~63ull;
  std::vector<uint8_t> master(rec_size), rec(rec_size);
  std::mt19937_64 rng(1);
  for (auto& b : master) b = static_cast<uint8_t>(rng());
  // sane float fields (identity K, plausible depths)
  {
    auto* d = reinterpret_cast<float*>(master.data() + a.lidar_depth_off);
    for (uint64_t i = 0; i < uint64_t(H) * W; ++i)
      d[i] = (i % 7 == 0) ? 5.0f + float(i % 600) / 10.f : 0.0f;
    auto* p = reinterpret_cast<float*>(master.data() + a.lidar_points_off);
    for (uint64_t i = 0; i < lidar_points * 3; ++i) p[i] = float(i % 100);
    auto* t = reinterpret_cast<float*>(master.data() + a.radar_tf_off);
    for (uint64_t i = 0; i < sweeps * 16; ++i) t[i] = float(i % 4 == 0);
    float K[9] = {1266.f, 0.f, W / 2.f, 0.f, 1266.f, H / 2.f, 0.f, 0.f, 1.f};
    std::memcpy(master.data() + a.intrinsics_off, K, sizeof(K));
  }

  double t_copy = 0, t_total = 0;
  g_phase_ms[0] = g_phase_ms[1] = g_phase_ms[2] = g_phase_ms[3] = 0;
  volatile uint8_t sink = 0;
  for (int it = 0; it < iters; ++it) {
    auto t0 = Clock::now();
    std::memcpy(rec.data(), master.data(), rec_size);
    t_copy += ms_since(t0);
    auto t1 = Clock::now();
    augment_record(rec.data(), a, splitmix64(1000 + it));
    t_total += ms_since(t1);
    sink ^= rec[it % rec_size];
  }
  (void)sink;
  printf("%dx%d, %d iters, record %.1f MB\n", H, W, iters, rec_size / 1e6);
  printf("  memcpy          : %7.3f ms/img\n", t_copy / iters);
  printf("  rgb warp        : %7.3f ms/img\n", g_phase_ms[0] / iters);
  printf("  rgb jitter/store: %7.3f ms/img\n", g_phase_ms[1] / iters);
  printf("  lidar warp      : %7.3f ms/img\n", g_phase_ms[2] / iters);
  printf("  points/K fold   : %7.3f ms/img\n", g_phase_ms[3] / iters);
  printf("  augment total   : %7.3f ms/img  (%.1f img/s/core incl copy)\n",
         t_total / iters, 1e3 / (t_total / iters + t_copy / iters));
  return 0;
}
