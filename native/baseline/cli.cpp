// CLI for the native host engine: runs a scenario and prints one JSON line
// (ticks/s + ATE), optionally dumping the trajectory CSV. This is the
// measured-baseline entry point used by bench.py and the parity tests.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <string>

#include "engine.h"

int main(int argc, char** argv) {
  using namespace shermbot;
  std::string scen_name = "loop5_known";
  std::string traj_path;
  bool deterministic = false;
  int repeat = 1;
  for (int i = 1; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--scenario") && i + 1 < argc)
      scen_name = argv[++i];
    else if (!std::strcmp(argv[i], "--traj") && i + 1 < argc)
      traj_path = argv[++i];
    else if (!std::strcmp(argv[i], "--deterministic"))
      deterministic = true;
    else if (!std::strcmp(argv[i], "--repeat") && i + 1 < argc)
      repeat = std::atoi(argv[++i]);
    else if (!std::strcmp(argv[i], "--bigmap") && i + 1 < argc) {
      int N = std::atoi(argv[++i]);
      return run_bigmap(N, /*ticks=*/3, /*M=*/8);
    }
  }
  Scenario sc = get_scenario(scen_name);
  if (sc.name.empty()) {
    std::fprintf(stderr, "unknown scenario %s\n", scen_name.c_str());
    return 2;
  }

  double total_sec = 0.0;
  double ate = 0.0, ate_odom = 0.0;
  int last_seen = 0;
  std::FILE* tf =
      traj_path.empty() ? nullptr : std::fopen(traj_path.c_str(), "w");
  if (tf)
    std::fprintf(tf,
                 "tick,true_th,true_x,true_y,odom_th,odom_x,odom_y,"
                 "slam_th,slam_x,slam_y,n_seen\n");

  for (int rep = 0; rep < repeat; ++rep) {
    Engine eng;
    eng.init(sc, deterministic, 12345 + rep);
    auto t0 = std::chrono::steady_clock::now();
    for (int t = 0; t < sc.steps; ++t) {
      last_seen = eng.tick(sc.cmd_w, sc.cmd_v);
      if (tf && rep == 0)
        std::fprintf(
            tf,
            "%d,%.12g,%.12g,%.12g,%.12g,%.12g,%.12g,%.12g,%.12g,%.12g,%d\n",
            t, eng.world.truth.th, eng.world.truth.x, eng.world.truth.y,
            eng.odom.th, eng.odom.x, eng.odom.y, eng.ekf.mean[0],
            eng.ekf.mean[1], eng.ekf.mean[2], eng.ekf.seen);
    }
    auto t1 = std::chrono::steady_clock::now();
    total_sec += std::chrono::duration<double>(t1 - t0).count();
    ate = eng.ate();
    ate_odom = eng.ate_odom();
  }
  if (tf) std::fclose(tf);
  (void)last_seen;

  double ticks_per_sec = (double)sc.steps * repeat / total_sec;
  std::printf(
      "{\"scenario\": \"%s\", \"ticks_per_sec\": %.1f, \"ate\": %.6f, "
      "\"ate_odom\": %.6f, \"steps\": %d, \"repeat\": %d, "
      "\"deterministic\": %s}\n",
      sc.name.c_str(), ticks_per_sec, ate, ate_odom, sc.steps, repeat,
      deterministic ? "true" : "false");
  return 0;
}
