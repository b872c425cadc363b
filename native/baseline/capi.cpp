// C API over the native host engine (engine.h), consumed from Python via
// ctypes (shermbot_navigation_tpu/native). Exposes:
//   - full pipeline instances (create/tick/poses/state/destroy)
//   - the standalone perception stage (scan -> landmark detections)
// All arrays are caller-allocated doubles; all functions are thread-safe per
// engine instance (no globals).

#include <cstdint>
#include <cstring>
#include <vector>

#include "engine.h"

using shermbot::Engine;
using shermbot::Scenario;

extern "C" {

// Opaque engine handle --------------------------------------------------
void* sb_engine_create(const char* scenario, int deterministic,
                       uint64_t seed) {
  Scenario sc = shermbot::get_scenario(scenario ? scenario : "");
  if (sc.name.empty()) return nullptr;
  Engine* e = new Engine();
  e->init(sc, deterministic != 0, seed);
  return e;
}

// Custom world: tube centers + pipeline knobs (mirrors pipeline/config.py).
void* sb_engine_create_custom(const double* tx, const double* ty,
                              int n_tubes, int capacity, int known_assoc,
                              int use_lidar, double max_range,
                              double tube_var, double twist_noise,
                              double slip_min, double slip_max,
                              double cmd_w, double cmd_v, int steps,
                              int deterministic, uint64_t seed) {
  Scenario sc;
  sc.name = "custom";
  sc.tx.assign(tx, tx + n_tubes);
  sc.ty.assign(ty, ty + n_tubes);
  sc.num_landmarks = capacity;
  sc.known_assoc = known_assoc != 0;
  sc.use_lidar = use_lidar != 0;
  sc.steps = steps;
  sc.cmd_w = cmd_w;
  sc.cmd_v = cmd_v;
  sc.max_range = max_range;
  sc.tube_var = tube_var;
  sc.twist_noise = twist_noise;
  sc.slip_min = slip_min;
  sc.slip_max = slip_max;
  Engine* e = new Engine();
  e->init(sc, deterministic != 0, seed);
  return e;
}

void sb_engine_destroy(void* h) { delete static_cast<Engine*>(h); }

// One 10 Hz SLAM tick; returns the number of landmarks seen so far.
int sb_engine_tick(void* h, double cmd_w, double cmd_v) {
  return static_cast<Engine*>(h)->tick(cmd_w, cmd_v);
}

// out[9] = truth(th,x,y), odom(th,x,y), slam(th,x,y)
void sb_engine_poses(const void* h, double* out) {
  const Engine* e = static_cast<const Engine*>(h);
  out[0] = e->world.truth.th;
  out[1] = e->world.truth.x;
  out[2] = e->world.truth.y;
  out[3] = e->odom.th;
  out[4] = e->odom.x;
  out[5] = e->odom.y;
  out[6] = e->ekf.mean[0];
  out[7] = e->ekf.mean[1];
  out[8] = e->ekf.mean[2];
}

int sb_engine_state_dim(const void* h) {
  return static_cast<const Engine*>(h)->ekf.dim;
}

// mean_out: dim doubles
void sb_engine_state(const void* h, double* mean_out) {
  const Engine* e = static_cast<const Engine*>(h);
  std::memcpy(mean_out, e->ekf.mean.data(), e->ekf.dim * sizeof(double));
}

// cov_out: dim*dim doubles, row-major
void sb_engine_cov(const void* h, double* cov_out) {
  const Engine* e = static_cast<const Engine*>(h);
  std::memcpy(cov_out, e->ekf.cov.v.data(),
              (size_t)e->ekf.dim * e->ekf.dim * sizeof(double));
}

int sb_engine_seen(const void* h) {
  return static_cast<const Engine*>(h)->ekf.seen;
}

double sb_engine_ate(const void* h) {
  return static_cast<const Engine*>(h)->ate();
}

double sb_engine_ate_odom(const void* h) {
  return static_cast<const Engine*>(h)->ate_odom();
}

// Standalone perception stage: 360-ray scan -> detections (robot frame).
// Returns the number of detections written (<= max_out).
int sb_detect_landmarks(const double* scan, int n_rays, double* mx_out,
                        double* my_out, int max_out) {
  std::vector<double> s(scan, scan + n_rays);
  std::vector<double> mx, my;
  shermbot::detect_landmarks(s, &mx, &my);
  int n = (int)mx.size();
  if (n > max_out) n = max_out;
  for (int i = 0; i < n; ++i) {
    mx_out[i] = mx[i];
    my_out[i] = my[i];
  }
  return n;
}

// Standalone simulated lidar for an arbitrary pose/world (for tests).
void sb_simulate_lidar(const double* tx, const double* ty, int n_tubes,
                       double tube_rad, double th, double x, double y,
                       double* ranges_out /*360*/) {
  shermbot::World w;
  w.tx.assign(tx, tx + n_tubes);
  w.ty.assign(ty, ty + n_tubes);
  w.tube_rad = tube_rad;
  w.truth.th = th;
  w.truth.x = x;
  w.truth.y = y;
  std::vector<double> r;
  w.lidar(&r);
  std::memcpy(ranges_out, r.data(), r.size() * sizeof(double));
}

int sb_abi_version(void) { return 1; }

}  // extern "C"
