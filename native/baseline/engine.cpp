// Implementation of the native host engine (see engine.h for the role of
// this component). Algorithm provenance, per function, is the reference's
// published math: slam_library.cpp (EKF), tube_world.cpp (sim + slip quirk),
// circle_fit_library.cpp (perception) — reimplemented dense-and-sequential.

#include "engine.h"

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>

namespace shermbot {

double wrap_angle(double a) { return std::atan2(std::sin(a), std::cos(a)); }

Mat mul(const Mat& a, const Mat& b) {
  Mat out(a.r, b.c);
  for (int i = 0; i < a.r; ++i)
    for (int k = 0; k < a.c; ++k) {
      double aik = a(i, k);
      if (aik == 0.0) continue;
      for (int j = 0; j < b.c; ++j) out(i, j) += aik * b(k, j);
    }
  return out;
}

Mat tr(const Mat& a) {
  Mat out(a.c, a.r);
  for (int i = 0; i < a.r; ++i)
    for (int j = 0; j < a.c; ++j) out(j, i) = a(i, j);
  return out;
}

Mat inv(Mat a) {
  int n = a.r;
  Mat out = Mat::eye(n);
  for (int col = 0; col < n; ++col) {
    int piv = col;
    for (int i = col + 1; i < n; ++i)
      if (std::fabs(a(i, col)) > std::fabs(a(piv, col))) piv = i;
    if (piv != col)
      for (int j = 0; j < n; ++j) {
        std::swap(a.v[(size_t)col * n + j], a.v[(size_t)piv * n + j]);
        std::swap(out.v[(size_t)col * n + j], out.v[(size_t)piv * n + j]);
      }
    double d = a(col, col);
    if (std::fabs(d) < 1e-300) d = (d < 0 ? -1e-300 : 1e-300);
    double invd = 1.0 / d;
    for (int j = 0; j < n; ++j) {
      a(col, j) *= invd;
      out(col, j) *= invd;
    }
    for (int i = 0; i < n; ++i) {
      if (i == col) continue;
      double f = a(i, col);
      if (f == 0.0) continue;
      for (int j = 0; j < n; ++j) {
        a(i, j) -= f * a(col, j);
        out(i, j) -= f * out(col, j);
      }
    }
  }
  return out;
}

void wheels_to_twist(const Geom& g, double dl, double dr, double* dth,
                     double* dx) {
  *dth = (g.wheel_rad / g.wheel_base) * (dr - dl);
  *dx = (g.wheel_rad / 2.0) * (dl + dr);
}

void drive_step(const Geom& g, Drive* d, double wl_new, double wr_new) {
  double dth, dx;
  wheels_to_twist(g, wl_new - d->wl, wr_new - d->wr, &dth, &dx);
  // integrate the body twist (dy = 0): closed-form screw
  double s1, s2;
  if (std::fabs(dth) < 1e-12) {
    s1 = 1.0;
    s2 = dth / 2.0;
  } else {
    s1 = std::sin(dth) / dth;
    s2 = (1.0 - std::cos(dth)) / dth;
  }
  double tx = dx * s1, ty = dx * s2;
  double c = std::cos(d->th), s = std::sin(d->th);
  d->x += c * tx - s * ty;
  d->y += s * tx + c * ty;
  d->th += dth;
  d->wl = wl_new;
  d->wr = wr_new;
}

// ----------------------------------------------------------------------
// EKF
// ----------------------------------------------------------------------
void EKF::init(int n_, const Mat& Q_, const Mat& R_, double init_cov) {
  n = n_;
  dim = 3 + 2 * n;
  seen = 0;
  slot_seen.assign(n, 0);
  mean.assign(dim, 0.0);
  cov = Mat(dim, dim);
  for (int i = 3; i < dim; ++i) cov(i, i) = init_cov;
  Q = Q_;
  R = R_;
}

// predict: arc motion model + dense A Sigma A^T + Qbar (reference style)
void EKF::predict(double dth, double dx) {
  double th = mean[0];
  double b10, b20, qx, qy;
  if (dth == 0.0) {
    qx = dx * std::cos(th);
    qy = dx * std::sin(th);
    b10 = -dx * std::sin(th);
    b20 = dx * std::cos(th);
  } else {
    double rr = dx / dth;
    qx = -rr * std::sin(th) + rr * std::sin(th + dth);
    qy = rr * std::cos(th) - rr * std::cos(th + dth);
    b10 = -rr * std::cos(th) + rr * std::cos(th + dth);
    b20 = -rr * std::sin(th) + rr * std::sin(th + dth);
  }
  mean[0] += dth;
  mean[1] += qx;
  mean[2] += qy;

  Mat A = Mat::eye(dim);
  A(1, 0) += b10;
  A(2, 0) += b20;
  Mat tmp = mul(mul(A, cov), tr(A));  // O(D^3), as the reference does
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) tmp(i, j) += Q(i, j);
  cov = tmp;
}

void EKF::zhat_H(int j, double* zr, double* zb, Mat* H) const {
  double dx = mean[3 + 2 * j] - mean[1];
  double dy = mean[4 + 2 * j] - mean[2];
  double d = dx * dx + dy * dy;
  if (d < 1e-12) d = 1e-12;
  double sq = std::sqrt(d);
  *zr = sq;
  *zb = wrap_angle(std::atan2(dy, dx) - mean[0]);
  *H = Mat(2, dim);
  (*H)(1, 0) = -1;
  (*H)(0, 1) = -dx / sq;
  (*H)(1, 1) = dy / d;
  (*H)(0, 2) = -dy / sq;
  (*H)(1, 2) = -dx / d;
  (*H)(0, 3 + 2 * j) = dx / sq;
  (*H)(1, 3 + 2 * j) = -dy / d;
  (*H)(0, 4 + 2 * j) = dy / sq;
  (*H)(1, 4 + 2 * j) = dx / d;
}

void EKF::init_landmark(int j, double zr, double zb) {
  mean[3 + 2 * j] = mean[1] + zr * std::cos(zb + mean[0]);
  mean[4 + 2 * j] = mean[2] + zr * std::sin(zb + mean[0]);
  if (!slot_seen[j]) {
    slot_seen[j] = 1;
    seen++;
  }
}

void EKF::update(int j, double zr, double zb) {
  double hr, hb;
  Mat H;
  zhat_H(j, &hr, &hb, &H);
  Mat SHt = mul(cov, tr(H));  // (D, 2)
  Mat psi = mul(H, SHt);      // (2, 2)
  psi(0, 0) += R(0, 0);
  psi(0, 1) += R(0, 1);
  psi(1, 0) += R(1, 0);
  psi(1, 1) += R(1, 1);
  Mat K = mul(SHt, inv(psi));            // (D, 2)
  double dz0 = zr - hr, dz1 = zb - hb;   // NOT wrapped (reference)
  for (int i = 0; i < dim; ++i) mean[i] += K(i, 0) * dz0 + K(i, 1) * dz1;
  mean[0] = wrap_angle(mean[0]);
  Mat IKH = Mat::eye(dim);
  Mat KH = mul(K, H);
  for (int i = 0; i < dim; ++i)
    for (int j2 = 0; j2 < dim; ++j2) IKH(i, j2) -= KH(i, j2);
  cov = mul(IKH, cov);  // O(D^3), as the reference
}

// first-hit association (SURVEY 2.4)
int EKF::associate(double zr, double zb) {
  if (seen == 0) return n > 0 ? 0 : -2;  // NEW at slot 0 (or overflow)
  for (int k = 0; k < seen; ++k) {
    double hr, hb;
    Mat H;
    zhat_H(k, &hr, &hb, &H);
    Mat psi = mul(mul(H, cov), tr(H));
    psi(0, 0) += R(0, 0);
    psi(0, 1) += R(0, 1);
    psi(1, 0) += R(1, 0);
    psi(1, 1) += R(1, 1);
    Mat pi = inv(psi);
    double d0 = zr - hr, d1 = zb - hb;
    double m = d0 * (pi(0, 0) * d0 + pi(0, 1) * d1) +
               d1 * (pi(1, 0) * d0 + pi(1, 1) * d1);
    if (m < match_gate) return k;  // match
    if (m < new_gate) return -1;   // gray area: skip
  }
  if (seen >= n) return -2;  // overflow
  return seen;               // new landmark at next slot
}

// ----------------------------------------------------------------------
// World
// ----------------------------------------------------------------------
double World::gauss(double mean, double std) {
  if (deterministic || std == 0.0) return mean;
  std::normal_distribution<double> g(mean, std);
  return g(rng);
}

void World::substep(double cmd_w, double cmd_v, double dt) {
  // 1. twist noise
  double w = cmd_w + gauss(0, twist_noise);
  double v = cmd_v + gauss(0, twist_noise);
  // 2. collision: slide along tangent
  double nx = 0, ny = 0;
  for (size_t i = 0; i < tx.size(); ++i) {
    double dx = tx[i] - truth.x, dy = ty[i] - truth.y;
    double dist = std::sqrt(dx * dx + dy * dy);
    if (dist < 1e-9) dist = 1e-9;
    if (dist <= tube_rad + robot_rad) {
      nx += (dy / dist) / 50.0;
      ny += (-dx / dist) / 50.0;
    }
  }
  truth.x += nx;
  truth.y += ny;
  // 3. wheel velocities and commanded joints
  double d = geom.wheel_base / 2.0, r = geom.wheel_rad;
  double ul = -(d / r) * w + v / r;
  double ur = (d / r) * w + v / r;
  cwl += ul * dt;
  cwr += ur * dt;
  // 4. true update from slip-perturbed wheel angles (the quirk: +u*eta)
  double smean = (slip_min + slip_max) / 2.0, svar = slip_max - smean;
  double el = gauss(smean, svar), er = gauss(smean, svar);
  drive_step(geom, &truth, cwl + ul * el, cwr + ur * er);
}

// Reference-quirks lidar (tube_world.cpp:405-471 behavior): per tube, a
// 54-wide integer-degree cone about the buggy center angle
// atan2(2*yt - yr, 2*xt - xr) (:428, rounded half-away-from-zero);
// intersection with the infinite LINE, not the forward ray — the two
// intersection points' absolute distances compete (:444-453), so rays
// pointing away from a tube still hit; a near-tangent band
// |r^2 dr^2 - det^2| < 1e-5 takes the perpendicular-foot distance (:439-442);
// exactly-horizontal rays (integer degree 0) divide by fabs(dy) == 0 and
// NaN out of the two-point branch (:445-449); the scan index is the world
// degree minus the heading truncated toward zero (:459-460).
// Implemented in the ray-parameter (t) form, which is algebraically the
// same map as the reference's determinant formulas.
void World::lidar_quirks_scan(std::vector<double>* ranges) const {
  const int n = 360;
  const double rmax = 1.0;  // scan_params.yaml maximum_range
  const double r2 = tube_rad * tube_rad;
  ranges->assign(n, rmax + 1.0);
  int th_deg = (int)(truth.th * 180.0 / kPi);  // trunc toward zero
  for (size_t ti = 0; ti < tx.size(); ++ti) {
    double px = truth.x - tx[ti], py = truth.y - ty[ti];
    // buggy cone center: tube coords minus ROBOT-RELATIVE-TO-TUBE coords
    double ca_deg =
        std::atan2(ty[ti] - py, tx[ti] - px) * 180.0 / kPi;
    int ta = (int)std::round(ca_deg);  // round(): half away from zero
    for (int i = ta - 27; i < ta + 27; ++i) {
      double ang = i * kPi / 180.0;
      double ux = std::cos(ang), uy = std::sin(ang);
      double b = px * ux + py * uy;
      double disc = b * b - (px * px + py * py - r2);
      // reference units: dis = r^2 dr^2 - det^2 with dr = rmax = 1
      double dist;
      if (std::fabs(disc) < 1e-5) {
        dist = std::fabs(b);  // tangent band: perpendicular foot
      } else if (disc > 0) {
        if (uy == 0.0) continue;  // dy/fabs(dy) -> NaN, never recorded
        double sq = std::sqrt(disc);
        dist = std::min(std::fabs(-b - sq), std::fabs(-b + sq));
      } else {
        continue;
      }
      int ind = (i - th_deg) % 360;
      if (ind < 0) ind += 360;
      if (dist < (*ranges)[ind]) (*ranges)[ind] = dist;
    }
  }
}

// 360-ray lidar scan (correct geometry, matching the engine's default)
void World::lidar(std::vector<double>* ranges) const {
  if (lidar_quirks) {
    lidar_quirks_scan(ranges);
    return;
  }
  const int n = 360;
  const double rmax = 1.0;  // scan_params.yaml maximum_range
  ranges->assign(n, rmax + 1.0);
  for (int k = 0; k < n; ++k) {
    double ang = truth.th + 2.0 * kPi * k / n;
    double ux = std::cos(ang), uy = std::sin(ang);
    double best = rmax + 1.0;
    for (size_t i = 0; i < tx.size(); ++i) {
      double px = truth.x - tx[i], py = truth.y - ty[i];
      double b = px * ux + py * uy;
      double c = px * px + py * py - tube_rad * tube_rad;
      double disc = b * b - c;
      if (disc < 0) continue;
      double sq = std::sqrt(disc);
      double t = -b - sq;
      if (t <= 0) t = -b + sq;
      if (t > 0 && t < best) best = t;
    }
    (*ranges)[k] = best;
  }
}

// relative landmark markers with range gate + constant tube_var offset
void World::fake_sensor(std::vector<double>* mx, std::vector<double>* my,
                        std::vector<char>* valid) const {
  double c = std::cos(truth.th), s = std::sin(truth.th);
  mx->resize(tx.size());
  my->resize(tx.size());
  valid->resize(tx.size());
  for (size_t i = 0; i < tx.size(); ++i) {
    double dx = tx[i] - truth.x, dy = ty[i] - truth.y;
    double rx = c * dx + s * dy;  // world -> robot frame
    double ry = -s * dx + c * dy;
    (*mx)[i] = rx + tube_var;
    (*my)[i] = ry + tube_var;
    (*valid)[i] = std::sqrt(dx * dx + dy * dy) <= max_range ? 1 : 0;
  }
}

// ----------------------------------------------------------------------
// Perception
// ----------------------------------------------------------------------
std::vector<std::vector<Pt>> cluster_scan(const std::vector<double>& r,
                                          double minR, double maxR) {
  const int n = (int)r.size();
  const double thr = 0.04;
  std::vector<std::vector<Pt>> clusters;
  std::vector<Pt> cur;
  auto in_range = [&](int i) { return r[i] >= minR && r[i] <= maxR; };
  for (int i = 0; i < n; ++i) {
    if (!in_range(i)) continue;
    double ang = 2.0 * kPi * i / n;
    Pt p{r[i] * std::cos(ang), r[i] * std::sin(ang)};
    int nx = (i + 1) % n;
    if (std::fabs(r[i] - r[nx]) < thr) {
      if (nx < i) {  // wraparound: move point to cluster 0, drop the rest
        if (!clusters.empty()) clusters[0].push_back(p);
        cur.clear();
        break;
      }
      cur.push_back(p);
    } else {
      cur.push_back(p);
      clusters.push_back(cur);
      cur.clear();
    }
  }
  std::vector<std::vector<Pt>> out;
  for (auto& c : clusters)
    if (c.size() >= 3) out.push_back(c);
  return out;
}

bool classify_circle(const std::vector<Pt>& c) {
  if (c.size() < 3) return false;
  const Pt& p2 = c.front();
  const Pt& p3 = c.back();
  std::vector<double> angs;
  for (size_t i = 1; i + 1 < c.size(); ++i) {
    const Pt& p1 = c[i];
    double num = p2.y * (p1.x - p3.x) + p1.y * (p3.x - p2.x) +
                 p3.y * (p2.x - p1.x);
    double den = (p2.x - p1.x) * (p1.x - p3.x) +
                 (p2.y - p1.y) * (p1.y - p3.y);
    angs.push_back(std::atan2(num, den) * 180.0 / kPi);
  }
  if (angs.empty()) return false;
  double mean = 0;
  for (double a : angs) mean += a / angs.size();
  double var = 0;
  for (double a : angs) var += (a - mean) * (a - mean);
  return std::sqrt(var / angs.size()) < 10.0;
}

// cyclic Jacobi eigendecomposition for symmetric 4x4
void eigh4(double A[4][4], double lam[4], double V[4][4]) {
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) V[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 12; ++sweep) {
    for (int p = 0; p < 3; ++p)
      for (int q = p + 1; q < 4; ++q) {
        double apq = A[p][q];
        if (std::fabs(apq) < 1e-300) continue;
        double theta = 0.5 * std::atan2(2 * apq, A[q][q] - A[p][p]);
        double cth = std::cos(theta), sth = std::sin(theta);
        for (int k = 0; k < 4; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = cth * akp - sth * akq;
          A[k][q] = sth * akp + cth * akq;
        }
        for (int k = 0; k < 4; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = cth * apk - sth * aqk;
          A[q][k] = sth * apk + cth * aqk;
        }
        for (int k = 0; k < 4; ++k) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = cth * vkp - sth * vkq;
          V[k][q] = sth * vkp + cth * vkq;
        }
      }
  }
  for (int i = 0; i < 4; ++i) lam[i] = A[i][i];
}

bool fit_circle(const std::vector<Pt>& c, double* ox, double* oy,
                double* orad) {
  size_t n = c.size();
  if (n < 4) return false;
  double cx = 0, cy = 0;
  for (auto& p : c) {
    cx += p.x / n;
    cy += p.y / n;
  }
  double zb = 0;
  std::vector<double> xs(n), ys(n), zs(n);
  for (size_t i = 0; i < n; ++i) {
    xs[i] = c[i].x - cx;
    ys[i] = c[i].y - cy;
    zs[i] = xs[i] * xs[i] + ys[i] * ys[i];
    zb += zs[i] / n;
  }
  double M[4][4] = {{0}};
  for (size_t i = 0; i < n; ++i) {
    double row[4] = {zs[i], xs[i], ys[i], 1.0};
    for (int a = 0; a < 4; ++a)
      for (int b = 0; b < 4; ++b) M[a][b] += row[a] * row[b];
  }
  double Mw[4][4];
  std::memcpy(Mw, M, sizeof(M));
  double lam[4], V[4][4];
  eigh4(Mw, lam, V);
  // smallest eigenvalue / corresponding vector
  int imin = 0;
  for (int i = 1; i < 4; ++i)
    if (lam[i] < lam[imin]) imin = i;
  double A[4];
  if (lam[imin] < 1e-24) {  // sigma4 = sqrt(lam) < 1e-12
    for (int i = 0; i < 4; ++i) A[i] = V[i][imin];
  } else {
    // Y = V sqrt(lam) V^T ; Q = Y Hinv Y ; pick smallest positive eig of Q
    double S[4];
    for (int i = 0; i < 4; ++i) S[i] = std::sqrt(std::max(lam[i], 0.0));
    double Y[4][4] = {{0}};
    for (int a = 0; a < 4; ++a)
      for (int b = 0; b < 4; ++b)
        for (int k = 0; k < 4; ++k) Y[a][b] += V[a][k] * S[k] * V[b][k];
    double Hinv[4][4] = {{0, 0, 0, 0.5},
                         {0, 1, 0, 0},
                         {0, 0, 1, 0},
                         {0.5, 0, 0, -2.0 * zb}};
    double YH[4][4] = {{0}}, Q[4][4] = {{0}};
    for (int a = 0; a < 4; ++a)
      for (int b = 0; b < 4; ++b)
        for (int k = 0; k < 4; ++k) YH[a][b] += Y[a][k] * Hinv[k][b];
    for (int a = 0; a < 4; ++a)
      for (int b = 0; b < 4; ++b)
        for (int k = 0; k < 4; ++k) Q[a][b] += YH[a][k] * Y[k][b];
    double ql[4], QV[4][4];
    eigh4(Q, ql, QV);
    int best = 0;
    double bestv = 1e300;
    for (int i = 0; i < 4; ++i)
      if (ql[i] > 0 && ql[i] < bestv) {
        bestv = ql[i];
        best = i;
      }
    double Astar[4];
    for (int i = 0; i < 4; ++i) Astar[i] = QV[i][best];
    // solve Y A = Astar with Gauss elimination
    Mat Ym(4, 4), vv(4, 1);
    for (int a = 0; a < 4; ++a) {
      vv(a, 0) = Astar[a];
      for (int b = 0; b < 4; ++b) Ym(a, b) = Y[a][b];
    }
    Mat sol = mul(inv(Ym), vv);
    for (int i = 0; i < 4; ++i) A[i] = sol(i, 0);
  }
  if (std::fabs(A[0]) < 1e-300) return false;
  double a = -A[1] / (2 * A[0]), b = -A[2] / (2 * A[0]);
  double R2 = (A[1] * A[1] + A[2] * A[2] - 4 * A[0] * A[3]) /
              (4 * A[0] * A[0]);
  *ox = a + cx;
  *oy = b + cy;
  *orad = std::sqrt(std::max(R2, 0.0));
  return std::isfinite(*ox) && std::isfinite(*oy) && std::isfinite(*orad);
}

// full landmarks-node stage: scan -> detections (robot frame)
void detect_landmarks(const std::vector<double>& scan,
                      std::vector<double>* mx, std::vector<double>* my) {
  mx->clear();
  my->clear();
  auto clusters = cluster_scan(scan, 0.05, 1.0);
  for (auto& c : clusters) {
    if (!classify_circle(c)) continue;
    double x, y, r;
    if (!fit_circle(c, &x, &y, &r)) continue;
    if (r > 1.0) continue;
    mx->push_back(x);
    my->push_back(y);
  }
}

// ----------------------------------------------------------------------
// Scenarios
// ----------------------------------------------------------------------
namespace {
Scenario ring_scenario(const std::string& name, int ntube, double radius,
                       int cap, bool known, int steps, double w, double v,
                       double max_range, double tube_var, double tnoise,
                       double smin, double smax) {
  Scenario s;
  s.name = name;
  for (int k = 0; k < ntube; ++k) {
    s.tx.push_back(radius * std::cos(2 * kPi * k / ntube));
    s.ty.push_back(radius * std::sin(2 * kPi * k / ntube));
  }
  s.num_landmarks = cap;
  s.known_assoc = known;
  s.steps = steps;
  s.cmd_w = w;
  s.cmd_v = v;
  s.max_range = max_range;
  s.tube_var = tube_var;
  s.twist_noise = tnoise;
  s.slip_min = smin;
  s.slip_max = smax;
  return s;
}
}  // namespace

Scenario get_scenario(const std::string& name) {
  const double w60 = 2 * kPi / 60.0;
  if (name == "loop5_known")
    return ring_scenario(name, 5, 0.8, 5, true, 600, w60, 0.052, 2.0, 0.0,
                         0.0, 1.0, 1.0);
  if (name == "course12_noisy")
    return ring_scenario(name, 12, 0.9, 12, false, 600, w60, 0.08, 1.0,
                         0.001, 0.001, 0.9, 1.0);
  if (name == "lidar20_full") {
    Scenario s = ring_scenario(name, 10, 0.7, 20, false, 600, w60, 0.08,
                               1.0, 0.001, 0.0, 0.95, 1.0);
    for (int k = 0; k < 10; ++k) {
      s.tx.push_back(1.3 * std::cos(2 * kPi * k / 10));
      s.ty.push_back(1.3 * std::sin(2 * kPi * k / 10));
    }
    s.use_lidar = true;
    return s;
  }
  if (name == "stock6") {
    Scenario s = ring_scenario(name, 0, 0, 6, false, 500, 0.5, 0.1, 1.0,
                               0.001, 0.0, 0.9, 1.0);
    double txs[] = {0.5, -0.5, 1.0, -1.0, -0.75, 0.75};
    double tys[] = {0.5, -0.5, 1.0, -1.0, 0.75, -0.75};
    s.tx.assign(txs, txs + 6);
    s.ty.assign(tys, tys + 6);
    return s;
  }
  Scenario bad;
  bad.name = "";
  return bad;  // callers check name.empty()
}

// ----------------------------------------------------------------------
// Engine
// ----------------------------------------------------------------------
void Engine::init(const Scenario& s, bool deterministic, uint64_t seed) {
  sc = s;
  world = World();
  world.tx = sc.tx;
  world.ty = sc.ty;
  world.max_range = sc.max_range;
  world.tube_var = sc.tube_var;
  world.twist_noise = sc.twist_noise;
  world.slip_min = sc.slip_min;
  world.slip_max = sc.slip_max;
  world.lidar_quirks = sc.lidar_quirks;
  world.deterministic = deterministic;
  world.rng.seed(seed);
  odom = Drive();
  Mat Q(3, 3), R(2, 2);
  Q(0, 0) = Q(1, 1) = Q(2, 2) = 0.1;   // slam_params.yaml (documented values)
  R(0, 0) = R(1, 1) = 0.001;
  ekf.init(sc.num_landmarks, Q, R, 2147483647.0);
  ticks = 0;
  sum_sq = sum_sq_od = 0.0;
}

int Engine::tick(double cmd_w, double cmd_v) {
  for (int ss = 0; ss < kSubsteps; ++ss)
    world.substep(cmd_w, cmd_v, kDt);

  // odometry from commanded joints
  double dth, dx;
  wheels_to_twist(world.geom, world.cwl - odom.wl, world.cwr - odom.wr,
                  &dth, &dx);
  drive_step(world.geom, &odom, world.cwl, world.cwr);

  // measurements
  std::vector<double> mx, my;
  std::vector<char> valid;
  if (sc.use_lidar) {
    std::vector<double> scan;
    world.lidar(&scan);
    detect_landmarks(scan, &mx, &my);
    valid.assign(mx.size(), 1);
  } else {
    world.fake_sensor(&mx, &my, &valid);
  }

  ekf.predict(dth, dx);
  bool stopped = false;
  for (size_t i = 0; i < mx.size() && !stopped; ++i) {
    if (!valid[i]) continue;
    double zr = std::sqrt(mx[i] * mx[i] + my[i] * my[i]);
    double zb = wrap_angle(std::atan2(my[i], mx[i]));
    int j;
    if (sc.known_assoc) {
      j = (int)i;
      if (j >= ekf.n) break;  // capacity guard (mirrors associate()'s -2)
    } else {
      j = ekf.associate(zr, zb);
      if (j == -1) continue;
      if (j == -2) {
        stopped = true;
        break;
      }
    }
    if (!ekf.slot_seen[j]) {
      ekf.init_landmark(j, zr, zb);
      ekf.update(j, zr, zb);  // reference: update after init
    } else {
      ekf.update(j, zr, zb);
    }
  }

  double ex = ekf.mean[1] - world.truth.x, ey = ekf.mean[2] - world.truth.y;
  sum_sq += ex * ex + ey * ey;
  double ox = odom.x - world.truth.x, oy = odom.y - world.truth.y;
  sum_sq_od += ox * ox + oy * oy;
  ++ticks;
  return ekf.seen;
}

double Engine::ate() const {
  return ticks ? std::sqrt(sum_sq / ticks) : 0.0;
}

double Engine::ate_odom() const {
  return ticks ? std::sqrt(sum_sq_od / ticks) : 0.0;
}

// Config-4 analog: the reference's dense O(D^3) EKF at N landmarks.
int run_bigmap(int N, int ticks, int M) {
  Mat Q(3, 3), R(2, 2);
  Q(0, 0) = Q(1, 1) = Q(2, 2) = 1e-4;
  R(0, 0) = R(1, 1) = 1e-3;
  EKF ekf;
  ekf.init(N, Q, R, 2147483647.0);
  // pre-seed all landmarks so updates hit the dense path
  for (int j = 0; j < N; ++j) {
    double ang = 2 * kPi * j / N;
    ekf.init_landmark(j, 1.0 + 0.001 * j / N, ang);
  }
  auto t0 = std::chrono::steady_clock::now();
  for (int t = 0; t < ticks; ++t) {
    ekf.predict(0.01, 0.05);
    for (int k = 0; k < M; ++k) {
      int j = (t * M + k) % N;
      double hr, hb;
      Mat H;
      ekf.zhat_H(j, &hr, &hb, &H);
      ekf.update(j, hr + 1e-3, hb - 1e-3);
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double sec = std::chrono::duration<double>(t1 - t0).count();
  std::printf(
      "{\"metric\": \"cpp_dense_bigmap\", \"N\": %d, \"ticks\": %d, "
      "\"M\": %d, \"sec_per_tick\": %.3f, \"ticks_per_sec\": %.4f}\n",
      N, ticks, M, sec / ticks, ticks / sec);
  return 0;
}

}  // namespace shermbot
