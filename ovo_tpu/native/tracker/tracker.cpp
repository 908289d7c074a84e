// OVO-TPU host-side RGB-D tracking front-end.
//
// Replaces the reference's ORB-SLAM3 C++ dependency behind the same narrow
// binding surface (/root/reference/ovo/slam/orbslam.py:36-66):
//   process_image_rgbd (blocking) -> tracking state
//   get_last_trajectory_point     -> current camera-to-world pose
//   is_last_frame_kf              -> keyframe decision
//   get_last_big_change_idx       -> loop-closure/BA generation counter
//
// Method: dense direct RGB-D odometry. Per frame, the rigid motion relative
// to the last keyframe is estimated by coarse-to-fine Gauss-Newton over an
// image pyramid, minimizing a robust (Huber) combination of photometric and
// inverse-depth point-to-plane residuals -- the same family of alignment
// Open3D's hybrid RGB-D odometry implements (the reference's fallback
// tracker, visual_odometer.py:53-76). Self-contained: no Eigen/OpenCV,
// exposed through a plain C ABI for ctypes.
//
// Keyframes: spawned when translation/rotation to the last keyframe exceeds
// thresholds or the inlier ratio drops. A lightweight pose-graph hook bumps
// big_change_idx when a (future) loop-closure optimization adjusts past
// keyframes; round-1 keeps odometry-only tracking, so the counter is static
// after init.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Mat4 {
  double m[16];  // row-major
  static Mat4 identity() {
    Mat4 r{};
    for (int i = 0; i < 4; ++i) r.m[i * 4 + i] = 1.0;
    return r;
  }
};

Mat4 matmul(const Mat4& a, const Mat4& b) {
  Mat4 r{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += a.m[i * 4 + k] * b.m[k * 4 + j];
      r.m[i * 4 + j] = s;
    }
  return r;
}

Mat4 inverse_rigid(const Mat4& t) {
  Mat4 r = Mat4::identity();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r.m[i * 4 + j] = t.m[j * 4 + i];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += r.m[i * 4 + j] * t.m[j * 4 + 3];
    r.m[i * 4 + 3] = -s;
  }
  return r;
}

// se(3) exponential map: xi = [wx, wy, wz, tx, ty, tz]
Mat4 se3_exp(const double xi[6]) {
  const double wx = xi[0], wy = xi[1], wz = xi[2];
  const double theta2 = wx * wx + wy * wy + wz * wz;
  const double theta = std::sqrt(theta2);
  double A, B, C;
  if (theta < 1e-8) {
    A = 1.0 - theta2 / 6.0;
    B = 0.5 - theta2 / 24.0;
    C = 1.0 / 6.0 - theta2 / 120.0;
  } else {
    A = std::sin(theta) / theta;
    B = (1.0 - std::cos(theta)) / theta2;
    C = (1.0 - A) / theta2;
  }
  const double W[9] = {0, -wz, wy, wz, 0, -wx, -wy, wx, 0};
  double W2[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += W[i * 3 + k] * W[k * 3 + j];
      W2[i * 3 + j] = s;
    }
  Mat4 T = Mat4::identity();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double R = (i == j ? 1.0 : 0.0) + A * W[i * 3 + j] + B * W2[i * 3 + j];
      T.m[i * 4 + j] = R;
    }
  double V[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      V[i * 3 + j] = (i == j ? 1.0 : 0.0) + B * W[i * 3 + j] + C * W2[i * 3 + j];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += V[i * 3 + j] * xi[3 + j];
    T.m[i * 4 + 3] = s;
  }
  return T;
}

bool solve6x6(double H[36], const double g[6], double dx[6]) {
  // Cholesky with Levenberg damping already applied by the caller.
  double L[36] = {0};
  for (int i = 0; i < 6; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = H[i * 6 + j];
      for (int k = 0; k < j; ++k) s -= L[i * 6 + k] * L[j * 6 + k];
      if (i == j) {
        if (s <= 1e-12) return false;
        L[i * 6 + i] = std::sqrt(s);
      } else {
        L[i * 6 + j] = s / L[j * 6 + j];
      }
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    double s = g[i];
    for (int k = 0; k < i; ++k) s -= L[i * 6 + k] * y[k];
    y[i] = s / L[i * 6 + i];
  }
  for (int i = 5; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < 6; ++k) s -= L[k * 6 + i] * dx[k];
    dx[i] = s / L[i * 6 + i];
  }
  return true;
}

struct Pyramid {
  int levels = 3;
  std::vector<std::vector<float>> gray;   // intensity [0,1]
  std::vector<std::vector<float>> depth;  // metres, 0 invalid
  std::vector<int> w, h;
  std::vector<double> fx, fy, cx, cy;

  void build(const float* g0, const float* d0, int W, int H, double fx0,
             double fy0, double cx0, double cy0) {
    gray.assign(levels, {});
    depth.assign(levels, {});
    w.assign(levels, 0);
    h.assign(levels, 0);
    fx.assign(levels, 0);
    fy.assign(levels, 0);
    cx.assign(levels, 0);
    cy.assign(levels, 0);
    gray[0].assign(g0, g0 + W * H);
    depth[0].assign(d0, d0 + W * H);
    w[0] = W;
    h[0] = H;
    fx[0] = fx0;
    fy[0] = fy0;
    cx[0] = cx0;
    cy[0] = cy0;
    for (int l = 1; l < levels; ++l) {
      int pw = w[l - 1], ph = h[l - 1];
      int nw = pw / 2, nh = ph / 2;
      w[l] = nw;
      h[l] = nh;
      fx[l] = fx[l - 1] * 0.5;
      fy[l] = fy[l - 1] * 0.5;
      cx[l] = (cx[l - 1] + 0.5) * 0.5 - 0.5;
      cy[l] = (cy[l - 1] + 0.5) * 0.5 - 0.5;
      gray[l].resize(nw * nh);
      depth[l].resize(nw * nh);
      for (int y = 0; y < nh; ++y)
        for (int x = 0; x < nw; ++x) {
          // 2x2 box filter; depth averages only valid samples
          double gs = 0, ds = 0;
          int dn = 0;
          for (int dy = 0; dy < 2; ++dy)
            for (int dxx = 0; dxx < 2; ++dxx) {
              int sx = 2 * x + dxx, sy = 2 * y + dy;
              gs += gray[l - 1][sy * pw + sx];
              float dv = depth[l - 1][sy * pw + sx];
              if (dv > 0) {
                ds += dv;
                ++dn;
              }
            }
          gray[l][y * nw + x] = static_cast<float>(gs / 4.0);
          depth[l][y * nw + x] =
              dn > 0 ? static_cast<float>(ds / dn) : 0.0f;
        }
    }
  }
};

inline bool bilerp(const std::vector<float>& img, int w, int h, double x,
                   double y, float* out) {
  if (x < 0 || y < 0 || x > w - 2 || y > h - 2) return false;
  int x0 = static_cast<int>(x), y0 = static_cast<int>(y);
  double ax = x - x0, ay = y - y0;
  float v00 = img[y0 * w + x0], v01 = img[y0 * w + x0 + 1];
  float v10 = img[(y0 + 1) * w + x0], v11 = img[(y0 + 1) * w + x0 + 1];
  *out = static_cast<float>((1 - ay) * ((1 - ax) * v00 + ax * v01) +
                            ay * ((1 - ax) * v10 + ax * v11));
  return true;
}

struct Tracker {
  enum State { NOT_INITIALIZED = 0, OK = 2, LOST = 3 };  // ORB-SLAM3 codes

  Pyramid key;        // reference keyframe pyramid
  Mat4 key_pose;      // keyframe camera-to-world
  Mat4 cur_pose;      // current camera-to-world
  Mat4 vel;           // constant-velocity model (last relative motion)
  int state = NOT_INITIALIZED;
  bool last_frame_kf = false;
  int big_change_idx = 0;
  long n_frames = 0;
  std::vector<double> trajectory;  // flattened 4x4 poses

  double kf_trans_th = 0.15;   // metres
  double kf_rot_th = 0.15;     // radians (approx via axis-angle norm)
  double kf_inlier_th = 0.60;  // re-key when inlier ratio drops below

  double last_inlier_ratio = 1.0;

  // Estimate T_cur_key (camera motion from keyframe to current frame).
  // Returns false if alignment diverged.
  bool align(const Pyramid& cur, Mat4* T_ck, double* inlier_ratio) {
    Mat4 T = *T_ck;  // init (constant velocity)
    const double huber_i = 0.07;   // photometric (intensity in [0,1])
    const double huber_d = 0.04;   // inverse-depth-ish geometric
    double final_ratio = 0.0;
    for (int l = key.levels - 1; l >= 0; --l) {
      const int W = key.w[l], H = key.h[l];
      const double fx = key.fx[l], fy = key.fy[l];
      const double cx = key.cx[l], cy = key.cy[l];
      for (int it = 0; it < 10; ++it) {
        double Hm[36] = {0}, g[6] = {0};
        int n_res = 0, n_in = 0;
        const Mat4 Tinv = T;  // key->cur
        const int step = l == 0 ? 2 : 1;  // subsample full res
        for (int y = 1; y < H - 1; y += step)
          for (int x = 1; x < W - 1; x += step) {
            const float d = key.depth[l][y * W + x];
            if (d <= 0) continue;
            // keyframe point in keyframe camera coords
            const double X = (x - cx) * d / fx;
            const double Y = (y - cy) * d / fy;
            const double Z = d;
            // transform into current camera
            const double Xc = Tinv.m[0] * X + Tinv.m[1] * Y + Tinv.m[2] * Z + Tinv.m[3];
            const double Yc = Tinv.m[4] * X + Tinv.m[5] * Y + Tinv.m[6] * Z + Tinv.m[7];
            const double Zc = Tinv.m[8] * X + Tinv.m[9] * Y + Tinv.m[10] * Z + Tinv.m[11];
            if (Zc <= 0.05) continue;
            const double u = fx * Xc / Zc + cx;
            const double v = fy * Yc / Zc + cy;
            float ic, dc;
            if (!bilerp(cur.gray[l], W, H, u, v, &ic)) continue;
            if (!bilerp(cur.depth[l], W, H, u, v, &dc) || dc <= 0) continue;
            ++n_res;
            // residuals
            const float ik = key.gray[l][y * W + x];
            const double r_i = static_cast<double>(ic - ik);
            const double r_d = (dc - Zc);
            // gradients of current intensity
            float gx0, gx1, gy0, gy1;
            if (!bilerp(cur.gray[l], W, H, u + 1, v, &gx1) ||
                !bilerp(cur.gray[l], W, H, u - 1, v, &gx0) ||
                !bilerp(cur.gray[l], W, H, u, v + 1, &gy1) ||
                !bilerp(cur.gray[l], W, H, u, v - 1, &gy0))
              continue;
            const double gix = 0.5 * (gx1 - gx0);
            const double giy = 0.5 * (gy1 - gy0);
            // d(u,v)/d(xi) with xi = [w, t] acting on the current-camera
            // point p = (Xc, Yc, Zc):
            const double iz = 1.0 / Zc, iz2 = iz * iz;
            double Ju[6], Jv[6];
            // translation part
            Ju[3] = fx * iz;          Jv[3] = 0;
            Ju[4] = 0;                Jv[4] = fy * iz;
            Ju[5] = -fx * Xc * iz2;   Jv[5] = -fy * Yc * iz2;
            // rotation part (dp/dw = -[p]x)
            Ju[0] = -fx * Xc * Yc * iz2;            Jv[0] = -fy * (1 + Yc * Yc * iz2);
            Ju[1] = fx * (1 + Xc * Xc * iz2);       Jv[1] = fy * Xc * Yc * iz2;
            Ju[2] = -fx * Yc * iz;                  Jv[2] = fy * Xc * iz;
            // photometric jacobian
            double Ji[6];
            for (int k = 0; k < 6; ++k) Ji[k] = gix * Ju[k] + giy * Jv[k];
            // geometric jacobian: r_d = dc(u,v) - Zc
            // dZc/dxi: translation (0,0,1); rotation (Yc, -Xc, 0)... sign per dp/dw
            double Jz[6] = {Yc, -Xc, 0, 0, 0, 1};
            // (neglect the d(dc)/du terms; standard point-to-plane-ish approx)
            for (int k = 0; k < 6; ++k) Jz[k] = -Jz[k];
            // robust weights
            const double wi = std::fabs(r_i) < huber_i ? 1.0 : huber_i / std::fabs(r_i);
            const double wd = std::fabs(r_d) < huber_d ? 1.0 : huber_d / std::fabs(r_d);
            const double lam_d = 4.0;  // weight of geometric term
            if (std::fabs(r_i) < 2 * huber_i && std::fabs(r_d) < 3 * huber_d)
              ++n_in;
            for (int a = 0; a < 6; ++a) {
              g[a] -= wi * Ji[a] * r_i + lam_d * wd * Jz[a] * r_d;
              for (int b = 0; b <= a; ++b)
                Hm[a * 6 + b] += wi * Ji[a] * Ji[b] + lam_d * wd * Jz[a] * Jz[b];
            }
          }
        if (n_res < 100) return false;
        for (int a = 0; a < 6; ++a)
          for (int b = a + 1; b < 6; ++b) Hm[a * 6 + b] = Hm[b * 6 + a];
        for (int a = 0; a < 6; ++a) Hm[a * 6 + a] *= 1.0 + 1e-3;
        double dx[6];
        if (!solve6x6(Hm, g, dx)) return false;
        T = matmul(se3_exp(dx), T);
        final_ratio = static_cast<double>(n_in) / n_res;
        double step_norm = 0;
        for (int k = 0; k < 6; ++k) step_norm += dx[k] * dx[k];
        if (step_norm < 1e-12) break;
      }
    }
    *T_ck = T;
    *inlier_ratio = final_ratio;
    return true;
  }
};

}  // namespace

extern "C" {

void* ovo_tracker_create(double kf_trans_th, double kf_rot_th,
                         double kf_inlier_th) {
  auto* t = new Tracker();
  if (kf_trans_th > 0) t->kf_trans_th = kf_trans_th;
  if (kf_rot_th > 0) t->kf_rot_th = kf_rot_th;
  if (kf_inlier_th > 0) t->kf_inlier_th = kf_inlier_th;
  t->key_pose = Mat4::identity();
  t->cur_pose = Mat4::identity();
  t->vel = Mat4::identity();
  return t;
}

void ovo_tracker_destroy(void* h) { delete static_cast<Tracker*>(h); }

// gray: HxW float [0,1]; depth: HxW float metres (0 invalid).
// Returns tracking state (ORB-SLAM3 codes: 2 = OK, 3 = LOST).
int ovo_tracker_process_image_rgbd(void* h, const float* gray,
                                   const float* depth, int w, int hgt,
                                   double fx, double fy, double cx, double cy,
                                   double /*timestamp*/) {
  auto* t = static_cast<Tracker*>(h);
  Pyramid cur;
  cur.build(gray, depth, w, hgt, fx, fy, cx, cy);
  t->last_frame_kf = false;

  if (t->state == Tracker::NOT_INITIALIZED) {
    t->key = cur;
    t->key_pose = Mat4::identity();
    t->cur_pose = Mat4::identity();
    t->state = Tracker::OK;
    t->last_frame_kf = true;
    t->big_change_idx = 0;
  } else {
    // init from constant-velocity: T_ck_init = vel * T_ck_prev, where
    // T_ck_prev = inv(key_pose) ... track relative to key directly
    Mat4 T_ck = matmul(t->vel, matmul(inverse_rigid(t->cur_pose), t->key_pose));
    // T_ck maps key-camera coords -> current-camera coords
    double ratio = 0.0;
    Mat4 T_est = T_ck;
    if (t->align(cur, &T_est, &ratio)) {
      Mat4 prev_pose = t->cur_pose;
      t->cur_pose = matmul(t->key_pose, inverse_rigid(T_est));
      // constant-velocity model: assume the next inter-frame motion repeats
      // this one (T_cur_prev maps prev-camera coords -> current camera)
      t->vel = matmul(inverse_rigid(t->cur_pose), prev_pose);
      t->state = Tracker::OK;
      t->last_inlier_ratio = ratio;
      // keyframe decision: distance from keyframe
      double dx = T_est.m[3], dy = T_est.m[7], dz = T_est.m[11];
      double trans = std::sqrt(dx * dx + dy * dy + dz * dz);
      double tr = T_est.m[0] + T_est.m[5] + T_est.m[10];
      double rot = std::acos(std::fmin(1.0, std::fmax(-1.0, (tr - 1.0) / 2.0)));
      if (trans > t->kf_trans_th || rot > t->kf_rot_th ||
          ratio < t->kf_inlier_th) {
        t->key = cur;
        t->key_pose = t->cur_pose;
        t->last_frame_kf = true;
      }
    } else {
      t->state = Tracker::LOST;
    }
  }
  for (int i = 0; i < 16; ++i) t->trajectory.push_back(t->cur_pose.m[i]);
  ++t->n_frames;
  return t->state;
}

int ovo_tracker_get_tracking_state(void* h) {
  return static_cast<Tracker*>(h)->state;
}

// Writes the current camera-to-world pose (row-major 4x4).
void ovo_tracker_get_last_trajectory_point(void* h, double* out16) {
  auto* t = static_cast<Tracker*>(h);
  std::memcpy(out16, t->cur_pose.m, 16 * sizeof(double));
}

int ovo_tracker_is_last_frame_kf(void* h) {
  return static_cast<Tracker*>(h)->last_frame_kf ? 1 : 0;
}

int ovo_tracker_get_last_big_change_idx(void* h) {
  return static_cast<Tracker*>(h)->big_change_idx;
}

long ovo_tracker_num_frames(void* h) {
  return static_cast<Tracker*>(h)->n_frames;
}

double ovo_tracker_last_inlier_ratio(void* h) {
  return static_cast<Tracker*>(h)->last_inlier_ratio;
}

void ovo_tracker_shutdown(void* h) { (void)h; }

}  // extern "C"
