"""ctypes wrapper over libshermbot_host.so (native/baseline/capi.cpp).

Thin, dependency-free (numpy only) bindings; see the package docstring for
the component's role. All state lives in the C++ engine instance — the
Python object is just a handle.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native", "baseline")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libshermbot_host.so")

_lock = threading.Lock()
_lib = None


def ensure_built():
    """(Re)build the native library and return the loaded CDLL.

    make runs unconditionally (it is incremental, ~no cost when current):
    gating on the .so's existence would silently load a stale library after
    source edits and make the parity tests validate against an old oracle.
    """
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            subprocess.run(["make"], cwd=_NATIVE_DIR, check=True,
                           capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            raise RuntimeError(
                f"building libshermbot_host failed:\n{e.stderr}") from e
        lib = ctypes.CDLL(_LIB_PATH)

        lib.sb_engine_create.restype = ctypes.c_void_p
        lib.sb_engine_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64]
        lib.sb_engine_create_custom.restype = ctypes.c_void_p
        lib.sb_engine_create_custom.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
        lib.sb_engine_destroy.argtypes = [ctypes.c_void_p]
        lib.sb_engine_tick.restype = ctypes.c_int
        lib.sb_engine_tick.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double]
        lib.sb_engine_poses.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
        lib.sb_engine_state_dim.restype = ctypes.c_int
        lib.sb_engine_state_dim.argtypes = [ctypes.c_void_p]
        lib.sb_engine_state.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
        lib.sb_engine_cov.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
        lib.sb_engine_seen.restype = ctypes.c_int
        lib.sb_engine_seen.argtypes = [ctypes.c_void_p]
        lib.sb_engine_ate.restype = ctypes.c_double
        lib.sb_engine_ate.argtypes = [ctypes.c_void_p]
        lib.sb_engine_ate_odom.restype = ctypes.c_double
        lib.sb_engine_ate_odom.argtypes = [ctypes.c_void_p]
        lib.sb_detect_landmarks.restype = ctypes.c_int
        lib.sb_detect_landmarks.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int]
        lib.sb_simulate_lidar.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
        dp = ctypes.POINTER(ctypes.c_double)
        lib.sb_ekf_create.restype = ctypes.c_void_p
        lib.sb_ekf_create.argtypes = [ctypes.c_int, dp, dp, ctypes.c_double]
        lib.sb_ekf_destroy.argtypes = [ctypes.c_void_p]
        lib.sb_ekf_set_mean.argtypes = [ctypes.c_void_p, dp]
        lib.sb_ekf_set_cov.argtypes = [ctypes.c_void_p, dp]
        lib.sb_ekf_set_seen.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.sb_ekf_get_mean.argtypes = [ctypes.c_void_p, dp]
        lib.sb_ekf_get_cov.argtypes = [ctypes.c_void_p, dp]
        lib.sb_ekf_predict.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double]
        lib.sb_ekf_update.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_double, ctypes.c_double]
        lib.sb_ekf_init_landmark.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_double, ctypes.c_double]
        lib.sb_ekf_associate.restype = ctypes.c_int
        lib.sb_ekf_associate.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double]
        lib.sb_ekf_zhat_h.argtypes = [ctypes.c_void_p, ctypes.c_int, dp, dp]
        lib.sb_integrate_twist.argtypes = [
            ctypes.c_double, ctypes.c_double, ctypes.c_double, dp]
        lib.sb_abi_version.restype = ctypes.c_int
        if lib.sb_abi_version() != 3:
            raise RuntimeError("libshermbot_host ABI mismatch")
        _lib = lib
        return _lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class HostEngine:
    """In-process native SLAM pipeline (sim + odometry + perception + EKF).

    One instance = one robot/world; mirrors the JAX engine's
    ``pipeline/driver.py`` tick semantics (PARITY.md applies on both sides).
    """

    def __init__(self, scenario=None, *, deterministic=True, seed=12345,
                 tubes=None, capacity=None, known_assoc=False,
                 use_lidar=False, lidar_quirks=False, max_range=1.0,
                 tube_var=0.001,
                 twist_noise=0.0, slip_min=0.9, slip_max=1.0,
                 cmd=(0.1, 0.05), steps=500):
        lib = ensure_built()
        if scenario is not None:
            h = lib.sb_engine_create(scenario.encode(), int(deterministic),
                                     seed)
            if not h:
                raise ValueError(f"unknown scenario {scenario!r}")
        else:
            tubes = np.ascontiguousarray(tubes, dtype=np.float64)
            if tubes.ndim != 2 or tubes.shape[1] != 2:
                raise ValueError("tubes must be (n, 2)")
            if capacity is None:
                capacity = len(tubes)
            tx = np.ascontiguousarray(tubes[:, 0])
            ty = np.ascontiguousarray(tubes[:, 1])
            h = lib.sb_engine_create_custom(
                _dptr(tx), _dptr(ty), len(tubes), int(capacity),
                int(known_assoc), int(use_lidar), int(lidar_quirks),
                float(max_range),
                float(tube_var), float(twist_noise), float(slip_min),
                float(slip_max), float(cmd[0]), float(cmd[1]), int(steps),
                int(deterministic), seed)
        self._lib = lib
        self._h = ctypes.c_void_p(h)

    def close(self):
        if self._h:
            self._lib.sb_engine_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def tick(self, cmd_w, cmd_v):
        """One 10 Hz SLAM tick; returns landmarks seen so far."""
        return self._lib.sb_engine_tick(self._h, float(cmd_w), float(cmd_v))

    @property
    def poses(self):
        """dict of (th, x, y) for truth / odom / slam."""
        out = np.empty(9)
        self._lib.sb_engine_poses(self._h, _dptr(out))
        return {"truth": tuple(out[0:3]), "odom": tuple(out[3:6]),
                "slam": tuple(out[6:9])}

    @property
    def state_dim(self):
        return self._lib.sb_engine_state_dim(self._h)

    @property
    def state(self):
        """EKF mean [th, x, y, m1x, m1y, ...]."""
        out = np.empty(self.state_dim)
        self._lib.sb_engine_state(self._h, _dptr(out))
        return out

    @property
    def cov(self):
        d = self.state_dim
        out = np.empty(d * d)
        self._lib.sb_engine_cov(self._h, _dptr(out))
        return out.reshape(d, d)

    @property
    def n_seen(self):
        """Landmarks initialized so far."""
        return self._lib.sb_engine_seen(self._h)

    @property
    def ate(self):
        return self._lib.sb_engine_ate(self._h)

    @property
    def ate_odom(self):
        return self._lib.sb_engine_ate_odom(self._h)

    def run(self, steps, cmd_w, cmd_v, record=False):
        """Run ``steps`` ticks; optionally record (steps, 9) pose rows."""
        traj = np.empty((steps, 9)) if record else None
        for t in range(steps):
            self.tick(cmd_w, cmd_v)
            if record:
                self._lib.sb_engine_poses(self._h, _dptr(traj[t]))
        return traj


class NativeEKF:
    """Standalone handle on the C++ engine's EKF primitives.

    Used by the hand-derived reference-fixture tests to anchor the native
    oracle to the reference's formulas (slam_library.cpp) directly, without
    running a whole pipeline.
    """

    def __init__(self, n, Q, R, init_cov=2147483647.0):
        lib = ensure_built()
        Q = np.ascontiguousarray(Q, dtype=np.float64).reshape(3, 3)
        R = np.ascontiguousarray(R, dtype=np.float64).reshape(2, 2)
        self._lib = lib
        self._h = ctypes.c_void_p(
            lib.sb_ekf_create(int(n), _dptr(Q), _dptr(R), float(init_cov)))
        self.dim = 3 + 2 * int(n)

    def close(self):
        if self._h:
            self._lib.sb_ekf_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    @property
    def mean(self):
        out = np.empty(self.dim)
        self._lib.sb_ekf_get_mean(self._h, _dptr(out))
        return out

    @mean.setter
    def mean(self, v):
        v = np.ascontiguousarray(v, dtype=np.float64)
        assert v.shape == (self.dim,)
        self._lib.sb_ekf_set_mean(self._h, _dptr(v))

    @property
    def cov(self):
        out = np.empty(self.dim * self.dim)
        self._lib.sb_ekf_get_cov(self._h, _dptr(out))
        return out.reshape(self.dim, self.dim)

    @cov.setter
    def cov(self, v):
        v = np.ascontiguousarray(v, dtype=np.float64)
        assert v.shape == (self.dim, self.dim)
        self._lib.sb_ekf_set_cov(self._h, _dptr(v))

    def set_seen(self, n_seen):
        self._lib.sb_ekf_set_seen(self._h, int(n_seen))

    def predict(self, dth, dx):
        self._lib.sb_ekf_predict(self._h, float(dth), float(dx))

    def update(self, j, zr, zb):
        self._lib.sb_ekf_update(self._h, int(j), float(zr), float(zb))

    def init_landmark(self, j, zr, zb):
        self._lib.sb_ekf_init_landmark(self._h, int(j), float(zr), float(zb))

    def associate(self, zr, zb):
        return self._lib.sb_ekf_associate(self._h, float(zr), float(zb))

    def zhat_H(self, j):
        z = np.empty(2)
        H = np.empty(2 * self.dim)
        self._lib.sb_ekf_zhat_h(self._h, int(j), _dptr(z), _dptr(H))
        return z, H.reshape(2, self.dim)


def integrate_twist(w, vx, vy):
    """Native SE(2) twist integration: exp([w, vx, vy]) -> (theta, x, y)."""
    lib = ensure_built()
    out = np.empty(3)
    lib.sb_integrate_twist(float(w), float(vx), float(vy), _dptr(out))
    return out


def detect_landmarks(scan, max_out=64):
    """Native perception stage: 360-ray scan -> (n, 2) detections."""
    lib = ensure_built()
    scan = np.ascontiguousarray(scan, dtype=np.float64)
    mx = np.empty(max_out)
    my = np.empty(max_out)
    n = lib.sb_detect_landmarks(_dptr(scan), len(scan), _dptr(mx),
                                _dptr(my), max_out)
    return np.stack([mx[:n], my[:n]], axis=-1)


def simulate_lidar(tubes, pose, tube_rad=0.0381, quirks=False):
    """Native 360-ray lidar at ``pose=(th, x, y)`` in a tube world.
    ``quirks=True`` selects the reference-faithful buggy scanner."""
    lib = ensure_built()
    tubes = np.ascontiguousarray(tubes, dtype=np.float64)
    tx = np.ascontiguousarray(tubes[:, 0])
    ty = np.ascontiguousarray(tubes[:, 1])
    out = np.empty(360)
    lib.sb_simulate_lidar(_dptr(tx), _dptr(ty), len(tubes),
                          float(tube_rad), float(pose[0]), float(pose[1]),
                          float(pose[2]), int(quirks), _dptr(out))
    return out
