"""IMU preintegration — TPU-native equivalent of the reference Preintegrated.

Mirrors /root/reference/sensors/src/IMU.cpp:218-276 (IntegrateNewMeasurement:
ΔR/ΔV/ΔP updates, 15x15 covariance via the A/B propagation, 5 bias Jacobians)
as a single `lax.scan` over a padded measurement buffer. Re-integration after a
bias update is one device call over the stored buffer instead of a C++ loop.

State layout (all float32):
  dR (3,3)  dV (3,)  dP (3,)  — deltas at the original bias b
  JRg JVg JVa JPg JPa (3,3)   — d(delta)/d(bias) Jacobians
  C (15,15)                   — [theta, v, p, bg, ba] covariance
  dT ()                       — total time
  avgA avgW (3,)              — running averages (used by IMU init checks)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import so3

GRAVITY_VALUE = 9.81  # reference IMU.h:22


class PreintState(NamedTuple):
    dR: jax.Array
    dV: jax.Array
    dP: jax.Array
    JRg: jax.Array
    JVg: jax.Array
    JVa: jax.Array
    JPg: jax.Array
    JPa: jax.Array
    C: jax.Array
    dT: jax.Array
    avgA: jax.Array
    avgW: jax.Array

    @staticmethod
    def identity(dtype=jnp.float32) -> "PreintState":
        z33 = jnp.zeros((3, 3), dtype)
        z3 = jnp.zeros((3,), dtype)
        return PreintState(
            dR=jnp.eye(3, dtype=dtype), dV=z3, dP=z3,
            JRg=z33, JVg=z33, JVa=z33, JPg=z33, JPa=z33,
            C=jnp.zeros((15, 15), dtype), dT=jnp.zeros((), dtype),
            avgA=z3, avgW=z3,
        )


def _integrate_step(nga: jax.Array, nga_walk: jax.Array, bias: jax.Array,
                    state: PreintState, meas) -> tuple[PreintState, None]:
    """One IntegrateNewMeasurement (IMU.cpp:218-276). meas=(acc, gyr, dt, valid)."""
    acc_m, gyr_m, dt, valid = meas
    bg, ba = bias[:3], bias[3:]
    acc = acc_m - ba
    accW = gyr_m - bg
    dR, dV, dP = state.dR, state.dV, state.dP
    dT = state.dT

    avgA = (dT * state.avgA + dR @ acc * dt) / (dT + dt)
    avgW = (dT * state.avgW + accW * dt) / (dT + dt)

    # position/velocity first (use non-updated rotation)
    dP_new = dP + dV * dt + 0.5 * dR @ acc * dt * dt
    dV_new = dV + dR @ acc * dt

    Wacc = so3.hat(acc)
    dRdt = dR * dt

    # bias Jacobians (order matters: JPa/JPg use old JVa/JVg)
    JPa = state.JPa + state.JVa * dt - 0.5 * dRdt * dt
    JPg = state.JPg + state.JVg * dt - 0.5 * dt * dt * (dR @ Wacc @ state.JRg)
    JVa = state.JVa - dRdt
    JVg = state.JVg - dt * (dR @ Wacc @ state.JRg)

    # rotation increment: the reference uses the *series* form with a first-
    # order branch for small angles (IMU.cpp:120-141); exp matches to fp32.
    w_dt = accW * dt
    dRi = so3.exp(w_dt)
    rightJ = so3.right_jacobian(w_dt)
    dR_new = so3.normalize(dR @ dRi)

    # covariance propagation: C9 = A C9 A^T + B Nga B^T; bias walk adds on 6x6
    A = jnp.eye(9, dtype=dR.dtype)
    A = A.at[3:6, 0:3].set(-dRdt @ Wacc)
    A = A.at[6:9, 0:3].set(-0.5 * dt * (dRdt @ Wacc))
    A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=dR.dtype) * dt)
    A = A.at[0:3, 0:3].set(dRi.T)
    B = jnp.zeros((9, 6), dtype=dR.dtype)
    B = B.at[3:6, 3:6].set(dRdt)
    B = B.at[6:9, 3:6].set(0.5 * dt * dRdt)
    B = B.at[0:3, 0:3].set(rightJ * dt)
    C9 = A @ state.C[:9, :9] @ A.T + B @ jnp.diag(nga) @ B.T
    C = state.C.at[:9, :9].set(C9)
    C = C.at[9:, 9:].add(jnp.diag(nga_walk))

    JRg = dRi.T @ state.JRg - rightJ * dt

    new = PreintState(
        dR=dR_new, dV=dV_new, dP=dP_new,
        JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
        C=C, dT=dT + dt, avgA=avgA, avgW=avgW,
    )
    # masked (padded) entries are no-ops
    keep = lambda n, o: jnp.where(valid, n, o)
    out = jax.tree.map(keep, new, state)
    return out, None


@functools.partial(jax.jit, static_argnames=())
def integrate(acc: jax.Array, gyr: jax.Array, dt: jax.Array, valid: jax.Array,
              bias: jax.Array, nga: jax.Array, nga_walk: jax.Array) -> PreintState:
    """Preintegrate a padded measurement buffer.

    acc/gyr: (N, 3); dt/valid: (N,); bias: (6,) = [bg, ba];
    nga/nga_walk: (6,) diagonal noise [gyro(3), acc(3)] already scaled by
    sqrt(freq) resp. 1/sqrt(freq) at config load (reference System.cpp:97-98).
    """
    step = functools.partial(_integrate_step, nga, nga_walk, bias)
    state, _ = jax.lax.scan(step, PreintState.identity(acc.dtype),
                            (acc, gyr, dt, valid))
    return state


def corrected_deltas(state: PreintState, bias0: jax.Array, bias_new: jax.Array):
    """GetDeltaRotation/Velocity/Position(b_) (IMU.cpp:328-365): first-order
    bias-corrected deltas without re-integration."""
    db = bias_new - bias0
    dbg, dba = db[:3], db[3:]
    dR = state.dR @ so3.exp(state.JRg @ dbg)
    dV = state.dV + state.JVg @ dbg + state.JVa @ dba
    dP = state.dP + state.JPg @ dbg + state.JPa @ dba
    return so3.normalize(dR), dV, dP


class Preintegrated:
    """Host-side wrapper: measurement storage + device integration.

    Plays the role of IMU::Preintegrated (IMU.h:120-235): stores raw
    measurements so `reintegrate`/`merge_previous` can recompute with a new
    bias; exposes the original/updated/bias-corrected delta getters used by
    tracking and the inertial residuals.
    """

    __slots__ = ("b", "bu", "nga", "nga_walk", "_acc", "_gyr", "_dt", "state")

    def __init__(self, bias: np.ndarray, nga: np.ndarray, nga_walk: np.ndarray):
        self.b = np.asarray(bias, np.float32).copy()      # original bias [bg, ba]
        self.bu = self.b.copy()                            # updated bias
        self.nga = np.asarray(nga, np.float32)
        self.nga_walk = np.asarray(nga_walk, np.float32)
        self._acc: list = []
        self._gyr: list = []
        self._dt: list = []
        self.state = jax.device_get(PreintState.identity())

    # -- measurement management -------------------------------------------
    def integrate_measurements(self, acc: np.ndarray, gyr: np.ndarray,
                               dt: np.ndarray) -> None:
        """Append measurements and integrate them (batched device call)."""
        acc = np.atleast_2d(np.asarray(acc, np.float32))
        gyr = np.atleast_2d(np.asarray(gyr, np.float32))
        dt = np.atleast_1d(np.asarray(dt, np.float32))
        self._acc.extend(acc)
        self._gyr.extend(gyr)
        self._dt.extend(dt)
        self._recompute(self.b)

    def reintegrate(self) -> None:
        """Reference Reintegrate (IMU.cpp:212-218): redo with updated bias."""
        self.b = self.bu.copy()
        self._recompute(self.b)

    def merge_previous(self, prev: "Preintegrated") -> None:
        """Reference MergePrevious (IMU.cpp:280-303): prepend prev's
        measurements and re-integrate at the updated bias."""
        if prev is self:
            return
        self._acc = list(prev._acc) + self._acc
        self._gyr = list(prev._gyr) + self._gyr
        self._dt = list(prev._dt) + self._dt
        self.b = self.bu.copy()
        self._recompute(self.b)

    def _recompute(self, bias: np.ndarray) -> None:
        n = len(self._dt)
        if n == 0:
            self.state = jax.device_get(PreintState.identity())
            return
        # pad to the next power-of-two bucket so XLA compiles few shapes
        cap = max(8, 1 << (n - 1).bit_length())
        acc = np.zeros((cap, 3), np.float32)
        gyr = np.zeros((cap, 3), np.float32)
        dt = np.zeros((cap,), np.float32)
        valid = np.zeros((cap,), bool)
        acc[:n] = self._acc
        gyr[:n] = self._gyr
        dt[:n] = self._dt
        valid[:n] = True
        self.state = jax.device_get(
            integrate(acc, gyr, dt, valid, bias, self.nga, self.nga_walk)
        )

    # -- getters (mirror the reference API) --------------------------------
    @property
    def dT(self) -> float:
        return float(self.state.dT)

    @property
    def C(self) -> np.ndarray:
        return np.asarray(self.state.C)

    def set_new_bias(self, bias_new: np.ndarray) -> None:
        self.bu = np.asarray(bias_new, np.float32).copy()

    def get_delta_bias(self) -> np.ndarray:
        return self.bu - self.b

    def delta_rotation(self, bias: np.ndarray | None = None) -> np.ndarray:
        b = self.bu if bias is None else np.asarray(bias, np.float32)
        dR, _, _ = corrected_deltas(self.state, self.b, b)
        return np.asarray(dR)

    def delta_velocity(self, bias: np.ndarray | None = None) -> np.ndarray:
        b = self.bu if bias is None else np.asarray(bias, np.float32)
        _, dV, _ = corrected_deltas(self.state, self.b, b)
        return np.asarray(dV)

    def delta_position(self, bias: np.ndarray | None = None) -> np.ndarray:
        b = self.bu if bias is None else np.asarray(bias, np.float32)
        _, _, dP = corrected_deltas(self.state, self.b, b)
        return np.asarray(dP)

    def original_deltas(self):
        return (np.asarray(self.state.dR), np.asarray(self.state.dV),
                np.asarray(self.state.dP))

    def copy(self) -> "Preintegrated":
        out = Preintegrated(self.b, self.nga, self.nga_walk)
        out.bu = self.bu.copy()
        out._acc = list(self._acc)
        out._gyr = list(self._gyr)
        out._dt = list(self._dt)
        out.state = self.state
        return out
