"""Fused ego-estimator step as one Pallas TPU kernel.

The XLA formulation of `estimation.ego.estimator_step` is ~30 tiny ops
(6x6 predict, Joseph update with the unrolled SPD Cholesky, two state
extractions) — each a separately scheduled kernel at (6, 6)/(6,) shapes,
costing ~10 us/frame of issue latency inside the fused scan
(benchmarks/ANALYSIS.md §3b).  This kernel runs the whole step in one
Mosaic program with everything register/VMEM-resident.

Semantics are op-for-op `estimation/ego.py` + `ops/kalman.py` (reference
src/state_estimation/vehicle_state.py:108-198, filterpy-compatible
Joseph-form update), including the double-extraction prev_heading/
prev_speed side-effect quirk.  Bit-compatibility with the XLA path is
asserted by tests (interpret mode) and was verified on TPU against the
parity budget (PARITY.md).

Layout: the scalar carry/state channels travel as 2-D f32 rows —
(1, 4) in, (1, 12) out — so `jax.vmap` (the multicamera runner) can
auto-batch the call (see the block-shape note in `step`); matrices stay
(6, 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scal_in: [time, prev_heading, prev_speed, has_measurement]
# scal_out: [time, speed_p (post-predict speed = prev_speed\'), speed,
#            x, y, vx2, vy2, vx1, vy1 (post-predict velocities),
#            accel, pos_unc, vel_unc]  (timestamp == time)
# Heading/yaw need atan2, which Mosaic TC does not lower; they are
# derived OUTSIDE the kernel from (vx1, vy1, vx2, vy2, speed_p, speed)
# with the exact XLA ops the reference path uses — bit-equal by
# construction (see estimation.ego._estimator_step_fused).
_N_IN = 4
_N_OUT = 12


def _make_kernel(model, dt: float):
    del model  # F/Q/R arrive as kernel inputs (Pallas forbids captures)

    def kernel(x_ref, P_ref, z_ref, s_ref, F_ref, Q_ref, R_ref,
               x_out, P_out, s_out):
        x0 = x_ref[:]  # (6, 1)
        P0 = P_ref[:]  # (6, 6)
        z = z_ref[:]  # (4, 1)
        time0 = s_ref[0, 0]
        has_meas = s_ref[0, 3] > 0.0

        Fc = F_ref[:]
        Qc = Q_ref[:]
        Rc = R_ref[:]

        # predict: x = F x, P = F P F' + Q
        x1 = jnp.dot(Fc, x0, preferred_element_type=jnp.float32)
        P1 = (
            jnp.dot(
                jnp.dot(Fc, P0, preferred_element_type=jnp.float32),
                Fc.T,
                preferred_element_type=jnp.float32,
            )
            + Qc
        )
        time1 = time0 + jnp.float32(dt)

        # first extraction (prev_* side effects only; heading outside)
        vx1, vy1 = x1[2, 0], x1[3, 0]
        speed_p = jnp.sqrt(vx1 * vx1 + vy1 * vy1)

        # update (Joseph form), H = [I4 | 0]
        y = z - x1[:4]  # (4, 1)
        PHT = P1[:, :4]  # (6, 4)
        S = P1[:4, :4] + Rc  # (4, 4)

        # unrolled SPD Cholesky solve: K = PHT S^-1  (ops/kalman._solve_spd4)
        l11 = jnp.sqrt(S[0, 0])
        l21 = S[1, 0] / l11
        l31 = S[2, 0] / l11
        l41 = S[3, 0] / l11
        l22 = jnp.sqrt(S[1, 1] - l21 * l21)
        l32 = (S[2, 1] - l31 * l21) / l22
        l42 = (S[3, 1] - l41 * l21) / l22
        l33 = jnp.sqrt(S[2, 2] - l31 * l31 - l32 * l32)
        l43 = (S[3, 2] - l41 * l31 - l42 * l32) / l33
        l44 = jnp.sqrt(S[3, 3] - l41 * l41 - l42 * l42 - l43 * l43)

        B = PHT.T  # (4, 6); solve S X = B row-block-wise
        y1r = B[0:1] / l11
        y2r = (B[1:2] - l21 * y1r) / l22
        y3r = (B[2:3] - l31 * y1r - l32 * y2r) / l33
        y4r = (B[3:4] - l41 * y1r - l42 * y2r - l43 * y3r) / l44
        x4r = y4r / l44
        x3r = (y3r - l43 * x4r) / l33
        x2r = (y2r - l32 * x3r - l42 * x4r) / l22
        x1r = (y1r - l21 * x2r - l31 * x3r - l41 * x4r) / l11
        K = jnp.concatenate([x1r, x2r, x3r, x4r], axis=0).T  # (6, 4)

        xu = x1 + jnp.dot(K, y, preferred_element_type=jnp.float32)
        I6 = jnp.eye(6, dtype=jnp.float32)
        KH = jnp.concatenate(
            [K, jnp.zeros((6, 2), jnp.float32)], axis=1
        )  # K @ H with H = [I4 | 0]
        I_KH = I6 - KH
        Pu = (
            jnp.dot(
                jnp.dot(I_KH, P1, preferred_element_type=jnp.float32),
                I_KH.T,
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(
                jnp.dot(K, Rc, preferred_element_type=jnp.float32),
                K.T,
                preferred_element_type=jnp.float32,
            )
        )

        x2 = jnp.where(has_meas, xu, x1)
        P2 = jnp.where(has_meas, Pu, P1)

        # reported extraction (heading/yaw derived outside the kernel)
        px, py = x2[0, 0], x2[1, 0]
        vx2, vy2 = x2[2, 0], x2[3, 0]
        speed = jnp.sqrt(vx2 * vx2 + vy2 * vy2)
        accel = (speed - speed_p) / jnp.float32(dt)
        pos_unc = jnp.sqrt(P2[0, 0] + P2[1, 1])
        vel_unc = jnp.sqrt(P2[2, 2] + P2[3, 3])

        x_out[:] = x2
        P_out[:] = P2
        s_out[0, 0] = time1
        s_out[0, 1] = speed_p
        s_out[0, 2] = speed
        s_out[0, 3] = px
        s_out[0, 4] = py
        s_out[0, 5] = vx2
        s_out[0, 6] = vy2
        s_out[0, 7] = vx1
        s_out[0, 8] = vy1
        s_out[0, 9] = accel
        s_out[0, 10] = pos_unc
        s_out[0, 11] = vel_unc

    return kernel


def make_fused_estimator_step(model, dt: float, hold: float,
                              interpret: bool = False):
    """Returns step(x, P, z, time, prev_heading, prev_speed, has_meas)
    -> (x', P', scal (12,)) with scal as documented above."""
    kernel = _make_kernel(model, dt)
    del hold  # heading hold applies outside the kernel
    F_np = np.asarray(model.F, np.float32)
    Q_np = np.asarray(model.Q, np.float32)
    R_np = np.asarray(model.R, np.float32)

    def step(x, P, z, time, prev_heading, prev_speed, has_meas):
        # Scalar channels travel as (1, K) 2-D rows, not (K,) vectors:
        # under `jax.vmap` (the multicamera runner) Pallas auto-batches
        # each operand with block shape (1, *dims), and a 1-D operand's
        # batched (B, K) array fails Mosaic's last-two-dims block check;
        # with 2-D rows the batched block keeps trailing dims equal to
        # the array's (tests/test_kalman_pallas.py::test_vmap_batches).
        scal_in = jnp.stack(
            [
                jnp.asarray(time, jnp.float32),
                jnp.asarray(prev_heading, jnp.float32),
                jnp.asarray(prev_speed, jnp.float32),
                jnp.asarray(has_meas, jnp.float32),
            ]
        )[None, :]
        x2, P2, scal = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((6, 1), jnp.float32),
                jax.ShapeDtypeStruct((6, 6), jnp.float32),
                jax.ShapeDtypeStruct((1, _N_OUT), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )(
            x.astype(jnp.float32)[:, None],
            P.astype(jnp.float32),
            z.astype(jnp.float32)[:, None],
            scal_in,
            jnp.asarray(F_np),
            jnp.asarray(Q_np),
            jnp.asarray(R_np),
        )
        return x2[:, 0], P2, scal[0]

    return step
