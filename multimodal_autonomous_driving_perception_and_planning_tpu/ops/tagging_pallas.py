"""All three rule-based tagging engines fused into one Pallas TPU kernel.

The XLA formulation of `tagging.rules.make_tagging_step` (scene
classifier + maneuver detector + interaction detector,
src/tagging/{scene_classifier,maneuver_detector,interaction_detector}.py)
is ~200 tiny VPU ops over (T,)/(1,)-shaped values.  Measured ablation
(benchmarks/ANALYSIS.md §3d): the tagging stage costs ~45 us/frame in
the fused scan and essentially none of it is output stacking — it is
pure issue latency of separately scheduled small ops, the same pathology
the fused ego kernel (`ops/kalman_pallas.py`) removed at a third of this
size.  This kernel runs the whole stage as one Mosaic program.

Both pipeline modes are covered by a static ``frames_mode`` switch:
detections mode bakes the reference's frame-feature defaults, frames
mode consumes the lane-fit and scene-feature rows (only the scene
classifier differs — the maneuver detector's lane-offset branch is the
reference's hardcoded-0.0 stub and is identically False in both modes).
`tagging.rules.make_tagging_step` dispatches: TPU -> this kernel,
CPU -> the XLA formulation (also the equivalence oracle).

Semantics are op-for-op `tagging/rules.py` (reference behavior cited
there), with two deliberate mechanical differences that cannot change
any emitted tag in practice and are covered by the equivalence tests:

  * Ring-window statistics (scene majority vote, maneuver mean/std and
    oldest/newest selects) are computed in ring-slot space with masked
    reductions instead of gather-then-reduce — same member set, so any
    difference is float reassociation of a <=30-term sum (guarded
    thresholds sit far from the accumulated values in the test streams,
    and all discrete outputs are asserted exactly equal to the XLA path
    over long random streams in tests/test_tagging_pallas.py).
  * argmin/argmax become min/max plus a first-position select (exact,
    including first-occurrence tie-breaks).

Layout rules (same as ops/kalman_pallas.py): every scalar channel is a
2-D row so `jax.vmap` can auto-batch the call (Mosaic's block check
rejects batched 1-D operands); per-slot vectors are (T, 1) columns;
cross-type aggregation uses (T, 13) so no transposes are needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PipelineConfig

# Detection class ids (detector.py:39-48) — keep in sync with rules.py.
_CAR, _TRUCK, _PED, _CYC, _MOTO, _BUS, _TLIGHT, _SSIGN = range(8)

# Risk rank in descending *string* order (rules.py quirk table).
_RISK_DESC_STRING_RANK = (2, 3, 1, 0)

# Interaction enum indices used by the cascade (rules.py INTERACTIONS).
_I_FOLLOWING = 1
_I_CUT_IN = 4
_I_PED_CROSSING = 6
_I_PED_WAITING = 7
_I_CYC_NEARBY = 8
_I_NEAR_MISS = 9
_N_INTERACTIONS = 13

# SMEM scalar-row layouts (see _build_tags in tagging/rules.py).
SF = (  # (1, 12) float32
    "road_type_confidence", "traffic_light_confidence",
    "stop_sign_confidence", "cond_day_confidence", "lateral_confidence",
    "longitudinal_confidence", "turning_confidence", "speed_kmh",
    "acceleration", "yaw_rate_deg", "closest_agent_distance", "min_ttc",
)
SI = (  # (1, 21) int32 (bools as 0/1)
    "road_type", "road_type_raw", "lane_count", "lateral", "longitudinal",
    "turning", "primary_interaction", "overall_risk", "agent_count",
    "pedestrian_count", "cyclist_count", "vehicle_count",
    "has_traffic_light", "has_stop_sign", "has_pedestrian_area",
    "cond_night", "cond_day", "cond_congested", "cond_clear", "cond_fog",
    "has_min_ttc",
)


def _fmod(a, m):
    """Floor-mod that is non-negative for possibly-negative ``a`` under
    either floor-mod or truncating-rem lowering of ``%``."""
    return ((a % m) + m) % m


def _scene_weights() -> np.ndarray:
    """Scene score table (rules.py weights; rows = condition, cols = road
    type).  numpy so the caller controls when it becomes a device value
    (Pallas forbids array captures inside kernels)."""
    return np.asarray(
        [
            [0.0, 0.4, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.5, 0.0, 0.0, 0.0],
            [0.0, 0.3, 0.0, 0.2, 0.0, 0.0],
            [0.0, 0.0, 0.2, 0.3, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.3, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.3, 0.0],
            [0.0, 0.0, 0.2, 0.1, 0.0, 0.0],
        ],
        np.float32,
    )


def _make_kernel(cfg: PipelineConfig, frames_mode: bool):
    tg = cfg.tagging
    W = tg.scene_smoothing_window
    H = tg.maneuver_history
    HI = tg.interaction_history
    h = float(cfg.frame_height)
    w = float(cfg.frame_width)
    min_hits = cfg.tracker.min_hits
    i32max = jnp.iinfo(jnp.int32).max

    risk_rank = _RISK_DESC_STRING_RANK  # python ints -> baked constants

    def kernel(
        # detections
        dbox_ref, dcls_ref, dconf_ref, dvalid_ref,
        # track table
        tbox_ref, tcls_ref, tid_ref, thits_ref, tvel_ref, tvelc_ref,
        # vehicle state row (1, 6): speed, heading, accel, yaw, x, y
        vrow_ref,
        # counts row (1, 2) int32: scene_count, man_count (pre-increment)
        crow_ref,
        # scene score table (7, 6) f32 (Pallas forbids array captures)
        wts_ref,
        # lane row (1, 8) f32: l_fit a,b,c, r_fit a,b,c, left_found,
        # right_found — zeros in detections mode
        lrow_ref,
        # frame-features row (1, 6) f32: center_edge_density,
        # num_long_lines, avg_line_length, green_ratio, brightness,
        # laplacian_var — zeros in detections mode
        frow_ref,
        # tagging state
        votes_ref, mhist_ref, icent_ref, ilen_ref, iprev_ref,
        # outputs
        votes_out, mhist_out, icent_out, ilen_out,
        sf_out, si_out, present_out, tconf_out,
        itype_out, iconf_out, irisk_out,
        dist_out, rel_out, ttc_out, httc_out,
    ):
        f32 = jnp.float32

        speed = vrow_ref[0, 0]
        heading = vrow_ref[0, 1]
        accel = vrow_ref[0, 2]
        yaw = vrow_ref[0, 3]
        ego_x = vrow_ref[0, 4]
        ego_y = vrow_ref[0, 5]

        # ---------------- scene classifier (rules.py scene_classify) ----
        dvalid = dvalid_ref[:] > 0  # (D, 1)
        dcls = dcls_ref[:]  # (D, 1)
        any_dets = jnp.any(dvalid)

        D = dcls.shape[0]
        ids8d = jax.lax.broadcasted_iota(jnp.int32, (D, 8), 1)
        dhist = jnp.sum(
            ((dcls == ids8d) & dvalid).astype(jnp.int32), axis=0, keepdims=True
        )  # (1, 8)
        traffic_count = dhist[0, _TLIGHT] + dhist[0, _SSIGN]
        vehicle_count_d = dhist[0, _CAR] + dhist[0, _TRUCK] + dhist[0, _BUS]
        ped_count_d = dhist[0, _PED]

        if frames_mode:
            center_density = frow_ref[0, 0]
            many_long = (frow_ref[0, 1] > 5.0) & (frow_ref[0, 2] > 150.0)
            green = frow_ref[0, 3] > 0.15
            brightness = frow_ref[0, 4]
            lap_var = frow_ref[0, 5]
            left_found = lrow_ref[0, 6] > 0.0
            right_found = lrow_ref[0, 7] > 0.0
            both_lanes = left_found & right_found
            conds = jnp.stack(
                [
                    (center_density > 0.15).astype(f32),
                    many_long.astype(f32),
                    (any_dets & (traffic_count > 0)).astype(f32),
                    (any_dets & (vehicle_count_d > 3)).astype(f32),
                    (any_dets & (vehicle_count_d <= 1)).astype(f32),
                    green.astype(f32),
                    both_lanes.astype(f32),
                ]
            ).reshape(7, 1)
        else:
            # Detections-mode frame-feature defaults (rules.py else-branch):
            # center_density 0 -> False; many_long False; green False;
            # lap_var 1000 -> fog False; both_lanes False.
            brightness = f32(128.0)
            lap_var = f32(1000.0)
            both_lanes = jnp.asarray(False)
            conds = jnp.stack(
                [
                    f32(0.0),  # center density > 0.15
                    f32(0.0),  # many long lines
                    (any_dets & (traffic_count > 0)).astype(f32),
                    (any_dets & (vehicle_count_d > 3)).astype(f32),
                    (any_dets & (vehicle_count_d <= 1)).astype(f32),
                    f32(0.0),  # green
                    f32(0.0),  # both lanes
                ]
            ).reshape(7, 1)
        scores = jnp.sum(conds * wts_ref[:], axis=0, keepdims=True)  # (1, 6)
        total = jnp.sum(scores) + 0.001
        norm = scores / total  # (1, 6)
        # argmax (first max) over 6.
        mx = jnp.max(norm)
        pos6 = jax.lax.broadcasted_iota(jnp.int32, (1, 6), 1)
        best = jnp.min(jnp.where(norm == mx, pos6, 6))
        conf = jnp.sum(jnp.where(pos6 == best, norm, 0.0))
        uncertain = conf < 0.3
        road_type = jnp.where(uncertain, 3, best).astype(jnp.int32)
        road_conf = jnp.where(uncertain, f32(0.3), conf)

        # Majority vote over the ring, in slot space.
        count0 = crow_ref[0, 0]
        widx = _fmod(count0, W)
        count1 = count0 + 1
        n_hist = jnp.minimum(count1, W)
        sW = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        votes_tmp = jnp.where(sW == widx, road_type, votes_ref[:])  # (1, W)
        jpos = _fmod(sW - count1, W)  # window position of each slot
        in_window = jpos >= (W - n_hist)
        rt6 = jax.lax.broadcasted_iota(jnp.int32, (6, W), 0)
        hit = in_window & (votes_tmp == rt6)  # (6, W) broadcast over rows
        counts6 = jnp.sum(hit.astype(jnp.int32), axis=1, keepdims=True)
        first_pos = jnp.min(
            jnp.where(hit, jnp.broadcast_to(jpos, (6, W)), W + 1),
            axis=1, keepdims=True,
        )
        max_count = jnp.max(counts6)
        tie_key = jnp.where(counts6 == max_count, first_pos, W + 2)  # (6, 1)
        mnk = jnp.min(tie_key)
        pos6c = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)
        vote_winner = jnp.min(jnp.where(tie_key == mnk, pos6c, 6))
        use_vote = (n_hist >= 2) & (max_count > n_hist // 2)
        smoothed = jnp.where(use_vote, vote_winner, road_type).astype(jnp.int32)
        votes_out[:] = jnp.where(sW == widx, smoothed, votes_tmp)

        night = brightness < 60
        congested = speed < 2.0
        clear = speed > 15.0
        fog = lap_var < 100.0

        if frames_mode:
            # Lane count from the fits at the frame bottom (rules.py
            # intent-level divergence note).
            yb = f32(h)
            lb = lrow_ref[0, 0] * yb * yb + lrow_ref[0, 1] * yb + lrow_ref[0, 2]
            rb = lrow_ref[0, 3] * yb * yb + lrow_ref[0, 4] * yb + lrow_ref[0, 5]
            width_px = jnp.abs(rb - lb)
            lane_count = jnp.where(
                both_lanes,
                jnp.where(width_px > 200, 3, jnp.where(width_px > 100, 2, 1)),
                2,
            ).astype(jnp.int32)
        else:
            lane_count = jnp.int32(2)

        # last-matching-detection confidences.
        posD = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)

        def last_conf(class_id):
            m = dvalid & (dcls == class_id)
            last = jnp.max(jnp.where(m, posD, -1))
            c = jnp.sum(jnp.where(posD == last, dconf_ref[:], 0.0))
            return jnp.any(m), jnp.where(last >= 0, c, 0.0)

        has_tl, tl_conf = last_conf(_TLIGHT)
        has_ss, ss_conf = last_conf(_SSIGN)

        # ---------------- maneuver detector ------------------------------
        mcount0 = crow_ref[0, 1]
        mwidx = _fmod(mcount0, H)
        mcount1 = mcount0 + 1
        entry = jnp.stack([speed, heading, accel, yaw, ego_x, ego_y])
        sH = jax.lax.broadcasted_iota(jnp.int32, (H, 6), 0)
        new_hist = jnp.where(sH == mwidx, entry.reshape(1, 6), mhist_ref[:])
        mhist_out[:] = new_hist

        age = _fmod(mcount1 - 1 - jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0), H)
        yaw_col = new_hist[:, 3:4]  # (H, 1)
        head_col = new_hist[:, 1:2]

        mem10 = age < 10
        have10 = mcount1 >= 10
        sum10 = jnp.sum(jnp.where(mem10, yaw_col, 0.0))
        avg_yaw = sum10 / 10.0
        var10 = jnp.sum(jnp.where(mem10, (yaw_col - avg_yaw) ** 2, 0.0)) / 10.0
        std_yaw = jnp.sqrt(var10)
        avg_yaw_deg = jnp.degrees(avg_yaw)
        yaw_deg = jnp.degrees(yaw)

        swerve = have10 & (std_yaw > 0.1)
        lc_left = have10 & jnp.logical_not(swerve) & (avg_yaw_deg > tg.lane_change_yaw_deg)
        lc_right = have10 & jnp.logical_not(swerve) & (avg_yaw_deg < -tg.lane_change_yaw_deg)
        # detections mode: no lane offset (has_offset False).
        lateral = jnp.where(
            swerve, 3, jnp.where(lc_left, 1, jnp.where(lc_right, 2, 0))
        ).astype(jnp.int32)
        lat_conf = jnp.where(
            swerve,
            jnp.minimum(0.9, std_yaw * 5),
            jnp.where(
                lc_left | lc_right,
                jnp.minimum(0.9, jnp.abs(avg_yaw_deg) / 20.0),
                f32(0.8),
            ),
        )

        stopped = speed < tg.stopped_speed
        hard_brake = accel < tg.hard_brake
        brake = accel < tg.brake
        accelerating = accel > tg.accel
        longitudinal = jnp.where(
            stopped, 4,
            jnp.where(hard_brake, 3, jnp.where(brake, 2, jnp.where(accelerating, 1, 0))),
        ).astype(jnp.int32)
        lon_conf = jnp.where(
            stopped, f32(0.95),
            jnp.where(
                hard_brake, jnp.minimum(0.95, jnp.abs(accel) / 5.0),
                jnp.where(
                    brake, jnp.minimum(0.9, jnp.abs(accel) / 3.0),
                    jnp.where(accelerating, jnp.minimum(0.9, accel / 3.0), f32(0.8)),
                ),
            ),
        )

        have15 = mcount1 >= 15
        newest = jnp.sum(jnp.where(age == 0, head_col, 0.0))
        oldest15 = jnp.sum(jnp.where(age == 14, head_col, 0.0))
        hc = jnp.degrees(newest - oldest15)
        hc = hc - 360.0 * jnp.floor((hc + 180.0) / 360.0)
        u_turn = jnp.abs(hc) > 120
        t_left = hc > 60
        t_right = hc < -60
        c_left = hc > 15
        c_right = hc < -15
        inst_left = yaw_deg > tg.turn_yaw_rate_deg
        inst_right = yaw_deg < -tg.turn_yaw_rate_deg
        turning_hist = jnp.where(
            u_turn, 3,
            jnp.where(t_left, 1, jnp.where(t_right, 2, jnp.where(c_left, 4, jnp.where(c_right, 5, -1)))),
        )
        conf_hist = jnp.where(
            u_turn, f32(0.8),
            jnp.where(
                t_left | t_right, jnp.minimum(0.9, jnp.abs(hc) / 90.0),
                jnp.where(c_left | c_right, jnp.minimum(0.8, jnp.abs(hc) / 45.0), f32(0.0)),
            ),
        )
        turning_inst = jnp.where(inst_left, 4, jnp.where(inst_right, 5, 0)).astype(jnp.int32)
        conf_inst = jnp.where(inst_left | inst_right, f32(0.6), f32(0.8))
        use_hist = have15 & (turning_hist >= 0)
        turning = jnp.where(
            have15, jnp.where(use_hist, turning_hist, turning_inst), 0
        ).astype(jnp.int32)
        turn_conf = jnp.where(have15, jnp.where(use_hist, conf_hist, conf_inst), f32(0.5))

        # ---------------- interaction detector ---------------------------
        tbox = tbox_ref[:]  # (T, 4)
        tcls = tcls_ref[:]  # (T, 1)
        tid = tid_ref[:]
        T = tcls.shape[0]
        confirmed = (tid > 0) & (thits_ref[:] >= min_hits)  # (T, 1)

        box_h = tbox[:, 3:4] - tbox[:, 1:2]
        y_norm = tbox[:, 3:4] / h
        base_d = 50.0 * (1.0 - y_norm) + 5.0
        size_f = 100.0 / (box_h + 10.0)
        dist = jnp.where(
            box_h <= 0, f32(50.0), jnp.clip((base_d + size_f) / 2.0, 2.0, 100.0)
        )  # (T, 1)
        rel = jnp.where(tvelc_ref[:] > 0, speed - tvel_ref[:, 1:2], 0.0)
        has_ttc = rel > 0.1
        ttc = jnp.where(has_ttc, dist / jnp.where(has_ttc, rel, 1.0), jnp.inf)
        has_ttc = has_ttc & (ttc > 0)

        # Per-slot center history ring (dense one-hot selects).
        centers_x = (tbox[:, 0:1] + tbox[:, 2:3]) * 0.5
        centers_y = (tbox[:, 1:2] + tbox[:, 3:4]) * 0.5
        same_owner = iprev_ref[:] == tid
        lens = jnp.where(same_owner, ilen_ref[:], 0)
        lwidx = _fmod(lens, HI)  # (T, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * HI), 1)
        pair = cols // 2
        is_x = (cols % 2) == 0
        val = jnp.where(is_x, centers_x, centers_y)  # (T, 2HI)
        write = (pair == lwidx) & confirmed
        int_centers = jnp.where(write, val, icent_ref[:])
        new_lens = jnp.where(confirmed, lens + 1, lens)
        icent_out[:] = int_centers
        ilen_out[:] = new_lens

        hist_len = new_lens
        oldest_idx = jnp.where(hist_len < HI, 0, _fmod(hist_len, HI))
        newest_idx = _fmod(hist_len - 1, HI)

        def gather_x(idx):
            sel = (pair == idx) & is_x
            return jnp.sum(jnp.where(sel, int_centers, 0.0), axis=1, keepdims=True)

        start_x = gather_x(oldest_idx)
        end_x = gather_x(newest_idx)
        cut_drift = jnp.abs(end_x - w / 2.0) < jnp.abs(start_x - w / 2.0)

        cx = centers_x
        near_miss = dist < tg.near_miss_distance
        is_ped = tcls == _PED
        ped_close = is_ped & (dist < tg.pedestrian_danger_distance)
        ped_center = jnp.abs(cx - w / 2.0) < w / 4.0
        ped_crossing = ped_close & ped_center
        ped_waiting = ped_close & jnp.logical_not(ped_center)
        is_cyc = tcls == _CYC
        cyc_near = is_cyc & (dist < 15.0)
        is_veh = (tcls == _CAR) | (tcls == _TRUCK) | (tcls == _BUS)
        in_front = (cx > w / 4.0) & (cx < 3.0 * w / 4.0)
        following = (
            is_veh & in_front
            & (dist > tg.following_distance_min)
            & (dist < tg.following_distance_max)
        )
        cut_in = is_veh & (hist_len >= 10) & cut_drift & (dist < tg.cut_in_distance)

        itype = jnp.full((T, 1), -1, jnp.int32)
        iconf = jnp.zeros((T, 1), jnp.float32)
        irisk = jnp.zeros((T, 1), jnp.int32)

        def setwhere(itype, iconf, irisk, cond, tval, cval, rval):
            do = cond & (itype < 0) & confirmed
            return (
                jnp.where(do, tval, itype),
                jnp.where(do, cval, iconf),
                jnp.where(do, rval, irisk),
            )

        itype, iconf, irisk = setwhere(itype, iconf, irisk, near_miss, _I_NEAR_MISS, f32(0.9), 3)
        itype, iconf, irisk = setwhere(
            itype, iconf, irisk, ped_crossing, _I_PED_CROSSING, f32(0.8),
            jnp.where(dist < 8.0, 2, 1),
        )
        itype, iconf, irisk = setwhere(itype, iconf, irisk, ped_waiting, _I_PED_WAITING, f32(0.6), 0)
        itype, iconf, irisk = setwhere(
            itype, iconf, irisk, cyc_near, _I_CYC_NEARBY, f32(0.7),
            jnp.where(dist < 8.0, 1, 0),
        )
        follow_risk = jnp.where(
            has_ttc & (ttc < tg.ttc_warning), 2, jnp.where(dist < 10.0, 1, 0)
        )
        itype, iconf, irisk = setwhere(itype, iconf, irisk, following, _I_FOLLOWING, f32(0.75), follow_risk)
        itype, iconf, irisk = setwhere(itype, iconf, irisk, cut_in, _I_CUT_IN, f32(0.7), 1)

        has_int = itype >= 0
        itype_out[:] = itype
        iconf_out[:] = iconf
        irisk_out[:] = irisk
        dist_out[:] = dist
        rel_out[:] = rel
        ttc_out[:] = jnp.where(has_ttc, ttc, 0.0)
        httc_out[:] = has_ttc.astype(jnp.int32)

        ids8t = jax.lax.broadcasted_iota(jnp.int32, (T, 8), 1)
        thist = jnp.sum(
            ((tcls == ids8t) & confirmed).astype(jnp.int32), axis=0, keepdims=True
        )  # (1, 8)
        n_conf = jnp.sum(confirmed.astype(jnp.int32))
        ped_count = thist[0, _PED]
        cyc_count = thist[0, _CYC]
        veh_count = thist[0, _CAR] + thist[0, _TRUCK] + thist[0, _BUS] + thist[0, _MOTO]
        min_dist_raw = jnp.min(jnp.where(confirmed, dist, jnp.inf))
        min_dist = jnp.where(n_conf > 0, min_dist_raw, jnp.inf)
        min_ttc = jnp.min(jnp.where(confirmed & has_ttc, ttc, jnp.inf))

        # Primary interaction (descending string-rank sort quirk).  The
        # 4-entry rank table as nested wheres — a dynamic gather over a
        # tiny table is a lowering hazard in Mosaic.
        desc_rank = jnp.where(
            irisk == 0, risk_rank[0],
            jnp.where(irisk == 1, risk_rank[1],
                      jnp.where(irisk == 2, risk_rank[2], risk_rank[3])),
        )  # (T, 1)
        elig = has_int
        any_int = jnp.any(elig)
        m1 = jnp.max(jnp.where(elig, desc_rank, -1))
        e1 = elig & (desc_rank == m1)
        m2 = jnp.min(jnp.where(e1, iconf, jnp.inf))
        e2 = e1 & (iconf == m2)
        id_key = jnp.where(e2, tid, i32max)
        mnid = jnp.min(id_key)
        posT = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        bestpos = jnp.min(jnp.where(id_key == mnid, posT, T))
        primary_val = jnp.sum(jnp.where(posT == bestpos, itype, 0))
        primary = jnp.where(any_int, primary_val, -1).astype(jnp.int32)

        max_risk = jnp.max(jnp.where(has_int, irisk, 0))
        has_min_ttc = min_ttc < jnp.inf
        ttc_critical = has_min_ttc & (min_ttc < tg.ttc_critical)
        overall = jnp.where(any_int, jnp.where(ttc_critical, 3, max_risk), 0).astype(jnp.int32)

        # Per-type presence + last-wins confidence, (T, 13) layout.
        ids13 = jax.lax.broadcasted_iota(jnp.int32, (T, _N_INTERACTIONS), 1)
        match = (itype == ids13) & has_int  # (T, 13)
        present_out[:] = jnp.any(
            match & (iconf > 0.5), axis=0, keepdims=True
        ).astype(jnp.int32)
        id_for_last = jnp.where(match, tid, -1)  # (T, 13)
        maxid = jnp.max(id_for_last, axis=0, keepdims=True)  # (1, 13)
        anym = jnp.any(match, axis=0, keepdims=True)
        tconf_out[:] = jnp.where(
            anym,
            jnp.sum(jnp.where(match & (id_for_last == maxid), iconf, 0.0),
                    axis=0, keepdims=True),
            0.0,
        )

        # ---------------- scalar rows ------------------------------------
        sf_out[0, 0] = road_conf
        sf_out[0, 1] = tl_conf
        sf_out[0, 2] = ss_conf
        sf_out[0, 3] = jnp.where(brightness > 120, f32(0.8), f32(0.5))
        sf_out[0, 4] = lat_conf
        sf_out[0, 5] = lon_conf
        sf_out[0, 6] = turn_conf
        sf_out[0, 7] = speed * 3.6
        sf_out[0, 8] = accel
        sf_out[0, 9] = yaw_deg
        sf_out[0, 10] = jnp.where(min_dist < jnp.inf, min_dist, 0.0)
        sf_out[0, 11] = jnp.where(has_min_ttc, min_ttc, 0.0)

        si_out[0, 0] = smoothed
        si_out[0, 1] = road_type
        si_out[0, 2] = lane_count
        si_out[0, 3] = lateral
        si_out[0, 4] = longitudinal
        si_out[0, 5] = turning
        si_out[0, 6] = primary
        si_out[0, 7] = overall
        si_out[0, 8] = n_conf
        si_out[0, 9] = ped_count
        si_out[0, 10] = cyc_count
        si_out[0, 11] = veh_count
        si_out[0, 12] = (has_tl & any_dets).astype(jnp.int32)
        si_out[0, 13] = (has_ss & any_dets).astype(jnp.int32)
        si_out[0, 14] = (any_dets & (ped_count_d > 0)).astype(jnp.int32)
        si_out[0, 15] = night.astype(jnp.int32)
        si_out[0, 16] = jnp.logical_not(night).astype(jnp.int32)
        si_out[0, 17] = congested.astype(jnp.int32)
        si_out[0, 18] = clear.astype(jnp.int32)
        si_out[0, 19] = fog.astype(jnp.int32)
        si_out[0, 20] = has_min_ttc.astype(jnp.int32)

    return kernel


def make_fused_tagging_step(cfg: PipelineConfig, frames_mode: bool = False,
                            interpret: bool = False):
    """Returns ``step(state_arrays, dets_arrays, table_arrays, v_scalars,
    lane_vals, feat_vals) -> (state_arrays', outputs)`` running the whole
    tagging stage as one Pallas kernel.  ``frames_mode`` statically
    selects the image-feature scene branches (lane_vals/feat_vals rows
    are consumed; pass None otherwise).  See `tagging.rules` for the
    dict-building wrapper that consumes this."""
    kernel = _make_kernel(cfg, frames_mode)
    W = cfg.tagging.scene_smoothing_window
    H = cfg.tagging.maneuver_history
    HI = cfg.tagging.interaction_history
    t_cap = cfg.tracker.max_tracks

    def step(votes, scene_count, mhist, man_count,
             icent, ilen, iprev,
             dbox, dcls, dconf, dvalid,
             tbox, tcls, tid, thits, tvel, tvelc,
             speed, heading, accel, yaw, ego_x, ego_y,
             lane_vals=None, feat_vals=None):
        f32 = jnp.float32
        if frames_mode:
            lrow = jnp.stack(
                [jnp.asarray(v, f32) for v in lane_vals]
            )[None, :]
            frow = jnp.stack(
                [jnp.asarray(v, f32) for v in feat_vals]
            )[None, :]
        else:
            lrow = jnp.zeros((1, 8), f32)
            frow = jnp.zeros((1, 6), f32)
        vrow = jnp.stack([
            jnp.asarray(speed, f32), jnp.asarray(heading, f32),
            jnp.asarray(accel, f32), jnp.asarray(yaw, f32),
            jnp.asarray(ego_x, f32), jnp.asarray(ego_y, f32),
        ])[None, :]
        crow = jnp.stack([
            jnp.asarray(scene_count, jnp.int32), jnp.asarray(man_count, jnp.int32),
        ])[None, :]
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        outs = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, W), jnp.int32),      # votes
                jax.ShapeDtypeStruct((H, 6), jnp.float32),    # man hist
                jax.ShapeDtypeStruct((t_cap, 2 * HI), jnp.float32),
                jax.ShapeDtypeStruct((t_cap, 1), jnp.int32),  # int_len
                jax.ShapeDtypeStruct((1, len(SF)), jnp.float32),
                jax.ShapeDtypeStruct((1, len(SI)), jnp.int32),
                jax.ShapeDtypeStruct((1, _N_INTERACTIONS), jnp.int32),
                jax.ShapeDtypeStruct((1, _N_INTERACTIONS), jnp.float32),
                jax.ShapeDtypeStruct((t_cap, 1), jnp.int32),   # itype
                jax.ShapeDtypeStruct((t_cap, 1), jnp.float32),  # iconf
                jax.ShapeDtypeStruct((t_cap, 1), jnp.int32),   # irisk
                jax.ShapeDtypeStruct((t_cap, 1), jnp.float32),  # dist
                jax.ShapeDtypeStruct((t_cap, 1), jnp.float32),  # rel
                jax.ShapeDtypeStruct((t_cap, 1), jnp.float32),  # ttc
                jax.ShapeDtypeStruct((t_cap, 1), jnp.int32),   # has_ttc
            ),
            in_specs=[
                vmem, vmem, vmem, vmem,           # detections
                vmem, vmem, vmem, vmem, vmem, vmem,  # table
                smem,                              # vrow
                smem,                              # crow
                vmem,                              # weights
                smem,                              # lane row
                smem,                              # feats row
                vmem, vmem, vmem, vmem, vmem,      # state
            ],
            out_specs=(
                vmem, vmem, vmem, vmem,
                smem, smem, vmem, vmem,
                vmem, vmem, vmem, vmem, vmem, vmem, vmem,
            ),
            interpret=interpret,
        )(
            dbox.astype(f32), dcls.astype(jnp.int32)[:, None],
            dconf.astype(f32)[:, None], dvalid.astype(jnp.int32)[:, None],
            tbox.astype(f32), tcls.astype(jnp.int32)[:, None],
            tid.astype(jnp.int32)[:, None], thits.astype(jnp.int32)[:, None],
            tvel.astype(f32), tvelc.astype(jnp.int32)[:, None],
            vrow, crow,
            jnp.asarray(_scene_weights()),
            lrow, frow,
            votes.astype(jnp.int32)[None, :], mhist.astype(f32),
            icent.astype(f32), ilen.astype(jnp.int32)[:, None],
            iprev.astype(jnp.int32)[:, None],
        )
        return outs

    return step
