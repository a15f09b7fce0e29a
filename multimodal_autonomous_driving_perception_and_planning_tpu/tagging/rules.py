"""Rule-based auto-tagging as device math.

TPU-native rebuild of the reference's three rule engines:
  * SceneClassifier       (src/tagging/scene_classifier.py:91-298)
  * ManeuverDetector      (src/tagging/maneuver_detector.py:105-268)
  * InteractionDetector   (src/tagging/interaction_detector.py:132-398)

Everything is thresholds and reductions over pipeline outputs, so the whole
stage fuses into the per-frame program; enums become int codes (tables below
map back to the reference's tag strings on the host).

Documented parity divergences:
  * Scene road-type majority-vote tie-break uses first-appearance order in
    the history window, like Python's ``max`` over an insertion-ordered dict.
  * ``_estimate_lane_count`` in the reference raises TypeError whenever both
    lanes exist (``len(LaneLine)`` on a dataclass, scene_classifier.py:269) —
    a latent bug.  We implement the evident intent: lane width from the lane
    fits evaluated at the frame bottom (>200 px -> 3, >100 px -> 2, else 1).
  * The reference sorts interactions by ``(risk_level.value, -confidence)
    reverse=True`` — *string* comparison, so alphabetically-descending risk:
    medium > low > high > critical (interaction_detector.py:217).  We
    replicate this quirk exactly so ``primary_interaction`` matches.
  * AutoTagger passes a hardcoded lane_offset of 0.0 when both lanes exist
    (auto_tagger.py:140-146, a latent stub); replicated.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..types import Detections, LaneObservation, TaggingState, TrackTable, VehicleState

# --- enum code tables (host-side names, device-side ints) ------------------

ROAD_TYPES = ("unknown", "intersection", "highway", "urban", "residential", "parking")
CONDITIONS = ("clear", "congested", "night", "day", "rain", "fog")
LATERAL = ("lane_keeping", "lane_change_left", "lane_change_right", "swerving")
LONGITUDINAL = ("cruising", "accelerating", "braking", "hard_braking", "stopped")
TURNING = (
    "straight",
    "turning_left",
    "turning_right",
    "u_turn",
    "curving_left",
    "curving_right",
)
INTERACTIONS = (
    "no_interaction",
    "following_vehicle",
    "being_followed",
    "yielding",
    "vehicle_cut_in",
    "vehicle_cut_out",
    "pedestrian_crossing",
    "pedestrian_waiting",
    "cyclist_nearby",
    "near_miss",
    "merging",
    "passing",
    "being_passed",
)
RISKS = ("low", "medium", "high", "critical")
# Rank of each risk in *descending string order* (the reference's sort quirk):
# "medium" > "low" > "high" > "critical" alphabetically, so a bigger rank
# sorts earlier.  Indexed by (low, medium, high, critical).
# Host constant: bakes into HLO at trace time (a captured device array
# would degrade every dispatch in the process on tunnel-attached TPUs).
_RISK_DESC_STRING_RANK = np.asarray([2, 3, 1, 0])

# Detection class ids (detector.py:39-48).
_CAR, _TRUCK, _PED, _CYC, _MOTO, _BUS, _TLIGHT, _SSIGN = range(8)

_I = lambda k: INTERACTIONS.index(k)  # noqa: E731


def _ring_gather(ring: jnp.ndarray, count: jnp.ndarray, n_last: int) -> jnp.ndarray:
    """Last n_last entries (oldest first) of a ring buffer written at
    ``count % cap``; requires count >= n_last for meaningful output."""
    cap = ring.shape[0]
    idx = (count - n_last + jnp.arange(n_last)) % cap
    return ring[idx]


# ---------------------------------------------------------------------------


def make_tagging_step(cfg: PipelineConfig, backend: str = None,
                      interpret: bool = False):
    """Build the per-frame tagging step.

    On TPU in detections mode (no ``lane_obs``/``frame_feats``) the whole
    stage dispatches to one fused Pallas kernel
    (`ops.tagging_pallas` — the XLA formulation below is ~200 tiny VPU
    ops costing ~45 us/frame of issue latency, ANALYSIS.md §3d); the XLA
    path remains for CPU, for frames mode, and as the equivalence oracle
    (tests/test_tagging_pallas.py).  ``backend`` overrides the
    `jax.default_backend()` probe; ``interpret`` runs the kernel through
    the Pallas interpreter (CPU tests).
    """
    tg = cfg.tagging
    h, w = cfg.frame_height, cfg.frame_width
    t_cap = cfg.tracker.max_tracks
    fps = tg.fps

    def scene_classify(state, dets: Detections, lane_obs, feats, vstate):
        """Road type + conditions + elements (scene_classifier.py:91-298)."""
        any_dets = jnp.any(dets.valid)
        cls = dets.class_id
        vmask = dets.valid

        # One 8-way class histogram instead of three separate masked sums
        # (each reduction is a fusion boundary costing ~1-2 us in the scan).
        cls_hist = jnp.sum(
            ((cls[:, None] == jnp.arange(8)) & vmask[:, None]).astype(jnp.int32),
            axis=0,
        )
        traffic_count = cls_hist[_TLIGHT] + cls_hist[_SSIGN]
        vehicle_count = cls_hist[_CAR] + cls_hist[_TRUCK] + cls_hist[_BUS]
        ped_count = cls_hist[_PED]

        if feats is not None:
            center_density = feats["center_edge_density"]
            many_long = (feats["num_long_lines"] > 5) & (feats["avg_line_length"] > 150.0)
            green = feats["green_ratio"] > 0.15
            brightness = feats["brightness"]
            lap_var = feats["laplacian_var"]
        else:
            center_density = jnp.float32(0.0)
            many_long = jnp.asarray(False)
            green = jnp.asarray(False)
            brightness = jnp.float32(128.0)
            lap_var = jnp.float32(1000.0)

        both_lanes = (
            (lane_obs.left_found & lane_obs.right_found)
            if lane_obs is not None
            else jnp.asarray(False)
        )

        # Scored heuristics (scene_classifier.py:145-207) as one matvec:
        # conditions (7,) x numpy weight rows (7, 6) -> scores (6,), instead
        # of ten sequential scatter-adds on a (6,) vector.
        conds = jnp.stack(
            [
                center_density > 0.15,
                many_long,
                any_dets & (traffic_count > 0),
                any_dets & (vehicle_count > 3),
                any_dets & (vehicle_count <= 1),
                green,
                both_lanes,
            ]
        ).astype(jnp.float32)
        weights = np.asarray(
            [
                # unknown, intersection, highway, urban, residential, parking
                [0.0, 0.4, 0.0, 0.0, 0.0, 0.0],  # center edge density
                [0.0, 0.0, 0.5, 0.0, 0.0, 0.0],  # many long lines
                [0.0, 0.3, 0.0, 0.2, 0.0, 0.0],  # traffic elements
                [0.0, 0.0, 0.2, 0.3, 0.0, 0.0],  # dense vehicles
                [0.0, 0.0, 0.0, 0.0, 0.3, 0.0],  # sparse vehicles
                [0.0, 0.0, 0.0, 0.0, 0.3, 0.0],  # green ratio
                [0.0, 0.0, 0.2, 0.1, 0.0, 0.0],  # both lanes
            ],
            np.float32,
        )
        # Broadcast-sum instead of @: stays on the VPU in exact f32 (the
        # TPU default matmul precision is bf16, which would perturb the
        # score constants and could flip near-tied argmax road types).
        scores = jnp.sum(conds[:, None] * weights, axis=0)

        total = jnp.sum(scores) + 0.001
        norm = scores / total
        best = jnp.argmax(norm).astype(jnp.int32)  # first-max == dict order
        conf = norm[best]
        uncertain = conf < 0.3
        road_type = jnp.where(uncertain, 3, best).astype(jnp.int32)  # urban
        road_conf = jnp.where(uncertain, 0.3, conf)

        # Temporal smoothing: majority vote over the last <=W road types
        # including the current one (scene_classifier.py:282-298).
        W = tg.scene_smoothing_window
        votes = state.scene_votes
        count = state.scene_count
        widx = count % W
        votes = votes.at[widx].set(road_type)
        count = count + 1
        n_hist = jnp.minimum(count, W)

        # Chronological window (oldest first) for first-appearance tie-break.
        window = _ring_gather(votes, count, W)  # (W,) oldest..newest
        pos = jnp.arange(W)
        in_window = pos >= (W - n_hist)
        rt_ids = jnp.arange(6)[:, None]  # (6, 1)
        hit = in_window[None, :] & (window[None, :] == rt_ids)  # (6, W)
        counts = jnp.sum(hit.astype(jnp.int32), axis=1)  # (6,)
        first_pos = jnp.min(jnp.where(hit, pos[None, :], W + 1), axis=1)
        max_count = jnp.max(counts)
        # Python max over an insertion-ordered dict: first key reaching the
        # max count, keyed by first appearance in the window.
        tie_key = jnp.where(counts == max_count, first_pos, W + 2)
        vote_winner = jnp.argmin(tie_key).astype(jnp.int32)
        use_vote = (n_hist >= 2) & (max_count > n_hist // 2)
        smoothed = jnp.where(use_vote, vote_winner, road_type)
        # The reference mutates the history entry it just appended: classify()
        # stores the SceneTags object in self.history and _smooth_tags then
        # assigns current.road_type in place (scene_classifier.py:282-296), so
        # later votes see this frame's *smoothed* road type, not the raw one.
        votes = votes.at[widx].set(smoothed)

        # Conditions (scene_classifier.py:230-259).
        night = brightness < 60
        day_strong = brightness > 120
        speed = vstate.speed
        congested = speed < 2.0
        clear = speed > 15.0
        fog = lap_var < 100.0

        # Lane count (intent-level; see module docstring).
        if lane_obs is not None:
            yb = jnp.float32(h)

            def at_bottom(fit):
                return fit[0] * yb * yb + fit[1] * yb + fit[2]

            width_px = jnp.abs(at_bottom(lane_obs.right_fit) - at_bottom(lane_obs.left_fit))
            lane_count = jnp.where(
                both_lanes,
                jnp.where(width_px > 200, 3, jnp.where(width_px > 100, 2, 1)),
                2,
            ).astype(jnp.int32)
        else:
            lane_count = jnp.asarray(2, jnp.int32)

        # Traffic-element confidences: last matching detection wins
        # (dict-assignment order in auto_tagger.py:162-163).
        def last_conf(class_id):
            m = vmask & (cls == class_id)
            pos_d = jnp.arange(cls.shape[0])
            last = jnp.max(jnp.where(m, pos_d, -1))
            return jnp.any(m), jnp.where(last >= 0, dets.confidence[last], 0.0)

        has_tl, tl_conf = last_conf(_TLIGHT)
        has_ss, ss_conf = last_conf(_SSIGN)

        tags = {
            "road_type": smoothed,
            "road_type_raw": road_type,
            "road_type_confidence": road_conf,
            "has_traffic_light": has_tl & any_dets,
            "traffic_light_confidence": tl_conf,
            "has_stop_sign": has_ss & any_dets,
            "stop_sign_confidence": ss_conf,
            "has_pedestrian_area": any_dets & (ped_count > 0),
            "cond_night": night,
            "cond_day": jnp.logical_not(night),  # day tag always emitted o.w.
            "cond_day_confidence": jnp.where(day_strong, 0.8, 0.5),
            "cond_congested": congested,
            "cond_clear": clear,
            "cond_fog": fog,
            "lane_count": lane_count,
        }
        return votes, count, tags

    # -----------------------------------------------------------------
    def maneuver_detect(state, vstate: VehicleState, lane_obs):
        """maneuver_detector.py:105-268 over the state-history ring."""
        H = tg.maneuver_history
        hist = state.man_history
        count = state.man_count
        entry = jnp.stack(
            [
                vstate.speed,
                vstate.heading,
                vstate.acceleration,
                vstate.yaw_rate,
                vstate.x,
                vstate.y,
            ]
        )
        hist = hist.at[count % H].set(entry)
        count = count + 1

        speed = vstate.speed
        accel = vstate.acceleration
        yaw = vstate.yaw_rate
        yaw_deg = jnp.degrees(yaw)

        # Lateral (:162-195).  AutoTagger's lane_offset stub: 0.0 when both
        # lanes exist, None otherwise.
        last10 = _ring_gather(hist, count, 10)[:, 3]  # yaw rates
        have10 = count >= 10
        avg_yaw = jnp.mean(last10)
        std_yaw = jnp.std(last10)
        avg_yaw_deg = jnp.degrees(avg_yaw)

        swerve = have10 & (std_yaw > 0.1)
        lc_left = have10 & jnp.logical_not(swerve) & (avg_yaw_deg > tg.lane_change_yaw_deg)
        lc_right = have10 & jnp.logical_not(swerve) & (avg_yaw_deg < -tg.lane_change_yaw_deg)

        has_offset = lane_obs.has_offset if lane_obs is not None else jnp.asarray(False)
        offset = jnp.float32(0.0)  # the reference's hardcoded stub value
        off_left = has_offset & (jnp.abs(offset) > tg.lane_change_lateral_m) & (offset > 0)
        off_right = has_offset & (jnp.abs(offset) > tg.lane_change_lateral_m) & (offset <= 0)

        lateral = jnp.where(
            swerve,
            3,
            jnp.where(
                lc_left,
                1,
                jnp.where(lc_right, 2, jnp.where(off_left, 1, jnp.where(off_right, 2, 0))),
            ),
        ).astype(jnp.int32)
        lat_conf = jnp.where(
            swerve,
            jnp.minimum(0.9, std_yaw * 5),
            jnp.where(
                lc_left | lc_right,
                jnp.minimum(0.9, jnp.abs(avg_yaw_deg) / 20.0),
                jnp.where(off_left | off_right, 0.6, 0.8),
            ),
        )

        # Longitudinal (:197-222).
        stopped = speed < tg.stopped_speed
        hard_brake = accel < tg.hard_brake
        brake = accel < tg.brake
        accelerating = accel > tg.accel
        longitudinal = jnp.where(
            stopped,
            4,
            jnp.where(hard_brake, 3, jnp.where(brake, 2, jnp.where(accelerating, 1, 0))),
        ).astype(jnp.int32)
        lon_conf = jnp.where(
            stopped,
            0.95,
            jnp.where(
                hard_brake,
                jnp.minimum(0.95, jnp.abs(accel) / 5.0),
                jnp.where(
                    brake,
                    jnp.minimum(0.9, jnp.abs(accel) / 3.0),
                    jnp.where(accelerating, jnp.minimum(0.9, accel / 3.0), 0.8),
                ),
            ),
        )

        # Turning (:224-268): cumulative heading change over 15 frames.
        have15 = count >= 15
        last15 = _ring_gather(hist, count, 15)[:, 1]  # headings
        hc = jnp.degrees(last15[-1] - last15[0])
        hc = hc - 360.0 * jnp.floor((hc + 180.0) / 360.0)  # wrap to (-180, 180]
        u_turn = jnp.abs(hc) > 120
        t_left = hc > 60
        t_right = hc < -60
        c_left = hc > 15
        c_right = hc < -15
        inst_left = yaw_deg > tg.turn_yaw_rate_deg
        inst_right = yaw_deg < -tg.turn_yaw_rate_deg

        turning_hist = jnp.where(
            u_turn,
            3,
            jnp.where(t_left, 1, jnp.where(t_right, 2, jnp.where(c_left, 4, jnp.where(c_right, 5, -1)))),
        )
        conf_hist = jnp.where(
            u_turn,
            0.8,
            jnp.where(
                t_left | t_right,
                jnp.minimum(0.9, jnp.abs(hc) / 90.0),
                jnp.where(c_left | c_right, jnp.minimum(0.8, jnp.abs(hc) / 45.0), 0.0),
            ),
        )
        turning_inst = jnp.where(inst_left, 4, jnp.where(inst_right, 5, 0)).astype(jnp.int32)
        conf_inst = jnp.where(inst_left | inst_right, 0.6, 0.8)

        use_hist = have15 & (turning_hist >= 0)
        turning = jnp.where(
            have15,
            jnp.where(use_hist, turning_hist, turning_inst),
            0,
        ).astype(jnp.int32)
        turn_conf = jnp.where(have15, jnp.where(use_hist, conf_hist, conf_inst), 0.5)

        tags = {
            "lateral": lateral,
            "lateral_confidence": lat_conf,
            "longitudinal": longitudinal,
            "longitudinal_confidence": lon_conf,
            "turning": turning,
            "turning_confidence": turn_conf,
            "speed_kmh": speed * 3.6,
            "acceleration": accel,
            "yaw_rate_deg": yaw_deg,
        }
        return hist, count, tags

    # -----------------------------------------------------------------
    def interaction_detect(state, table: TrackTable, vstate: VehicleState):
        """interaction_detector.py:132-398 vectorized over track slots."""
        H = tg.interaction_history
        confirmed = table.alive & (table.hits >= cfg.tracker.min_hits)
        cls = table.class_id
        bbox = table.bbox

        ego_speed = vstate.speed

        # Distance heuristic (:224-247).
        box_h = bbox[:, 3] - bbox[:, 1]
        y_norm = bbox[:, 3] / h
        base_d = 50.0 * (1.0 - y_norm) + 5.0
        size_f = 100.0 / (box_h + 10.0)
        dist = jnp.where(
            box_h <= 0, 50.0, jnp.clip((base_d + size_f) / 2.0, 2.0, 100.0)
        )

        # Relative speed (:249-258); velocity None -> 0.
        rel = jnp.where(table.vel_count > 0, ego_speed - table.velocity[:, 1], 0.0)

        # TTC (:260-266).
        has_ttc = rel > 0.1
        ttc = jnp.where(has_ttc, dist / jnp.where(has_ttc, rel, 1.0), jnp.inf)
        has_ttc = has_ttc & (ttc > 0)

        # Per-slot center history ring; reset slots claimed by a new id.
        # The ring write/reads use dense one-hot selects over the (T, 2H)
        # buffer instead of per-row scatter/gather (a scatter with a
        # per-row dynamic column is the expensive lowering on TPU; the
        # masked select is a single fused VPU pass and bit-exact — the
        # gather-by-sum has exactly one nonzero term per row).
        same_owner = state.int_track_id == table.track_id
        lens = jnp.where(same_owner, state.int_len, 0)
        centers = table.center  # (T, 2)
        widx = lens % H
        cols = jnp.arange(2 * H)
        pair = cols // 2  # (2H,) history index of each column
        is_x = (cols % 2) == 0
        val = jnp.where(is_x[None, :], centers[:, 0:1], centers[:, 1:2])  # (T, 2H)
        write = (pair[None, :] == widx[:, None]) & confirmed[:, None]
        int_centers = jnp.where(write, val, state.int_centers)
        new_lens = jnp.where(confirmed, lens + 1, lens)

        # Cut-in drift test uses oldest vs newest (:358-364), evaluated on
        # the *pre-update* history like the reference (history appended
        # before analysis — :195-198 appends, then :201 analyzes with the
        # updated deque, so include the current center).
        hist_len = new_lens
        oldest_idx = jnp.where(hist_len < H, 0, hist_len % H)
        newest_idx = (hist_len - 1) % H

        def gather_x(idx):
            sel = (pair[None, :] == idx[:, None]) & is_x[None, :]
            return jnp.sum(jnp.where(sel, int_centers, 0.0), axis=1)

        start_x = gather_x(oldest_idx)
        end_x = gather_x(newest_idx)
        cut_drift = jnp.abs(end_x - w / 2.0) < jnp.abs(start_x - w / 2.0)

        cx = (bbox[:, 0] + bbox[:, 2]) / 2.0

        # Interaction cascade (:268-375).
        near_miss = dist < tg.near_miss_distance

        is_ped = cls == _PED
        ped_close = is_ped & (dist < tg.pedestrian_danger_distance)
        ped_center = jnp.abs(cx - w / 2.0) < w / 4.0
        ped_crossing = ped_close & ped_center
        ped_waiting = ped_close & jnp.logical_not(ped_center)

        is_cyc = cls == _CYC
        cyc_near = is_cyc & (dist < 15.0)

        is_veh = (cls == _CAR) | (cls == _TRUCK) | (cls == _BUS)
        in_front = (cx > w / 4.0) & (cx < 3.0 * w / 4.0)
        following = (
            is_veh
            & in_front
            & (dist > tg.following_distance_min)
            & (dist < tg.following_distance_max)
        )
        cut_in = (
            is_veh
            & (hist_len >= 10)
            & cut_drift
            & (dist < tg.cut_in_distance)
        )

        # Priority: near_miss > pedestrian > cyclist > following > cut_in.
        itype = jnp.full((t_cap,), -1, jnp.int32)
        iconf = jnp.zeros((t_cap,), jnp.float32)
        irisk = jnp.zeros((t_cap,), jnp.int32)

        def setwhere(cond, tval, cval, rval):
            nonlocal itype, iconf, irisk
            do = cond & (itype < 0) & confirmed
            itype = jnp.where(do, tval, itype)
            iconf = jnp.where(do, cval, iconf)
            irisk = jnp.where(do, rval, irisk)

        setwhere(near_miss, _I("near_miss"), 0.9, 3)
        setwhere(
            ped_crossing,
            _I("pedestrian_crossing"),
            0.8,
            jnp.where(dist < 8.0, 2, 1),
        )
        setwhere(ped_waiting, _I("pedestrian_waiting"), 0.6, 0)
        setwhere(cyc_near, _I("cyclist_nearby"), 0.7, jnp.where(dist < 8.0, 1, 0))
        follow_risk = jnp.where(
            has_ttc & (ttc < tg.ttc_warning), 2, jnp.where(dist < 10.0, 1, 0)
        )
        setwhere(following, _I("following_vehicle"), 0.75, follow_risk)
        setwhere(cut_in, _I("vehicle_cut_in"), 0.7, 1)

        has_int = itype >= 0

        # Aggregates: one 8-way class histogram and one batched (2, T) min
        # instead of six separate masked reductions.
        conf_hist = jnp.sum(
            ((cls[:, None] == jnp.arange(8)) & confirmed[:, None]).astype(jnp.int32),
            axis=0,
        )
        n_conf = jnp.sum(confirmed.astype(jnp.int32))
        ped_count = conf_hist[_PED]
        cyc_count = conf_hist[_CYC]
        veh_count = (
            conf_hist[_CAR] + conf_hist[_TRUCK] + conf_hist[_BUS] + conf_hist[_MOTO]
        )
        mins = jnp.min(
            jnp.stack(
                [
                    jnp.where(confirmed, dist, jnp.inf),
                    jnp.where(confirmed & has_ttc, ttc, jnp.inf),
                ]
            ),
            axis=1,
        )
        min_dist = jnp.where(n_conf > 0, mins[0], jnp.inf)
        min_ttc = mins[1]

        # Primary interaction: the reference's descending *string* sort on
        # (risk, -confidence), stable by confirmed order (ascending id).
        desc_rank = jnp.asarray(_RISK_DESC_STRING_RANK)[irisk]  # bigger = sorts first
        elig = has_int
        any_int = jnp.any(elig)
        m1 = jnp.max(jnp.where(elig, desc_rank, -1))
        e1 = elig & (desc_rank == m1)
        m2 = jnp.min(jnp.where(e1, iconf, jnp.inf))  # -conf desc == conf asc
        e2 = e1 & (iconf == m2)
        id_key = jnp.where(e2, table.track_id, jnp.iinfo(jnp.int32).max)
        primary_slot = jnp.argmin(id_key)
        primary = jnp.where(any_int, itype[primary_slot], -1).astype(jnp.int32)

        # Overall risk (:377-398).
        max_risk = jnp.max(jnp.where(has_int, irisk, 0))
        ttc_critical = jnp.isfinite(min_ttc) & (min_ttc < tg.ttc_critical)
        overall = jnp.where(
            any_int, jnp.where(ttc_critical, 3, max_risk), 0
        ).astype(jnp.int32)

        # Tag presence (conf > 0.5, get_tags_list :95-103) and last-wins
        # confidences per type (auto_tagger.py:177-178 — iteration order is
        # ascending id, so "last" = max id having the type).
        type_ids = jnp.arange(len(INTERACTIONS))[:, None]  # (13, 1)
        match = (itype[None, :] == type_ids) & has_int[None, :]  # (13, T)
        present = jnp.any(match & (iconf[None, :] > 0.5), axis=1)
        id_for_last = jnp.where(match, table.track_id[None, :], -1)
        last_slot = jnp.argmax(id_for_last, axis=1)
        type_conf = jnp.where(
            jnp.any(match, axis=1), iconf[last_slot], 0.0
        )

        new_state_fields = dict(
            int_centers=int_centers,
            int_len=new_lens,
            int_track_id=table.track_id,
        )
        tags = {
            "interaction_present": present,  # (13,)
            "interaction_confidence": type_conf,  # (13,)
            "primary_interaction": primary,
            "overall_risk": overall,
            "agent_count": n_conf,
            "pedestrian_count": ped_count,
            "cyclist_count": cyc_count,
            "vehicle_count": veh_count,
            "closest_agent_distance": jnp.where(jnp.isfinite(min_dist), min_dist, 0.0),
            "min_ttc": jnp.where(jnp.isfinite(min_ttc), min_ttc, 0.0),
            "has_min_ttc": jnp.isfinite(min_ttc),
            # Per-slot detail for host-side export.
            "track_interaction_type": itype,
            "track_interaction_confidence": iconf,
            "track_interaction_risk": irisk,
            "track_distance": dist,
            "track_relative_speed": rel,
            "track_ttc": jnp.where(has_ttc, ttc, 0.0),
            "track_has_ttc": has_ttc,
        }
        return new_state_fields, tags

    # -----------------------------------------------------------------
    def tagging_step(
        state: TaggingState,
        dets: Detections,
        table: TrackTable,
        confirmed,
        n_confirmed,
        vstate: VehicleState,
        lane_obs: LaneObservation,
        frame_feats: Dict,
    ):
        votes, scount, scene_tags = scene_classify(state, dets, lane_obs, frame_feats, vstate)
        mhist, mcount, man_tags = maneuver_detect(state, vstate, lane_obs)
        ifields, int_tags = interaction_detect(state, table, vstate)

        frame_count = state.frame_count + 1
        new_state = TaggingState(
            scene_votes=votes,
            scene_count=scount,
            man_history=mhist,
            man_count=mcount,
            int_centers=ifields["int_centers"],
            int_len=ifields["int_len"],
            int_track_id=ifields["int_track_id"],
            frame_count=frame_count,
        )
        tags = {
            "timestamp": (frame_count - 1).astype(jnp.float32) / fps,
            **scene_tags,
            **man_tags,
            **int_tags,
        }
        return new_state, tags

    # ---------------- fused-kernel dispatch -----------------------------
    # backend=None -> lowering-time platform choice (ops.dispatch): the
    # fused kernel lowers for TPU, the XLA formulation above for anything
    # else — so AOT exports lowered for TPU from a CPU host still contain
    # the kernel.  Explicit backend pins a formulation at trace time
    # (oracle comparisons); interpret runs the kernel via the Pallas
    # interpreter on CPU (tests).
    if backend is None:
        from ..ops.dispatch import env_backend

        backend = env_backend()
    if backend is not None and backend != "tpu" and not interpret:
        return tagging_step

    from ..ops.tagging_pallas import SF, SI, make_fused_tagging_step

    fused_det = make_fused_tagging_step(cfg, frames_mode=False,
                                        interpret=interpret)
    fused_frames = make_fused_tagging_step(cfg, frames_mode=True,
                                           interpret=interpret)
    sf_i = {k: i for i, k in enumerate(SF)}
    si_i = {k: i for i, k in enumerate(SI)}

    def tagging_step_pallas(
        state: TaggingState,
        dets: Detections,
        table: TrackTable,
        confirmed,
        n_confirmed,
        vstate: VehicleState,
        lane_obs: LaneObservation,
        frame_feats: Dict,
    ):
        if (lane_obs is None) != (frame_feats is None):
            # Mixed availability never happens in the pipeline (the lane
            # step produces both); keep the XLA path for odd callers.
            return tagging_step(
                state, dets, table, confirmed, n_confirmed, vstate,
                lane_obs, frame_feats,
            )
        if lane_obs is not None:
            fused = fused_frames
            extra = dict(
                lane_vals=(
                    lane_obs.left_fit[0], lane_obs.left_fit[1],
                    lane_obs.left_fit[2], lane_obs.right_fit[0],
                    lane_obs.right_fit[1], lane_obs.right_fit[2],
                    lane_obs.left_found, lane_obs.right_found,
                ),
                feat_vals=(
                    frame_feats["center_edge_density"],
                    frame_feats["num_long_lines"],
                    frame_feats["avg_line_length"],
                    frame_feats["green_ratio"],
                    frame_feats["brightness"],
                    frame_feats["laplacian_var"],
                ),
            )
        else:
            fused = fused_det
            extra = {}
        (votes, mhist, icent, ilen, sf, si, present, tconf,
         itype, iconf, irisk, dist, rel, ttc, httc) = fused(
            state.scene_votes, state.scene_count,
            state.man_history, state.man_count,
            state.int_centers, state.int_len, state.int_track_id,
            dets.bbox, dets.class_id, dets.confidence, dets.valid,
            table.bbox, table.class_id, table.track_id, table.hits,
            table.velocity, table.vel_count,
            vstate.speed, vstate.heading, vstate.acceleration,
            vstate.yaw_rate, vstate.x, vstate.y,
            **extra,
        )
        frame_count = state.frame_count + 1
        new_state = TaggingState(
            scene_votes=votes[0],
            scene_count=state.scene_count + 1,
            man_history=mhist,
            man_count=state.man_count + 1,
            int_centers=icent,
            int_len=ilen[:, 0],
            int_track_id=table.track_id,
            frame_count=frame_count,
        )
        sfv, siv = sf[0], si[0]

        def fx(k):
            return sfv[sf_i[k]]

        def ix(k):
            return siv[si_i[k]]

        def bx(k):
            return ix(k).astype(bool)

        tags = {
            "timestamp": (frame_count - 1).astype(jnp.float32) / fps,
            "road_type": ix("road_type"),
            "road_type_raw": ix("road_type_raw"),
            "road_type_confidence": fx("road_type_confidence"),
            "has_traffic_light": bx("has_traffic_light"),
            "traffic_light_confidence": fx("traffic_light_confidence"),
            "has_stop_sign": bx("has_stop_sign"),
            "stop_sign_confidence": fx("stop_sign_confidence"),
            "has_pedestrian_area": bx("has_pedestrian_area"),
            "cond_night": bx("cond_night"),
            "cond_day": bx("cond_day"),
            "cond_day_confidence": fx("cond_day_confidence"),
            "cond_congested": bx("cond_congested"),
            "cond_clear": bx("cond_clear"),
            "cond_fog": bx("cond_fog"),
            "lane_count": ix("lane_count"),
            "lateral": ix("lateral"),
            "lateral_confidence": fx("lateral_confidence"),
            "longitudinal": ix("longitudinal"),
            "longitudinal_confidence": fx("longitudinal_confidence"),
            "turning": ix("turning"),
            "turning_confidence": fx("turning_confidence"),
            "speed_kmh": fx("speed_kmh"),
            "acceleration": fx("acceleration"),
            "yaw_rate_deg": fx("yaw_rate_deg"),
            "interaction_present": present[0].astype(bool),
            "interaction_confidence": tconf[0],
            "primary_interaction": ix("primary_interaction"),
            "overall_risk": ix("overall_risk"),
            "agent_count": ix("agent_count"),
            "pedestrian_count": ix("pedestrian_count"),
            "cyclist_count": ix("cyclist_count"),
            "vehicle_count": ix("vehicle_count"),
            "closest_agent_distance": fx("closest_agent_distance"),
            "min_ttc": fx("min_ttc"),
            "has_min_ttc": bx("has_min_ttc"),
            "track_interaction_type": itype[:, 0],
            "track_interaction_confidence": iconf[:, 0],
            "track_interaction_risk": irisk[:, 0],
            "track_distance": dist[:, 0],
            "track_relative_speed": rel[:, 0],
            "track_ttc": ttc[:, 0],
            "track_has_ttc": httc[:, 0].astype(bool),
        }
        return new_state, tags

    if backend == "tpu" or interpret:
        return tagging_step_pallas

    # backend=None: choose at lowering time.  lane_obs/frame_feats
    # None-ness is static per call site; mixed availability falls back to
    # the XLA path inside tagging_step_pallas (never happens in the
    # pipeline).
    from ..ops.dispatch import kernel_or_xla

    def tagging_step_dispatch(
        state, dets, table, confirmed, n_confirmed, vstate,
        lane_obs=None, frame_feats=None,
    ):
        if (lane_obs is None) != (frame_feats is None):
            return tagging_step(
                state, dets, table, confirmed, n_confirmed, vstate,
                lane_obs, frame_feats,
            )
        return kernel_or_xla(
            tagging_step_pallas,
            tagging_step,
            state, dets, table, confirmed, n_confirmed, vstate,
            lane_obs, frame_feats,
            backend=None,
        )

    return tagging_step_dispatch
