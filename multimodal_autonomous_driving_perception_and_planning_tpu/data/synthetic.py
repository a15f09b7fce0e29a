"""Synthetic scenario fixtures.

Two families:

1. **Parity fixtures** (`simulated_detection_stream`, `ego_motion_stream`,
   `simulated_vehicle_motion_stream`): host-side numpy generators that are
   bit-exact with the reference's seeded global-numpy-RNG semantics
   (src/perception/detector.py:125-169, data/loaders/video_loader.py:166-205,
   src/state_estimation/vehicle_state.py:260-330).  They call the same
   ``np.random`` legacy functions in the same order, so the streams match the
   CPU reference exactly; they exist so device outputs can be compared to the
   reference oracle at <=1e-4.

   Note the reference's global-RNG quirk (SURVEY.md section 3.3): the
   detector re-seeds numpy's *global* RNG every frame with
   ``frame_count % 1000``, and ``generate_ego_motion`` draws from whatever
   global state is current.  The canonical sequence here seeds the ego
   stream explicitly (default seed 0) to make it reproducible, since the
   reference's is entropy-seeded and differs per run.

   Because they mutate numpy's GLOBAL RNG, these generators are NOT
   thread-safe: concurrent calls interleave draws and corrupt both
   streams.  Generate fixtures on one thread (tests/test_serve.py's
   micro-batching test learned this the hard way).

2. **Device-native streams** (`device_detection_stream`): the same
   detection distribution expressed with counter-keyed `jax.random`, for
   pure-device benchmarking where bit-parity with numpy's MT19937 is not
   required.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Class-sampling weights from detector.py:159-160.
CLASS_WEIGHTS = (0.6, 0.15, 0.1, 0.05, 0.03, 0.05, 0.01, 0.01)

CLASS_NAMES = (
    "car",
    "truck",
    "pedestrian",
    "cyclist",
    "motorcycle",
    "bus",
    "traffic_light",
    "stop_sign",
)  # detector.py:39-48


def simulated_detections_for_frame(
    frame_count: int, height: int = 480, width: int = 640
):
    """Detections for one frame, bit-exact with ObjectDetector._detect_simulated.

    ``frame_count`` is the reference's post-increment counter, i.e. 1 for the
    first frame (detector.py:96).  Returns (boxes (n,4) int, class_ids (n,),
    confidences (n,)).
    """
    np.random.seed(frame_count % 1000)
    num_vehicles = np.random.randint(3, 8)
    boxes, classes, confs = [], [], []
    for i in range(num_vehicles):
        distance_factor = np.random.uniform(0.3, 1.0)
        base_w = int(80 * distance_factor + 40)
        base_h = int(60 * distance_factor + 30)
        t = frame_count * 0.02
        x_base = (i * 150 + int(50 * np.sin(t + i))) % (width - base_w)
        y_base = int(height * 0.4 + (height * 0.4 * distance_factor))
        x1 = max(0, x_base + np.random.randint(-10, 10))
        y1 = max(0, y_base + np.random.randint(-5, 5))
        x2 = min(width, x1 + base_w)
        y2 = min(height, y1 + base_h)
        class_id = np.random.choice(len(CLASS_WEIGHTS), p=np.asarray(CLASS_WEIGHTS))
        conf = np.random.uniform(0.75, 0.98)
        boxes.append((x1, y1, x2, y2))
        classes.append(int(class_id))
        confs.append(float(conf))
    return (
        np.asarray(boxes, np.float32),
        np.asarray(classes, np.int32),
        np.asarray(confs, np.float32),
    )


def simulated_detection_stream(
    num_frames: int,
    height: int = 480,
    width: int = 640,
    capacity: int = 16,
    start_frame_count: int = 1,
):
    """Padded (T, D, ...) detection tables for a frame sequence.

    Returns dict of numpy arrays: bbox (T, D, 4), class_id (T, D),
    confidence (T, D), valid (T, D).
    """
    bbox = np.zeros((num_frames, capacity, 4), np.float32)
    cls = np.zeros((num_frames, capacity), np.int32)
    conf = np.zeros((num_frames, capacity), np.float32)
    valid = np.zeros((num_frames, capacity), bool)
    for f in range(num_frames):
        b, c, cf = simulated_detections_for_frame(
            start_frame_count + f, height, width
        )
        n = min(len(b), capacity)
        bbox[f, :n] = b[:n]
        cls[f, :n] = c[:n]
        conf[f, :n] = cf[:n]
        valid[f, :n] = True
    return {"bbox": bbox, "class_id": cls, "confidence": conf, "valid": valid}


def ego_motion_stream(
    num_frames: int, dt: float = 1.0 / 30.0, seed: int | None = 0
) -> np.ndarray:
    """(T, 4) [x, y, vx, vy] measurements, matching
    VideoDataLoader.generate_ego_motion (video_loader.py:166-205):
    constant 10 m/s, heading 0.05 sin(0.5 t), gaussian noise
    sigma = (0.1, 0.1, 0.05, 0.05)."""
    if seed is not None:
        np.random.seed(seed)
    out = np.zeros((num_frames, 4), np.float64)
    x = y = 0.0
    speed = 10.0
    for i in range(num_frames):
        t = i * dt
        heading = 0.05 * np.sin(t * 0.5)
        vx = speed * np.cos(heading)
        vy = speed * np.sin(heading)
        x += vx * dt
        y += vy * dt
        out[i] = (
            x + np.random.normal(0, 0.1),
            y + np.random.normal(0, 0.1),
            vx + np.random.normal(0, 0.05),
            vy + np.random.normal(0, 0.05),
        )
    return out


class IncrementalEgoMotion:
    """Stateful `ego_motion_stream` producing successive rows in O(n) per
    call — bit-identical to slicing one monolithic stream, without the
    O(T^2/chunk) regenerate-from-frame-0 cost the chunked stream driver
    (runtime/stream.py) used to pay.

    ``np.random.RandomState(seed)`` initializes the same MT19937 stream as
    ``np.random.seed(seed)`` on the global generator, so the draws match
    `ego_motion_stream(seed=seed)` exactly (asserted in test_runtime)."""

    def __init__(self, dt: float = 1.0 / 30.0, seed: int = 0):
        self.dt = dt
        self._i = 0
        self._x = 0.0
        self._y = 0.0
        self._rs = np.random.RandomState(seed)

    def take(self, num_frames: int) -> np.ndarray:
        out = np.zeros((num_frames, 4), np.float64)
        speed = 10.0
        for j in range(num_frames):
            t = self._i * self.dt
            heading = 0.05 * np.sin(t * 0.5)
            vx = speed * np.cos(heading)
            vy = speed * np.sin(heading)
            self._x += vx * self.dt
            self._y += vy * self.dt
            out[j] = (
                self._x + self._rs.normal(0, 0.1),
                self._y + self._rs.normal(0, 0.1),
                vx + self._rs.normal(0, 0.05),
                vy + self._rs.normal(0, 0.05),
            )
            self._i += 1
        return out


def simulated_vehicle_motion_stream(
    num_frames: int, dt: float = 0.033, seed: int | None = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """(measurements, ground_truth) per SimulatedVehicleMotion
    (vehicle_state.py:260-330): speed 10 + 3 sin(0.2 t), heading
    0.1 sin(0.3 t) + 0.05 sin(0.7 t), noise sigma (0.5, 0.5, 0.2, 0.2)."""
    if seed is not None:
        np.random.seed(seed)
    meas = np.zeros((num_frames, 4), np.float64)
    truth = np.zeros((num_frames, 4), np.float64)
    x = y = 0.0
    time = 0.0
    for i in range(num_frames):
        time += dt
        speed = 10 + 3 * np.sin(time * 0.2)
        heading = 0.1 * np.sin(time * 0.3) + 0.05 * np.sin(time * 0.7)
        vx = speed * np.cos(heading)
        vy = speed * np.sin(heading)
        x += vx * dt
        y += vy * dt
        truth[i] = (x, y, vx, vy)
        meas[i] = (
            x + np.random.normal(0, 0.5),
            y + np.random.normal(0, 0.5),
            vx + np.random.normal(0, 0.2),
            vy + np.random.normal(0, 0.2),
        )
    return meas, truth


def generate_agent_trajectories(
    num_agents: int,
    num_steps: int,
    dt: float = 1.0 / 30.0,
    seed: int | None = 0,
):
    """Random-walk agent trajectories, matching
    SyntheticDataGenerator.generate_agent_trajectories (bytecode-recovered,
    data/generators/synthetic_data.cpython-312.pyc lines 221-255): per agent,
    start x~U(-20,20), y~U(10,40), heading~U(-0.3,0.3), speed~U(5,15); each
    step heading += N(0,0.02), speed += N(0,0.1) clipped to [3,20], then
    Euler-integrate.

    Returns dict mapping agent_id -> list of (x, y, vx, vy) tuples.
    """
    if seed is not None:
        np.random.seed(seed)
    trajectories = {}
    for agent_id in range(num_agents):
        x = np.random.uniform(-20, 20)
        y = np.random.uniform(10, 40)
        heading = np.random.uniform(-0.3, 0.3)
        speed = np.random.uniform(5, 15)
        agent_traj = []
        for _ in range(num_steps):
            heading += np.random.normal(0, 0.02)
            speed = np.clip(speed + np.random.normal(0, 0.1), 3, 20)
            vx = speed * np.cos(heading)
            vy = speed * np.sin(heading)
            x += vx * dt
            y += vy * dt
            agent_traj.append((x, y, vx, vy))
        trajectories[agent_id] = agent_traj
    return trajectories


def device_detection_stream(
    num_frames: int,
    height: int = 480,
    width: int = 640,
    capacity: int = 16,
    seed: int = 0,
    start_frame_count: int = 1,
):
    """Device-native simulated detections via counter-keyed `jax.random`.

    Same distribution family as the parity fixture (3-7 boxes, sizes and
    positions drawn identically in structure), but using threefry streams
    folded on the frame counter — the TPU-idiomatic analog of the
    reference's per-frame ``np.random.seed`` (detector.py:134).
    """
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    weights = jnp.asarray(CLASS_WEIGHTS)

    def one_frame(frame_count):
        k = jax.random.fold_in(key, frame_count % 1000)
        ks = jax.random.split(k, 6)
        num = jax.random.randint(ks[0], (), 3, 8)
        i = jnp.arange(capacity)
        df = jax.random.uniform(ks[1], (capacity,), minval=0.3, maxval=1.0)
        base_w = jnp.floor(80 * df + 40)
        base_h = jnp.floor(60 * df + 30)
        t = frame_count.astype(jnp.float32) * 0.02
        x_base = jnp.mod(
            i * 150 + jnp.floor(50 * jnp.sin(t + i)), width - base_w
        )
        y_base = jnp.floor(height * 0.4 + height * 0.4 * df)
        jx = jax.random.randint(ks[2], (capacity,), -10, 10)
        jy = jax.random.randint(ks[3], (capacity,), -5, 5)
        x1 = jnp.maximum(0.0, x_base + jx)
        y1 = jnp.maximum(0.0, y_base + jy)
        x2 = jnp.minimum(float(width), x1 + base_w)
        y2 = jnp.minimum(float(height), y1 + base_h)
        cls = jax.random.choice(ks[4], 8, (capacity,), p=weights)
        conf = jax.random.uniform(ks[5], (capacity,), minval=0.75, maxval=0.98)
        valid = i < num
        bbox = jnp.stack([x1, y1, x2, y2], axis=-1)
        return {
            "bbox": bbox.astype(jnp.float32),
            "class_id": cls.astype(jnp.int32),
            "confidence": conf.astype(jnp.float32),
            "valid": valid,
        }

    counters = jnp.arange(start_frame_count, start_frame_count + num_frames)
    return jax.vmap(one_frame)(counters)
