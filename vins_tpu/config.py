"""Configuration for the TPU-native VIO stack.

Mirrors the reference's per-platform yaml schema (config/euroc/
euroc_config.yaml; read by the three readParameters() functions —
feature_tracker/src/parameters.cpp:37-74, vins_estimator/src/parameters.cpp:
42-137, pose_graph/src/pose_graph_node.cpp:460-527) plus the compile-time
constants (vins_estimator/src/parameters.h:11-14).  Static/shape-determining
fields are plain Python ints so they stay jit-static.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import yaml


@dataclasses.dataclass(frozen=True)
class VinsConfig:
    # --- compile-time constants (parameters.h:11-14) ---
    window: int = 10  # WINDOW_SIZE: sliding window of window+1 frames
    max_landmarks: int = 160  # landmark slots in the solver (NUM_OF_F bound)
    focal: float = 460.0  # FOCAL_LENGTH virtual focal for thresholds/weights
    # --- front-end (euroc_config.yaml) ---
    image_width: int = 752
    image_height: int = 480
    max_cnt: int = 150
    min_dist: int = 30
    freq: int = 10
    f_threshold: float = 1.0
    equalize: bool = True
    fisheye: bool = False
    # --- estimator ---
    max_num_iterations: int = 8
    keyframe_parallax: float = 10.0  # pixels, divided by focal in use
    estimate_extrinsic: int = 0  # 0 fixed / 1 optimize / 2 calibrate from scratch
    estimate_td: bool = False
    rolling_shutter: bool = False
    rolling_shutter_tr: float = 0.0
    td: float = 0.0
    init_depth: float = 5.0  # INIT_DEPTH fallback (parameters.cpp)
    min_parallax_ratio_init: float = 30.0  # px·focal for init relativePose
    # --- IMU noise ---
    acc_n: float = 0.08
    gyr_n: float = 0.004
    acc_w: float = 0.00004
    gyr_w: float = 2.0e-6
    g_norm: float = 9.81007
    # --- loop closure ---
    loop_closure: bool = True
    fast_relocalization: bool = False
    # pose-graph ingestion gates (pose_graph_node.cpp:24 SKIP_FIRST_CNT;
    # launch params skip_cnt / skip_dis, e.g. euroc.launch:19-20)
    pg_skip_first_cnt: int = 10
    pg_skip_cnt: int = 0
    pg_skip_dis: float = 0.0
    # MIN_LOOP_NUM (keyframe.h:16): matched-descriptor AND PnP-inlier gate
    min_loop_num: int = 25
    # run the pose-graph stage on a background worker thread (the
    # reference's separate pose_graph process) — sync by default so tests
    # and tools see deterministic per-frame results
    pg_async: bool = False
    # software-pipeline the front-end and estimator one published frame
    # apart (the reference's tracker/estimator process parallelism,
    # SURVEY §2.6) — off by default so tests see per-frame results
    overlap: bool = False
    # 4-DoF solve cadence in stream seconds (the reference's 2 s optimize
    # thread, pose_graph.cpp:403); 0 = solve on every accepted loop
    pg_opt_interval: float = 2.0
    # keep raw images on keyframes + build loop-match overlays (the
    # reference's DEBUG_IMAGE compile flag, keyframe.h/parameters)
    debug_image: bool = False
    # --- camera (parsed separately into a camera model) ---
    camera: dict | None = None
    extrinsic_R: tuple = ((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0))  # imu^R_cam
    extrinsic_t: tuple = (0.0, 0.0, 0.0)  # imu^t_cam

    @property
    def frames(self) -> int:
        return self.window + 1

    @property
    def min_parallax(self) -> float:
        """Keyframe parallax threshold on the normalized plane."""
        return self.keyframe_parallax / self.focal


def _cv_matrix(node: Any) -> np.ndarray:
    """Parse an opencv-matrix yaml node."""
    return np.asarray(node["data"], dtype=np.float64).reshape(node["rows"], node["cols"])


def load_config(path: str) -> VinsConfig:
    """Load a reference-style yaml config file (cv::FileStorage flavor)."""
    with open(path) as f:
        text = f.read()
    # cv::FileStorage yaml needs its directive + !!opencv-matrix tags stripped
    text = text.replace("%YAML:1.0", "").replace("!!opencv-matrix", "")
    raw = yaml.safe_load(text)

    kw: dict[str, Any] = {}
    for yaml_key, field, cast in [
        ("image_width", "image_width", int),
        ("image_height", "image_height", int),
        ("max_cnt", "max_cnt", int),
        ("min_dist", "min_dist", int),
        ("freq", "freq", int),
        ("F_threshold", "f_threshold", float),
        ("equalize", "equalize", lambda v: bool(int(v))),
        ("fisheye", "fisheye", lambda v: bool(int(v))),
        ("max_num_iterations", "max_num_iterations", int),
        ("keyframe_parallax", "keyframe_parallax", float),
        ("estimate_extrinsic", "estimate_extrinsic", int),
        ("estimate_td", "estimate_td", lambda v: bool(int(v))),
        ("rolling_shutter", "rolling_shutter", lambda v: bool(int(v))),
        ("rolling_shutter_tr", "rolling_shutter_tr", float),
        ("td", "td", float),
        ("acc_n", "acc_n", float),
        ("gyr_n", "gyr_n", float),
        ("acc_w", "acc_w", float),
        ("gyr_w", "gyr_w", float),
        ("g_norm", "g_norm", float),
        ("loop_closure", "loop_closure", lambda v: bool(int(v))),
        ("fast_relocalization", "fast_relocalization", lambda v: bool(int(v))),
        # pose-graph ingestion gates: roslaunch params in the reference
        # (euroc.launch:19-20); plain yaml keys here
        ("pg_skip_first_cnt", "pg_skip_first_cnt", int),
        ("skip_cnt", "pg_skip_cnt", int),
        ("skip_dis", "pg_skip_dis", float),
    ]:
        if raw.get(yaml_key) is not None:
            kw[field] = cast(raw[yaml_key])

    cam_keys = ("model_type", "distortion_parameters", "projection_parameters",
                "mirror_parameters", "poly_parameters", "inv_poly_parameters",
                "affine_parameters")
    kw["camera"] = {k: raw[k] for k in cam_keys if k in raw}

    if "extrinsicRotation" in raw:
        kw["extrinsic_R"] = tuple(map(tuple, _cv_matrix(raw["extrinsicRotation"])))
    if "extrinsicTranslation" in raw:
        kw["extrinsic_t"] = tuple(_cv_matrix(raw["extrinsicTranslation"]).ravel())

    return VinsConfig(**kw)
