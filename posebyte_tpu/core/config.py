"""Configuration dataclasses.

Mirrors the reference's three config layers (SURVEY.md §5): CLI flags,
config structs (GPUTrackerConfig / TrackerConfig), and compile-time
constants. Configs here are static hashable dataclasses so they can be
closed over by jit without retracing on every call.

Reference: include/cuda/gpu_tracker.h:16-26, include/types.h:135-155,
src/main.cpp:132-141.
"""
from __future__ import annotations

import dataclasses
from . import constants as C


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """GPU-native tracker configuration (reference: gpu_tracker.h:16-26)."""
    max_tracks: int = C.DEFAULT_MAX_TRACKS
    max_detections: int = C.DEFAULT_MAX_DETECTIONS
    match_threshold: float = 0.5    # cost threshold (1 - OKS)
    high_thresh: float = 0.30       # two-tier high-confidence split
    low_thresh: float = 0.15        # two-tier low-confidence floor
    new_track_thresh: float = 0.30  # min confidence to spawn a track
    max_age: int = 10               # frames before confirmed -> lost
    min_hits: int = 3               # hits before tentative -> confirmed

    # Motion model: "cv" = the constant-gain constant-velocity filter
    # the reference's shipping tracker uses (gpu_tracker.cu:102-189);
    # "kalman136" = the full third-order per-keypoint filter
    # (kalman_filter.cu), which the reference wires in but never calls.
    motion_model: str = "cv"
    accel_memory: float = 0.9
    jerk_memory: float = 0.9

    # Compile-time constants in the reference, lifted into config here.
    lost_window: int = C.LOST_WINDOW
    gate_threshold: float = C.GATE_THRESHOLD
    visibility_threshold: float = C.VISIBILITY_THRESHOLD
    dedup_iou_threshold: float = C.DEDUP_IOU_THRESHOLD

    # Stage-4 torso-OKS fallback tier (gpu_tracker.cu:429/kernelTorsoOKS).
    # NOTE the reference's "two-tier" split is by COST FUNCTION only:
    # it computes high/low confidence masks but never applies them to
    # association (gpu_tracker.cu:1217-1224, reproduced faithfully —
    # see tracker/step.py divergence notes). This flag ablates the
    # tier that actually exists. False is supported on the scan path
    # (tracker_step) for evaluation; the fused chunk kernel always
    # runs the production True.
    torso_tier: bool = True

    # Appearance Re-ID blend (beyond the reference, ops/reid.py):
    # cost' = (1-w)*geometry + w*(1-cosine) in the high-confidence and
    # lost-recovery tiers. 0 = pure geometric association (reference
    # behavior, the default).
    reid_weight: float = 0.0
    reid_ema: float = 0.9
    # Embedding image-sampling lowering (ops/reid.py): "direct" =
    # advanced-indexing point gathers (the reference formulation);
    # "block" = one contiguous-block gather per keypoint + one-hot
    # corner selection (ops.reid.corner_blocks). Measured at the
    # headline chunk shape (BENCH_REID_r05.json, one process per leg):
    # the free 1-tap descriptor prefers direct (3187 vs 2130 FPS) but
    # the learned 25-tap patch head prefers block (1008 vs 566 FPS —
    # the four point-gather fusions alone were 1.38 of 1.75 ms/frame,
    # PROFILE_REID_LEARNED_r05.json). "auto" (default) picks the
    # measured winner per source. Values agree bit-exactly (free) / to
    # f32 rounding (learned patches) — tests/test_reid_head.py.
    reid_sample_impl: str = "auto"

    @staticmethod
    def from_conf_threshold(conf: float, **kw) -> "TrackerConfig":
        """Derive tracker thresholds from detector confidence, as the demo
        CLI does (reference: src/main.cpp:132-141, low = conf * 0.5)."""
        return TrackerConfig(
            high_thresh=conf,
            low_thresh=conf * 0.5,
            new_track_thresh=conf,
            **kw,
        )


@dataclasses.dataclass(frozen=True)
class LegacyTrackerConfig:
    """Legacy host-path tracker config (reference: types.h:135-155)."""
    high_thresh: float = 0.6
    low_thresh: float = 0.1
    new_track_thresh: float = 0.7
    max_time_lost: int = 30
    min_hits: int = 3
    match_thresh: float = 0.8
    iou_thresh: float = 0.3
    accel_memory: float = 0.9
    jerk_memory: float = 0.9
    nms_thresh: float = 0.65


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Detection + postprocess configuration.

    Mirrors YoloPoseEngine / GPUPostprocess knobs
    (reference: include/tensorrt/yolo_pose_engine.h:59-130,
    src/cuda/gpu_postprocess.cu:366-476)."""
    input_size: int = C.DEFAULT_INPUT_SIZE
    num_anchors: int = C.DEFAULT_NUM_ANCHORS
    conf_threshold: float = 0.25
    iou_threshold: float = 0.55     # NMS IoU (gpu_postprocess process default)
    oks_threshold: float = 0.55    # NMS OKS
    max_candidates: int = 256       # pre-NMS top-k (ref caps at 1024 w/ atomics)
    max_detections: int = C.DEFAULT_MAX_DETECTIONS
    # Candidate-ranking lowering (ops/topk.py): "sort" = lax.top_k,
    # "bisect" = exact radix-select (bit-identical), "approx" =
    # lax.approx_max_k (TPU PartialReduce; opt-in, approximate).
    topk_impl: str = "sort"
    # Candidate-row extraction (ops/decode.py): "index" = XLA gathers,
    # "onehot" = MXU one-hot selection matmuls (bit-identical outputs).
    # Default "onehot": won the measured matrix (BENCH_DECODE_AB_r03)
    # and every adjacent pair of the interleaved confirmation
    # (BENCH_DECODE_AB_CONFIRM_r03: +2.2..+4.7% e2e vs "index").
    # Re-validated post-letterbox-fix at the other production batch
    # shapes (BENCH_GATHER_AB_r04, one process per leg): batch 1
    # frame_exec 1.736 vs 2.648 ms, 8-stream serving 146.8 vs 145.8
    # FPS/stream — onehot wins or ties everywhere.
    gather_impl: str = "onehot"
    # Candidate-selection placement (r4, VERDICT r3 item 4):
    # "post" = select top-K AFTER concatenating the three pyramid
    # levels into [A, C] tensors (the r1-r3 path); "tail" = fuse
    # selection into the model tail — per-level top-K on the conv
    # output layout, then an exact merge of the <=3K survivors
    # (ops/decode.py::decode_topk_levels) — the concatenated [A, 64/51]
    # head tensors are never materialized. Bit-identical outputs for
    # topk_impl in {sort, bisect} (proof in decode_topk_levels's
    # docstring; equivalence pinned by tests/test_decode_fusion.py).
    # NOTE: only PosePipeline honors "tail"; the serving classes
    # (StreamServer/ChunkedStreamServer/MultiStream*Pipeline) always
    # use the post-concat decode ("tail" measured NO-GO at the chunk
    # shapes they run — BENCH_DECODE_FUSION_AB_r04.json).
    decode_fusion: str = "post"
    # Raw-ingest preprocessing (r5): letterbox emits the UN-normalized
    # BGR uint8 letterbox (ops/preprocess.py raw=True) and the BGR->RGB
    # flip + /255 are folded into the stem conv weights at
    # pipeline/server construction (models.weights.fold_stem_preprocess)
    # — deletes the materialized channel reverse (0.016 ms/frame,
    # PROFILE_r04.json) and the /255 multiply from the per-frame graph.
    # Exact in f32 (linearity); bf16 equivalence pinned by
    # tests/test_preprocess_fold.py. Constructors that take an injected
    # detector (oracle heads_fn) force this off — there are no stem
    # weights to fold; YoloPoseEngine keeps the normalized path (its
    # params round-trip through save/load_engine unfolded).
    # Default True: measured GO at every production batch shape —
    # +4.8% e2e at chunk 128 (4339.7 vs 4139.3 FPS), faster at batch 1
    # (1.652 vs 1.695 ms), tie at 8-stream serving
    # (BENCH_RAW_AB_r05.json).
    raw_preproc: bool = True

    def __post_init__(self):
        if self.decode_fusion not in ("post", "tail"):
            raise ValueError(
                f"decode_fusion must be 'post' or 'tail', got "
                f"{self.decode_fusion!r}")


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end frame pipeline configuration."""
    detector: DetectorConfig = DetectorConfig()
    tracker: TrackerConfig = TrackerConfig()
    model_name: str = "yolov8n-pose"
    precision: str = "bf16"         # fp32 | bf16 | int8
