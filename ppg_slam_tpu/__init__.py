"""ppg_slam_tpu — a TPU-native (JAX/XLA) monocular-inertial SLAM framework.

A from-scratch re-design of the capabilities of NEU-REAL/PPG-SLAM (see SURVEY.md):
a learned point-pair-graph (PPG) front-end, image-to-map association with graph
seed-growing, IMU preintegration, and a batched Gauss-Newton / Schur-complement
estimator with co-linearity constraints, Sim3 loop closure and pose-graph
optimization — built TPU-first: one jitted XLA program per pipeline stage,
fixed-shape padded buffers, MXU-resident matmuls (one-hot gather/scatter
assembly, batched decode), and `jax.sharding` meshes for multi-chip scaling.

Package layout:
  geometry/   SO3 / SE3 / Sim3 Lie ops, camera models, triangulation, 2-view init
  imu/        IMU preintegration (lax.scan) with bias Jacobians + 15x15 covariance
  models/     the PPG CNNs (backbone + junction / edge-heatmap / descriptor heads)
  ops/        device ops: NMS, heatmap refine/remap, line sampling, descriptors
  frontend/   the fused PPG extractor (device program + host graph builder)
  estimator/  batched GN/LM with Schur elimination; all BA flavors of the reference
  worldmap/   Frame / KeyFrame / MapPoint / MapEdge / MapColine / Map
  matching/   projection & BoW & PPG graph matching, Sim3 solver, PnP
  bow/        DBoW3-compatible vocabulary + inverted-file place recognition
  pipeline/   tracking / local mapping / loop closing / System facade
  parallel/   device-mesh utilities and sharded estimator steps
  datasets/   EuRoC / TUM-VI / UMA loaders + TUM trajectory IO
  cli/        mono_inertial_{euroc,tumvi,uma}, train_vocabulary
  native/     C++ host runtime pieces (PPG graph builder) as a C extension
"""

__version__ = "0.1.0"

# On TPU, f32 dot/einsum/conv default to ONE bf16 MXU pass per operand
# (Precision.DEFAULT) — ~8 mantissa bits, a ~4e-3 relative error that CPU
# runs never see. SLAM estimator math (normal-equation assembly, Lie-group
# composition chains, triangulation, RANSAC scoring) accumulates that error
# across iterations and frames, so the framework pins the default to true
# f32 (6-pass operand splitting). The deliberately-fast paths are explicit
# bf16 *dtypes* (serving convs via PPGExtractor(compute_dtype="bf16"),
# device matching in ops/device_match.py, int8 descriptor transfer) and are
# unaffected: precision config only governs f32-input contractions. Hot f32
# contractions that need a cheaper mode pin their own `precision=` at the
# call site (ops/sampling.py banded remap = HIGH, estimator one-hot
# gather/scatter = HIGHEST already). Opt out with PPG_DEFAULT_MATMUL=1 to
# restore JAX's platform default.
import os as _os

if not _os.environ.get("PPG_DEFAULT_MATMUL"):
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "float32")
