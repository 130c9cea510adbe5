"""plsvo_tpu — TPU-native semi-direct monocular visual odometry (points + lines).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
rubengooj/pl-svo (IROS 2016): FAST-corner + line-segment features, sparse
image alignment, subpixel feature alignment, motion-only and structure-only
optimization, Bayesian depth filtering, keyframe map management, and (new)
real + distributed bundle adjustment over TPU meshes.

Layout mirrors SURVEY.md §7:
  lie / camera / image / config   — M0 foundations
  ops/                             — per-frame numeric kernels (detection,
                                     alignment, matching, optimization)
  pipeline/                        — functional state tables + stage machine
  parallel/                        — batched multi-sequence VO, distributed BA
  utils/                           — datasets, trajectories, metrics, profiling
"""

from plsvo_tpu import camera, config, image, lie  # noqa: F401
from plsvo_tpu.config import Config, default_config, fast_config  # noqa: F401

__version__ = "0.1.0"
