"""turbo-metrics-tpu: TPU-native full-reference video/image quality metrics.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Gui-Yom/turbo-metrics: host-side demuxing/decoding feeds planar YUV/RGB
frames into batched XLA programs computing PSNR, SSIM, MS-SSIM, SSIMULACRA2,
XPSNR and VMAF elementary features on TPU.
"""

__version__ = "0.1.0"

from turbo_metrics_tpu.engine import (  # noqa: F401
    FrameScores,
    Metrics,
    MetricsResults,
    Options,
    TurboMetrics,
)
