"""Frame source protocol and raw frame containers.

The TPU analog of the reference's FrameSource trait + HwFrame enum
(turbo-metrics/src/lib.rs:125-156): sources yield host-side raw frames
(planar YUV 4:2:0 or packed RGB) plus colour metadata; the engine batches
them and ships them to the device.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass
from typing import Optional

import numpy as np

from turbo_metrics_tpu.color.characteristics import ColorCharacteristics


@dataclass
class FormatIdentifier:
    """container/codec/decoder triple (turbo-metrics/src/lib.rs:132-146)."""

    container: Optional[str]
    codec: str
    decoder: str

    def __str__(self) -> str:
        parts = [] if self.container is None else [self.container]
        return "/".join(parts + [self.codec, self.decoder])


@dataclass
class RawFrame:
    """One decoded frame on the host, ready for device upload.

    Exactly one of the two layouts is populated:
      * YUV 4:2:0: ``y`` (H, W) uint8/uint16 + ``uv`` (ceil(H/2), ceil(W/2), 2)
        — the analog of the reference's NV12/P016 NvDec frames.
      * RGB: ``rgb`` (H, W, 3) uint8/uint16/float32 gamma-encoded — the analog
        of the reference's Npp8/16/32 image frames.
    """

    y: Optional[np.ndarray] = None
    uv: Optional[np.ndarray] = None
    rgb: Optional[np.ndarray] = None
    depth: int = 8
    full_range: bool = False

    @property
    def kind(self) -> str:
        return "rgb" if self.rgb is not None else "yuv420"

    @property
    def height(self) -> int:
        return self.rgb.shape[0] if self.rgb is not None else self.y.shape[0]

    @property
    def width(self) -> int:
        return self.rgb.shape[1] if self.rgb is not None else self.y.shape[1]


class FrameSource(abc.ABC):
    """Streaming source of frames (turbo-metrics/src/lib.rs:148-156)."""

    @abc.abstractmethod
    def format_id(self) -> FormatIdentifier: ...

    @property
    @abc.abstractmethod
    def width(self) -> int: ...

    @property
    @abc.abstractmethod
    def height(self) -> int: ...

    @abc.abstractmethod
    def color_characteristics(self) -> tuple[ColorCharacteristics, str]:
        """Returns (characteristics, range) with range 'limited' or 'full'."""

    @abc.abstractmethod
    def frame_count(self) -> int:
        """Total frames if known, else 0."""

    def skip_frames(self, n: int) -> None:
        for _ in range(n):
            if self.next_frame() is None:
                return

    @abc.abstractmethod
    def next_frame(self) -> Optional[RawFrame]: ...

    def close(self) -> None:  # pragma: no cover - default no-op
        pass
