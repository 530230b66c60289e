"""ctypes bindings for the native turbodemux shim (native/turbodemux.cpp).

Host-side decode: libavformat/libavcodec demux + decode to planar YUV with
full colour metadata.  This is the TPU build's replacement for the
reference's NVDEC path (cudarse-video) — decode happens on host CPU and
frames stream to the device, the mode the reference itself plans for
(README.md:66-70).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from turbo_metrics_tpu.color.characteristics import ColorCharacteristics, height_fallback
from turbo_metrics_tpu.io.frame_source import (
    FormatIdentifier,
    FrameSource,
    RawFrame,
    ResolutionChanged,
)

log = logging.getLogger("turbo_metrics_tpu")

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libturbodemux.so"


class _TmInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("depth", ctypes.c_int32),
        ("chroma", ctypes.c_int32),
        ("color_primaries", ctypes.c_int32),
        ("color_trc", ctypes.c_int32),
        ("color_space", ctypes.c_int32),
        ("full_range", ctypes.c_int32),
        ("frame_count", ctypes.c_int64),
        ("codec_name", ctypes.c_char * 32),
        ("container_name", ctypes.c_char * 32),
    ]


_lib: Optional[ctypes.CDLL] = None
_lib_error: Optional[str] = None


def _build_library() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native shim; None if unavailable."""
    global _lib, _lib_error
    if _lib is not None:
        return _lib
    if _lib_error is not None:
        return None
    if not _LIB_PATH.exists() and not _build_library():
        _lib_error = "libturbodemux.so missing and could not be built"
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        _lib_error = str(e)
        return None
    lib.tm_open.restype = ctypes.c_void_p
    lib.tm_open.argtypes = [ctypes.c_char_p]
    lib.tm_info.restype = ctypes.c_int
    lib.tm_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(_TmInfo)]
    lib.tm_next_frame.restype = ctypes.c_int
    lib.tm_next_frame.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
    lib.tm_close.argtypes = [ctypes.c_void_p]
    lib.tm_has_decoder.restype = ctypes.c_int
    lib.tm_has_decoder.argtypes = [ctypes.c_char_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class NativeVideoSource(FrameSource):
    """FrameSource over the native libav decode shim.

    Handles any container/codec the system FFmpeg decodes (H.264, HEVC, AV1,
    VP8/9, MPEG-2, ...), 8..16-bit, 4:2:0/4:2:2/4:4:4 (non-4:2:0 content is
    converted to 4:2:0-compatible chroma by 2x2 averaging on the host).
    """

    def __init__(self, path: str | os.PathLike):
        lib = load_library()
        if lib is None:
            raise RuntimeError(f"native demuxer unavailable: {_lib_error}")
        self._lib = lib
        self._h = lib.tm_open(str(path).encode())
        if not self._h:
            raise ValueError(f"could not open video: {path}")
        self._read_info_and_alloc()

    def _read_info_and_alloc(self) -> None:
        """(Re)read stream info and size the decode buffers accordingly.
        Called at open and again after a -3 mid-stream reconfiguration."""
        info = _TmInfo()
        self._lib.tm_info(self._h, ctypes.byref(info))
        self.info = info
        self._depth = int(info.depth)
        self._dtype = np.uint8 if self._depth == 8 else np.uint16
        w, h = int(info.width), int(info.height)
        self._w, self._hgt = w, h
        self._chroma = int(info.chroma)
        if self._chroma == 400:
            cw, ch = (w + 1) // 2, (h + 1) // 2
        elif self._chroma == 420:
            cw, ch = (w + 1) // 2, (h + 1) // 2
        elif self._chroma == 422:
            cw, ch = (w + 1) // 2, h
        else:
            cw, ch = w, h
        self._cw, self._ch = cw, ch
        self._ybuf = np.empty((h, w), dtype=self._dtype)
        self._ubuf = np.empty((ch, cw), dtype=self._dtype)
        self._vbuf = np.empty((ch, cw), dtype=self._dtype)

    def format_id(self) -> FormatIdentifier:
        return FormatIdentifier(
            self.info.container_name.decode(),
            self.info.codec_name.decode(),
            "libavcodec",
        )

    @property
    def width(self) -> int:
        return self._w

    @property
    def height(self) -> int:
        return self._hgt

    def color_characteristics(self) -> tuple[ColorCharacteristics, str]:
        cc = ColorCharacteristics.from_code_points(
            int(self.info.color_primaries),
            int(self.info.color_space),
            int(self.info.color_trc),
        )
        cc = cc.or_fallback(height_fallback(self._hgt))
        crange = "full" if self.info.full_range == 1 else "limited"
        return cc, crange

    def frame_count(self) -> int:
        return max(0, int(self.info.frame_count))

    def next_frame(self) -> Optional[RawFrame]:
        ret = self._lib.tm_next_frame(
            self._h,
            self._ybuf.ctypes.data_as(ctypes.c_void_p),
            self._ubuf.ctypes.data_as(ctypes.c_void_p),
            self._vbuf.ctypes.data_as(ctypes.c_void_p),
        )
        if ret == 0:
            return None
        if ret == -3:
            # Mid-stream reconfiguration (resolution or pixel-format change):
            # the shim adopted the new format and stashed the frame.  Resize
            # our buffers and signal the caller; the stashed frame arrives on
            # the next get_frame() call.
            old = (self._w, self._hgt, self._depth, self._chroma)
            self._read_info_and_alloc()
            new = (self._w, self._hgt, self._depth, self._chroma)
            log.info("stream reconfigured: %s -> %s", old, new)
            raise ResolutionChanged(self._w, self._hgt)
        if ret < 0:
            raise RuntimeError(f"decode error ({ret})")
        y = self._ybuf.copy()
        u, v = self._ubuf, self._vbuf
        if self._chroma == 400:
            neutral = 1 << (self._depth - 1)
            uv = np.full((*u.shape, 2), neutral, dtype=self._dtype)
        else:
            if self._chroma == 422:  # vertical 2x average -> 4:2:0
                hh = (u.shape[0] // 2) * 2
                u = ((u[:hh:2].astype(np.uint32) + u[1:hh:2]) // 2).astype(self._dtype)
                v = ((v[:hh:2].astype(np.uint32) + v[1:hh:2]) // 2).astype(self._dtype)
            elif self._chroma == 444:  # 2x2 average -> 4:2:0
                u = _down2(u).astype(self._dtype)
                v = _down2(v).astype(self._dtype)
            uv = np.stack([u, v], axis=-1)
        return RawFrame(
            y=y,
            uv=np.ascontiguousarray(uv),
            depth=self._depth,
            full_range=self.info.full_range == 1,
        )

    def close(self) -> None:
        if self._h:
            self._lib.tm_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def _down2(p: np.ndarray) -> np.ndarray:
    h, w = (p.shape[0] // 2) * 2, (p.shape[1] // 2) * 2
    q = p[:h, :w].astype(np.uint32)
    return (q[::2, ::2] + q[1::2, ::2] + q[::2, 1::2] + q[1::2, 1::2] + 2) // 4
