"""Input probing: image first, then video container (CLI main.rs:176-210).

Order mirrors the reference: peek a prefix, try the image magic table; fall
back to video probing (Y4M magic, IVF magic, else hand the path to the
native libav demuxer which recognises MKV/MP4/TS/raw elementary streams).
"""

from __future__ import annotations

import io
import sys
from pathlib import Path
from typing import BinaryIO, Optional, Union

from turbo_metrics_tpu.io.frame_source import FrameSource
from turbo_metrics_tpu.io.image import PROBE_LEN, ImageFrameSource, ImageProbe
from turbo_metrics_tpu.io.ivf import IVF_MAGIC
from turbo_metrics_tpu.io.y4m import Y4M_MAGIC, Y4MFrameSource


def create_source(path: Union[str, Path], *, use_stdin: bool = False) -> FrameSource:
    """Open a media file (or '-' for stdin) as a FrameSource."""
    if use_stdin or str(path) == "-":
        data = sys.stdin.buffer.read()
        stream: BinaryIO = io.BytesIO(data)
        return _probe_stream(stream, None)
    f = open(path, "rb")
    return _probe_stream(f, str(path))


def _probe_stream(f: BinaryIO, path: Optional[str]) -> FrameSource:
    prefix = f.read(PROBE_LEN)
    f.seek(0)

    img = ImageProbe.probe(prefix)
    if img is not None:
        if not img.can_decode():
            raise ValueError(
                f"detected {img.value} but no decoder is available"
            )
        src = ImageFrameSource(f, img)
        f.close()
        return src

    if prefix.startswith(Y4M_MAGIC):
        return Y4MFrameSource(f, path=path)

    # Everything else (IVF, MKV, MP4, elementary streams) goes through the
    # native libav shim, which needs a real file path.
    from turbo_metrics_tpu.io.native import NativeVideoSource, native_available

    if path is None:
        # stdin video: spill to a temp file for libav.
        import tempfile

        tmp = tempfile.NamedTemporaryFile(suffix=_suffix_for(prefix), delete=False)
        tmp.write(f.read())
        tmp.flush()
        path = tmp.name
    f.close()
    if native_available():
        return NativeVideoSource(path)
    # Fallback decode backend (lower colour fidelity; see opencv_source.py).
    from turbo_metrics_tpu.io.opencv_source import OpenCvVideoSource, opencv_available

    if opencv_available():
        return OpenCvVideoSource(path)
    raise RuntimeError(
        "video input requires the native demuxer (native/libturbodemux.so) "
        "or OpenCV as a fallback"
    )


def _suffix_for(prefix: bytes) -> str:
    if prefix.startswith(IVF_MAGIC):
        return ".ivf"
    if prefix.startswith(b"\x1a\x45\xdf\xa3"):
        return ".mkv"
    return ".bin"
