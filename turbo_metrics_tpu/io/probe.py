"""Input probing: image first, then video container (CLI main.rs:176-210).

Order mirrors the reference: peek a prefix, try the image magic table; fall
back to video probing (Y4M magic, else hand the input to the native libav
demuxer, which recognises MKV/MP4/TS/IVF/raw elementary streams).  Stdin and
other pipes stream straight into libav through AVIO read callbacks — no
temp-file spill.  MKV inputs are additionally parsed by the pure-Python EBML
demuxer (io/mkv.py) to cross-check geometry and to supply colour metadata /
frame counts that libav's codec-level probe may miss (MKV Colour elements
live in the container, not the bitstream).
"""

from __future__ import annotations

import io
import logging
import sys
from pathlib import Path
from typing import BinaryIO, Optional, Union

from turbo_metrics_tpu.io.frame_source import FrameSource
from turbo_metrics_tpu.io.image import PROBE_LEN, ImageFrameSource, ImageProbe
from turbo_metrics_tpu.io.ivf import IVF_MAGIC
from turbo_metrics_tpu.io.mkv import EBML_MAGIC
from turbo_metrics_tpu.io.y4m import Y4M_MAGIC, Y4MFrameSource

log = logging.getLogger("turbo_metrics_tpu")


class ChainReader:
    """Sequential reader serving a probed prefix, then the rest of a stream.

    Lets us peek magic bytes from a non-seekable source (stdin) and still
    hand the complete byte stream to a downstream consumer.
    """

    def __init__(self, prefix: bytes, rest: BinaryIO, name: str = "<stream>"):
        self._prefix = prefix
        self._pos = 0
        self._rest = rest
        self.name = name

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            out = self._prefix[self._pos :] + self._rest.read()
            self._pos = len(self._prefix)
            return out
        out = b""
        if self._pos < len(self._prefix):
            out = self._prefix[self._pos : self._pos + n]
            self._pos += len(out)
            n -= len(out)
        if n > 0:
            out += self._rest.read(n)
        return out

    def seekable(self) -> bool:
        return False

    def close(self) -> None:
        self._rest.close()


def create_source(path: Union[str, Path], *, use_stdin: bool = False) -> FrameSource:
    """Open a media file (or '-' for stdin) as a FrameSource."""
    if use_stdin or str(path) == "-":
        raw = sys.stdin.buffer
        prefix = raw.read(PROBE_LEN)
        return _probe_stream(ChainReader(prefix, raw, name="<stdin>"), None, prefix)
    f = open(path, "rb")
    prefix = f.read(PROBE_LEN)
    f.seek(0)
    return _probe_stream(f, str(path), prefix)


def _probe_stream(f, path: Optional[str], prefix: bytes) -> FrameSource:
    img = ImageProbe.probe(prefix)
    if img is not None:
        if not img.can_decode():
            raise ValueError(f"detected {img.value} but no decoder is available")
        src = ImageFrameSource(f, img)
        f.close()
        return src

    if prefix.startswith(Y4M_MAGIC):
        return Y4MFrameSource(f, path=path)

    # Everything else (IVF, MKV, MP4, TS, elementary streams) goes through
    # the native libav shim — by path when we have one, else streaming via
    # AVIO callbacks (no temp-file spill).
    from turbo_metrics_tpu.io.native import NativeVideoSource, native_available

    if native_available():
        meta = None
        if path is not None and prefix.startswith(EBML_MAGIC):
            meta = _mkv_container_meta(path)
        if path is not None:
            f.close()
            return NativeVideoSource(path, container_meta=meta)
        return NativeVideoSource(stream=f)

    # Fallback decode backend (lower colour fidelity; see opencv_source.py).
    from turbo_metrics_tpu.io.opencv_source import OpenCvVideoSource, opencv_available

    if opencv_available() and path is not None:
        f.close()
        return OpenCvVideoSource(path)

    raise RuntimeError(
        "no video decode backend available for "
        + _describe_stream(f, path, prefix)
        + "; build native/libturbodemux.so (make -C native) or install OpenCV"
    )


def _mkv_container_meta(path: str) -> Optional[dict]:
    """Header-only parse of an MKV file with the pure-Python EBML demuxer:
    colour metadata (MKV Colour elements), dimensions and a frame-count
    estimate to cross-check/enrich libav's stream info."""
    from turbo_metrics_tpu.color.characteristics import ColorCharacteristics
    from turbo_metrics_tpu.io.mkv import MkvDemuxer

    try:
        with open(path, "rb") as g:
            mkv = MkvDemuxer(g)
            t = mkv.video_track
            if t is None:
                return None
            cc = ColorCharacteristics.from_code_points(
                t.colour_primaries, t.colour_matrix, t.colour_transfer
            )
            crange = {1: "limited", 2: "full"}.get(t.colour_range)
            return {
                "width": t.pixel_width,
                "height": t.pixel_height,
                "codec": t.codec,
                "frame_count": mkv.frame_count_estimate(),
                "cc": cc,
                "range": crange,
            }
    except Exception as e:  # malformed container: let libav be the judge
        log.debug("MKV header cross-check failed: %s", e)
        return None


def _describe_stream(f, path: Optional[str], prefix: bytes) -> str:
    """Best-effort description of an undecodable input using the pure-Python
    demuxers (io/ivf.py, io/mkv.py) so the error names codec and geometry."""
    what = path or getattr(f, "name", "<stream>")
    try:
        if prefix.startswith(IVF_MAGIC) and path is not None:
            from turbo_metrics_tpu.io import ivf

            with open(path, "rb") as g:
                hdr = ivf.read_header(g)
            return (
                f"{what} (IVF, codec={hdr.codec or hdr.fourcc}, "
                f"{hdr.width}x{hdr.height}, {hdr.frames} frames)"
            )
        if prefix.startswith(EBML_MAGIC) and path is not None:
            meta = _mkv_container_meta(path)
            if meta:
                return (
                    f"{what} (Matroska, codec={meta['codec']}, "
                    f"{meta['width']}x{meta['height']}, "
                    f"~{meta['frame_count']} frames)"
                )
    except Exception:
        pass
    return str(what)
