"""Decode scale-out overhead measurement (VERDICT r3 item 7).

The dev host has ONE core, so near-linear *speedup* from
parallel/decode_pool.py cannot be demonstrated here; what CAN be bounded
is the pool's per-worker *overhead*: N seek-partitioned workers decoding
disjoint chunks of the same clip do strictly more work than one
sequential decoder (each chunk seeks to the preceding keyframe and
decode-discards up to its first frame), and on one core any
coordination/GIL cost shows up directly as wall-time above the N=1 run.
overhead(N) = wall(N) / wall(1) - 1 on a single core is an upper bound
on the per-worker efficiency loss on a real multi-core host (there the
discard work runs concurrently instead of serially).

Usage: python tools/decode_scaling.py [N ...]   (default 1 2 4 8)
Decodes the cached bench_e2e reference clip with ChunkedVideoSource and
prints wall-time, fps and overhead vs N=1.  Pure host work, no TPU.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bench_e2e import CACHE, NFRAMES, make_clip
    from turbo_metrics_tpu.parallel.decode_pool import ChunkedVideoSource

    H, W = 1080, 1920
    path = os.path.join(CACHE, f"e2e_ref_{W}x{H}_{NFRAMES}.ts")
    if not os.path.exists(path):
        t0 = time.perf_counter()
        make_clip(path, seed=1)
        print(f"encoded clip in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    ns = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    base = None
    print(f"clip: {path} ({NFRAMES} frames {W}x{H} MPEG-2 TS); "
          f"host cores: {os.cpu_count()}")
    for n in ns:
        src = ChunkedVideoSource(path, workers=n, chunk=16)
        t0 = time.perf_counter()
        count = 0
        csum = 0
        while True:
            f = src.next_frame()
            if f is None:
                break
            count += 1
            csum ^= int(f.y[0, 0])  # consume (and checksum) every frame
        dt = time.perf_counter() - t0
        src.close()
        assert count == NFRAMES, (count, NFRAMES)
        if base is None:
            base = dt
        print(
            f"workers={n}: {dt:6.2f}s  {count / dt:6.1f} fps  "
            f"overhead vs N=1: {dt / base - 1.0:+6.1%}  (checksum {csum})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
