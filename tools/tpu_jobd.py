"""Persistent TPU job runner for perf iteration.

The axon tunnel charges 1-10 minutes for the FIRST device->host fetch in
each process, so perf experiments must share one process.  This daemon
warms the TPU once, then polls /tmp/tpu_jobs/ for ``NNN.py`` job files,
execs each in-process (fresh module reloads are the job's concern), and
writes stdout+traceback to ``NNN.out`` plus an ``NNN.done`` marker.

Usage: python tools/tpu_jobd.py   (run in background; one instance only)
Jobs run with globals {"jax": jax, "jnp": jnp, "np": np}.  A job file
containing only "QUIT" stops the daemon.
"""

from __future__ import annotations

import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOB_DIR = "/tmp/tpu_jobs"


def main() -> int:
    os.makedirs(JOB_DIR, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    # NOTE: if backend init fails (tunnel down), just exit — JAX caches the
    # failure in-process, so retrying here can never succeed.  Run the
    # daemon under tools/tpu_jobd_loop.sh, which restarts a fresh process.
    t0 = time.perf_counter()
    print("devices:", jax.devices(), flush=True)
    _ = float(jnp.ones((8, 128)).sum())
    print(f"warm: first fetch {time.perf_counter() - t0:.1f}s", flush=True)
    with open(os.path.join(JOB_DIR, "READY"), "w") as f:
        f.write(f"{time.perf_counter() - t0:.1f}\n")

    # Seed from existing .done markers so a daemon restart does not replay
    # every historical job (and collide with a prior instance's work).
    done = {
        f[:-5] + ".py"
        for f in os.listdir(JOB_DIR)
        if f.endswith(".done")
    }
    while True:
        jobs = sorted(
            f for f in os.listdir(JOB_DIR)
            if f.endswith(".py") and f not in done
        )
        if not jobs:
            time.sleep(0.5)
            continue
        for name in jobs:
            done.add(name)
            path = os.path.join(JOB_DIR, name)
            src = open(path).read()
            if src.strip() == "QUIT":
                print("quit requested", flush=True)
                return 0
            print(f"== running {name}", flush=True)
            buf = io.StringIO()
            real = sys.stdout
            t0 = time.perf_counter()
            try:
                sys.stdout = buf
                exec(compile(src, path, "exec"),
                     {"jax": jax, "jnp": jnp, "np": np})
                status = "ok"
            except BaseException:
                buf.write(traceback.format_exc())
                status = "error"
            finally:
                sys.stdout = real
            dt = time.perf_counter() - t0
            out = buf.getvalue()
            with open(os.path.join(JOB_DIR, name[:-3] + ".out"), "w") as f:
                f.write(out)
            with open(os.path.join(JOB_DIR, name[:-3] + ".done"), "w") as f:
                f.write(f"{status} {dt:.1f}s\n")
            print(f"== {name}: {status} in {dt:.1f}s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
