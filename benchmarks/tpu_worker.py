"""Persistent TPU job worker: pay the ~6-minute axon device init ONCE and
then execute queued python snippets against the live backend.

The axon TPU plugin is single-client and its device init is slow, so
iterative measurement work (the reference's cheap LOG_TIME loop,
main.cpp:212-217) is impractical as one-process-per-probe.  This worker
holds the device open and polls a queue directory:

    python benchmarks/tpu_worker.py /tmp/tpuq &
    # submit:    write  /tmp/tpuq/001.py   (any python; shared namespace)
    # result:    read   /tmp/tpuq/001.out  (stdout+stderr+traceback)
    # done flag: exists /tmp/tpuq/001.done
    # shutdown:  touch  /tmp/tpuq/STOP

Submission MUST be atomic: write the snippet to a non-``.py`` temp path in
the same directory (e.g. ``001.py.tmp``) and ``os.rename`` it to ``001.py``.
The poll loop picks a job up the instant its name matches ``*.py`` and
marks it seen forever, so a partially flushed direct write would exec
truncated source with no retry.

Jobs share one namespace across the session (``ns``), so compiled
functions, loaded images, and imports persist between probes.
"""

import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(qdir: str) -> None:
    os.makedirs(qdir, exist_ok=True)
    t0 = time.time()
    import jax  # noqa: F401  (device init happens on first backend touch)
    devs = jax.devices()
    with open(os.path.join(qdir, "READY"), "w") as f:
        f.write(f"{devs} init={time.time() - t0:.1f}s\n")
    print(f"[tpu_worker] ready: {devs} ({time.time() - t0:.1f}s)",
          flush=True)

    ns: dict = {"jax": jax}
    seen = set()
    while True:
        if os.path.exists(os.path.join(qdir, "STOP")):
            print("[tpu_worker] stopping", flush=True)
            return
        jobs = sorted(f for f in os.listdir(qdir)
                      if f.endswith(".py") and f not in seen)
        if not jobs:
            time.sleep(0.5)
            continue
        for job in jobs:
            seen.add(job)
            path = os.path.join(qdir, job)
            out = io.StringIO()
            t1 = time.time()
            old_out, old_err = sys.stdout, sys.stderr
            sys.stdout = sys.stderr = out
            try:
                with open(path) as f:
                    src = f.read()
                exec(compile(src, path, "exec"), ns)
                status = "ok"
            except BaseException:
                traceback.print_exc()
                status = "error"
            finally:
                sys.stdout, sys.stderr = old_out, old_err
            dt = time.time() - t1
            with open(path[:-3] + ".out", "w") as f:
                f.write(out.getvalue())
                f.write(f"\n[{status} in {dt:.1f}s]\n")
            open(path[:-3] + ".done", "w").close()
            print(f"[tpu_worker] {job}: {status} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuq")
