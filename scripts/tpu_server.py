"""Persistent TPU worker: holds the device claim and executes queued job
files so we never pay the claim-handoff cost between experiments.

Protocol: drop NNN.py into the queue dir; it is exec()'d in-process
(namespace persists across jobs — build a scene once, reuse it); stdout
goes to NNN.out, then NNN.done is created.  A job named quit.py stops
the server.

Usage: python scripts/tpu_server.py /tmp/tpu_jobs
"""

import faulthandler
import io
import os
import signal
import sys
import time
import traceback
import contextlib

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    qdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
    os.makedirs(qdir, exist_ok=True)
    import jax
    print("tpu_server ready:", jax.devices(), flush=True)
    with open(os.path.join(qdir, "READY"), "w") as f:
        f.write(str(time.time()))

    ns = {"jax": jax}
    done = set()
    while True:
        jobs = sorted(f for f in os.listdir(qdir)
                      if f.endswith(".py") and f not in done)
        for job in jobs:
            path = os.path.join(qdir, job)
            done.add(job)
            if job == "quit.py":
                print("tpu_server quitting", flush=True)
                return
            out_path = path[:-3] + ".out"
            buf = io.StringIO()
            t0 = time.time()
            try:
                with open(path) as f:
                    code = f.read()
                with contextlib.redirect_stdout(buf):
                    exec(compile(code, job, "exec"), ns)
                status = "OK"
            except Exception:
                buf.write(traceback.format_exc())
                status = "FAIL"
            with open(out_path, "w") as f:
                f.write(buf.getvalue())
                f.write(f"\n== {status} in {time.time()-t0:.1f}s ==\n")
            open(path[:-3] + ".done", "w").close()
            print(f"job {job}: {status} ({time.time()-t0:.1f}s)", flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
