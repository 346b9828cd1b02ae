#!/usr/bin/env python3
"""Persistent TPU work process for iterative benchmarking.

Pays the axon bootstrap cost once, then executes python snippets dropped
into /tmp/tpu_jobs/NNN.py (in name order), writing stdout+traceback to
NNN.out and creating NNN.done.  Shared globals persist between jobs.
Exit by submitting a job containing QUIT_SERVER = True.
"""

import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)
sys.path.insert(0, "/root/repo")

# pay the bootstrap now
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

t0 = time.time()
float(jax.jit(lambda x: jnp.sum(x * 2))(jnp.ones(128)))
print(f"bootstrap done in {time.time()-t0:.1f}s on {jax.devices()}", flush=True)

G = {"jax": jax, "jnp": jnp, "np": np, "time": time}
done = set()
while True:
    jobs = sorted(f for f in os.listdir(JOBS)
                  if f.endswith(".py") and f not in done)
    for j in jobs:
        path = os.path.join(JOBS, j)
        out = io.StringIO()
        old = sys.stdout
        sys.stdout = out
        try:
            code = open(path).read()
            exec(compile(code, path, "exec"), G)
        except Exception:
            traceback.print_exc(file=out)
        finally:
            sys.stdout = old
        with open(path[:-3] + ".out", "w") as f:
            f.write(out.getvalue())
        open(path[:-3] + ".done", "w").close()
        done.add(j)
        if G.get("QUIT_SERVER"):
            sys.exit(0)
    time.sleep(0.2)
