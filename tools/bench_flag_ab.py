"""A/B TPU compiler options against the depth-1 U-FNO train step.

Env XLA_FLAGS cannot carry TPU backend flags through the axon tunnel (the
host-side flag parser rejects them: "Unknown flag in XLA_FLAGS"), but
per-compile ``compiler_options`` ARE forwarded to the remote compiler.
Each variant runs in its own subprocess so device memory is fully isolated.

Run: python tools/bench_flag_ab.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
import numpy as np
import jax
sys.path.insert(0, {repo!r})
import bench

opts = json.loads(sys.argv[1]) or None
trainer, device_batch = bench.build_trainer()
u_traj, pos, cond, t_cond, sc = device_batch
batch, t_res = u_traj.shape[0], u_traj.shape[2]
fn = trainer._make_train_step(1, batch, t_res)
lowered = fn.lower(trainer.params, trainer.opt_state, u_traj, pos, cond,
                   t_cond, sc, jax.random.PRNGKey(0))
exe = lowered.compile(compiler_options=opts)
p2, o2 = trainer.params, trainer.opt_state
for i in range(2):
    p2, o2, loss = exe(p2, o2, u_traj, pos, cond, t_cond, sc,
                       jax.random.PRNGKey(i))
float(loss)
t0 = time.perf_counter()
n = 15
for i in range(n):
    p2, o2, loss = exe(p2, o2, u_traj, pos, cond, t_cond, sc,
                       jax.random.PRNGKey(100 + i))
float(loss)
dt = (time.perf_counter() - t0) / n
assert np.isfinite(float(loss))
print(f"RESULT {{batch / dt:.2f}} samples/s ({{dt * 1e3:.1f}} ms/step)")
"""

VARIANTS = {
    "baseline": {},
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
}


def main():
    # argv: [variant ...] [--timeout=S] — default runs every variant
    timeout = 1800
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--timeout="):
            timeout = int(a.split("=", 1)[1])
        else:
            names.append(a)
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        sys.exit(f"unknown variant(s) {unknown}; "
                 f"choose from {list(VARIANTS)}")
    for name in names or list(VARIANTS):
        opts = VARIANTS[name]
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD.format(repo=REPO),
                 json.dumps(opts)],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT after {timeout}s (compile never "
                  "finished — impractical as a default either way)",
                  flush=True)
            continue
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{name}: {line[0][7:] if line else 'FAILED'}", flush=True)
        if not line:
            print(proc.stderr[-400:], flush=True)


if __name__ == "__main__":
    main()
