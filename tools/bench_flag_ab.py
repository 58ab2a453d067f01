"""A/B candidate XLA flags against the depth-1 U-FNO train step.

Each variant runs in a subprocess (flags must be set before JAX initializes;
whether the axon remote compiler honors them is part of what's measured).

Run: python tools/bench_flag_ab.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
sys.path.insert(0, {repo!r})
import bench
trainer, device_batch = bench.build_trainer()
sps, flops, dt = bench.bench_depth(trainer, device_batch, unrolled=1,
                                   n_steps=15)
print(f"RESULT {{sps:.3f}} samples/s")
"""

VARIANTS = {
    "baseline": "",
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
}


def main():
    for name, flags in VARIANTS.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO)], cwd=REPO,
            env=env, capture_output=True, text=True, timeout=1800)
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{name}: {line[0] if line else 'FAILED rc=' + str(proc.returncode)}",
              flush=True)
        if not line:
            print(proc.stderr[-500:], flush=True)


if __name__ == "__main__":
    main()
