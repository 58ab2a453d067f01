"""Capture and summarize a device profile of the benchmark train step.

Usage: python tools/profile_step.py [trace_dir]

Prints TPU-busy time per step, the op-category breakdown, and the top
attributed sources. Works over the axon tunnel (device timelines included).
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(trace_dir, n_steps):
    p = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))[-1]
    data = json.loads(gzip.open(p).read())
    evs = [e for e in data["traceEvents"] if isinstance(e, dict)]
    tpu_pids = {e["pid"] for e in evs if e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    tnames = {(e["pid"], e.get("tid")): e.get("args", {}).get("name")
              for e in evs if e.get("name") == "thread_name"}
    ops = [e for e in evs if e.get("ph") == "X" and e.get("pid") in tpu_pids
           and tnames.get((e["pid"], e.get("tid"))) == "XLA Ops"
           and "dur" in e]

    cat = collections.Counter()
    cat_bytes = collections.Counter()
    src = collections.Counter()
    top = collections.Counter()
    top_bytes = collections.Counter()
    for e in ops:
        name = re.sub(r"\.\d+$", "", e["name"])
        a = e.get("args", {})
        b = int(a.get("bytes_accessed", 0) or 0)
        cat[name] += e["dur"]
        cat_bytes[name] += b
        s = a.get("tf_op") or ""
        src[str(s)[:70] or name] += e["dur"]
        top[e["name"]] += e["dur"]
        top_bytes[e["name"]] += b
    total = sum(cat.values())
    total_bytes = sum(cat_bytes.values())
    print(f"TPU busy: {total / n_steps / 1e3:.0f} ms/step;"
          f" bytes accessed: {total_bytes / n_steps / 2**30:.1f} GiB/step"
          f" -> {total_bytes / (total * 1e-6) / 1e9:.0f} GB/s achieved")
    print("\nby op category (ms | % | GiB | achieved GB/s):")
    for k, d in cat.most_common(12):
        b = cat_bytes[k]
        print(f"  {d / n_steps / 1e3:8.2f} ms {d / total * 100:5.1f}% "
              f"{b / n_steps / 2**30:7.2f} GiB {b / (d * 1e-6) / 1e9:6.0f} GB/s  {k}")
    print("\nby source:")
    for k, d in src.most_common(12):
        print(f"  {d / n_steps / 1e3:8.2f} ms {d / total * 100:5.1f}%  {k}")
    print("\ntop individual ops (ms | GiB | GB/s):")
    for k, d in top.most_common(15):
        b = top_bytes[k]
        print(f"  {d / n_steps / 1e3:8.2f} ms {b / n_steps / 2**30:7.2f} GiB "
              f"{b / (d * 1e-6) / 1e9:6.0f} GB/s  {k[:60]}")


def main():
    import jax

    import bench

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nps_profile"
    mode = sys.argv[2] if len(sys.argv) > 2 else "1"
    family = sys.argv[3] if len(sys.argv) > 3 else "ufno"
    if family == "ufno":
        trainer, device_batch = bench.build_trainer()
    else:  # any tools/bench_all.py family name, same shapes it benches
        import bench_all
        trainer, device_batch = bench.build_trainer(
            batch=8 if family == "gnn" else bench.BATCH,
            model_kwargs=bench_all.family_kwargs(family),
            trainer_kwargs=dict(neighbors=2) if family == "gnn" else None)
    u_traj, pos, cond, t_cond, sc = device_batch
    if mode == "eval":
        # the EVALUATION step (VERDICT r4 weak #3: the eval share of a
        # convergence run was never profiled): one-step losses at every
        # tw-strided start + the full-rollout scan, exactly what every
        # named validation / test-on-best dispatches
        import numpy as np

        step = trainer._make_test_step(int(u_traj.shape[0]),
                                       int(u_traj.shape[2]), has_base=False)
        u_base = None
        args = (trainer.params, u_base, u_traj, pos, cond, t_cond, sc, None)
        out = step(*args)
        float(np.asarray(out["unrolled_losses"]))  # compile + sync
        n = 3
        jax.profiler.start_trace(trace_dir)
        for _ in range(n):
            out = step(*args)
        float(np.asarray(out["unrolled_losses"]))
        jax.profiler.stop_trace()
        summarize(trace_dir, n)
        return
    depth = int(mode)
    step = trainer._make_train_step(depth, u_traj.shape[0], u_traj.shape[2])
    params, opt_state = trainer.params, trainer.opt_state
    params, opt_state, loss = step(params, opt_state, u_traj, pos, cond,
                                   t_cond, sc, jax.random.PRNGKey(0))
    float(loss)  # sync (block_until_ready is unreliable on axon)
    n = 3
    jax.profiler.start_trace(trace_dir)
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, u_traj, pos, cond,
                                       t_cond, sc, jax.random.PRNGKey(i))
    float(loss)
    jax.profiler.stop_trace()
    summarize(trace_dir, n)


if __name__ == "__main__":
    main()
