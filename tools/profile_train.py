"""Profile the flagship train step on the real chip and attribute device time.

Produces the per-kernel-family attribution the roofline work needs (PERF_NOTES):
parses the jax.profiler trace's device-side events, groups kernels by family
(fusion / multiply_add_fusion / copy / custom-call names...), sums duration and
counts, and joins the top fusions against the compiled HLO's op_name metadata so
each hot kernel maps to a model site.

Usage (NOTHING else may run on the host during this — 1 CPU core):
    python tools/profile_train.py [--steps 10] [--out /tmp/prof]
Optionally set XLA_FLAGS before launch to A/B compiler flag sets.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/prof")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from cenet_tpu.core.config import get_preset
    from cenet_tpu.train.trainer import Trainer

    cfg = get_preset("synapse")
    tr = Trainer(cfg, max_iterations=100_000)
    bs, K = 8, args.steps
    cpu = jax.local_devices(backend="cpu")
    tpu = jax.devices()[0]
    with jax.default_device(cpu[0]):
        state = tr.init_state(jax.random.PRNGKey(0), (1, 224, 224, 1))
    state = jax.device_put(state, tpu)

    rng = np.random.default_rng(0)
    im = jax.device_put(jnp.asarray(rng.standard_normal((K, bs, 224, 224, 1)), jnp.float32), tpu)
    lb = jax.device_put(jnp.asarray(rng.integers(0, 9, (K, bs, 224, 224)), jnp.int32), tpu)
    key = jax.random.PRNGKey(0)

    mstep = tr.make_multi_step(K)
    state, loss = mstep(state, im, lb, key)
    print("compiled; loss", float(loss), flush=True)

    t0 = time.time()
    state, loss = mstep(state, im, lb, key)
    float(loss)
    wall = (time.time() - t0) / K * 1e3
    print(f"wall {wall:.2f} ms/step ({bs / wall * 1e3:.1f} img/s)", flush=True)

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out)
    state, loss = mstep(state, im, lb, key)
    float(loss)
    jax.profiler.stop_trace()

    # ---- parse the trace: device-lane complete events --------------------
    traces = sorted(glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True),
                    key=os.path.getmtime)
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    fam_dur = collections.Counter()
    fam_cnt = collections.Counter()
    kern_dur = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # ms
        total += dur
        kern_dur[name] += dur
        fam = re.sub(r"[.\d]+$", "", name)  # strip trailing .N / numbers
        fam_dur[fam] += dur
        fam_cnt[fam] += 1
    print(f"\ndevice total {total:.2f} ms over {K} steps = {total / K:.2f} ms/step")
    print(f"\n== families (ms over {K} steps | count) ==")
    for fam, d in fam_dur.most_common(args.top):
        print(f"{d:9.2f}  n={fam_cnt[fam]:5d}  {fam}")
    print(f"\n== top kernels ==")
    for kn, d in kern_dur.most_common(args.top):
        print(f"{d:9.2f}  {kn}")

    # ---- join top fusions to HLO metadata for attribution ----------------
    lowered = tr.make_multi_step(K).lower(state, im, lb, key)
    hlo = lowered.compile().as_text()
    meta = {}
    for m in re.finditer(r"(%?[\w.-]+(?:\.\d+)?) = [^\n]*metadata={op_name=\"([^\"]+)\"", hlo):
        meta[m.group(1).lstrip("%")] = m.group(2)
    print("\n== top-kernel attribution (HLO op_name) ==")
    for kn, d in kern_dur.most_common(args.top):
        base = kn.split(":")[-1].strip()
        print(f"{d:9.2f}  {kn}  ->  {meta.get(base, '?')[:140]}")


if __name__ == "__main__":
    main()
