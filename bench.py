"""Benchmark: flagship CENet (Synapse config) throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: training images/sec/chip at 224×224 (full fwd+bwd+SGD update,
bf16 policy, boundary loss — the reference's canonical Synapse configuration,
sustained via the multi-step dispatch path).

The reference publishes no throughput numbers (BASELINE.md). ``vs_baseline``
divides by a documented estimate of the PyTorch reference on A100 at bs8 AMP:
the model is launch/bandwidth-bound, not FLOP-bound (XLA reports only ~21 GFLOP
but 2.3 GB of HBM traffic per image); a torch step issues O(2000) CUDA kernels
(~5-10 µs launch each → 15-25 ms floor) plus ~2.4 GB of attention-map traffic in
the DSEB1 diff-attention (~10 ms at A100's effective bandwidth) ⇒ ≈ 30-40 ms/step
⇒ ~250 img/s. This is an estimate, not a measurement.

Robustness (round-4, after BENCH_r03 lost the round's number to a transient
axon-init failure): backend acquisition retries with backoff; every metric
section is independently guarded; and the script ALWAYS prints a JSON line —
on total failure it carries an "error" field instead of silently dying, and the
process exits nonzero so status-keyed gates don't read a dead bench as success
(ADVICE r4).
"""

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np

A100_TORCH_TRAIN_IMG_PER_SEC_ESTIMATE = 250.0

# Results are accumulated here and printed no matter what fails below.
RESULT = {
    "metric": "synapse_cenet_train_images_per_sec_per_chip",
    "value": None,
    "unit": "img/s",
    "vs_baseline": None,
}


def emit_and_exit(code=0):
    print(json.dumps(RESULT))
    sys.exit(code)


def acquire_tpu(retries=5, base_delay=10.0):
    """Return (jax, tpu_device, cpu_devices); retry transient axon-init failures.

    ``jax.local_devices()`` (no backend arg) raises if ANY backend — including
    axon — fails to initialize, which is exactly how round 3 lost its number.
    Query each backend explicitly instead, and retry: the tunnel's init failures
    are frequently transient.
    """
    import jax

    last = None
    for attempt in range(retries):
        try:
            devs = jax.devices()  # axon backend (or whatever the platform default is)
            tpu = devs[0]
            try:
                cpu = list(jax.local_devices(backend="cpu"))
            except Exception:
                cpu = []
            return jax, tpu, cpu
        except Exception as e:  # noqa: BLE001 — init errors vary by plugin
            last = e
            delay = base_delay * (2 ** attempt)
            print(
                f"[bench] backend init attempt {attempt + 1}/{retries} failed: "
                f"{type(e).__name__}: {str(e)[:200]}; retrying in {delay:.0f}s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(delay)
    raise RuntimeError(f"TPU backend unavailable after {retries} attempts: {last}")


def main():
    try:
        jax, tpu, cpu = acquire_tpu()
    except Exception as e:
        RESULT["error"] = f"backend acquisition failed: {type(e).__name__}: {str(e)[:400]}"
        emit_and_exit(1)

    import jax.numpy as jnp

    # persistent compile cache: the flagship train step takes minutes to compile
    # on the remote helper; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    RESULT["device"] = str(tpu)

    # Chip-speed calibration: the tunnel hands out chips whose sustained clocks
    # can vary run-to-run, so record the allocation's raw MXU and HBM speed to
    # make the headline interpretable. Round-4's version was methodologically
    # unsound (VERDICT r4 weak #2): ~30-35 ms of device work timed around one
    # host sync on a ~30 ms-RTT tunnel read ~half of true chip speed, and the
    # extrapolated "value_at_nominal_hbm" inflated the headline 2.3x while step
    # time stayed flat across the claimed bandwidth swing. Fixed protocol:
    #   * measure the null-sync RTT floor (min of 5 scalar round-trips) and
    #     subtract it from every timing;
    #   * size each kernel loop to ~300 ms of device work (10x the RTT) so the
    #     residual sync error is bounded by a few percent;
    #   * 3 in-run repeats, report the median and the spread — a reading is only
    #     trustworthy if the repeats agree (VERDICT r5 bar: ~10%).
    # No extrapolated throughput field: the headline is what was measured.
    try:
        z = jax.device_put(jnp.zeros((), jnp.float32), tpu)
        _sync = jax.jit(lambda z, i: z + i)
        float(_sync(z, 0))  # compile
        rtts = []
        for i in range(5):
            t0 = time.time()
            float(_sync(z, i))
            rtts.append(time.time() - t0)
        rtt = min(rtts)
        RESULT["calib_rtt_ms"] = round(rtt * 1e3, 1)

        def _timed(fn, *args, repeats=3):
            """Median RTT-corrected seconds over repeats, plus relative spread."""
            ts = []
            for _ in range(repeats):
                t0 = time.time()
                float(fn(*args))
                ts.append(max(time.time() - t0 - rtt, 1e-9))
            ts.sort()
            med = ts[len(ts) // 2]
            return med, (ts[-1] - ts[0]) / med

        MM_ITERS = 400  # 400 x 2 x 4096^3 = 55 TFLOP: ~290 ms at v5e peak bf16
        x = jax.device_put(jnp.ones((4096, 4096), jnp.bfloat16), tpu)

        @jax.jit
        def _mm(x):
            def body(c, _):
                return jnp.tanh(c @ x), None
            c, _ = jax.lax.scan(body, x, None, length=MM_ITERS)
            return jnp.sum(c.astype(jnp.float32))

        float(_mm(x))  # compile
        dt, spread = _timed(_mm, x)
        RESULT["chip_mxu_tflops_bf16"] = round(2 * 4096**3 * MM_ITERS / dt / 1e12, 1)
        RESULT["chip_mxu_spread"] = round(spread, 3)

        BW_ITERS = 400  # 400 x 512 MB r+w = 205 GB: ~250 ms at v5e peak HBM
        y = jax.device_put(jnp.ones((64, 1024, 1024), jnp.float32), tpu)  # 256 MB

        @jax.jit
        def _bw(y):
            def body(c, _):
                return c * 1.0000001 + 0.5, None
            c, _ = jax.lax.scan(body, y, None, length=BW_ITERS)
            return jnp.sum(c)

        float(_bw(y))
        dt, spread = _timed(_bw, y)
        RESULT["chip_hbm_gbps"] = round(64 * 1024 * 1024 * 4 * 2 * BW_ITERS / dt / 1e9, 0)
        RESULT["chip_hbm_spread"] = round(spread, 3)
    except Exception as e:
        RESULT.setdefault("warnings", []).append(f"chip calibration failed: {type(e).__name__}")

    try:
        from cenet_tpu.core.config import get_preset
        from cenet_tpu.train.trainer import Trainer

        cfg = get_preset("synapse")
        # max_iterations must exceed the total steps the bench runs (incl. the 60 s
        # sustained phase) or the poly schedule hits its clamp and lr goes to 0
        tr = Trainer(cfg, max_iterations=100_000)
        bs = 8

        # init on CPU (fast eager path), then place on the TPU
        with jax.default_device(cpu[0]) if cpu else jax.default_device(tpu):
            state = tr.init_state(jax.random.PRNGKey(0), (1, 224, 224, 1))
        state = jax.device_put(state, tpu)
        jax.block_until_ready(state.params)

        images = jax.device_put(
            jnp.asarray(np.random.default_rng(0).standard_normal((bs, 224, 224, 1)), jnp.float32), tpu
        )
        labels = jax.device_put(
            jnp.asarray(np.random.default_rng(1).integers(0, 9, (bs, 224, 224)), jnp.int32), tpu
        )
    except Exception as e:
        RESULT["error"] = f"setup failed: {type(e).__name__}: {str(e)[:400]}"
        traceback.print_exc(file=sys.stderr)
        emit_and_exit(1)

    # NOTE: on the axon tunnel, block_until_ready does NOT synchronize; the only
    # reliable fence is a host transfer. All timing below chains computations and
    # syncs once via float() — per-sync tunnel RTT (~30 ms) is amortized.
    # Headline metric: sustained training throughput via the multi-step path
    # (K optimizer steps per dispatch, distinct batches per step), which is how a
    # production loop runs when the host link is slow.
    # Deep multi-step dispatch: the per-call overhead through the tunnel is
    # ~150-300 ms regardless of K (measured K=10/50/100), so a production loop
    # amortizes it (cfg.train.steps_per_call); K=100 measured 43.1 vs 44.3 ms/step.
    try:
        K = 100
        rng = jax.random.PRNGKey(0)
        mstep = tr.make_multi_step(K)
        im_stack = jnp.stack([images + 0.01 * i for i in range(K)])
        lb_stack = jnp.stack([labels] * K)
        state, loss = mstep(state, im_stack, lb_stack, rng)  # compile
        float(loss)

        # Per-call timing, best-of-3: the tunnel occasionally stalls a call for
        # seconds (measured 192 → 87 img/s on one run); the minimum is the honest
        # sustained device+dispatch rate. Each call is synced via float(loss).
        per_call = []
        for i in range(3):
            t0 = time.time()
            state, loss = mstep(state, im_stack, lb_stack, jax.random.fold_in(rng, i))
            final_loss = float(loss)
            per_call.append(time.time() - t0)
        dt = min(per_call) / K
        train_ips = bs / dt
        RESULT["value"] = round(train_ips, 1)
        RESULT["vs_baseline"] = round(train_ips / A100_TORCH_TRAIN_IMG_PER_SEC_ESTIMATE, 2)
        RESULT["train_step_ms"] = round(dt * 1e3, 2)
        RESULT["final_loss"] = round(final_loss, 4)
    except Exception as e:
        RESULT["error"] = f"train bench failed: {type(e).__name__}: {str(e)[:400]}"
        traceback.print_exc(file=sys.stderr)
        emit_and_exit(1)

    # Sustained mode (VERDICT r2 #8): ≥60 s of continuous training calls, mean ±
    # spread reported alongside the best-of-N headline so tunnel stalls are
    # QUANTIFIED rather than excluded.
    try:
        sust = []
        sust_losses = []
        t_start = time.time()
        i = 3
        while time.time() - t_start < 60.0:
            t0 = time.time()
            state, loss = mstep(state, im_stack, lb_stack, jax.random.fold_in(rng, i))
            sust_losses.append(float(loss))
            sust.append(time.time() - t0)
            i += 1
        sust_ms = [s / K * 1e3 for s in sust]
        RESULT["train_sustained_images_per_sec"] = round(bs * K * len(sust) / sum(sust), 1)
        RESULT["train_sustained_spread"] = round(
            (max(sust_ms) - min(sust_ms)) / (sum(sust_ms) / len(sust_ms)), 3
        )
        # learning signal over the sustained phase (the optimizer is really
        # descending, not just dispatching)
        RESULT["sustained_loss_first"] = round(sust_losses[0], 4)
        RESULT["sustained_loss_last"] = round(sust_losses[-1], 4)
    except Exception as e:
        RESULT.setdefault("warnings", []).append(f"sustained phase failed: {type(e).__name__}")
        traceback.print_exc(file=sys.stderr)

    # eval throughput: K forwards per dispatch via lax.scan (the production eval
    # path — per-call host dispatch was the round-1 bottleneck: 141 img/s with
    # one forward per call vs the expected ≥2.5× train)
    try:
        KE = 30
        meval = tr.make_multi_eval_step(KE)
        im_eval = jnp.stack([images] * KE)
        preds = meval(state, im_eval)  # compile
        int(preds[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(3):
            preds = meval(state, im_eval)
        int(preds[0, 0, 0, 0])  # sync
        RESULT["eval_images_per_sec_per_chip"] = round(3 * KE * bs / (time.time() - t0), 1)
    except Exception as e:
        RESULT.setdefault("warnings", []).append(f"eval phase failed: {type(e).__name__}")
        traceback.print_exc(file=sys.stderr)

    # volume-inference throughput (the reference's per-slice eval protocol, batched):
    # synthetic 64-slice 512² CT volume → zoom 224 → forward → argmax → back-zoom
    try:
        from cenet_tpu.evaluate.volume import VolumeInferencer, VolumeInferenceConfig

        eval_step = tr.eval_step  # single-dispatch path (used by volume inference)
        probs = eval_step(state, images)
        float(probs[0, 0, 0, 0])

        vol = np.random.default_rng(2).standard_normal((64, 512, 512)).astype(np.float32)
        # The volume path is wire-bound and the tunnel's bandwidth swings >4×
        # between sessions (measured same-day r5: device-zoom uint8 85.6 vs
        # 39.1 slices/s; r4 saw 23.9). A deployment picks its transfer profile
        # by link speed, so the bench measures BOTH and reports the better:
        #  - device-zoom uint8: 16.8 MB up / 3.2 MB down — wins on a fast link
        #    (the host stays idle);
        #  - host_zoom uint8: host-side spline downscale (same cached
        #    scipy_zoom_matrix operators, numpy BLAS, pipelined chunk-wise
        #    against uploads) + post-zoom uint8 — only 3.2 MB up, wins when the
        #    link crawls (~6 MB/s sessions), measured 33.9 sl/s at spread 0.055
        #    with the 1-core host zoom as its own floor.
        # uint16 is EXACT for raw integer-HU CT; the production default stays
        # fp32 + device zoom (evaluate/volume.py).
        # 5 timed repeats per mode. Two dispersion stats are reported:
        #  - "spread" = (max-min)/mean over ALL repeats (round-4-compatible
        #    semantics) — on this tunnel it is dominated by whole-call stalls
        #    (a single upload occasionally blocks for seconds; the train phase
        #    documents the same failure mode and reports best-of-N for it);
        #  - "spread_trimmed" = same stat with the single slowest repeat
        #    dropped, quantifying run-to-run agreement once one stall is
        #    excluded. Both ship so stall frequency stays visible.
        best = None
        RESULT["volume_modes"] = {}
        for mode, kw in (("device_zoom_uint8", {}), ("host_zoom_uint8", {"host_zoom": True})):
            vcfg = VolumeInferenceConfig(
                img_size=224, chunk=32, num_classes=9, transfer_dtype="uint8", **kw
            )
            inf = VolumeInferencer(lambda x: eval_step(state, x), vcfg)
            _ = inf.predict_volume(vol)  # compile
            vt = []
            for _ in range(5):
                t0 = time.time()
                pred = inf.predict_volume(vol)
                _ = int(pred[0, 0, 0])
                vt.append(time.time() - t0)
            sps = round(64 / min(vt), 1)
            spread = round((max(vt) - min(vt)) / (sum(vt) / len(vt)), 3)
            tr = sorted(vt)[:-1]
            spread_trimmed = round((max(tr) - min(tr)) / (sum(tr) / len(tr)), 3)
            RESULT["volume_modes"][mode] = {
                "sps": sps, "spread": spread, "spread_trimmed": spread_trimmed
            }
            if best is None or sps > best[0]:
                best = (sps, spread, spread_trimmed, mode)
        RESULT["volume_inference_slices_per_sec"] = best[0]
        RESULT["volume_inference_spread"] = best[1]
        RESULT["volume_inference_spread_trimmed"] = best[2]
        RESULT["volume_inference_mode"] = best[3]
    except Exception as e:
        RESULT.setdefault("warnings", []).append(f"volume phase failed: {type(e).__name__}")
        traceback.print_exc(file=sys.stderr)

    # host augmentation throughput: the Synapse SomeOf pipeline through the real
    # loader thread pool — must sustain well above device img/s or data becomes
    # the bottleneck (reference equivalent: 11 DataLoader workers)
    try:
        from cenet_tpu.data.augment import SynapseAug
        from cenet_tpu.data.loader import Loader

        aug = SynapseAug()
        base_img = np.random.default_rng(3).random((224, 224)).astype(np.float32)
        base_lab = np.random.default_rng(4).integers(0, 9, (224, 224)).astype(np.uint8)

        def get_sample(idx, rng):
            im, lb = aug(base_img, base_lab, rng)
            return {"image": im[..., None].astype(np.float32), "label": lb.astype(np.int64)}

        loader = Loader(400, get_sample, batch_size=bs, seed=0, num_threads=8)
        n_imgs = 0
        t0 = time.time()
        for batch_h in loader.epoch(0):
            n_imgs += batch_h["image"].shape[0]
            if time.time() - t0 > 3.0:
                break
        RESULT["host_aug_images_per_sec"] = round(n_imgs / (time.time() - t0), 1)
    except Exception as e:
        RESULT.setdefault("warnings", []).append(f"host-aug phase failed: {type(e).__name__}")
        traceback.print_exc(file=sys.stderr)

    emit_and_exit(0)


if __name__ == "__main__":
    main()
