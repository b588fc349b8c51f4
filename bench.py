"""Benchmark: SDXL-class UNet train step on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: SDXL 1024px train-step MFU per chip (BASELINE.json north-star ≥0.40).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

PEAK_FLOPS = {
    # per-chip peak bf16 FLOP/s
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


SDXL_UNET_KW = dict(
    in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
    attention_resolutions=[4, 2], channel_mult=[1, 2, 4], num_head_channels=64,
    transformer_depth=[1, 2, 10], context_dim=2048, num_classes="sequential",
    adm_in_channels=2816, use_linear_in_transformer=True,
)

# reference SD1.5 UNet (configs/sd15 surface): fixed 8 heads -> d=40/80/160,
# attention at every level incl. 16384 tokens at 1024px (the d=40 sweep shape)
SD15_UNET_KW = dict(
    in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
    attention_resolutions=[4, 2, 1], channel_mult=[1, 2, 4, 4], num_heads=8,
    transformer_depth=1, context_dim=768,
)


def _jax_with_cpu_honored():
    """Import jax, honoring JAX_PLATFORMS=cpu via the config knob (the 'axon'
    TPU plugin ignores the env var)."""
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    return jax


def guess_peak(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return 197e12


def main() -> None:
    import os

    jax = _jax_with_cpu_honored()

    mode = os.environ.get("NEUROSIS_BENCH_MODE", "sdxl")
    if mode == "vae":
        return vae_encode_bench()
    if mode == "vae_train":
        return vae_train_bench()
    if mode == "pipeline":
        return pipeline_bench()
    if mode == "sample":
        return sample_bench()

    # persistent compile cache: repeated bench runs skip the (slow) compile
    cache_dir = os.path.expanduser("~/.cache/neurosis_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import optax

    from neurosis_tpu.models.unet import UNetModel

    on_tpu = jax.default_backend() == "tpu"
    # 1024px-class: 128x128 latents. batch=2 is the best single-v5e config
    # measured (b1: 35.4%, b2: 39.5%, b3: 39.0% HW-util; b4 OOM; dots-remat
    # b2: same wall-clock, fewer counted flops).
    batch, res = (2, 128) if on_tpu else (1, 16)
    if os.environ.get("NEUROSIS_BENCH_MODE", "sdxl") == "sd15" and on_tpu:
        # SD1.5's UNet is 3x smaller: batch 4 fits HBM and measures
        # 0.3511 MFU vs 0.3147 at b2 (the small-channel levels amortize)
        batch = 4
    batch = int(os.environ.get("NEUROSIS_BENCH_BATCH", batch))
    # default policy none,none,dots_names: levels 0/1 keep all activations
    # (shallow stacks, big wins from zero recompute), the deep level-2
    # transformer stack saves every matmul output + flash-attention residuals
    # and recomputes elementwise only. Measured b2 sweep: full 2.051 steps/s
    # (0.439 MFU) < names 2.061 (0.4405) < dots_names 2.115 (0.452) <
    # none,none,dots_names 2.163 (0.4621) — all fit b2 HBM.
    remat_env = os.environ.get("NEUROSIS_BENCH_REMAT", "1")
    use_remat = remat_env not in ("0", "false")
    # policy pass-through: full | dots | dots_all | names | dots_names, or a
    # comma-separated per-level triple (e.g. "names,names,full")
    _policies = ("full", "dots", "dots_all", "names", "dots_names")
    if "," in remat_env:
        remat_policy = tuple(p if p in _policies + ("none",) else "dots_names" for p in remat_env.split(","))
    elif remat_env in _policies:
        remat_policy = remat_env
    else:
        remat_policy = ("none", "none", "dots_names")

    sd15 = mode == "sd15"
    if sd15:
        if isinstance(remat_policy, tuple) and len(remat_policy) != 4:
            remat_policy = "dots_names" if remat_env == "1" else remat_policy
        model_kw = {**SD15_UNET_KW}
        if not on_tpu:
            model_kw["channel_mult"] = [1, 2]
            model_kw["attention_resolutions"] = [2]
    else:
        model_kw = {**SDXL_UNET_KW, "transformer_depth": [1, 2, 10] if on_tpu else [1, 1, 1]}
    model = UNetModel(
        **model_kw,
        use_checkpoint=use_remat,
        remat_policy=remat_policy,
        dtype=jnp.bfloat16,
    )

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, res, res, 4), jnp.bfloat16)
    t = jnp.ones((batch,), jnp.float32) * 500.0
    ctx = jnp.zeros((batch, 77, 768 if sd15 else 2048), jnp.bfloat16)
    y = None if sd15 else jnp.zeros((batch, 2816), jnp.bfloat16)

    print("bench: tracing param shapes...", file=sys.stderr, flush=True)
    shapes = jax.eval_shape(lambda: model.init(rng, x, t, ctx, y=y))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def init_params(key):
        # bf16 params: single-chip SDXL (2.6B) in fp32 + optimizer state would
        # not fit 16GB HBM; production multi-chip runs shard fp32 masters.
        ks = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef,
            [jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02 for k, s in zip(ks, leaves)],
        )

    print("bench: initializing params (one fused program)...", file=sys.stderr, flush=True)
    params = init_params(rng)
    jax.block_until_ready(params)

    opt = optax.adafactor(1e-5)
    if os.environ.get("NEUROSIS_BENCH_STACKED", "1") not in ("0", "false"):
        # batch per-leaf optimizer kernels (~7000 tiny scalar reductions ->
        # ~30 vmapped group updates; saves ~100ms/step, see optimizers/stacked.py)
        from neurosis_tpu.optimizers.stacked import stacked

        opt = stacked(opt)
    opt_state = jax.jit(opt.init)(params)

    def loss_fn(p, x, t, ctx, y, noise):
        out = model.apply({"params": p}, x + noise, t, ctx, y=y, deterministic=False)
        return jnp.mean(jnp.square(out.astype(jnp.float32) - noise.astype(jnp.float32)))

    def train_step(p, opt_state, key):
        noise = jax.random.normal(key, x.shape, x.dtype)
        loss, grads = jax.value_and_grad(loss_fn)(p, x, t, ctx, y, noise)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, loss

    iters = 10 if on_tpu else 2

    # Measurement methodology for the remote-attached TPU: per-call dispatch
    # latency is ~75ms and block_until_ready does NOT guarantee execution
    # completion there, so the step loop runs INSIDE one jit via lax.scan and
    # completion is forced by a host transfer of the summed losses.
    @partial(jax.jit, donate_argnums=(0, 1))
    def run_n(p, opt_state, key):
        def body(carry, _):
            p, opt_state, key = carry
            key, sub = jax.random.split(key)
            p, opt_state, loss = train_step(p, opt_state, sub)
            return (p, opt_state, key), loss

        (p, opt_state, _), losses = jax.lax.scan(body, (p, opt_state, key), None, length=iters)
        return p, opt_state, losses

    key = jax.random.PRNGKey(1)
    print("bench: tracing scanned step loop...", file=sys.stderr, flush=True)
    lowered = run_n.lower(params, opt_state, key)
    print("bench: compiling...", file=sys.stderr, flush=True)
    # optional XLA compiler-option sweep, e.g.
    # NEUROSIS_BENCH_XLA_OPT="xla_tpu_scoped_vmem_limit_kib=98304"
    xla_opts = {}
    for kv in filter(None, os.environ.get("NEUROSIS_BENCH_XLA_OPT", "").split(",")):
        k, _, v = kv.partition("=")
        xla_opts[k.strip()] = v.strip()
    compiled = lowered.compile(compiler_options=xla_opts or None)
    try:
        cost = compiled.cost_analysis()
        # XLA cost analysis counts a while/scan body ONCE (verified: the
        # 10-step scan reports the same flops as a single-step executable),
        # so this is already per-step flops. NOTE: this counts remat recompute
        # as executed work — it is HW flops, not model flops.
        step_flops = float(cost.get("flops", 0.0))
    except Exception:
        step_flops = 0.0

    # Conventional MODEL flops: 3x the un-rematerialized forward (bwd = 2x fwd
    # for matmul/conv-dominated nets; verified on-chip: 3x fwd = 42,097 GF vs
    # 42,474 GF measured for the full no-remat fwd+bwd+optimizer step, <1% off).
    # The fwd-only compile is cheap (~100 s cold, cached after).
    model_flops = 0.0
    if on_tpu:
        print("bench: compiling no-remat fwd for model-flops accounting...", file=sys.stderr, flush=True)
        try:
            plain = UNetModel(**model_kw, use_checkpoint=False, dtype=jnp.bfloat16)
            spec = jax.tree_util.tree_map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)
            fwd_compiled = (
                jax.jit(lambda p, xin: plain.apply({"params": p}, xin, t, ctx, y=y, deterministic=True))
                .lower(spec, jax.ShapeDtypeStruct(x.shape, x.dtype))
                .compile()
            )
            model_flops = 3.0 * float(fwd_compiled.cost_analysis().get("flops", 0.0))
        except Exception as e:
            print(f"bench: model-flops compile failed ({e}); falling back to HW flops", file=sys.stderr)
    if not model_flops:
        model_flops = step_flops

    print("bench: warmup run...", file=sys.stderr, flush=True)
    params, opt_state, losses = run_n(params, opt_state, key)
    assert np.isfinite(float(jnp.sum(losses))), "non-finite loss in bench"

    print("bench: timing...", file=sys.stderr, flush=True)
    profile_dir = os.environ.get("NEUROSIS_BENCH_PROFILE")
    if profile_dir:
        # on-chip trace of the identical compiled program (cache hit)
        jax.profiler.start_trace(profile_dir)
    start = time.perf_counter()
    params, opt_state, losses = run_n(params, opt_state, jax.random.PRNGKey(2))
    _ = float(jnp.sum(losses))  # host transfer = true completion barrier
    dt = (time.perf_counter() - start) / iters
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"bench: profile written to {profile_dir}", file=sys.stderr, flush=True)

    steps_per_sec = 1.0 / dt
    peak = guess_peak(jax.devices()[0])
    hw_util = step_flops * steps_per_sec / peak if step_flops else 0.0
    mfu = model_flops * steps_per_sec / peak if model_flops else 0.0

    print(
        json.dumps(
            {
                # headline = conventional MODEL-flops MFU (3x no-remat fwd);
                # remat recompute counts toward hw_flops_util only.
                "metric": (("sd15" if sd15 else "sdxl") + "_1024px_train_mfu")
                if on_tpu
                else ("sd15" if sd15 else "sdxl") + "_tiny_train_steps_per_sec_cpu",
                "value": round(mfu, 4) if on_tpu else round(steps_per_sec, 4),
                "unit": "mfu" if on_tpu else "steps/s",
                "vs_baseline": round(mfu / 0.40, 4) if on_tpu else 0.0,
                "detail": {
                    "steps_per_sec": round(steps_per_sec, 4),
                    "model_gflops": round(model_flops / 1e9, 1),
                    "executed_gflops": round(step_flops / 1e9, 1),
                    "hw_flops_util": round(hw_util, 4),
                    "device": str(jax.devices()[0].device_kind),
                    "batch": batch,
                    "latent_res": res,
                    "remat": remat_env,
                },
            }
        )
    )


def sample_bench() -> None:
    """Inference: SDXL-class 1024px CFG sampling (Euler, 30 steps) imgs/min.

    The whole sampling loop is ONE jitted lax.fori_loop program (CFG batch
    doubling inside), so per-step dispatch overhead is zero — the TPU-native
    analog of the reference's eval-mode `sample()` path (models/diffusion.py:
    298-313 + sampling.py EulerEDMSampler)."""
    import os

    jax = _jax_with_cpu_honored()

    cache_dir = os.path.expanduser("~/.cache/neurosis_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from neurosis_tpu.diffusion import Denoiser, EpsPreconditioning, LegacyDDPMDiscretization
    from neurosis_tpu.models.unet import UNetModel
    from neurosis_tpu.sampling import EulerEDMSampler, VanillaCFG

    on_tpu = jax.default_backend() == "tpu"
    batch, res, steps = (1, 128, 30) if on_tpu else (1, 16, 4)
    # batch > 1 = THROUGHPUT serving (imgs/min scales ~2x at b4; b1 is the
    # latency number quoted in BASELINE)
    batch = int(os.environ.get("NEUROSIS_BENCH_BATCH", batch))
    mc, ctx_dim, adm = (320, 2048, 2816) if on_tpu else (32, 64, 128)
    model = UNetModel(
        **{**SDXL_UNET_KW, "model_channels": mc, "context_dim": ctx_dim,
           "adm_in_channels": adm, "num_head_channels": 64 if on_tpu else 16,
           "transformer_depth": [1, 2, 10] if on_tpu else [1, 1, 1]},
        use_checkpoint=False, dtype=jnp.bfloat16,
    )
    ctx = jnp.zeros((batch, 77, ctx_dim), jnp.bfloat16)
    y = jnp.zeros((batch, adm), jnp.bfloat16)
    x = jnp.zeros((batch, res, res, 4), jnp.bfloat16)
    t = jnp.ones((batch,), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t, ctx, y=y))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def init_params(key):
        ks = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02 for k, s in zip(ks, leaves)]
        )

    params = init_params(jax.random.PRNGKey(0))
    denoiser = Denoiser(preconditioning=EpsPreconditioning())
    sampler = EulerEDMSampler(
        discretization=LegacyDDPMDiscretization(), guider=VanillaCFG(scale=7.0), num_steps=steps
    )

    cond = {"crossattn": ctx, "vector": y}
    uc = {"crossattn": jnp.zeros_like(ctx), "vector": jnp.zeros_like(y)}

    # outer jit: the sigma-table math is host-side numpy (Discretization.table)
    # so the WHOLE sampling call traces once and is cached — without this,
    # every call re-traces the UNet (~1 min of host time per image on a slow
    # host while the chip idles)
    @jax.jit
    def run(p, noise):
        def net(xin, sigma, c):
            return denoiser(
                lambda z, tt, cc: model.apply(
                    {"params": p}, z, tt, cc.get("crossattn"), y=cc.get("vector")
                ),
                xin, sigma, c,
            )

        return sampler(net, noise, cond, uc=uc)

    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype)
    print("bench[sample]: compiling sampling loop...", file=sys.stderr, flush=True)
    out = run(params, noise)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # warmup + barrier
    start = time.perf_counter()
    out = run(params, noise)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - start
    imgs_per_min = 60.0 * batch / dt
    print(
        json.dumps(
            {
                "metric": "sdxl_1024px_sample_imgs_per_min" if on_tpu else "sample_tiny_imgs_per_min_cpu",
                "value": round(imgs_per_min, 2),
                "unit": "imgs/min",
                "vs_baseline": 0.0,
                "detail": {"batch": batch, "latent_res": res, "steps": steps, "cfg": 7.0,
                           "sec_per_image": round(dt / batch, 3)},
            }
        )
    )


def pipeline_bench() -> None:
    """Input-pipeline throughput: decode+bucket+collate imgs/s with process
    workers (no device work). Proves the host can feed 2 steps/s x batch 2 x 8
    chips = 32 imgs/s (VERDICT weak #7)."""
    import os
    import tempfile
    import time as _time

    import numpy as np
    from PIL import Image

    n_images = int(os.environ.get("NEUROSIS_BENCH_PIPELINE_IMAGES", 96))
    batch = int(os.environ.get("NEUROSIS_BENCH_BATCH", 8))
    # worker processes scale with host cores (a v5e pod host has 100+; this
    # bench box may have 1 — the per-core rate is the honest number there)
    cores = os.cpu_count() or 1
    workers = min(int(os.environ.get("NEUROSIS_BENCH_WORKERS", 8)), max(cores, 1))

    with tempfile.TemporaryDirectory() as tmp:
        rng = np.random.RandomState(0)
        sizes = [(1280, 960), (1024, 1024), (896, 1152), (1536, 864)]
        for i in range(n_images):
            w, h = sizes[i % len(sizes)]
            arr = (rng.rand(h, w, 3) * 255).astype("uint8")
            Image.fromarray(arr).save(f"{tmp}/img_{i:04d}.jpg", quality=90)
            with open(f"{tmp}/img_{i:04d}.txt", "w") as f:
                f.write("a synthetic benchmark image, test")

        from neurosis_tpu.data.aspect import SDXLBucketList
        from neurosis_tpu.data.imagefolder import ImageFolderDataset
        from neurosis_tpu.data.prefetch import prefetch_batches_processes

        ds = ImageFolderDataset(folder=tmp, buckets=SDXLBucketList(), batch_size=batch)
        # two epochs over the folder: the first batch absorbs the one-time
        # worker-pool spawn (amortized in real training, like jit compile),
        # steady-state throughput is what feeds the chips
        idx = list(ds.get_batch_iterator()) * 2
        # single-core decode rate (the per-worker unit of scaling)
        t0 = _time.perf_counter()
        _ = ds.get_batch(idx[0])
        per_core = batch / (_time.perf_counter() - t0)

        # config-level uint8 collate A/B (image_dtype="uint8", the int8 input
        # path): same decode + bucket, but no host float conversion and 4x
        # smaller collate buffers — quotes the host-side half of the uint8 win
        # (the transfer-inclusive half is NEUROSIS_BENCH_MODE=vae INPUT=ab)
        ds_u8 = ImageFolderDataset(
            folder=tmp, buckets=SDXLBucketList(), batch_size=batch, image_dtype="uint8"
        )
        probe = idx[: max(4, len(idx) // 4)]
        t0 = _time.perf_counter()
        for i in probe:
            b = ds_u8.get_batch(i)
        u8_rate = batch * len(probe) / (_time.perf_counter() - t0)
        assert b["image"].dtype == np.uint8
        t0 = _time.perf_counter()
        for i in probe:
            _ = ds.get_batch(i)
        f32_rate = batch * len(probe) / (_time.perf_counter() - t0)

        n = 0
        start = None
        if workers > 1:
            for b in prefetch_batches_processes(ds, iter(idx), num_workers=workers):
                if start is None:
                    start = _time.perf_counter()  # timer starts after batch 0 (pool spawn)
                    continue
                n += b["image"].shape[0]
            dt = _time.perf_counter() - start
            imgs_per_sec = n / dt
        else:
            # 1-core host: worker processes only add IPC; direct decode IS the pipeline
            start = _time.perf_counter()
            for i in idx:
                n += ds.get_batch(i)["image"].shape[0]
            imgs_per_sec = n / (_time.perf_counter() - start)

    print(
        json.dumps(
            {
                "metric": "input_pipeline_imgs_per_sec",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/s",
                # target: feed 8 v5e chips at 2 steps/s, batch 2/chip
                "vs_baseline": round(imgs_per_sec / 32.0, 4),
                "detail": {
                    "images": n,
                    "workers": workers,
                    "host_cores": cores,
                    "batch": batch,
                    "per_core_imgs_per_sec": round(per_core, 2),
                    # projected rate on a 16-core pod host (linear in workers)
                    "projected_16core": round(per_core * 16, 1),
                    # config-level image_dtype="uint8" collate vs f32 (host side)
                    "collate_imgs_per_sec_uint8": round(u8_rate, 2),
                    "collate_imgs_per_sec_f32": round(f32_rate, 2),
                },
            }
        )
    )


def vae_encode_bench() -> None:
    """Secondary metric: SDXL VAE encode imgs/sec at 1024px (BASELINE.json:2)."""
    import os

    jax = _jax_with_cpu_honored()

    cache_dir = os.path.expanduser("~/.cache/neurosis_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    import jax.numpy as jnp

    from neurosis_tpu.models.autoencoder import AutoencoderKL

    on_tpu = jax.default_backend() == "tpu"
    batch, res = (8, 1024) if on_tpu else (1, 64)
    batch = int(os.environ.get("NEUROSIS_BENCH_BATCH", batch))
    dd = dict(double_z=True, z_channels=4, resolution=res, in_channels=3, out_ch=3,
              ch=128 if on_tpu else 32, ch_mult=[1, 2, 4, 4] if on_tpu else [1, 2],
              num_res_blocks=2 if on_tpu else 1, attn_resolutions=[], dropout=0.0)
    vae = AutoencoderKL(ddconfig=dd, embed_dim=4, dtype=jnp.bfloat16 if on_tpu else None)

    x = jnp.zeros((batch, res, res, 3), jnp.bfloat16 if on_tpu else jnp.float32)
    shapes = jax.eval_shape(lambda: vae.init(jax.random.PRNGKey(0), x))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def init_params(key):
        ks = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [jax.random.normal(k, s.shape, s.dtype) * 0.02 for k, s in zip(ks, leaves)]
        )

    params = init_params(jax.random.PRNGKey(0))

    iters = 10 if on_tpu else 2

    @jax.jit
    def encode_n(p, x):
        def body(acc, _):
            m = vae.apply({"params": p}, x, method="encode")
            return acc + jnp.mean(m.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return acc

    print("bench[vae]: compiling...", file=sys.stderr, flush=True)
    _ = float(encode_n(params, x))  # warmup + completion barrier
    start = time.perf_counter()
    _ = float(encode_n(params, x))
    dt = (time.perf_counter() - start) / iters
    imgs_per_sec = batch / dt

    detail = {"batch": batch, "res": res, "ms_per_batch": round(dt * 1e3, 2)}
    if os.environ.get("NEUROSIS_BENCH_INPUT") == "ab":
        # int8 input-path A/B (VERDICT r3 #6): host buffer → device transfer
        # → encode, per-dispatch (the scan metric above excludes transfers).
        # u8 ships 1 B/px/ch and dequantizes in-graph (ops/dequant.py).
        import numpy as np

        from neurosis_tpu.ops.dequant import dequant_image

        rng = np.random.RandomState(0)
        host_u8 = (rng.rand(batch, res, res, 3) * 255).astype(np.uint8)
        host_f32 = (host_u8.astype(np.float32) * (2.0 / 255.0) - 1.0)

        @jax.jit
        def encode_once(p, img):
            m = vae.apply({"params": p}, dequant_image(img).astype(x.dtype), method="encode")
            return jnp.mean(m.astype(jnp.float32))

        def timed(host_buf, n=20):
            _ = float(encode_once(params, jnp.asarray(host_buf)))  # compile
            t0 = time.perf_counter()
            for _i in range(n):
                out = encode_once(params, jnp.asarray(host_buf))
            _ = float(out)
            return batch / ((time.perf_counter() - t0) / n)

        f32_rate = timed(host_f32)
        u8_rate = timed(host_u8)
        detail["input_ab"] = {
            "f32_imgs_per_sec": round(f32_rate, 2),
            "u8_imgs_per_sec": round(u8_rate, 2),
            "u8_speedup": round(u8_rate / f32_rate, 4),
        }

    print(
        json.dumps(
            {
                "metric": "sdxl_vae_encode_imgs_per_sec" if on_tpu else "vae_tiny_encode_imgs_per_sec_cpu",
                "value": round(imgs_per_sec, 3),
                "unit": "imgs/s",
                "vs_baseline": 0.0,
                "detail": detail,
            }
        )
    )


def vae_train_bench() -> None:
    """VAE-GAN training step (the reference's second trainer pillar,
    models/autoencoder.py:280-293): alternating G/D steps at 256px with
    AutoencoderLPIPSWithDiscr — LPIPS VGG trunk + PatchGAN forward/backward
    on-chip. Reports imgs/s through the alternating schedule (one optimizer
    step per batch, like the reference's manual-optimization loop)."""
    import os

    jax = _jax_with_cpu_honored()

    cache_dir = os.path.expanduser("~/.cache/neurosis_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import optax

    from neurosis_tpu.losses.vae_loss import AutoencoderLPIPSWithDiscr
    from neurosis_tpu.models.vae import Decoder, Encoder
    from neurosis_tpu.trainer.vae_engine import AutoencodingEngine

    on_tpu = jax.default_backend() == "tpu"
    batch, res = (8, 256) if on_tpu else (1, 32)
    res = int(os.environ.get("NEUROSIS_BENCH_RES", res))
    if on_tpu and res >= 512:
        # 512px quadruples activation memory: b2 without remat OOMs HBM by
        # 299 MB (fp32 GroupNorm temporaries in the G step bwd), and the G
        # step is flops-bound at ~50 TF/s here, so b2+remat (6.01 imgs/s)
        # LOSES to b1 without remat (7.44 imgs/s) — recompute costs more
        # than batch amortization buys. Default b1; forced batch >= 2 gets
        # remat for HBM feasibility.
        batch = 1
    batch = int(os.environ.get("NEUROSIS_BENCH_BATCH", batch))
    remat = bool(on_tpu and res >= 512 and batch >= 2)
    # A/B override (e.g. b2 WITHOUT remat once NEUROSIS_GN_VJP removes the
    # fp32 GroupNorm temporaries that made that config OOM)
    remat_env = os.environ.get("NEUROSIS_BENCH_VAE_REMAT")
    if remat_env is not None:
        remat = remat_env not in ("0", "false")
    dd = dict(
        ch=128 if on_tpu else 32,
        ch_mult=[1, 2, 4, 4] if on_tpu else [1, 2],
        num_res_blocks=2 if on_tpu else 1,
        attn_resolutions=[],
        resolution=res,
        z_channels=4 if on_tpu else 2,
        dropout=0.0,
    )
    dtype = jnp.bfloat16 if on_tpu else None
    engine = AutoencodingEngine(
        encoder=Encoder(**dd, double_z=True, in_channels=3, dtype=dtype, remat=remat),
        decoder=Decoder(**dd, out_ch=3, dtype=dtype, remat=remat),
        loss=AutoencoderLPIPSWithDiscr(
            lpips_type="vgg", disc_start=1, disc_n_layers=3 if on_tpu else 1
        ),
        g_optimizer=optax.adam(4.5e-6),
        d_optimizer=optax.adam(4.5e-6),
        kl_weight=1e-6,
        disc_start=1,
    )

    import numpy as np

    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, res, res, 3).astype(np.float32) * 0.5
    )
    batch_d = {"image": x}
    state = engine.init(jax.random.PRNGKey(0), batch_d)

    iters = 10 if on_tpu else 2
    # DISTINCT batch per scan iteration: with a constant batch, the D scan's
    # reconstruction (frozen G params, frozen input) is loop-invariant and XLA
    # hoists the whole decoder forward out of the loop — first measurement read
    # an impossible 198 TF/s (100.4% of peak) on the D step. Real training sees
    # a fresh batch every step, so the scan must too.
    xs = jnp.asarray(
        np.random.RandomState(1).randn(iters, batch, res, res, 3).astype(np.float32) * 0.5
    )

    def scan_n(step_fn):
        @jax.jit
        def run(state, xs):
            def body(s, xi):
                s2, log = step_fn(s, {"image": xi})
                return s2, log["total"]
            return jax.lax.scan(body, state, xs)

        return run

    g_n_ = scan_n(engine.g_step)
    d_n_ = scan_n(engine.d_step)
    g_n = lambda s: g_n_(s, xs)  # noqa: E731
    d_n = lambda s: d_n_(s, xs)  # noqa: E731

    # completion barrier: block_until_ready returns at DISPATCH through the
    # axon tunnel; only a host transfer proves execution finished (NOTES.md)
    def barrier(tot):
        return float(np.asarray(tot)[-1])

    print("bench[vae_train]: compiling G step...", file=sys.stderr, flush=True)
    state, tot = g_n(state)  # warmup + move past disc_start
    barrier(tot)
    print("bench[vae_train]: compiling D step...", file=sys.stderr, flush=True)
    state, tot = d_n(state)
    barrier(tot)

    start = time.perf_counter()
    state, tot_g = g_n(state)
    barrier(tot_g)
    g_dt = (time.perf_counter() - start) / iters
    start = time.perf_counter()
    state, tot_d = d_n(state)
    barrier(tot_d)
    d_dt = (time.perf_counter() - start) / iters

    # alternating schedule: each batch takes ONE step (G or D), so sustained
    # throughput over a G+D pair is two batches per (g_dt + d_dt)
    imgs_per_sec = 2 * batch / (g_dt + d_dt)

    # executed flops via cost_analysis (counts the scan body ONCE — NOTES.md),
    # so per-step flops ≈ whole-program flops (scan of `iters` bodies)
    def _step_gflops(fn, state):
        try:
            cost = fn.lower(state, xs).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) / 1e9
        except Exception:
            return 0.0

    g_gf = _step_gflops(g_n_, state)
    d_gf = _step_gflops(d_n_, state)
    peak = guess_peak(jax.devices()[0]) if on_tpu else 0
    hw_util = ((g_gf + d_gf) * 1e9 / (g_dt + d_dt) / peak) if peak else 0.0
    print(
        json.dumps(
            {
                "metric": "vae_gan_train_imgs_per_sec" if on_tpu else "vae_gan_train_imgs_per_sec_cpu",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/s",
                "vs_baseline": 0.0,
                "detail": {
                    "batch": batch,
                    "res": res,
                    "g_ms": round(g_dt * 1e3, 2),
                    "d_ms": round(d_dt * 1e3, 2),
                    "g_gflops": round(g_gf, 1),
                    "d_gflops": round(d_gf, 1),
                    "hw_flops_util": round(hw_util, 4),
                    "g_total": float(np.asarray(tot_g)[-1]),
                    "d_total": float(np.asarray(tot_d)[-1]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
