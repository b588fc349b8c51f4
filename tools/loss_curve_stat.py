"""Statistical loss-curve parity at real SD1.5 dims (VERDICT r3 #4).

The deterministic 10-step tiny-UNet test (tests/test_loss_curve_parity.py)
pins the math; THIS harness runs a few hundred optimization steps of a
reduced-depth SD1.5 UNet with the REAL dims tiny tests can't see (320/640/1280
channels, heads d=40/80/160, 768-dim context, bf16 islands on the JAX side)
in both frameworks on the same data stream with matched init, and checks the
curves agree within the seed-to-seed noise band of the reference itself.

Reference workload anchor: configs/sd15/sd15.example.yml (eps-preconditioned
DiscreteDenoiser, LegacyDDPM sigmas, Adam). Depth is reduced (num_res_blocks=1,
channel_mult [1,2,4]) purely so the torch-CPU side finishes in minutes; all
per-layer shapes match real SD1.5 levels.

Usage:
  python tools/loss_curve_stat.py --side torch --seed 0 --out /tmp/t0.json
  python tools/loss_curve_stat.py --side torch --seed 1 --out /tmp/t1.json
  python tools/loss_curve_stat.py --side jax --dtype bf16 --seed 0 --out /tmp/j.json
  python tools/loss_curve_stat.py --analyze /tmp/t0.json /tmp/t1.json /tmp/j.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

CFG = dict(
    in_channels=4,
    model_channels=320,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=[4, 2, 1],
    channel_mult=[1, 2, 4],
    num_heads=8,
    transformer_depth=1,
    context_dim=768,
)
BATCH = 2
# 128px-class latents: the torch-CPU side runs on ONE host core (~35 s/step at
# 32x32), so spatial is halved for feasibility while every per-layer CHANNEL
# and HEAD dim (320/640/1280, d=40/80/160, 768 ctx) stays real-SD1.5
RES = 16
LR = 1e-4
DATA_SEED = 123  # the shared data stream; --seed varies only sigma/noise draws


def ddpm_sigmas(num_steps: int = 1000) -> np.ndarray:
    """LegacyDDPM sigma table — golden vs the reference discretization
    (tests/test_diffusion_math.py).

    Uses the production DiscreteSigmaGenerator table (exclude_zero=True,
    upstream-sgm training semantics): the reference fork's default layout
    puts sigma=0 at drawable index 0, which under eps weighting (sigma^-2)
    produced 0*inf = NaN at step 196 of the seed-0 run. The table here is
    the 1000-entry [sigma_min..sigma_max] both frameworks index uniformly."""
    from neurosis_tpu.diffusion import DiscreteSigmaGenerator, LegacyDDPMDiscretization

    gen = DiscreteSigmaGenerator(LegacyDDPMDiscretization(), num_idx=num_steps)
    return np.asarray(gen.sigmas, np.float64)


def data_stream(steps: int):
    """Deterministic (x0, ctx) stream shared by every run."""
    rng = np.random.RandomState(DATA_SEED)
    for _ in range(steps):
        yield (
            rng.randn(BATCH, 4, RES, RES).astype(np.float32),
            rng.randn(BATCH, 77, 768).astype(np.float32),
        )


def sigma_noise_stream(steps: int, seed: int, sigmas: np.ndarray):
    """Per-run sigma/noise draws (the *statistical* part)."""
    rng = np.random.RandomState(1000 + seed)
    for _ in range(steps):
        idx = rng.randint(0, len(sigmas), size=(BATCH,))
        yield sigmas[idx].astype(np.float32), rng.randn(BATCH, 4, RES, RES).astype(np.float32)


def run_torch(steps: int, seed: int) -> list[float]:
    import torch

    torch.manual_seed(0)  # matched INIT across all runs
    from _reference_loader import load_reference_math, load_reference_unet

    om = load_reference_unet()
    precond_mod, weighting_mod, _, _ = load_reference_math()
    model = om.UNetModel(**CFG, spatial_transformer_attn_type="torch-sdp")
    model.train()
    pc = precond_mod.EpsPreconditioning()
    w_fn = weighting_mod.EpsWeighting()
    opt = torch.optim.Adam(model.parameters(), lr=LR, betas=(0.9, 0.999), eps=1e-8)
    sig_tab = ddpm_sigmas()

    losses = []
    t0 = time.time()
    for i, ((x0, ctx), (sig, noise)) in enumerate(
        zip(data_stream(steps), sigma_noise_stream(steps, seed, sig_tab))
    ):
        x = torch.from_numpy(x0)
        s = torch.from_numpy(sig)[:, None, None, None]
        z_t = x + s * torch.from_numpy(noise)
        c_skip, c_out, c_in, c_noise = pc(s)
        out = model(z_t * c_in, c_noise.reshape(-1), context=torch.from_numpy(ctx))
        denoised = out * c_out + z_t * c_skip
        w = w_fn(torch.from_numpy(sig))
        loss = (((denoised - x) ** 2).mean(dim=(1, 2, 3)) * w).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        if i % 20 == 0:
            print(f"torch[{seed}] step {i}: {losses[-1]:.4f} ({time.time()-t0:.0f}s)", flush=True)
    return losses


def run_jax(steps: int, seed: int, dtype: str) -> list[float]:
    import torch

    torch.manual_seed(0)  # SAME init as the torch runs
    from _reference_loader import load_reference_unet

    om = load_reference_unet()
    ref = om.UNetModel(**CFG, spatial_transformer_attn_type="torch-sdp")
    sd = {k: v.numpy().copy() for k, v in ref.state_dict().items()}
    del ref

    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.path.expanduser("~/.cache/neurosis_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from neurosis_tpu.checkpoint import import_torch_params
    from neurosis_tpu.diffusion import EpsPreconditioning, EpsWeighting
    from neurosis_tpu.models.unet import UNetModel
    from neurosis_tpu.utils import append_dims

    jdtype = {"bf16": jnp.bfloat16, "fp32": None}[dtype]
    model = UNetModel(**CFG, dtype=jdtype, remat_policy="none")
    xd = jnp.zeros((BATCH, RES, RES, 4))
    tmpl = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), xd, jnp.zeros((BATCH,)), jnp.zeros((BATCH, 77, 768)))
    )
    params, missing, unexpected = import_torch_params(tmpl["params"], sd)
    assert not missing and not unexpected, (missing, unexpected)

    pc, w_fn = EpsPreconditioning(), EpsWeighting()
    opt = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(params)
    sig_tab = ddpm_sigmas()

    def loss_fn(p, x0, ctx, sig, noise):
        s = append_dims(sig, 4)
        z_t = x0 + s * noise
        c_skip, c_out, c_in, c_noise = pc(s)
        out = model.apply({"params": p}, (z_t * c_in).astype(jdtype or z_t.dtype), c_noise.reshape(-1), ctx)
        denoised = out.astype(jnp.float32) * c_out + z_t * c_skip
        return (jnp.mean((denoised - x0) ** 2, axis=(1, 2, 3)) * w_fn(sig)).mean()

    @jax.jit
    def step(p, opt_state, x0, ctx, sig, noise):
        loss, grads = jax.value_and_grad(loss_fn)(p, x0, ctx, sig, noise)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    losses = []
    t0 = time.time()
    for i, ((x0, ctx), (sig, noise)) in enumerate(
        zip(data_stream(steps), sigma_noise_stream(steps, seed, sig_tab))
    ):
        params, opt_state, loss = step(
            params,
            opt_state,
            jnp.asarray(x0.transpose(0, 2, 3, 1)),
            jnp.asarray(ctx),
            jnp.asarray(sig),
            jnp.asarray(noise.transpose(0, 2, 3, 1)),
        )
        losses.append(float(loss))
        if i % 20 == 0:
            print(f"jax[{dtype}] step {i}: {losses[-1]:.4f} ({time.time()-t0:.0f}s)", flush=True)
    return losses


def ema(xs: np.ndarray, decay: float = 0.98) -> np.ndarray:
    out = np.empty_like(xs)
    m = xs[0]
    for i, x in enumerate(xs):
        m = decay * m + (1 - decay) * x
        out[i] = m / (1 - decay ** (i + 1))  # bias-corrected
    return out


def analyze(paths: list[str]) -> int:
    runs = [json.load(open(p)) for p in paths]
    torch_runs = [r for r in runs if r["side"] == "torch"]
    jax_runs = [r for r in runs if r["side"] == "jax"]
    assert len(torch_runs) >= 2, "need two torch seeds for the noise band"
    emas = {f"{r['side']}[{r.get('dtype', 'fp32')}#{r['seed']}]": ema(np.asarray(r["losses"]))
            for r in runs}
    t_emas = [ema(np.asarray(r["losses"])) for r in torch_runs]
    warm = len(t_emas[0]) // 4  # let the EMA settle
    band = float(np.abs(t_emas[0][warm:] - t_emas[1][warm:]).max())
    report = {"noise_band": band, "warmup": warm, "checks": []}
    ok = True
    for r in jax_runs:
        je = ema(np.asarray(r["losses"]))
        dev = float(np.abs(je[warm:] - t_emas[0][warm:]).max())
        passed = dev <= 1.5 * band
        ok &= passed
        report["checks"].append(
            {"run": f"jax[{r.get('dtype')}]", "max_ema_dev": dev,
             "limit": 1.5 * band, "pass": passed}
        )
    report["final_ema"] = {k: float(v[-1]) for k, v in emas.items()}
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["torch", "jax"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--out")
    ap.add_argument("--analyze", nargs="+")
    args = ap.parse_args()

    if args.analyze:
        return analyze(args.analyze)

    if args.side == "torch":
        # the torch side touches jax only for the shared sigma table; keep it
        # off the TPU so it can run concurrently with the jax side (the axon
        # plugin ignores the JAX_PLATFORMS env var — force via config)
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    losses = (run_torch if args.side == "torch" else lambda s, sd: run_jax(s, sd, args.dtype))(
        args.steps, args.seed
    )
    payload = {"side": args.side, "seed": args.seed, "steps": args.steps, "losses": losses}
    if args.side == "jax":
        payload["dtype"] = args.dtype
    with open(args.out, "w") as f:
        json.dump(payload, f)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
