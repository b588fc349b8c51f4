"""Assemble engines from reference-shaped YAML config nodes.

Translates the reference DiffusionEngine init_args (models/diffusion.py:36-125)
into our functional engine: jsonargparse's implicit instantiation becomes an
explicit walk of the node tree against config.registry.
"""

from __future__ import annotations

import logging
from typing import Optional

import optax

from neurosis_tpu.config import instantiate
from neurosis_tpu.config.loader import _adapt_kwargs
from neurosis_tpu.config.registry import resolve_class_path
from neurosis_tpu.models.autoencoder import AutoencoderKL
from neurosis_tpu.modules.encoders import GeneralConditioner, with_embedder_names
from neurosis_tpu.trainer.engine import DiffusionEngine

logger = logging.getLogger(__name__)


#: exact class_path → builder dispatch (replaces substring matching; the
#: reference's jsonargparse resolves these classes directly, trainer/cli.py:50-70)
ENGINE_BUILDERS: dict = {}


def build_engine(model_node: dict):
    """`model:` YAML node → engine, dispatched by its exact class_path."""
    if not ENGINE_BUILDERS:
        diffusion = build_diffusion_engine
        vae = build_autoencoding_engine
        ENGINE_BUILDERS.update(
            {
                "neurosis.models.DiffusionEngine": diffusion,
                "neurosis.models.diffusion.DiffusionEngine": diffusion,
                "neurosis_tpu.trainer.engine.DiffusionEngine": diffusion,
                "neurosis.models.autoencoder.AutoencodingEngine": vae,
                "neurosis.models.autoencoder.AutoencodingEngineLegacy": vae,
                "neurosis.models.autoencoder.AutoencoderKL": vae,
                "neurosis.models.autoencoder.AutoencoderKLInferenceWrapper": vae,
                "neurosis.models.autoencoder.DiffusersAutoencodingEngine": vae,
                "neurosis_tpu.trainer.vae_engine.AutoencodingEngine": vae,
            }
        )
    cls_path = model_node.get("class_path", "")
    builder = ENGINE_BUILDERS.get(cls_path)
    if builder is None:
        raise NotImplementedError(
            f"unsupported model class_path {cls_path!r}; known: {sorted(ENGINE_BUILDERS)}"
        )
    return builder(model_node)


_BF16_PRECISIONS = {"bf16", "bf16-mixed", "bf16-true", "16", "16-mixed", "16-true", 16}


def apply_precision(engine, precision):
    """trainer.precision (Lightning 'bf16-mixed' etc.) → bf16 compute dtype on
    the trainable backbone, fp32 text/VAE islands (SDXLMixedPrecision
    semantics, fsdp/diffusionpolicy.py:62-105: param/reduce dtype bf16 with
    tenc_fp32/vae_fp32 defaulting True). Norms already compute in fp32."""
    import dataclasses as _dc

    import jax.numpy as _jnp

    if precision not in _BF16_PRECISIONS:
        return engine
    try:
        if hasattr(engine, "model") and engine.model is not None:
            engine.model = _dc.replace(engine.model, dtype=_jnp.bfloat16)
        elif hasattr(engine, "encoder") and engine.encoder is not None:
            engine.encoder = _dc.replace(engine.encoder, dtype=_jnp.bfloat16)
            engine.decoder = _dc.replace(engine.decoder, dtype=_jnp.bfloat16)
    except (TypeError, ValueError) as e:  # non-dataclass module: leave as-is
        logger.warning(f"precision={precision!r} not applied: {e}")
    return engine


def build_optimizer(node: Optional[dict], scheduler_node: Optional[dict] = None):
    """optimizer/scheduler config → optax transformation (stacked by default,
    disable per-node with `stacked: false`)."""
    if node is None:
        node = {"class_path": "optax.adamw", "init_args": {"learning_rate": 1e-4}}
    cls = resolve_class_path(node["class_path"])
    kwargs = dict(node.get("init_args") or {})
    # torch-style lr names → optax
    if "lr" in kwargs:
        kwargs["learning_rate"] = kwargs.pop("lr")
    # schedule composition: if a scheduler is given and the optimizer takes a
    # learning_rate, feed the schedule in (multiplier × base lr handled by the
    # schedule itself for the reference's multiplier-style schedules)
    if scheduler_node is not None and "AdafactorScheduler" not in scheduler_node.get("class_path", ""):
        sched = instantiate(scheduler_node)
        base_lr = kwargs.get("learning_rate", 1.0)
        if callable(sched):
            kwargs["learning_rate"] = lambda step: float(base_lr) * float(sched(int(step)))
    kwargs = _adapt_kwargs(cls, kwargs)
    use_stacked = bool(node.get("stacked", True))
    opt = cls(**kwargs)
    if use_stacked and isinstance(opt, optax.GradientTransformation):
        # batch per-leaf update kernels by shape group (exact same math —
        # tests/test_stacked_optimizer.py; ~100ms/step on the SDXL UNet).
        # hybrid_optimizer compositions stay unwrapped: their label_fn reads
        # param paths, which vmapped slices don't have.
        from neurosis_tpu.optimizers.stacked import stacked

        opt = stacked(opt)
    return opt


def build_conditioner(node: dict) -> tuple[GeneralConditioner, list[int]]:
    """GeneralConditioner node → module + trainable embedder indices."""
    emb_nodes = (node.get("init_args") or {}).get("emb_models", [])
    embedders = []
    trainable = []
    for i, en in enumerate(emb_nodes):
        emb = instantiate(en)
        embedders.append(emb)
        if (en.get("init_args") or {}).get("is_trainable"):
            trainable.append(i)
    return GeneralConditioner(embedders=with_embedder_names(embedders)), trainable


def build_first_stage(node: Optional[dict]) -> Optional[AutoencoderKL]:
    if node is None:
        return None
    if "IdentityFirstStage" in (node.get("class_path") or ""):
        return None  # engine runs pixel-space (identity_first_stage flag)
    args = node.get("init_args") or {}
    ddconfig = args.get("ddconfig")
    if ddconfig is None:
        logger.warning("first_stage_model without ddconfig — skipping")
        return None
    return AutoencoderKL(ddconfig=dict(ddconfig), embed_dim=args.get("embed_dim", 4))


def build_autoencoding_engine(model_node: dict):
    """The reference AutoencodingEngine/AutoencoderKL `model:` node → VAE engine
    (models/autoencoder.py:134-505 config surface)."""
    import optax as _optax

    from neurosis_tpu.losses.vae_loss import AutoencoderPerceptual
    from neurosis_tpu.models.vae import Decoder, Encoder
    from neurosis_tpu.trainer.vae_engine import AutoencodingEngine

    args = dict(model_node.get("init_args") or {})
    dd = dict(args.get("ddconfig") or {})
    double_z = dd.pop("double_z", True)
    common = dict(
        ch=dd.get("ch", 128),
        ch_mult=dd.get("ch_mult", [1, 2, 4, 4]),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=dd.get("attn_resolutions", []),
        resolution=dd.get("resolution", 256),
        z_channels=dd.get("z_channels", 4),
        dropout=dd.get("dropout", 0.0),
        attn_type=dd.pop("attn_type", "vanilla"),
    )
    encoder = Encoder(in_channels=dd.get("in_channels", 3), double_z=double_z, **common)
    decoder = Decoder(out_ch=dd.get("out_ch", 3), **common)

    loss = instantiate(args["loss"]) if isinstance(args.get("loss"), dict) else AutoencoderPerceptual()
    # pluggable bottleneck (regularizer_config: KL sample/mode or VQ family)
    regularizer = (
        instantiate(args["regularizer_config"])
        if isinstance(args.get("regularizer_config"), dict)
        else None
    )
    g_opt = build_optimizer(args.get("optimizer"), args.get("scheduler"))
    d_opt = build_optimizer(args.get("disc_optimizer")) if args.get("disc_optimizer") else _optax.adam(1e-4)

    disc_start = getattr(loss, "disc_start", -1)
    engine = AutoencodingEngine(
        encoder=encoder,
        decoder=decoder,
        loss=loss,
        regularizer=regularizer,
        g_optimizer=g_opt,
        d_optimizer=d_opt,
        kl_weight=float(args.get("kl_weight", 0.0)),
        input_key=args.get("input_key", "image"),
        use_ema=bool(args.get("use_ema", False)),
        disc_start=disc_start if isinstance(disc_start, int) else -1,
    )
    engine.ckpt_path = args.get("ckpt_path")
    return engine


def build_diffusion_engine(model_node: dict) -> DiffusionEngine:
    """The reference `model:` YAML node → DiffusionEngine."""
    args = dict(model_node.get("init_args") or {})

    unet = instantiate(args["model"])
    denoiser = instantiate(args["denoiser"])
    loss_fn = instantiate(args["loss_fn"]) if "loss_fn" in args else None
    sampler = instantiate(args["sampler"]) if "sampler" in args else None
    conditioner, trainable_idx = build_conditioner(args["conditioner"])
    first_stage = build_first_stage(args.get("first_stage_model"))
    optimizer = build_optimizer(args.get("optimizer"), args.get("scheduler"))

    # per-module LR param groups (models/diffusion.py:261-296): the UNet trains
    # at base_lr; each trainable embedder with its own base_lr gets an LR-scaled
    # copy of the optimizer via multi_transform.
    emb_nodes = (args["conditioner"].get("init_args") or {}).get("emb_models", [])
    base_lr = args.get("base_lr")
    group_scales = {}
    for i in emb_nodes and trainable_idx or []:
        ia = emb_nodes[i].get("init_args") or {}
        if ia.get("base_lr") is not None and base_lr:
            group_scales[f"embedders.{i}"] = float(ia["base_lr"]) / float(base_lr)
    if group_scales:
        import optax as _optax

        from neurosis_tpu.optimizers import hybrid_optimizer

        # hybrid (multi_transform) label_fn reads param paths, which the
        # stacked wrapper's vmapped slices don't have — use the plain
        # (unstacked) optimizer inside the hybrid composition.
        opt_node = dict(args.get("optimizer") or {})
        opt_node["stacked"] = False
        optimizer = build_optimizer(opt_node if args.get("optimizer") else None, args.get("scheduler"))
        opts = {"default": optimizer}
        for label, scale in group_scales.items():
            opts[label] = _optax.chain(optimizer, _optax.scale(scale))

        def label_fn(path, leaf):
            for label in group_scales:
                if any(label in p for p in path):
                    return label
            return "default"

        optimizer = hybrid_optimizer(opts, label_fn)

    engine = DiffusionEngine(
        model=unet,
        denoiser=denoiser,
        loss_fn=loss_fn,
        conditioner=conditioner,
        first_stage=first_stage,
        identity_first_stage="IdentityFirstStage"
        in ((args.get("first_stage_model") or {}).get("class_path") or ""),
        optimizer=optimizer,
        sampler=sampler,
        scale_factor=args.get("scale_factor", 0.18215),
        input_key=args.get("input_key", "image"),
        use_ema=bool(args.get("use_ema", False)),
        trainable_embedders=tuple(trainable_idx),
        log_sigmas=bool(args.get("log_sigmas", False)),
    )
    engine.ckpt_path = args.get("ckpt_path")
    engine.loss_hooks = [instantiate(h) for h in args.get("forward_hooks", []) or []]
    return engine
