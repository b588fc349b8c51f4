"""class_path registry — resolves reference-style dotted names to our components.

The contract (SURVEY.md §5.6): consume the same YAML shape as the reference
(`class_path`/`init_args`), so `neurosis.modules.diffusion.UNetModel` must
resolve to our Flax UNetModel, etc. Unknown paths fall back to a real import
(so `neurosis_tpu.*`, `optax.*`, stdlib paths work directly).
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

REGISTRY: Dict[str, Any] = {}


def register(*names: str):
    def deco(obj):
        for n in names:
            REGISTRY[n] = obj
        return obj

    return deco


def _hooks():
    import neurosis_tpu.hooks as hooks

    return hooks


def _attr(module: str, name: str):
    """Deferred attribute lookup (heavy modules import only when _populate
    runs; mongo datasets additionally keep pymongo/s3fs lazy internally)."""
    return getattr(importlib.import_module(module), name)


def _cb_cls(name: str):
    return _attr("neurosis_tpu.trainer.callbacks", name)


def _engine_cls(name: str):
    return _attr("neurosis_tpu.trainer.engine", name)


def _vae_engine_cls():
    return _attr("neurosis_tpu.trainer.vae_engine", "AutoencodingEngine")


def _enc_misc(name: str):
    return _attr("neurosis_tpu.modules.encoders.misc", name)


def _ae_cls(name: str):
    return _attr("neurosis_tpu.models.autoencoder", name)


def _mongo_cls(name: str):
    return _attr("neurosis_tpu.data.mongo", name)


def _populate():
    """Lazy mapping of reference class paths → our components."""
    from neurosis_tpu.data.aspect import AspectBucketList, SDXLBucketList, WDXLBucketList, WDXLBucketList2
    from neurosis_tpu.data.imagefolder import FolderSquareDataset, FolderVAEDataset, ImageFolderDataset
    from neurosis_tpu.diffusion import (
        DiscreteDenoiser,
        Denoiser,
        DiscreteSigmaGenerator,
        CosineScheduleSigmaGenerator,
        TanScheduleSigmaGenerator,
        EDMSigmaGenerator,
        EDMcDiscretization,
        EDMcSimpleDiscretization,
        EDMDiscretization,
        EDMPreconditioning,
        EDMWeighting,
        EpsPreconditioning,
        EpsWeighting,
        LegacyDDPMDiscretization,
        MinSNRGammaModifier,
        RectifiedFlowComfyDiscretization,
        RectifiedFlowComfyPreconditioning,
        RectifiedFlowComfySigmaGenerator,
        RectifiedFlowComfyWeighting,
        RectifiedFlowDiscretization,
        RectifiedFlowSigmaGenerator,
        RectifiedFlowWeighting,
        RectifiedFlowXLPreconditioning,
        StandardDiffusionLoss,
        TanZeroSNRDiscretization,
        UnitWeighting,
        VPreconditioning,
        VPreconditioningWithEDMcNoise,
    )
    from neurosis_tpu.losses.discriminator_loss import (
        GeneralLPIPSWithDiscriminator,
        VQLPIPSWithDiscriminator,
    )
    from neurosis_tpu.losses.dreamsim import AutoencoderDreamsim
    from neurosis_tpu.modules.regularizers import (
        DiagonalGaussianRegularizer,
        EMAVectorQuantizer,
        GumbelQuantizer,
        IdentityRegularizer,
        VectorQuantizer,
        VectorQuantizerWithInputProjection,
    )
    from neurosis_tpu.losses.vae_loss import AutoencoderLPIPSWithDiscr, AutoencoderPerceptual, LatentLPIPS
    from neurosis_tpu.models.unet import UNetModel
    from neurosis_tpu.models.vae import Decoder, Encoder, Model
    from neurosis_tpu.modules.encoders import (
        ConcatTimestepEmbedderND,
        FrozenCLIPEmbedder,
        FrozenCLIPT5Encoder,
        FrozenOpenCLIPEmbedder2,
        GeneralConditioner,
        IdentityEncoder,
    )
    from neurosis_tpu.optimizers import Adafactor, adafactor_relative_step_schedule, came
    from neurosis_tpu.sampling import (
        DPMPP2MSampler,
        DPMPP2SAncestralSampler,
        EulerAncestralSampler,
        EulerEDMSampler,
        HeunEDMSampler,
        IdentityGuider,
        LinearMultistepSampler,
        VanillaCFG,
    )
    import neurosis_tpu.schedulers as schedulers

    mapping = {
        # models / engines (engine assembly handled by trainer.builder)
        "neurosis.modules.diffusion.UNetModel": UNetModel,
        "neurosis.modules.diffusion.openaimodel.UNetModel": UNetModel,
        "neurosis.modules.diffusion.model.Encoder": Encoder,
        "neurosis.modules.diffusion.model.Decoder": Decoder,
        "neurosis.modules.diffusion.model.Model": Model,
        # diffusion math
        "neurosis.modules.diffusion.Denoiser": Denoiser,
        "neurosis.modules.diffusion.DiscreteDenoiser": DiscreteDenoiser,
        "neurosis.modules.diffusion.EpsPreconditioning": EpsPreconditioning,
        "neurosis.modules.diffusion.VPreconditioning": VPreconditioning,
        "neurosis.modules.diffusion.VPreconditioningWithEDMcNoise": VPreconditioningWithEDMcNoise,
        "neurosis.modules.diffusion.EDMPreconditioning": EDMPreconditioning,
        "neurosis.modules.diffusion.RectifiedFlowXLPreconditioning": RectifiedFlowXLPreconditioning,
        "neurosis.modules.diffusion.RectifiedFlowComfyPreconditioning": RectifiedFlowComfyPreconditioning,
        "neurosis.modules.diffusion.UnitWeighting": UnitWeighting,
        "neurosis.modules.diffusion.EpsWeighting": EpsWeighting,
        "neurosis.modules.diffusion.EDMWeighting": EDMWeighting,
        "neurosis.modules.diffusion.RectifiedFlowWeighting": RectifiedFlowWeighting,
        "neurosis.modules.diffusion.RectifiedFlowComfyWeighting": RectifiedFlowComfyWeighting,
        "neurosis.modules.diffusion.MinSNRGammaModifier": MinSNRGammaModifier,
        "neurosis.modules.diffusion.LegacyDDPMDiscretization": LegacyDDPMDiscretization,
        "neurosis.modules.diffusion.EDMcDiscretization": EDMcDiscretization,
        "neurosis.modules.diffusion.EDMcSimpleDiscretization": EDMcSimpleDiscretization,
        "neurosis.modules.diffusion.EDMDiscretization": EDMDiscretization,
        "neurosis.modules.diffusion.TanZeroSNRDiscretization": TanZeroSNRDiscretization,
        "neurosis.modules.diffusion.RectifiedFlowDiscretization": RectifiedFlowDiscretization,
        "neurosis.modules.diffusion.RectifiedFlowComfyDiscretization": RectifiedFlowComfyDiscretization,
        "neurosis.modules.diffusion.StandardDiffusionLoss": StandardDiffusionLoss,
        "neurosis.modules.diffusion.sigma_sampling.DiscreteSampling": DiscreteSigmaGenerator,
        "neurosis.modules.diffusion.sigma_sampling.EDMSampling": EDMSigmaGenerator,
        "neurosis.modules.diffusion.sampling.sigma_generators.DiscreteSigmaGenerator": DiscreteSigmaGenerator,
        "neurosis.modules.diffusion.sampling.sigma_generators.EDMSigmaGenerator": EDMSigmaGenerator,
        "neurosis.modules.diffusion.sampling.sigma_generators.CosineScheduleSigmaGenerator": CosineScheduleSigmaGenerator,
        "neurosis.modules.diffusion.sampling.sigma_generators.TanScheduleSigmaGenerator": TanScheduleSigmaGenerator,
        "neurosis.modules.diffusion.sampling.sigma_generators.RectifiedFlowSigmaGenerator": RectifiedFlowSigmaGenerator,
        "neurosis.modules.diffusion.sampling.sigma_generators.RectifiedFlowComfySigmaGenerator": RectifiedFlowComfySigmaGenerator,
        # samplers / guiders
        "neurosis.modules.diffusion.sampling.EulerEDMSampler": EulerEDMSampler,
        "neurosis.modules.diffusion.sampling.HeunEDMSampler": HeunEDMSampler,
        "neurosis.modules.diffusion.sampling.EulerAncestralSampler": EulerAncestralSampler,
        "neurosis.modules.diffusion.sampling.DPMPP2SAncestralSampler": DPMPP2SAncestralSampler,
        "neurosis.modules.diffusion.sampling.DPMPP2MSampler": DPMPP2MSampler,
        "neurosis.modules.diffusion.sampling.LinearMultistepSampler": LinearMultistepSampler,
        "neurosis.modules.guidance.VanillaCFG": VanillaCFG,
        "neurosis.modules.guidance.IdentityGuider": IdentityGuider,
        # conditioner
        "neurosis.modules.encoders.GeneralConditioner": GeneralConditioner,
        "neurosis.models.text_encoder.FrozenCLIPEmbedder": FrozenCLIPEmbedder,
        "neurosis.models.text_encoder.FrozenOpenCLIPEmbedder2": FrozenOpenCLIPEmbedder2,
        "neurosis.models.text_encoder.FrozenCLIPT5Encoder": FrozenCLIPT5Encoder,
        "neurosis.modules.encoders.metadata.ConcatTimestepEmbedderND": ConcatTimestepEmbedderND,
        "neurosis.modules.encoders.misc.IdentityEncoder": IdentityEncoder,
        "neurosis.modules.encoders.classed.ClassEmbedder": _enc_misc("ClassEmbedder"),
        "neurosis.modules.encoders.classed.ClassEmbedderForMultiCond": _enc_misc("ClassEmbedderForMultiCond"),
        "neurosis.modules.encoders.metadata.GaussianEncoder": _enc_misc("GaussianEncoder"),
        "neurosis.modules.encoders.embedding.SpatialRescaler": _enc_misc("SpatialRescaler"),
        "neurosis.modules.encoders.lowscale.LowScaleEncoder": _enc_misc("LowScaleEncoder"),
        # task-module class paths (the CLI builds engines from the YAML node
        # via trainer/builder.py; these resolve for programmatic use)
        "neurosis.models.DiffusionEngine": _engine_cls("DiffusionEngine"),
        "neurosis.models.diffusion.DiffusionEngine": _engine_cls("DiffusionEngine"),
        "neurosis.models.AutoencoderKL": _ae_cls("AutoencoderKL"),
        "neurosis.models.autoencoder.AutoencoderKL": _ae_cls("AutoencoderKL"),
        "neurosis.models.autoencoder.AutoencodingEngine": _vae_engine_cls(),
        "neurosis.models.AutoencodingEngine": _vae_engine_cls(),
        # autoencoder wrappers (models/autoencoder.py:640-700)
        "neurosis.models.IdentityFirstStage": _ae_cls("IdentityFirstStage"),
        "neurosis.models.autoencoder.IdentityFirstStage": _ae_cls("IdentityFirstStage"),
        "neurosis.models.AutoencoderKLInferenceWrapper": _ae_cls("AutoencoderKLInferenceWrapper"),
        "neurosis.models.autoencoder.AutoencoderKLInferenceWrapper": _ae_cls("AutoencoderKLInferenceWrapper"),
        "neurosis.models.AEIntegerWrapper": _ae_cls("AEIntegerWrapper"),
        "neurosis.models.autoencoder.AEIntegerWrapper": _ae_cls("AEIntegerWrapper"),
        # regularizers (quantize.py / regularizers/__init__.py)
        "neurosis.modules.autoencoding.regularizers.DiagonalGaussianRegularizer": DiagonalGaussianRegularizer,
        "neurosis.modules.autoencoding.regularizers.IdentityRegularizer": IdentityRegularizer,
        "neurosis.modules.autoencoding.regularizers.quantize.VectorQuantizer": VectorQuantizer,
        "neurosis.modules.autoencoding.regularizers.quantize.GumbelQuantizer": GumbelQuantizer,
        "neurosis.modules.autoencoding.regularizers.quantize.EMAVectorQuantizer": EMAVectorQuantizer,
        "neurosis.modules.autoencoding.regularizers.quantize.VectorQuantizerWithInputProjection": VectorQuantizerWithInputProjection,
        # losses
        "neurosis.modules.autoencoding.losses.AutoencoderPerceptual": AutoencoderPerceptual,
        "neurosis.modules.autoencoding.losses.AutoencoderLPIPSWithDiscr": AutoencoderLPIPSWithDiscr,
        "neurosis.modules.autoencoding.losses.GeneralLPIPSWithDiscriminator": GeneralLPIPSWithDiscriminator,
        "neurosis.modules.autoencoding.losses.VQLPIPSWithDiscriminator": VQLPIPSWithDiscriminator,
        "neurosis.modules.autoencoding.losses.AutoencoderDreamsim": AutoencoderDreamsim,
        "neurosis.modules.autoencoding.losses.LatentLPIPS": LatentLPIPS,
        # data
        "neurosis.dataset.aspect.AspectBucketList": AspectBucketList,
        "neurosis.dataset.aspect.SDXLBucketList": SDXLBucketList,
        "neurosis.dataset.aspect.WDXLBucketList": WDXLBucketList,
        "neurosis.dataset.aspect.WDXLBucketList2": WDXLBucketList2,
        "neurosis.dataset.imagefolder.ImageFolderDataset": ImageFolderDataset,
        "neurosis.dataset.imagefolder.ImageFolderModule": ImageFolderDataset,
        "neurosis.dataset.imagefolder.FolderSquareDataset": FolderSquareDataset,
        "neurosis.dataset.imagefolder.FolderSquareModule": FolderSquareDataset,
        "neurosis.dataset.imagefolder.FolderVAEDataset": FolderVAEDataset,
        "neurosis.dataset.imagefolder.FolderVAEModule": FolderVAEDataset,
        "neurosis.dataset.mongo.MongoAspectDataset": _mongo_cls("MongoAspectDataset"),
        "neurosis.dataset.mongo.MongoAspectModule": _mongo_cls("MongoAspectDataset"),
        "neurosis.dataset.mongo.MongoSquareDataset": _mongo_cls("MongoSquareDataset"),
        "neurosis.dataset.mongo.MongoSquareModule": _mongo_cls("MongoSquareDataset"),
        "neurosis.dataset.mongo.MongoVAEDataset": _mongo_cls("MongoVAEDataset"),
        "neurosis.dataset.mongo.MongoVAEModule": _mongo_cls("MongoVAEDataset"),
        # fully-qualified submodule spellings (mongo/{aspect,nobucket,nocaption}.py)
        "neurosis.dataset.mongo.aspect.MongoAspectDataset": _mongo_cls("MongoAspectDataset"),
        "neurosis.dataset.mongo.aspect.MongoAspectModule": _mongo_cls("MongoAspectDataset"),
        "neurosis.dataset.mongo.nobucket.MongoSquareDataset": _mongo_cls("MongoSquareDataset"),
        "neurosis.dataset.mongo.nobucket.MongoSquareModule": _mongo_cls("MongoSquareDataset"),
        "neurosis.dataset.mongo.nocaption.MongoVAEDataset": _mongo_cls("MongoVAEDataset"),
        "neurosis.dataset.mongo.nocaption.MongoVAEModule": _mongo_cls("MongoVAEDataset"),
        # optimizers / schedulers
        # loss hooks (config contract: configs/hook/loss_scale.example.yml)
        "neurosis.dataset.processing.TagFrequencyHook": _hooks().TagFrequencyHook,
        "neurosis.dataset.processing.TagFreqScale": _hooks().TagFreqScale,
        "neurosis.dataset.processing.TagRewards": _hooks().TagRewards,
        # optimizers / schedulers
        "neurosis.optimizers.Adafactor": Adafactor,
        "neurosis.optimizers.AdafactorScheduler": adafactor_relative_step_schedule,
        # Lightning callback class paths → our callbacks (consumed by the CLI)
        "neurosis.trainer.profile.NeurosisProfiler": _attr("neurosis_tpu.trainer.profile", "NeurosisProfiler"),
        "neurosis.trainer.profile.profiler.NeurosisProfiler": _attr("neurosis_tpu.trainer.profile", "NeurosisProfiler"),
        "NeurosisProfiler": _attr("neurosis_tpu.trainer.profile", "NeurosisProfiler"),
        "DeviceStatsMonitor": _cb_cls("DeviceStatsCallback"),
        "lightning.pytorch.callbacks.DeviceStatsMonitor": _cb_cls("DeviceStatsCallback"),
        "lightning.pytorch.callbacks.ModelSummary": _cb_cls("ModelSummaryCallback"),
        "neurosis.optimizers.CAME": came,
        "neurosis.optimizers.came.CAME": came,
        "neurosis.schedulers.CosineWithWarmUp": schedulers.cosine_with_warmup,
        "neurosis.schedulers.CosineWithHardRestartsAndWarmUp": schedulers.cosine_with_hard_restarts,
        "neurosis.schedulers.LambdaWarmUpCosineScheduler2": schedulers.lambda_warmup_cosine_scheduler2,
        "neurosis.schedulers.LambdaLinearScheduler": schedulers.lambda_linear_scheduler,
        "neurosis.schedulers.CosineAnnealingWarmupRestarts": schedulers.cosine_annealing_warmup_restarts,
        "neurosis.schedulers.CosineDecayWithWarmup": schedulers.cosine_decay_with_warmup,
        "neurosis.schedulers.CosineWarmupSchedule": schedulers.cosine_warmup_schedule,
        "neurosis.schedulers.CosineWarmupStagedSchedule": schedulers.cosine_warmup_schedule_staged,
        "neurosis.schedulers.LinearWarmupSchedule": schedulers.linear_warmup_schedule,
        "neurosis.schedulers.LegacyCosineAnnealingWarmupRestarts": schedulers.legacy_cosine_annealing_warmup_restarts,
    }
    REGISTRY.update({k: v for k, v in mapping.items() if k not in REGISTRY})


def resolve_class_path(path: str) -> Any:
    if not REGISTRY:
        _populate()
    if path in REGISTRY:
        return REGISTRY[path]
    # bitsandbytes AdamW8bit → our TPU-native 8-bit AdamW (blockwise-
    # quantized moments, optimizers/adamw8bit.py)
    if path == "bitsandbytes.optim.AdamW8bit":
        from neurosis_tpu.optimizers.adamw8bit import adamw8bit

        return adamw8bit
    # torch.optim class paths → optax equivalents
    _TORCH_OPT = {
        "torch.optim.AdamW": "adamw",
        "torch.optim.Adam": "adam",
        "torch.optim.SGD": "sgd",
    }
    if path in _TORCH_OPT:
        import optax

        return getattr(optax, _TORCH_OPT[path])
    module, _, name = path.rpartition(".")
    try:
        return getattr(importlib.import_module(module), name)
    except (ImportError, AttributeError) as e:
        raise ImportError(f"cannot resolve class_path {path!r}: {e}") from e
