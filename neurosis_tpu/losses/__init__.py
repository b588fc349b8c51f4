from .functions import (
    batch_l1_loss,
    batch_mse_loss,
    batch_nll_loss,
    hinge_d_loss,
    vanilla_d_loss,
    get_discr_loss_fn,
)
from .types import DiffusionObjective, GenericLoss, DiscriminatorLoss, PerceptualLoss

__all__ = [
    "batch_l1_loss",
    "batch_mse_loss",
    "batch_nll_loss",
    "hinge_d_loss",
    "vanilla_d_loss",
    "get_discr_loss_fn",
    "DiffusionObjective",
    "GenericLoss",
    "DiscriminatorLoss",
    "PerceptualLoss",
]

# heavier loss modules import lazily elsewhere to keep package import light:
#   .lpips (LPIPS), .patchgan (NLayerDiscriminator),
#   .vae_loss (AutoencoderPerceptual, AutoencoderLPIPSWithDiscr),
#   .discriminator_loss (GeneralLPIPSWithDiscriminator)
