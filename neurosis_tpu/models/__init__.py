"""Model backbones: UNet (SD/SDXL), VAE, text encoders."""
