from .gambler_heads import (
    GAMBLER_HEAD_REGISTRY,
    LayeredUnetGambler,
    UnetGambler,
    UnetLaurence,
    build_detector,
    build_gambler,
    calc_cls_loss,
    calc_gambler_loss,
    get_loss_upper_bound,
)
from .gan_trainer import GANTrainer, build_optimizer_gambler
from .unet import LayeredUnet, UNet, UnetGenerator

__all__ = [k for k in globals().keys() if not k.startswith("_")]
