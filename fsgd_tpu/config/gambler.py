"""Config extension for the gambler (ImbalanceDetection) subsystem.

Key-for-key parity with the reference's
ImbalanceDetection/imbalancedetection/config.py:4-76 (``add_gambler_config``),
so the fork's ``configs/quick_schedules/coco*.yaml`` sweeps merge unmodified.
"""

from .cfg_node import CfgNode as CN


def add_gambler_config(cfg):
    """Add ``MODEL.GAMBLER_HEAD`` config keys for gambler/detector GAN training."""
    _C = cfg
    _C.MODEL.GAMBLER_ON = True
    _C.MODEL.GAMBLER_HEAD = CN()
    # Variants: UnetGambler | LayeredUnetGambler | UnetLaurence
    _C.MODEL.GAMBLER_HEAD.NAME = "UnetGambler"
    _C.MODEL.GAMBLER_HEAD.LOAD_PRETRAINED_GAMBLER = False
    _C.MODEL.GAMBLER_HEAD.WEIGHTS = ""
    # Alternation schedule: how many consecutive iterations each player trains.
    _C.MODEL.GAMBLER_HEAD.GAMBLER_ITERATIONS = 100
    _C.MODEL.GAMBLER_HEAD.DETECTOR_ITERATIONS = 200
    # Input/output tensor layout codes, e.g. BCHW, BCAHW, L_BCAHW (per-FPN-level).
    _C.MODEL.GAMBLER_HEAD.GAMBLER_INPUT = "BCAHW"
    _C.MODEL.GAMBLER_HEAD.GAMBLER_OUTPUT = "BAHW"
    _C.MODEL.GAMBLER_HEAD.GAMBLER_IN_CHANNELS = 883
    _C.MODEL.GAMBLER_HEAD.GAMBLER_OUT_CHANNELS = 11
    # kappa multiplies the gambler loss inside the detector objective.
    _C.MODEL.GAMBLER_HEAD.GAMBLER_KAPPA = 2200
    _C.MODEL.GAMBLER_HEAD.REGRESSION_LAMBDA = 1
    _C.MODEL.GAMBLER_HEAD.GAMBLER_OUTSIDE_LAMBDA = 1.0
    _C.MODEL.GAMBLER_HEAD.GAMBLER_TEMPERATURE = 0.03
    # classification loss inside the gambler: "sigmoid" or "focal"
    _C.MODEL.GAMBLER_HEAD.GAMBLER_LOSS_MODE = "focal"
    # detector objective: "cls+reg-gambler" or "weighted_cls_with_gambler+reg"
    _C.MODEL.GAMBLER_HEAD.DETECTOR_LOSS_MODE = "cls+reg-gambler"
    _C.MODEL.GAMBLER_HEAD.NORMALIZE = True
    _C.MODEL.GAMBLER_HEAD.DATA_RANGE = [-128, 128]
    _C.MODEL.GAMBLER_HEAD.BILINEAR_UPSAMPLING = True
    # original image enters the gambler "downsample"d or through a "conv" tower
    _C.MODEL.GAMBLER_HEAD.IMAGE_MODE = "downsample"
    _C.MODEL.GAMBLER_HEAD.IMAGE_CHANNELS = 3
    _C.MODEL.GAMBLER_HEAD.FIXED_CHANNEL = 32
    _C.MODEL.GAMBLER_HEAD.NUM_CLASSES = 80
    # Feature map sizes entering the layered gambler (P3..P7 at 640px input).
    _C.MODEL.GAMBLER_HEAD.IN_LAYERS = [80, 40, 20, 10, 5]
    _C.MODEL.GAMBLER_HEAD.SAVE_VIS_FILES = False
    _C.MODEL.GAMBLER_HEAD.INIT = "random"
    _C.MODEL.GAMBLER_HEAD.PRIOR_PROB = 0.01
    _C.MODEL.GAMBLER_HEAD.OPTIMIZER = "sgd"
    # betting map is raised to gamma to control bet concentration
    _C.MODEL.GAMBLER_HEAD.GAMBLER_GAMMA = 1.0
    _C.MODEL.GAMBLER_HEAD.VIS_PERIOD = 1000
    # gambler's own optimizer hyperparameters (default to the detector's)
    _C.MODEL.GAMBLER_HEAD.BASE_LR = cfg.SOLVER.BASE_LR
    _C.MODEL.GAMBLER_HEAD.BIAS_LR_FACTOR = cfg.SOLVER.BIAS_LR_FACTOR
    _C.MODEL.GAMBLER_HEAD.WEIGHT_DECAY = _C.SOLVER.WEIGHT_DECAY
    _C.MODEL.GAMBLER_HEAD.WEIGHT_DECAY_NORM = _C.SOLVER.WEIGHT_DECAY_NORM
    _C.MODEL.GAMBLER_HEAD.WEIGHT_DECAY_BIAS = _C.SOLVER.WEIGHT_DECAY_BIAS
    _C.MODEL.GAMBLER_HEAD.MOMENTUM = _C.SOLVER.MOMENTUM
    return cfg
