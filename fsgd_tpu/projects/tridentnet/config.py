"""TridentNet config extension (parity with
projects/TridentNet/tridentnet/config.py)."""

from fsgd_tpu.config import CfgNode as CN


def add_tridentnet_config(cfg):
    _C = cfg
    _C.MODEL.TRIDENT = CN()
    # number of branches / dilations for trident blocks
    _C.MODEL.TRIDENT.NUM_BRANCH = 3
    _C.MODEL.TRIDENT.BRANCH_DILATIONS = [1, 2, 3]
    # the stage where trident blocks replace standard bottlenecks
    _C.MODEL.TRIDENT.TRIDENT_STAGE = "res4"
    # at test time, TridentNet-Fast uses only this branch
    _C.MODEL.TRIDENT.TEST_BRANCH_IDX = 1
    return cfg
