#!/usr/bin/env python
"""Generate the standard YAML config tree.

Emits the config families the reference ships (Base-RCNN-FPN/C4/DilatedC5,
Base-RetinaNet, COCO-Detection / InstanceSegmentation / Keypoints /
PanopticSegmentation, LVIS, PascalVOC, quick_schedules, ImbalanceDetection) so
users of the reference find the same config names here.  Values follow the
standard detectron2 schedules (1x = 90k iters at batch 16, 3x = 270k).
"""

import os

import yaml

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def w(path, cfg):
    full = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    print("wrote", path)


BASE_RCNN_FPN = {
    "MODEL": {
        "META_ARCHITECTURE": "GeneralizedRCNN",
        "BACKBONE": {"NAME": "build_resnet_fpn_backbone"},
        "RESNETS": {"OUT_FEATURES": ["res2", "res3", "res4", "res5"]},
        "FPN": {"IN_FEATURES": ["res2", "res3", "res4", "res5"]},
        "ANCHOR_GENERATOR": {
            "SIZES": [[32], [64], [128], [256], [512]],
            "ASPECT_RATIOS": [[0.5, 1.0, 2.0]],
        },
        "RPN": {
            "IN_FEATURES": ["p2", "p3", "p4", "p5", "p6"],
            "PRE_NMS_TOPK_TRAIN": 2000,
            "PRE_NMS_TOPK_TEST": 1000,
            "POST_NMS_TOPK_TRAIN": 1000,
            "POST_NMS_TOPK_TEST": 1000,
        },
        "ROI_HEADS": {"NAME": "StandardROIHeads", "IN_FEATURES": ["p2", "p3", "p4", "p5"]},
        "ROI_BOX_HEAD": {"NAME": "FastRCNNConvFCHead", "NUM_FC": 2, "POOLER_RESOLUTION": 7},
        "ROI_MASK_HEAD": {"NAME": "MaskRCNNConvUpsampleHead", "NUM_CONV": 4, "POOLER_RESOLUTION": 14},
    },
    "DATASETS": {"TRAIN": ["coco_2017_train"], "TEST": ["coco_2017_val"]},
    "SOLVER": {"IMS_PER_BATCH": 16, "BASE_LR": 0.02, "STEPS": [60000, 80000], "MAX_ITER": 90000},
    "INPUT": {"MIN_SIZE_TRAIN": [640, 672, 704, 736, 768, 800]},
    "VERSION": 2,
}

BASE_RCNN_C4 = {
    "MODEL": {
        "META_ARCHITECTURE": "GeneralizedRCNN",
        "RPN": {"PRE_NMS_TOPK_TEST": 6000, "POST_NMS_TOPK_TEST": 1000},
        "ROI_HEADS": {"NAME": "Res5ROIHeads"},
    },
    "DATASETS": {"TRAIN": ["coco_2017_train"], "TEST": ["coco_2017_val"]},
    "SOLVER": {"IMS_PER_BATCH": 16, "BASE_LR": 0.02, "STEPS": [60000, 80000], "MAX_ITER": 90000},
    "INPUT": {"MIN_SIZE_TRAIN": [640, 672, 704, 736, 768, 800]},
    "VERSION": 2,
}

BASE_RCNN_DC5 = {
    "_BASE_": "Base-RCNN-C4.yaml",
    "MODEL": {
        "RESNETS": {"OUT_FEATURES": ["res5"], "RES5_DILATION": 2},
        "RPN": {"IN_FEATURES": ["res5"]},
        "ROI_HEADS": {"NAME": "StandardROIHeads", "IN_FEATURES": ["res5"]},
        "ROI_BOX_HEAD": {"NAME": "FastRCNNConvFCHead", "NUM_FC": 2, "POOLER_RESOLUTION": 7},
        "ROI_MASK_HEAD": {"NAME": "MaskRCNNConvUpsampleHead", "NUM_CONV": 4, "POOLER_RESOLUTION": 14},
    },
}

BASE_RETINANET = {
    "MODEL": {
        "META_ARCHITECTURE": "RetinaNet",
        "BACKBONE": {"NAME": "build_retinanet_resnet_fpn_backbone"},
        "RESNETS": {"OUT_FEATURES": ["res3", "res4", "res5"]},
        "FPN": {"IN_FEATURES": ["res3", "res4", "res5"]},
        "ANCHOR_GENERATOR": {
            "SIZES": [
                [x, x * 2 ** (1.0 / 3), x * 2 ** (2.0 / 3)] for x in [32, 64, 128, 256, 512]
            ]
        },
        "RETINANET": {"IOU_THRESHOLDS": [0.4, 0.5], "IOU_LABELS": [0, -1, 1]},
    },
    "DATASETS": {"TRAIN": ["coco_2017_train"], "TEST": ["coco_2017_val"]},
    "SOLVER": {"IMS_PER_BATCH": 16, "BASE_LR": 0.01, "STEPS": [60000, 80000], "MAX_ITER": 90000},
    "INPUT": {"MIN_SIZE_TRAIN": [640, 672, 704, 736, 768, 800]},
    "VERSION": 2,
}


def sched(mult):
    if mult == 1:
        return {"STEPS": [60000, 80000], "MAX_ITER": 90000}
    return {"STEPS": [210000, 250000], "MAX_ITER": 270000}


def resnet(depth):
    return {"WEIGHTS": "", "RESNETS": {"DEPTH": depth}}


def main():
    w("Base-RCNN-FPN.yaml", BASE_RCNN_FPN)
    w("Base-RCNN-C4.yaml", BASE_RCNN_C4)
    w("Base-RCNN-DilatedC5.yaml", BASE_RCNN_DC5)
    w("Base-RetinaNet.yaml", BASE_RETINANET)

    # COCO-Detection
    for depth in (50, 101):
        for base, tag in [("Base-RCNN-FPN.yaml", "FPN"), ("Base-RCNN-C4.yaml", "C4"), ("Base-RCNN-DilatedC5.yaml", "DC5")]:
            for mult in (1, 3):
                if depth == 101 and mult == 1:
                    continue
                w(
                    "COCO-Detection/faster_rcnn_R_{}_{}_{}x.yaml".format(depth, tag, mult),
                    {"_BASE_": "../" + base, "MODEL": {"MASK_ON": False, **resnet(depth)}, "SOLVER": sched(mult)},
                )
        for mult in (1, 3):
            if depth == 101 and mult == 1:
                continue
            w(
                "COCO-Detection/retinanet_R_{}_FPN_{}x.yaml".format(depth, mult),
                {"_BASE_": "../Base-RetinaNet.yaml", "MODEL": resnet(depth), "SOLVER": sched(mult)},
            )
    w(
        "COCO-Detection/rpn_R_50_FPN_1x.yaml",
        {
            "_BASE_": "../Base-RCNN-FPN.yaml",
            # FPN keeps Base-RCNN-FPN's PRE_NMS_TOPK_TEST 1000 (only the C4
            # variant raises it to 12000, matching the reference yamls)
            "MODEL": {"META_ARCHITECTURE": "ProposalNetwork", "MASK_ON": False, **resnet(50),
                      "RPN": {"POST_NMS_TOPK_TEST": 2000}},
        },
    )
    w(
        "COCO-Detection/rpn_R_50_C4_1x.yaml",
        {"_BASE_": "../Base-RCNN-C4.yaml", "MODEL": {"META_ARCHITECTURE": "ProposalNetwork", "MASK_ON": False, **resnet(50),
                                                      "RPN": {"PRE_NMS_TOPK_TEST": 12000, "POST_NMS_TOPK_TEST": 2000}}},
    )
    w(
        "COCO-Detection/fast_rcnn_R_50_FPN_1x.yaml",
        {"_BASE_": "../Base-RCNN-FPN.yaml", "MODEL": {"MASK_ON": False, "LOAD_PROPOSALS": True, **resnet(50),
                                                       "PROPOSAL_GENERATOR": {"NAME": "PrecomputedProposals"}},
         "DATASETS": {"PROPOSAL_FILES_TRAIN":
                       ["detectron2://COCO-Detection/rpn_R_50_FPN_1x/137258492/coco_2017_train_box_proposals_21bc3a.pkl"],
                       "PROPOSAL_FILES_TEST":
                       ["detectron2://COCO-Detection/rpn_R_50_FPN_1x/137258492/coco_2017_val_box_proposals_ee0dad.pkl"],
                       "TRAIN": ["coco_2017_train"], "TEST": ["coco_2017_val"]}},
    )
    w(
        "COCO-Detection/faster_rcnn_X_101_32x8d_FPN_3x.yaml",
        {"_BASE_": "../Base-RCNN-FPN.yaml",
         "MODEL": {"MASK_ON": False,
                    "WEIGHTS": "detectron2://ImageNetPretrained/FAIR/X-101-32x8d.pkl",
                    "PIXEL_STD": [57.375, 57.12, 58.395],  # C2 ResNeXt stats
                    "RESNETS": {"DEPTH": 101, "NUM_GROUPS": 32, "WIDTH_PER_GROUP": 8,
                                 "STRIDE_IN_1X1": False}},
         "SOLVER": sched(3)},
    )

    # COCO-InstanceSegmentation
    for depth in (50, 101):
        for mult in (1, 3):
            if depth == 101 and mult == 1:
                continue
            w(
                "COCO-InstanceSegmentation/mask_rcnn_R_{}_FPN_{}x.yaml".format(depth, mult),
                {"_BASE_": "../Base-RCNN-FPN.yaml", "MODEL": {"MASK_ON": True, **resnet(depth)}, "SOLVER": sched(mult)},
            )
    w("COCO-InstanceSegmentation/mask_rcnn_R_50_C4_1x.yaml",
      {"_BASE_": "../Base-RCNN-C4.yaml", "MODEL": {"MASK_ON": True, **resnet(50)}})

    # COCO-Keypoints (reference Base-Keypoint-RCNN-FPN.yaml: KEYPOINT_ON,
    # NUM_CLASSES 1, ROI_BOX_HEAD.SMOOTH_L1_BETA 0.5, RPN.POST_NMS_TOPK_TRAIN
    # 1500 — and NO RPN.SMOOTH_L1_BETA override: that 0.2 belongs only to the
    # quick_schedules / Detectron1-Comparisons keypoint configs)
    w("COCO-Keypoints/Base-Keypoint-RCNN-FPN.yaml", {
        "_BASE_": "../Base-RCNN-FPN.yaml",
        "MODEL": {"KEYPOINT_ON": True, "ROI_HEADS": {"NUM_CLASSES": 1},
                   "ROI_BOX_HEAD": {"SMOOTH_L1_BETA": 0.5},
                   "RPN": {"POST_NMS_TOPK_TRAIN": 1500}},
        "DATASETS": {"TRAIN": ["keypoints_coco_2017_train"], "TEST": ["keypoints_coco_2017_val"]},
    })
    for mult in (1, 3):
        w("COCO-Keypoints/keypoint_rcnn_R_50_FPN_{}x.yaml".format(mult),
          {"_BASE_": "Base-Keypoint-RCNN-FPN.yaml",
           "MODEL": {"WEIGHTS": "detectron2://ImageNetPretrained/MSRA/R-50.pkl",
                      "RESNETS": {"DEPTH": 50}},
           "SOLVER": sched(mult)})

    # COCO-PanopticSegmentation
    pan = {
        "MODEL": {"META_ARCHITECTURE": "PanopticFPN", "MASK_ON": True,
                   "SEM_SEG_HEAD": {"LOSS_WEIGHT": 0.5}},
        "DATASETS": {"TRAIN": ["coco_2017_train_panoptic_separated"],
                      "TEST": ["coco_2017_val_panoptic_separated"]},
    }
    for mult in (1, 3):
        cfg = {"_BASE_": "../Base-RCNN-FPN.yaml", **pan, "SOLVER": sched(mult)}
        cfg["MODEL"] = {**pan["MODEL"], **resnet(50)}
        w("COCO-PanopticSegmentation/panoptic_fpn_R_50_{}x.yaml".format(mult), cfg)

    # LVIS
    lvis = {
        "MODEL": {"MASK_ON": True, "ROI_HEADS": {"NUM_CLASSES": 1230, "SCORE_THRESH_TEST": 0.0001},
                   **resnet(50)},
        "DATASETS": {"TRAIN": ["lvis_v0.5_train"], "TEST": ["lvis_v0.5_val"]},
        "TEST": {"DETECTIONS_PER_IMAGE": 300},
        "DATALOADER": {"SAMPLER_TRAIN": "RepeatFactorTrainingSampler", "REPEAT_THRESHOLD": 0.001},
    }
    w("LVIS-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml", {"_BASE_": "../Base-RCNN-FPN.yaml", **lvis})

    # LVIS-ImbalanceDetection (fork family)
    w("LVIS-ImbalanceDetection/faster_rcnn_R_50_FPN_1x.yaml",
      {"_BASE_": "../Base-RCNN-FPN.yaml",
       "MODEL": {"MASK_ON": False, "ROI_HEADS": {"NUM_CLASSES": 1230, "SCORE_THRESH_TEST": 0.0001}, **resnet(50)},
       "DATASETS": {"TRAIN": ["lvis_v0.5_train"], "TEST": ["lvis_v0.5_val"]},
       "TEST": {"DETECTIONS_PER_IMAGE": 300},
       "DATALOADER": {"SAMPLER_TRAIN": "RepeatFactorTrainingSampler", "REPEAT_THRESHOLD": 0.001}})
    w("LVIS-ImbalanceDetection/faster_rcnn_R_50_FPN_1x_fasterrcnn_focalloss.yaml",
      {"_BASE_": "faster_rcnn_R_50_FPN_1x.yaml",
       "MODEL": {"META_ARCHITECTURE": "FasterRCNNFocalLoss"}})

    # PascalVOC
    w("PascalVOC-Detection/faster_rcnn_R_50_FPN.yaml",
      {"_BASE_": "../Base-RCNN-FPN.yaml",
       "MODEL": {"MASK_ON": False, "ROI_HEADS": {"NUM_CLASSES": 20}, **resnet(50)},
       "DATASETS": {"TRAIN": ["voc_2007_trainval", "voc_2012_trainval"], "TEST": ["voc_2007_test"]},
       "INPUT": {"MIN_SIZE_TRAIN": [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800],
                  "MIN_SIZE_TEST": 800},
       "SOLVER": {"STEPS": [12000, 16000], "MAX_ITER": 18000, "WARMUP_ITERS": 100}})

    # quick_schedules (instant + inference goldens) — each row mirrors the
    # reference file exactly: (inference base, zoo weights, test dataset,
    # EXPECTED_RESULTS, instant base + extra MODEL keys, instant datasets).
    # The reference's instant tests run batch 4 / 2 workers; the inference
    # gates pin the published APs on coco_2017_val_100 (+variants).
    R50 = "detectron2://ImageNetPretrained/MSRA/R-50.pkl"
    val100 = ["coco_2017_val_100"]
    golden = {
        "retinanet_R_50_FPN": dict(
            inf_base="../COCO-Detection/retinanet_R_50_FPN_3x.yaml",
            weights="detectron2://COCO-Detection/retinanet_R_50_FPN_3x/137849486/model_final_4cafe0.pkl",
            test=val100, expected=[["bbox", "AP", 44.36, 0.02]],
            ins_base="../COCO-Detection/retinanet_R_50_FPN_1x.yaml", ins_model={}),
        "mask_rcnn_R_50_FPN": dict(
            inf_base="../COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml",
            weights="detectron2://COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x/137849600/model_final_f10217.pkl",
            test=val100,
            expected=[["bbox", "AP", 47.34, 0.02], ["segm", "AP", 42.67, 0.02]],
            inf_test_aug={"ENABLED": True, "MIN_SIZES": [400, 500]},
            ins_base="../Base-RCNN-FPN.yaml", ins_model={"MASK_ON": True}),
        "fast_rcnn_R_50_FPN": dict(
            inf_base="../COCO-Detection/fast_rcnn_R_50_FPN_1x.yaml",
            weights="detectron2://COCO-Detection/fast_rcnn_R_50_FPN_1x/137635226/model_final_e5f7ce.pkl",
            test=val100, expected=[["bbox", "AP", 45.70, 0.02]],
            ins_base="../COCO-Detection/fast_rcnn_R_50_FPN_1x.yaml", ins_model={},
            ins_datasets={
                "TRAIN": val100,
                "PROPOSAL_FILES_TRAIN": ["detectron2://COCO-Detection/rpn_R_50_FPN_1x/137258492/coco_2017_val_box_proposals_ee0dad.pkl"],
                "TEST": val100,
                "PROPOSAL_FILES_TEST": ["detectron2://COCO-Detection/rpn_R_50_FPN_1x/137258492/coco_2017_val_box_proposals_ee0dad.pkl"],
            }),
        "keypoint_rcnn_R_50_FPN": dict(
            inf_base="../COCO-Keypoints/keypoint_rcnn_R_50_FPN_3x.yaml",
            weights="detectron2://COCO-Keypoints/keypoint_rcnn_R_50_FPN_3x/137849621/model_final_a6e10b.pkl",
            test=["keypoints_coco_2017_val_100"],
            expected=[["bbox", "AP", 52.47, 0.02], ["keypoints", "AP", 67.36, 0.02]],
            ins_base="../Base-RCNN-FPN.yaml", ins_model={"KEYPOINT_ON": True},
            ins_datasets={"TRAIN": ["keypoints_coco_2017_val_100"],
                           "TEST": ["keypoints_coco_2017_val_100"]}),
        "panoptic_fpn_R_50": dict(
            inf_base="../COCO-PanopticSegmentation/panoptic_fpn_R_50_3x.yaml",
            weights="detectron2://COCO-PanopticSegmentation/panoptic_fpn_R_50_3x/139514569/model_final_c10459.pkl",
            test=["coco_2017_val_100_panoptic_separated"],
            expected=[["bbox", "AP", 46.47, 0.02], ["segm", "AP", 43.39, 0.02],
                       ["sem_seg", "mIoU", 42.55, 0.02], ["panoptic_seg", "PQ", 38.99, 0.02]],
            ins_base="../Base-RCNN-FPN.yaml",
            ins_model={"META_ARCHITECTURE": "PanopticFPN", "MASK_ON": True,
                        "RESNETS": {"DEPTH": 50}, "SEM_SEG_HEAD": {"LOSS_WEIGHT": 0.5}},
            ins_datasets={"TRAIN": ["coco_2017_val_100_panoptic_separated"],
                           "TEST": ["coco_2017_val_100_panoptic_separated"]}),
        "rpn_R_50_FPN": dict(
            inf_base="../COCO-Detection/rpn_R_50_FPN_1x.yaml",
            weights="detectron2://COCO-Detection/rpn_R_50_FPN_1x/137258492/model_final_02ce48.pkl",
            test=val100, expected=[["box_proposals", "AR@1000", 58.16, 0.02]],
            ins_base="../COCO-Detection/rpn_R_50_FPN_1x.yaml", ins_model={}),
    }
    for name, g in golden.items():
        inf = {"_BASE_": g["inf_base"],
               "MODEL": {"WEIGHTS": g["weights"]},
               "DATASETS": {"TEST": g["test"]},
               "TEST": {"EXPECTED_RESULTS": g["expected"]},
               # exact-sort decode when verifying the published APs
               "TPU": {"APPROX_TOPK": False}}
        if "inf_test_aug" in g:
            inf["TEST"]["AUG"] = g["inf_test_aug"]
        w("quick_schedules/{}_inference_acc_test.yaml".format(name), inf)
        w("quick_schedules/{}_instant_test.yaml".format(name),
          {"_BASE_": g["ins_base"],
           "MODEL": {"WEIGHTS": R50, **g["ins_model"]},
           "DATASETS": g.get("ins_datasets",
                              {"TRAIN": val100, "TEST": val100}),
           "SOLVER": {"BASE_LR": 0.005, "STEPS": [30], "MAX_ITER": 40,
                       "IMS_PER_BATCH": 4},
           "DATALOADER": {"NUM_WORKERS": 2}})

    # ImbalanceDetection configs (fork family)
    imb_base = {
        "_BASE_": "../Base-RetinaNet.yaml",
        "MODEL": {
            "GAMBLER_ON": True,
            **resnet(50),
            "GAMBLER_HEAD": {
                "NAME": "LayeredUnetGambler",
                "GAMBLER_OUTPUT": "L_BAHW",
                "GAMBLER_IN_CHANNELS": 720,
                "GAMBLER_OUT_CHANNELS": 9,
                "IN_LAYERS": [80, 40, 20, 10, 5],
            },
        },
        "INPUT": {"RESIZING": False},
    }
    w("ImbalanceDetection/Base-Gambler.yaml", imb_base)
    for kappa in (100, 2200):
        for temp in (0.001, 0.03):
            w("ImbalanceDetection/quick_schedules/coco_kappa{}_temp{}.yaml".format(kappa, str(temp).replace(".", "p")),
              {"_BASE_": "../Base-Gambler.yaml",
               "MODEL": {"GAMBLER_HEAD": {"GAMBLER_KAPPA": kappa, "GAMBLER_TEMPERATURE": temp}}})
    w("ImbalanceDetection/quick_schedules/simple_retinanet.yaml",
      {"_BASE_": "../Base-Gambler.yaml",
       "MODEL": {"ANCHOR_GENERATOR": {"SIZES": [[32, 40.3, 50.8], [64, 80.6, 101.6], [128, 161.3, 203.2],
                                                  [256, 322.5, 406.4], [512, 645.1, 812.7]],
                                        "ASPECT_RATIOS": [[1.0]]},
                  "GAMBLER_HEAD": {"GAMBLER_IN_CHANNELS": 240, "GAMBLER_OUT_CHANNELS": 3}}})
    w("ImbalanceDetection/lvis.yaml",
      {"_BASE_": "Base-Gambler.yaml",
       "MODEL": {"RETINANET": {"NUM_CLASSES": 1230}, "GAMBLER_HEAD": {"NUM_CLASSES": 1230}},
       "DATASETS": {"TRAIN": ["lvis_v0.5_train"], "TEST": ["lvis_v0.5_val"]}})
    w("ImbalanceDetection/overfit.yaml",
      {"_BASE_": "Base-Gambler.yaml",
       "INPUT": {"RANDOM_FLIPPING": False},
       "DATALOADER": {"FILTER_EMPTY_ANNOTATIONS": True}})


if __name__ == "__main__":
    main()


def extra_families():
    """Cityscapes / Detectron1-Comparisons / Misc families."""
    w("Cityscapes/mask_rcnn_R_50_FPN.yaml",
      {"_BASE_": "../Base-RCNN-FPN.yaml",
       "MODEL": {"MASK_ON": True, "ROI_HEADS": {"NUM_CLASSES": 8}, **resnet(50)},
       "DATASETS": {"TRAIN": ["cityscapes_fine_instance_seg_train"],
                     "TEST": ["cityscapes_fine_instance_seg_val"]},
       "INPUT": {"MIN_SIZE_TRAIN": [800, 832, 864, 896, 928, 960, 992, 1024],
                  "MIN_SIZE_TEST": 1024, "MAX_SIZE_TRAIN": 2048, "MAX_SIZE_TEST": 2048},
       "SOLVER": {"IMS_PER_BATCH": 8, "BASE_LR": 0.01, "STEPS": [18000], "MAX_ITER": 24000}})
    for name, overrides in [
        ("faster_rcnn_R_50_FPN_noaug_1x", {"INPUT": {"MIN_SIZE_TRAIN": [800]}}),
        ("mask_rcnn_R_50_FPN_noaug_1x", {"MODEL": {"MASK_ON": True}, "INPUT": {"MIN_SIZE_TRAIN": [800]}}),
    ]:
        cfg = {"_BASE_": "../Base-RCNN-FPN.yaml", "MODEL": {"MASK_ON": False, **resnet(50)}}
        for k, v in overrides.items():
            cfg.setdefault(k, {}).update(v) if isinstance(v, dict) else cfg.update({k: v})
        w("Detectron1-Comparisons/{}.yaml".format(name), cfg)
    # Misc: deformable conv + cascade + GN variants
    w("Misc/mask_rcnn_R_50_FPN_3x_dconv_c3-c5.yaml",
      {"_BASE_": "../Base-RCNN-FPN.yaml",
       "MODEL": {"MASK_ON": True, **resnet(50),
                  "RESNETS": {"DEPTH": 50, "DEFORM_ON_PER_STAGE": [False, True, True, True],
                               "DEFORM_MODULATED": False}},
       "SOLVER": sched(3)})
    w("Misc/cascade_mask_rcnn_R_50_FPN_3x.yaml",
      {"_BASE_": "../Base-RCNN-FPN.yaml",
       "MODEL": {"MASK_ON": True, **resnet(50),
                  "ROI_HEADS": {"NAME": "CascadeROIHeads"},
                  "ROI_BOX_HEAD": {"CLS_AGNOSTIC_BBOX_REG": True}},
       "SOLVER": sched(3)})
    w("Misc/mask_rcnn_R_50_FPN_3x_gn.yaml",
      {"_BASE_": "../Base-RCNN-FPN.yaml",
       "MODEL": {"MASK_ON": True, **resnet(50),
                  "RESNETS": {"DEPTH": 50, "NORM": "GN", "STRIDE_IN_1X1": False},
                  "FPN": {"NORM": "GN"},
                  "ROI_BOX_HEAD": {"NORM": "GN", "NUM_CONV": 4, "NUM_FC": 1, "NAME": "FastRCNNConvFCHead"},
                  "ROI_MASK_HEAD": {"NORM": "GN"}},
       "SOLVER": sched(3)})
    w("ssigns/faster_rcnn_R_50_FPN_crop320.yaml",
      {"_BASE_": "../Base-RCNN-FPN.yaml",
       "MODEL": {"MASK_ON": False, "ROI_HEADS": {"NUM_CLASSES": 9}, **resnet(50)},
       "INPUT": {"CROP": {"ENABLED": True, "TYPE": "absolute", "SIZE": [320, 320]}},
       "DATASETS": {"TRAIN": ["ssigns_train"], "TEST": ["ssigns_val"]}})


extra_families()
