from .build import (
    build_detection_test_loader,
    build_detection_train_loader,
    get_detection_dataset_dicts,
    print_instances_class_histogram,
    to_native_batch,
)
from .catalog import DatasetCatalog, Metadata, MetadataCatalog
from .dataset_mapper import DatasetMapper
from . import datasets  # noqa: F401  (registers the builtin splits, ref data/__init__.py)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
